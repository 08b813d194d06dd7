package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class BloomPruneSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("pruned semi-join equals the plain semi-join exactly") {
    import spark.implicits._
    val fact = (1L to 5000L).map(i => (i, i % 400)).toDF("rid", "k").repartition(6)
    val dim = Seq(3L, 17L, 42L, 399L, 9999L).toDF("dk")

    val got = BloomPrune.prunedSemiJoin(fact, dim, "k", "dk", expectedKeys = 10)
      .collect().map(_.toString).sorted
    val expected = fact.join(dim.select(col("dk").as("k")), Seq("k"), "left_semi")
      .collect().map(_.toString).sorted
    got shouldBe expected
    got.length should be > 0
  }

  test("string keys probe the string representation (no silent long cast)") {
    import spark.implicits._
    val fact = Seq((1L, "US"), (2L, "DE"), (3L, "FR"), (4L, "JP")).toDF("rid", "cc")
    val dim = Seq("US", "FR").toDF("dc")
    val got = BloomPrune.prunedSemiJoin(fact, dim, "cc", "dc", expectedKeys = 2)
      .select("rid").collect().map(_.getLong(0)).sorted
    got shouldBe Array(1L, 3L)
  }

  test("mismatched key type families are rejected, not mis-probed") {
    import spark.implicits._
    val fact = Seq((1L, "7")).toDF("rid", "k")
    val dim = Seq(7L).toDF("dk")
    val ex = intercept[IllegalArgumentException] {
      BloomPrune.prunedSemiJoin(fact, dim, "k", "dk", expectedKeys = 1)
    }
    ex.getMessage should include("type family")
  }

  test("the bloom pass-through is selective (prunes most non-matching rows)") {
    import spark.implicits._
    val fact = (1L to 20000L).map(i => (i, i)).toDF("rid", "k")
    val dim = (1L to 50L).map(i => i * 1000).toDF("dk")
    val bloom = dim.stat.bloomFilter("dk", 50, 0.01)
    val kept = fact.collect().count(r => bloom.mightContainLong(r.getLong(1)))
    // 50 true keys + ~1% fpp of 20k ≈ 250: an order of magnitude under full
    kept should be < 2000
    kept should be >= 50
  }

  test("no false negatives: every dimension key survives the prune") {
    import spark.implicits._
    val keys = (1L to 3000L).map(i => i * 7)
    val dim = keys.toDF("dk")
    val bloom = dim.stat.bloomFilter("dk", keys.size.toLong, 0.03)
    keys.foreach(k => bloom.mightContainLong(k) shouldBe true)
  }
}
