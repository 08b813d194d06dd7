package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class SkewSaltSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def probe = {
    import spark.implicits._
    // one hot key (900 of 1000 rows) + a long tail
    val rows = (0 until 900).map(i => ("hot", i.toLong)) ++
      (0 until 100).map(i => (s"k$i", i.toLong))
    rows.toDF("k", "payload")
  }

  private def build = {
    import spark.implicits._
    (Seq("hot") ++ (0 until 100).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, i * 10.0) }.toDF("k", "dim_value")
  }

  test("salted join returns exactly the plain equi-join rows") {
    val plain = probe.join(build, Seq("k"))
      .select("k", "payload", "dim_value")
      .collect().map(_.toString).sorted
    val salted = SkewSalt.saltedJoin(probe, build, Seq("k"), salts = 8)
      .select("k", "payload", "dim_value")
      .collect().map(_.toString).sorted
    salted shouldBe plain
  }

  test("the hot key spreads across the salt range") {
    val nonKey = Seq(col("payload"))
    val spread = probe.where(col("k") === "hot")
      .withColumn("__salt", pmod(hash(nonKey: _*), lit(8)))
      .groupBy("__salt").count().collect()
    spread.length shouldBe 8 // all 8 salt buckets populated
    all(spread.map(_.getLong(1))) should be < 900L / 2 // no bucket re-concentrates
  }

  test("salted join is re-execution deterministic") {
    def run() = SkewSalt.saltedJoin(probe.repartition(5), build, Seq("k"), 4)
      .orderBy("k", "payload").collect().map(_.toString)
    run() shouldBe run()
  }
}
