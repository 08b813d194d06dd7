package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Randomized conformance for the round-9 operators: each vs the
  * brute-force formulation it replaces, on seeded random inputs — the
  * fixed oracles pin one dataset; these catch the edge geometry (ties at
  * the skyline boundary, sketch saturation, label oscillation) the
  * curated data misses. */
class Round9RandomSpec extends AnyFunSuite with Matchers with SparkSuite {

  for (seed <- Seq(3, 11, 77)) {
    test(s"windowed skyline equals brute-force dominance on random data (seed $seed)") {
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      // small value domains make boundary ties COMMON (duplicate prices,
      // duplicate sizes, full duplicate points)
      val parts = (0 until 400).map { _ =>
        (s"B${rnd.nextInt(4)}", rnd.nextInt(12).toLong, rnd.nextInt(10).toLong)
      }
      val df = parts.toDF("brand", "price_c", "sz").repartition(7)
      val wStrict = Window.partitionBy("brand").orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
      val wSame = Window.partitionBy("brand", "price_c")
      val got = df
        .withColumn("m_strict", max("sz").over(wStrict))
        .withColumn("m_same", max("sz").over(wSame))
        .where(coalesce(col("m_strict"), lit(Long.MinValue)) < col("sz") &&
          col("m_same") <= col("sz"))
        .select("brand", "price_c", "sz")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      def dom(a: (String, Long, Long), b: (String, Long, Long)) =
        a._1 == b._1 && a._2 <= b._2 && a._3 >= b._3 &&
          (a._2 < b._2 || a._3 > b._3)
      val expect = parts.map(p => (p._1, p._2, p._3))
        .filter(p => !parts.exists(q => dom((q._1, q._2, q._3), p))).toSet
      got shouldBe expect
    }

    test(s"KMV distinct estimate stays within the sketch error bound (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val keys = (0 until 5000).map(_ => rnd.nextInt(2000)).distinct
      def h(k: Int): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(k.toString.getBytes("UTF-8"))
        java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(8), 16)
      }
      val hashes = keys.map(h).distinct.sorted
      val k = 256
      val est =
        if (hashes.length < k) hashes.length.toLong
        else (255L * 4294967296L) / hashes(k - 1)
      val trueN = hashes.length
      // KMV relative error ~ 1/sqrt(k) ≈ 6.3%; allow 4 sigma
      math.abs(est.toDouble - trueN) / trueN should be < 0.25
    }

    test(s"LPA result is invariant to edge-list order and partitioning (seed $seed)") {
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val raw = (0 until 300).map { _ =>
        val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong; (a, b)
      }.filter(p => p._1 != p._2).distinct
      val nodes = raw.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
      val sym = (raw ++ raw.map(_.swap)).distinct
      val run1 = graft.operators.LabelPropagation
        .run(nodes, sym.toDF("u", "v").repartition(3), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val run2 = graft.operators.LabelPropagation
        .run(nodes, scala.util.Random.shuffle(sym).toDF("u", "v").repartition(9), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      run1 shouldBe run2
      // the distributed loop (maxDriverEdges = 0) must agree with the
      // driver fast path run1/run2 took under the default bound
      val runDist = graft.operators.LabelPropagation
        .run(nodes, sym.toDF("u", "v").repartition(3), 3, maxDriverEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      runDist shouldBe run1
    }
  }
}
