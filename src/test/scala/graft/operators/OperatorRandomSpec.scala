package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Randomized conformance: each operator vs the brute-force formulation it
  * replaces, on seeded random inputs — catches edge geometry (boundary
  * ties, empty keys, singleton groups) fixtures curate away. */
class OperatorRandomSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def randomTables(seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // coarse integer times make equal-time collisions COMMON, not rare —
    // the tie paths are the risky ones
    val left = (0 until 120).map { i =>
      (i.toLong, s"k${rnd.nextInt(6)}", rnd.nextInt(40).toLong, rnd.nextInt(1000) / 10.0)
    }.toDF("lid", "key", "t", "lv")
    val right = (0 until 90).map { i =>
      (1000L + i, s"k${rnd.nextInt(7)}", rnd.nextInt(40).toLong, rnd.nextInt(1000) / 10.0)
    }.toDF("rid", "key", "t", "rv")
    (left.repartition(5), right.repartition(3))
  }

  for (seed <- Seq(1, 7, 42)) {
    test(s"asof join equals brute-force latest-prior lookup (seed $seed)") {
      val (left, right) = randomTables(seed)
      val got = AsofJoin.joinAsof(left, right,
        on = Seq("key"), leftTime = "t", rightTime = "t",
        rightCols = Seq("rid", "rv"), rightPrefix = "m_")
        .select("lid", "m_rid", "m_rv")
        .collect().map(_.toString).sorted

      // Brute force: expand all (left, right<=t) pairs, keep the max
      // (t, rid, rv) struct per left row — the same tie-break AsofJoin
      // defines (greatest payload among equal times).
      val r = right.select(col("key").as("rkey"), col("t").as("rt"),
        col("rid"), col("rv"))
      val w = Window.partitionBy("lid")
        .orderBy(col("rt").desc, col("rid").desc, col("rv").desc)
      val expected = left
        .join(r, col("key") === col("rkey") && col("rt") <= col("t"), "left")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1 || col("rid").isNull)
        .select("lid", "rid", "rv")
        .collect().map(_.toString).sorted

      got shouldBe expected
    }

    test(s"range join equals brute-force BETWEEN join (seed $seed)") {
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val points = (0 until 200).map(i => (i.toLong, rnd.nextInt(500) - 250.0))
        .toDF("pid", "v").repartition(4)
      val intervals = (0 until 30).map { i =>
        val lo = rnd.nextInt(400) - 250.0
        (s"b$i", lo, lo + rnd.nextInt(120))
      }.toDF("band", "lo", "hi").repartition(2)

      val got = RangeJoin.bucketed(points, "v", intervals, "lo", "hi", 37.0)
        .select("pid", "band").collect().map(_.toString).sorted
      val expected = points.crossJoin(intervals)
        .where(col("v") >= col("lo") && col("v") <= col("hi"))
        .select("pid", "band").collect().map(_.toString).sorted
      got shouldBe expected
    }

    test(s"salted join equals plain join (seed $seed)") {
      val (left, right) = randomTables(seed)
      val got = SkewSalt.saltedJoin(left, right.withColumnRenamed("t", "rt"),
        Seq("key"), salts = 5)
        .select("lid", "rid").collect().map(_.toString).sorted
      val expected = left.join(right.withColumnRenamed("t", "rt"), Seq("key"))
        .select("lid", "rid").collect().map(_.toString).sorted
      got shouldBe expected
    }

    test(s"morton code equals bit-interleave reference, injective, monotone (seed $seed)") {
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val pts = (0 until 300).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      // reference: interleave bit-by-bit in plain Scala
      def ref(x: Long, y: Long): Long =
        (0 until 16).foldLeft(0L) { (acc, i) =>
          acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
        }
      val got = pts.toDF("x", "y")
        .select(ZOrder.mortonCode(col("x"), col("y")).as("z"))
        .as[Long].collect()
      got.toSeq shouldBe pts.map { case (x, y) => ref(x, y) }
      // injectivity on the sample (codes collide only for identical points)
      pts.zip(got).groupBy(_._2).values.foreach { g =>
        g.map(_._1).distinct.size shouldBe 1
      }
      // monotone in x for fixed y (spread16 strictly increasing)
      val Seq((x1, y1), (x2, _)) = pts.take(2).toSeq
      val lo = math.min(x1, x2); val hi = math.max(x1, x2)
      if (lo != hi) {
        val z = Seq((lo, y1), (hi, y1)).toDF("x", "y")
          .select(ZOrder.mortonCode(col("x"), col("y")).as("z")).as[Long].collect()
        z(0) should be < z(1)
      }
    }
  }
}
