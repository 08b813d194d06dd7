package graft.queries

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSuite, Tables}

/** Invariants for the round-9 skyline / sketch / streaming-upsert
  * operators, each proved against an independent in-process computation
  * (the DuckDB hash gate is the cross-engine proof; these pin semantics). */
class SkylineSketchSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("pareto front: members are mutually non-dominated and cover all parts") {
    val front = AnalyticsQueries.o25ParetoFront.build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val parts = Tables.part(spark, sfDir)
      .select(F.col("p_brand"),
        F.expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        F.col("p_size").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def dominates(a: (String, Long, Long), b: (String, Long, Long)) =
      a._1 == b._1 && a._2 <= b._2 && a._3 >= b._3 &&
        (a._2 < b._2 || a._3 > b._3)
    // no front member is dominated by anything in the full data
    for (m <- front; p <- parts) withClue(s"$p dominates $m") {
      dominates(p, m) shouldBe false
    }
    // completeness: every part is a front member or dominated by one
    val fs = front.toSet
    for (p <- parts if !fs.contains(p))
      withClue(s"$p escaped the front") {
        front.exists(m => dominates(m, p)) shouldBe true
      }
  }

  test("count-min: estimates never undercount and match a Scala-side sketch") {
    val out = AnalyticsQueries.o26CountMin.build(spark, sfDir).collect()
    out.foreach { r =>
      withClue(r.getLong(0)) { r.getLong(2) should be >= r.getLong(1) }
    }
    // independent sketch: same md5-derived buckets in plain Scala
    val keys = Tables.orders(spark, sfDir).select("o_custkey").collect()
      .map(_.getLong(0).toString)
    def bucket(k: String, j: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$k:$j".getBytes("UTF-8"))
      Integer.parseInt(md.map("%02x".format(_)).mkString.substring(0, 3), 16)
    }
    val sketch = scala.collection.mutable.Map.empty[(Int, Int), Long]
    for (k <- keys; j <- 0 to 3)
      sketch.updateWith((j, bucket(k, j)))(v => Some(v.getOrElse(0L) + 1))
    for (r <- out) {
      val k = r.getLong(0).toString
      val expect = (0 to 3).map(j => sketch((j, bucket(k, j)))).min
      withClue(k) { r.getLong(2) shouldBe expect }
    }
  }

  test("foreachBatch upsert: multi-batch stream state equals one-shot batch merge") {
    val got = IngestQueries.foreachBatchUpsert.build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    val expect = Tables.events(spark, sfDir)
      .where(F.col("event_id") < 50000L)
      .withColumn("rn", F.row_number().over(w))
      .withColumn("upd_cnt", F.count(F.lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .where(F.col("rn") === 1)
      .select("user_id", "event_id", "value", "upd_cnt")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    got should contain theSameElementsInOrderAs expect
  }
}
