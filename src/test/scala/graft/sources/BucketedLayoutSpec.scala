package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSuite, Tables}

/** The bucketed-layout scale claim, proven on the plan: aggregations and
  * joins on the bucket key must run with NO shuffle exchange — the fact
  * table's one hash shuffle is paid at write time, once, for every
  * downstream per-AP job. */
class BucketedLayoutSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def synth = Tables.events(spark, sfDir).select(
    col("user_id").cast("string").as("bssid"),
    col("value").cast("double").as("value"))

  private def shuffles(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  test("groupBy on the bucket key aggregates exchange-free, same results") {
    val root = Files.createTempDirectory("graft_bucketed").toString
    BucketedLayout.writeBucketed(synth, "fact_by_bssid", s"$root/fact", "bssid", 8)
    try {
      val agg = BucketedLayout.table(spark, "fact_by_bssid")
        .groupBy("bssid").agg(count(lit(1)).as("n"), avg("value").as("mean"))
      shuffles(agg.queryExecution.executedPlan.toString) shouldBe 0

      // Bucketing is a layout change only — results match the plain scan.
      val expect = synth.groupBy("bssid")
        .agg(count(lit(1)).as("n"), avg("value").as("mean"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = agg.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      got shouldBe expect
    } finally spark.sql("DROP TABLE IF EXISTS fact_by_bssid")
  }

  test("co-bucketed join on the key runs without a shuffle on either side") {
    val root = Files.createTempDirectory("graft_bucketed_join").toString
    BucketedLayout.writeBucketed(synth, "fact_a", s"$root/a", "bssid", 8)
    BucketedLayout.writeBucketed(
      synth.groupBy("bssid").agg(avg("value").as("mean")),
      "stats_b", s"$root/b", "bssid", 8)
    // Forbid the broadcast fallback so the test exercises the co-located
    // join path (at real scale both sides are too big to broadcast anyway).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedLayout.table(spark, "fact_a")
        .join(BucketedLayout.table(spark, "stats_b"), "bssid")
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      shuffles(plan) shouldBe 0
      joined.count() shouldBe synth.count()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS fact_a")
      spark.sql("DROP TABLE IF EXISTS stats_b")
    }
  }
}
