package graft.queries

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSuite, Tables}

/** Invariants of the temporal-history operators (cross-engine equality is
  * the oracle gate's job; these pin what the shapes must mean). */
class HistorySpec extends AnyFunSuite with Matchers with SparkSuite {

  test("scd2: versions are gapless per key and validity chains link exactly") {
    val out = HistoryQueries.scd2History.build(spark, sfDir).cache()
    // versions 1..n per customer with no gaps
    val badVersions = out.groupBy("custkey")
      .agg(F.count(F.lit(1)).as("n"), F.max("version").as("mx"),
        F.min("version").as("mn"))
      .where(F.col("mx") =!= F.col("n") || F.col("mn") =!= 1)
    badVersions.count() shouldBe 0
    // each row's to_day equals the next version's from_day (half-open chain)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("custkey").orderBy("version")
    val chained = out.withColumn("next_from", F.lead("from_day", 1).over(w))
    chained.where(F.col("to_day").isNotNull &&
      F.col("to_day") =!= F.col("next_from")).count() shouldBe 0
    // exactly one open-ended (current) row per customer
    out.where(F.col("to_day").isNull).groupBy("custkey")
      .count().where(F.col("count") =!= 1).count() shouldBe 0
    // consecutive versions always change status
    chained.withColumn("next_status", F.lead("status", 1).over(w))
      .where(F.col("next_status").isNotNull &&
        F.col("next_status") === F.col("status")).count() shouldBe 0
    out.unpersist()
    ()
  }

  test("islands: conservation and coverage bounds against the raw intervals") {
    val out = HistoryQueries.intervalIslands.build(spark, sfDir).cache()
    val iv = Tables.lineitem(spark, sfDir).select(
      F.col("l_suppkey").as("suppkey"),
      F.datediff(F.col("l_shipdate").cast("date"),
        F.lit("1970-01-01").cast("date")).as("s"),
      (F.datediff(F.col("l_shipdate").cast("date"),
        F.lit("1970-01-01").cast("date"))
        + F.lit(1) + F.col("l_orderkey") % 7).as("e"))
    val perKey = iv.groupBy("suppkey").agg(
      F.count(F.lit(1)).as("n_iv"),
      F.sum(F.col("e") - F.col("s") + 1).as("sum_len"),
      (F.max("e") - F.min("s") + 1).as("span"))
    val j = out.join(perKey, "suppkey")
    // every interval lands in exactly one island
    j.where(F.col("n_intervals") =!= F.col("n_iv")).count() shouldBe 0
    // union is at most the sum of lengths and at most the total span,
    // and at least the longest single interval could require: >= 1 island
    j.where(F.col("covered_days") > F.col("sum_len") ||
      F.col("covered_days") > F.col("span") ||
      F.col("n_islands") < 1 ||
      F.col("n_islands") > F.col("n_intervals")).count() shouldBe 0
    out.unpersist()
    ()
  }
}
