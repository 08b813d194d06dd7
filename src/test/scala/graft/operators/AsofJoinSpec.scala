package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class AsofJoinSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def leftDf = {
    import spark.implicits._
    Seq(
      (1L, "u1", ts("2024-01-01 10:00:00"), 100.0),
      (2L, "u1", ts("2024-01-01 12:00:00"), 200.0),
      (3L, "u2", ts("2024-01-01 09:00:00"), 300.0), // before any right row
      (4L, "u3", ts("2024-01-01 10:00:00"), 400.0)  // key with no right rows
    ).toDF("event_id", "user_id", "ts", "value")
  }

  private def rightDf = {
    import spark.implicits._
    Seq(
      (11L, "u1", ts("2024-01-01 09:30:00"), 1.0),
      (12L, "u1", ts("2024-01-01 11:00:00"), 2.0),
      (13L, "u2", ts("2024-01-01 09:30:00"), 3.0)
    ).toDF("event_id", "user_id", "ts", "value")
  }

  private def run(tol: Option[org.apache.spark.sql.Column] = None) =
    AsofJoin.joinAsof(leftDf, rightDf,
      on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      rightCols = Seq("event_id", "value"), rightPrefix = "r_", tolerance = tol)
      .select("event_id", "r_event_id", "r_value")
      .orderBy("event_id").collect()

  test("each left row gets the most recent right row at or before it") {
    run() shouldBe Array(
      Row(1L, 11L, 1.0),   // 10:00 -> 09:30 view
      Row(2L, 12L, 2.0),   // 12:00 -> 11:00 view (not 09:30)
      Row(3L, null, null), // 09:00 precedes every u2 right row
      Row(4L, null, null)) // u3 has no right rows at all
  }

  test("a right row exactly at the left timestamp matches (inclusive)") {
    import spark.implicits._
    val l = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val r = Seq((9L, "u", ts("2024-01-01 10:00:00"), 7.0)).toDF("event_id", "user_id", "ts", "v")
    val out = AsofJoin.joinAsof(l, r, Seq("user_id"), "ts", "ts", Seq("event_id", "v"), "r_")
      .select("event_id", "r_event_id", "r_v").collect()
    out shouldBe Array(Row(1L, 9L, 7.0))
  }

  test("tolerance discards matches older than the horizon but keeps the row") {
    val out = run(tol = Some(expr("INTERVAL 1 HOUR")))
    out shouldBe Array(
      Row(1L, 11L, 1.0),   // 30 min old: inside 1 h
      Row(2L, 12L, 2.0),   // 1 h old exactly: inclusive
      Row(3L, null, null),
      Row(4L, null, null))
  }

  test("equal-time right rows resolve to the greatest payload, independent of input order") {
    import spark.implicits._
    val l = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    def right(seed: Int) = new scala.util.Random(seed).shuffle(Seq(
      (21L, "u", ts("2024-01-01 09:00:00"), 5.0),
      (23L, "u", ts("2024-01-01 09:00:00"), 6.0),
      (22L, "u", ts("2024-01-01 09:00:00"), 4.0)))
      .toDF("event_id", "user_id", "ts", "v").repartition(3)
    val outs = Seq(1, 42).map { seed =>
      AsofJoin.joinAsof(l, right(seed), Seq("user_id"), "ts", "ts", Seq("event_id", "v"), "r_")
        .select("r_event_id", "r_v").collect()
    }
    outs.head shouldBe outs.last
    outs.head shouldBe Array(Row(23L, 6.0)) // greatest (event_id, v) struct wins
  }

  test("equals an explicit max-payload pre-dedup of the right side on real data") {
    // The j6 oracle pre-dedups duplicate (user_id, ts) view rows to the max
    // event_id row (DuckDB's ASOF tie-break among duplicates is unspecified);
    // the Spark operator instead resolves them inside its single-Exchange
    // window (greatest __right struct wins). This pins the two formulations
    // equivalent on the real events table WITH planted duplicates, so scaled
    // or re-seeded testdata cannot open a gap between them.
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val views = ev.where(col("event_type") === "view")
      .select("event_id", "user_id", "ts", "value")
    // plant duplicates: clone every view at the same (user_id, ts) with a
    // shifted event_id/value on both sides of the original
    val planted = views
      .unionByName(views.withColumn("event_id", col("event_id") + 1000000L)
        .withColumn("value", col("value") * 2))
      .unionByName(views.withColumn("event_id", col("event_id") - 1000000L))
    val viaOperator = AsofJoin.joinAsof(
      purchases, planted, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"), "view_")
      .select("event_id", "view_event_id", "view_value")
    val dedupW = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "ts")
      .orderBy(struct(col("event_id"), col("value"), col("ts")).desc)
    val preDeduped = planted
      .withColumn("__rn", row_number().over(dedupW)).where($"__rn" === 1)
      .drop("__rn")
    val viaDedup = AsofJoin.joinAsof(
      purchases, preDeduped, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"), "view_")
      .select("event_id", "view_event_id", "view_value")
    viaOperator.exceptAll(viaDedup).count() shouldBe 0
    viaDedup.exceptAll(viaOperator).count() shouldBe 0
    viaOperator.count() should be > 0L
  }

  test("null keys match nothing (SQL equi-join semantics), rows still kept") {
    import spark.implicits._
    val l = Seq(
      (1L, Option("u"), ts("2024-01-01 10:00:00")),
      (2L, Option.empty[String], ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val r = Seq(
      (9L, Option("u"), ts("2024-01-01 09:00:00"), 7.0),
      (8L, Option.empty[String], ts("2024-01-01 09:00:00"), 5.0)
    ).toDF("event_id", "user_id", "ts", "v")
    val out = AsofJoin.joinAsof(l, r, Seq("user_id"), "ts", "ts", Seq("event_id", "v"), "r_")
      .select("event_id", "r_event_id", "r_v").orderBy("event_id").collect()
    out shouldBe Array(
      Row(1L, 9L, 7.0),
      Row(2L, null, null)) // null key: no invented null-to-null match
  }

  test("plan has exactly one hash-partition Exchange and no nested-loop join") {
    val df = AsofJoin.joinAsof(leftDf, rightDf,
      on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      rightCols = Seq("event_id", "value"), rightPrefix = "r_")
    val p = df.queryExecution.executedPlan.toString
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    "hashpartitioning".r.findAllIn(p).size shouldBe 1
  }
}
