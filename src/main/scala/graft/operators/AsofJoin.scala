package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: attach to each left row the single most recent right row with
  * `rightTime <= leftTime` (inclusive), per equi-key, optionally within a
  * tolerance horizon — the temporal join the reference's feedback loop does
  * row-at-a-time when it pairs a positioning request with the latest prior
  * AP-state snapshot (`wifi-positioning-service`'s per-request repository
  * lookup, generalized to a set-oriented batch operator).
  *
  * Spark has no ASOF JOIN. The naive encodings are scale-killers:
  *   - a range join (`l.key = r.key AND r.t <= l.t`) plans as a
  *     BroadcastNestedLoop / per-key pair blow-up, O(n·m) per key;
  *   - "join then row_number over pairs" materializes the same blow-up
  *     before pruning it.
  * This implementation is the scalable idiom: tag both sides, union them,
  * shuffle ONCE on the key, sort each partition by (time, side), and carry
  * the latest right payload forward with a running `last(ignoreNulls)`
  * window — O((n+m) log (n+m)) per partition, zero pair expansion. The plan
  * is one Exchange (hashpartitioning on the key) + one sort, and survives
  * 100× on both sides. DuckDB's native ASOF JOIN is the oracle for the
  * registered query (`j6_asof_join`).
  *
  * Determinism: right rows sharing an identical (key, time) are ordered by
  * the payload struct itself, so "latest" resolves to the greatest payload —
  * a total, input-order-independent tie-break (the driver hash-gate re-runs
  * queries; an arbitrary winner would flake).
  */
object AsofJoin {

  /** @param on         equi-join key columns (present on both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightCols  right payload columns to attach (each emitted as
    *                   `rightPrefix + name`); `rightTime` is always attached
    *                   as `rightPrefix + rightTime`
    * @param tolerance  optional horizon: matches older than
    *                   `leftTime - tolerance` are discarded (row kept, nulls)
    */
  def joinAsof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightPrefix: String = "asof_",
      tolerance: Option[Column] = None): DataFrame = {
    require(on.nonEmpty, "asof join needs at least one equi-key")
    val leftPayloadCols = left.columns.toSeq
    val rightPayload = (rightCols :+ rightTime).distinct

    val leftStructT = StructType(left.schema.fields)
    val rightStructT = StructType(
      right.select(rightPayload.map(col): _*).schema.fields)

    val l = left.select(
      on.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        struct(leftPayloadCols.map(col): _*).as("__left"),
        lit(null).cast(rightStructT).as("__right")): _*)
    // SQL equi-join semantics: a NULL key matches nothing. Window
    // partitionBy would group null-key rows from BOTH sides together and
    // invent matches — drop null-key right rows instead (left null-key rows
    // then sit in a partition with no right rows and correctly get nulls).
    val r = right
      .where(on.map(col(_).isNotNull).reduce(_ && _))
      .select(
        on.map(col) ++ Seq(
          col(rightTime).as("__t"),
          lit(0).as("__side"),
          lit(null).cast(leftStructT).as("__left"),
          struct(rightPayload.map(col): _*).as("__right")): _*)

    // Right rows sort BEFORE left rows at an equal timestamp (side 0 < 1),
    // making the match inclusive (rightTime == leftTime matches); the
    // trailing __right orders equal-time right rows totally.
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__right").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__m", last(col("__right"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val gated = tolerance match {
      case Some(tol) =>
        carried.withColumn("__m",
          when(col("__m")(rightTime) >= col("__t") - tol, col("__m")))
      case None => carried
    }

    val out = leftPayloadCols.map(c => col("__left")(c).as(c)) ++
      rightPayload.map(c => col("__m")(c).as(rightPrefix + c))
    gated.select(out: _*)
  }
}
