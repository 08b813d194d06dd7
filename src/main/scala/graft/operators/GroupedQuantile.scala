package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.plans.{DoubleOrderBitsExpression, DoubleOrderBitsInverseExpression}

/** Exact PER-GROUP order statistics by fully-distributed histogram descent
  * — the grouped extension of [[ExactQuantile]], with NO driver-side
  * per-group state at all.
  *
  * Spark's exact `percentile` buffers every group's values in
  * ObjectHashAggregate state (memory grows with group size — the 100 TB
  * OOM), and a global `row_number` window per group sorts each group's full
  * data. This operator instead keeps a GROUP-STATE DATAFRAME
  * (keys, lo, hi, k, remaining) and descends all groups' histograms in
  * lock-step:
  *
  *   1. each level joins the values to the state (AQE picks broadcast when
  *      the group count is small, shuffle when it isn't — no hint), tags
  *      each row with its group's bucket `(v − lo) DIV width`, and runs ONE
  *      aggregate: (keys, bucket) → count. ≤ fanout buckets per group.
  *   2. the bucket holding rank k is found per group with a window
  *      cumulative sum over its ≤ fanout histogram rows (bounded frame —
  *      never over data rows), producing the next level's state. Groups
  *      whose range collapses (hi == lo) or whose remaining rows fit
  *      `directLimit` leave the loop.
  *   3. small residues finish exactly with a per-group `row_number` over at
  *      most `directLimit` rows per group.
  *
  * Driver involvement per level is ONE emptiness check on the active-state
  * frame; levels are ⌈log_fanout(range)⌉ — the state frame is
  * `localCheckpoint`ed per level (the iterative-loop lineage discipline).
  * Groups of wildly different sizes coexist: tiny groups exit to the
  * residue finisher on level 0, huge groups keep descending.
  */
object GroupedQuantile {

  /** Exact value at a per-group rank of an integral column.
    *
    * @param rankOf builds the 1-indexed rank from the group's row-count
    *               column — e.g. `n => expr("(__n + 1) DIV 2")` via the
    *               provided [[medianRank]]. Must satisfy 1 ≤ k ≤ n.
    * @return one row per group: (keys..., resCol)
    */
  def valueAtRankBy(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      rankOf: Column => Column,
      resCol: String = "value_at_rank",
      fanout: Int = 4096,
      directLimit: Long = 65536L): DataFrame =
    valueAtRanksBy(df, keys, valueCol, Seq(rankOf), resCol, fanout, directLimit)
      .drop("rank_slot")

  /** A whole RANK VECTOR per group out of ONE lock-step descent: the rank
    * slot index joins the grouping key, so (supplier, median) and
    * (supplier, p95) descend as sibling "groups" sharing every level's
    * single aggregate — r ranks cost the same number of LEVELS as one,
    * with the per-level join fanning each value row out only to its
    * group's ACTIVE slots (ranges shrink geometrically and slots that hit
    * their answer leave the state).
    *
    * @return one row per (group, slot): (keys..., rank_slot, resCol) —
    *         `rank_slot` is the 0-based index into `rankOfs`
    */
  def valueAtRanksBy(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      rankOfs: Seq[Column => Column],
      resCol: String = "value_at_rank",
      fanout: Int = 4096,
      directLimit: Long = 65536L): DataFrame = {
    require(keys.nonEmpty, "need at least one grouping key")
    require(rankOfs.nonEmpty, "need at least one rank builder")
    require(fanout >= 2, s"fanout must be >= 2 (got $fanout)")
    val kc = keys.map(col)
    val vals = df
      .select(kc :+ col(valueCol).cast("long").as("__v"): _*)
      .where(col("__v").isNotNull)
      .localCheckpoint(false) // scanned once per level; cut re-derivation

    val perGroup = vals.groupBy(kc: _*)
      .agg(min("__v").as("__lo"), max("__v").as("__hi"),
        count(lit(1)).as("__n"))
    var state = rankOfs.zipWithIndex.map { case (rankOf, i) =>
      perGroup
        .withColumn("__slot", lit(i.toLong))
        .withColumn("__k", rankOf(col("__n")).cast("long"))
    }.reduce(_ unionByName _)
      .withColumn("__rem", col("__n"))
      .drop("__n")
      .localCheckpoint(false)
    // from here on, (keys, __slot) is the effective group key
    val kcS = kc :+ col("__slot")

    def needsLevel(c: Column = lit(true)) =
      col("__hi") > col("__lo") && col("__rem") > directLimit && c

    // done slots carry their answer in __lo; residues finish by sorting
    def out(st: DataFrame, v: Column) =
      st.select(kc ++ Seq(col("__slot").as("rank_slot"), v.as(resCol)): _*)
    var finished = out(state.where(col("__hi") === col("__lo")), col("__lo"))
    var residues = state.where(col("__hi") > col("__lo") && !needsLevel())
    var active = state.where(needsLevel())

    var level = 0
    var converged = active.isEmpty
    while (level < 64 && !converged) { // one driver action per level
      // __w stays DECIMAL: over the full 64-bit range at fanout 2 the
      // width is 2^63, one past Long.MaxValue (the DIV result itself
      // always fits — it's the +1 that must not happen in BIGINT)
      val widened = active.withColumn("__w",
        expr(s"CAST((CAST(__hi AS DECIMAL(21,0)) - __lo) DIV $fanout AS DECIMAL(21,0)) + 1"))
      // join on keys only: each value row fans out to its group's ACTIVE
      // slots (≤ |rankOfs|, shrinking as slots finish); no hint — AQE
      // broadcasts the state frame when the group count is small
      val hist = vals.join(widened, keys)
        .where(col("__v").between(col("__lo"), col("__hi")))
        .withColumn("__b",
          expr("CAST((CAST(__v AS DECIMAL(21,0)) - __lo) DIV __w AS BIGINT)"))
        .groupBy(kcS ++ Seq(col("__lo"), col("__hi"), col("__k"), col("__w"),
          col("__b")): _*)
        .agg(count(lit(1)).as("__c"))
      // bucket holding rank k, per slot, over ≤ fanout histogram rows
      val wCum = Window.partitionBy(kcS: _*).orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wPick = Window.partitionBy(kcS: _*).orderBy("__b")
      val target = hist
        .withColumn("__cum", sum("__c").over(wCum))
        .where(col("__cum") >= col("__k"))
        .withColumn("__rn", row_number().over(wPick))
        .where(col("__rn") === 1)
      state = target.select(kcS ++ Seq(
        expr("CAST(CAST(__lo AS DECIMAL(21,0)) + CAST(__b AS DECIMAL(21,0)) * __w AS DECIMAL(21,0))")
          .as("__lo_d"),
        col("__hi"), col("__w"), col("__k"), col("__cum"), col("__c")): _*)
        .select(kcS ++ Seq(
          expr("CAST(__lo_d AS BIGINT)").as("__lo"),
          expr("CAST(LEAST(CAST(__hi AS DECIMAL(21,0)), __lo_d + __w - 1) AS BIGINT)")
            .as("__hi"),
          (col("__k") - (col("__cum") - col("__c"))).as("__k"),
          col("__c").as("__rem")): _*)
        .localCheckpoint(false)
      finished = finished.unionByName(
        out(state.where(col("__hi") === col("__lo")), col("__lo")))
      residues = residues.unionByName(
        state.where(col("__hi") > col("__lo") && !needsLevel()))
      active = state.where(needsLevel())
      converged = active.isEmpty
      level += 1
    }
    // 64 levels are legitimate at fanout 2 on the full 64-bit mapped-double
    // domain — converged means no active slots remain, not a level count
    require(converged, "histogram descent failed to converge")

    // finish residues: per-slot sort of ≤ directLimit rows each
    val wRn = Window.partitionBy(kcS: _*).orderBy("__v")
    val fromResidue = vals
      .join(residues.select(kc ++ Seq(col("__slot"), col("__lo"), col("__hi"),
        col("__k")): _*), keys)
      .where(col("__v").between(col("__lo"), col("__hi")))
      .withColumn("__rn", row_number().over(wRn))
      .where(col("__rn") === col("__k"))
      .select(kc ++ Seq(col("__slot").as("rank_slot"), col("__v").as(resCol)): _*)
    finished.unionByName(fromResidue)
  }

  /** The lower-median rank `(n + 1) DIV 2` as a rank builder. */
  val medianRank: Column => Column = n => floor((n + lit(1L)) / lit(2L)).cast("long")

  /** Grouped exact rank over a DOUBLE column: descend on the
    * order-isomorphic bit-mapped longs, reverse-map each group's result
    * ([[graft.plans.DoubleOrderBitsExpression]] / its inverse). */
  def valueAtRankByDouble(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      rankOf: Column => Column,
      resCol: String = "value_at_rank",
      fanout: Int = 4096,
      directLimit: Long = 65536L): DataFrame = {
    val mapped = df.select(keys.map(col) :+
      ColumnBridge.column(DoubleOrderBitsExpression(
        ColumnBridge.expression(col(valueCol).cast("double")))).as("__vd"): _*)
    valueAtRankBy(mapped, keys, "__vd", rankOf, "__m", fanout, directLimit)
      .select(keys.map(col) :+
        ColumnBridge.column(DoubleOrderBitsInverseExpression(
          ColumnBridge.expression(col("__m")))).as(resCol): _*)
  }

  /** Rank-vector form over a DOUBLE column: one shared per-group descent
    * on the bit-mapped longs, each (group, slot) result reverse-mapped.
    * Output: (keys..., rank_slot, resCol). */
  def valueAtRanksByDouble(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      rankOfs: Seq[Column => Column],
      resCol: String = "value_at_rank",
      fanout: Int = 4096,
      directLimit: Long = 65536L): DataFrame = {
    val mapped = df.select(keys.map(col) :+
      ColumnBridge.column(DoubleOrderBitsExpression(
        ColumnBridge.expression(col(valueCol).cast("double")))).as("__vd"): _*)
    valueAtRanksBy(mapped, keys, "__vd", rankOfs, "__m", fanout, directLimit)
      .select(keys.map(col) ++ Seq(col("rank_slot"),
        ColumnBridge.column(DoubleOrderBitsInverseExpression(
          ColumnBridge.expression(col("__m")))).as(resCol)): _*)
  }
}
