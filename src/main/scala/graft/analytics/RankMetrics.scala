package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ranking metrics over scored, binary-labeled rows — the model
  * evaluation step of a training-data pipeline (quality-classifier AUC on a
  * held-out slice, ranker regression gates) run where the data already
  * lives instead of collecting scores to a driver.
  *
  * ROC-AUC is computed by the Mann-Whitney U identity
  *   AUC = (R₁ − n₁(n₁+1)/2) / (n₁·n₀)
  * with average ranks for ties, which makes it a GLOBAL-rank statistic: the
  * naive plan is a full sort plus a running sum — a single-partition window
  * at any scale. This implementation keeps every data-sized frame
  * distributed with a two-level prefix sum:
  *
  *   1. rows collapse to one row per DISTINCT score (c = rows, p =
  *      positives) — one hash shuffle, the only corpus-sized exchange;
  *   2. scores bucket by `score DIV bucketWidth`; per-bucket totals form a
  *      DOMAIN-bounded frame (quantized model scores have fixed range, so
  *      |domain|/bucketWidth is a constant independent of row count) whose
  *      running offsets cost one constant-sized window;
  *   3. each score group's global "rows strictly below" count cb is its
  *      broadcast bucket offset plus a WITHIN-bucket running sum — a window
  *      partitioned by bucket, fully parallel;
  *   4. ties use the average-rank convention exactly, in integers: doubled
  *      ranks (2·avg_rank = 2·cb + c + 1 for every row of a tie group) stay
  *      integral, so U₂ = Σ p·(2cb+c+1) − n₁(n₁+1) = 2U is exact and
  *      auc_ppm = U₂·500000 div (n₁·n₀) carries no float anywhere.
  *
  * Overflow bound: U₂·500000 fits a BIGINT up to ~10¹² rows; past that,
  * route the final multiply through DECIMAL(38,0) (the aggregate counts
  * themselves are safe far beyond any real corpus).
  */
object RankMetrics {

  /** @param scored      rows with an integral score column and a 0/1 label
    * @param scoreCol    integral (pre-quantized) model score
    * @param labelCol    1 = positive, 0 = negative
    * @param bucketWidth score-domain slice per prefix bucket; pick so that
    *                    |score domain| / bucketWidth stays driver-trivial
    * @return one row: (n_pos, n_neg, u2, auc_ppm); auc_ppm is NULL when
    *         either class is empty (AUC undefined) */
  def aucExact(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      bucketWidth: Long = 64L): DataFrame =
    aucExactBy(scored, Nil, scoreCol, labelCol, bucketWidth)

  /** Per-slice form: one AUC row per distinct `groupCols` tuple — model
    * eval by segment/source/language, each slice ranked independently.
    * Same two-level shape with every frame keyed by the slice: score
    * groups aggregate on (slice, score), bucket offsets run in a window
    * PARTITIONED by slice over the (slice, bucket) frame (|slices| ·
    * |domain|/width rows, hash-distributed — parallel across slices), and
    * the broadcast join carries the slice key. No stage concentrates one
    * slice's rows on one partition beyond its per-bucket share. */
  def aucExactBy(
      scored: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      labelCol: String,
      bucketWidth: Long = 64L): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val gks = groupCols.map(col)
    val g = scored
      .groupBy(gks :+ col(scoreCol).cast("long").as("sc"): _*)
      .agg(count(lit(1)).as("c"), sum(col(labelCol).cast("long")).as("p"))
      .withColumn("b", expr(s"sc DIV $bucketWidth"))
    // Bucket totals: |slices| × domain-bounded. Grouped: the offset window
    // partitions by slice; ungrouped: the frame itself is domain-bounded,
    // the one frame allowed a global window.
    val wB = (if (groupCols.isEmpty) Window.orderBy("b")
              else Window.partitionBy(gks: _*).orderBy("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = g.groupBy(gks :+ col("b"): _*).agg(sum("c").as("bc"))
      .select(gks :+ col("b") :+
        coalesce(sum("bc").over(wB), lit(0L)).as("boff"): _*)
    val wIn = Window.partitionBy(gks :+ col("b"): _*).orderBy("sc")
      .rowsBetween(Window.unboundedPreceding, -1)
    // No broadcast hint on the offset frame: ungrouped it is domain-bounded,
    // but grouped it scales with |slices| — a hint would pin a driver OOM to
    // slice cardinality. AQE broadcasts it adaptively whenever it is small
    // and degrades to a shuffle join beyond that (same rule as PrefixSum).
    val ranked = g.join(offs, groupCols :+ "b")
      .withColumn("cb", col("boff") + coalesce(sum("c").over(wIn), lit(0L)))
    ranked
      .groupBy(gks: _*)
      .agg(
        sum(col("p") * (lit(2L) * col("cb") + col("c") + lit(1L))).as("r2"),
        sum("p").as("n_pos"),
        sum(col("c") - col("p")).as("n_neg"))
      .select(gks ++ Seq(
        col("n_pos"), col("n_neg"),
        (col("r2") - col("n_pos") * (col("n_pos") + lit(1L))).as("u2"),
        when(col("n_pos") * col("n_neg") > 0,
          expr("(r2 - n_pos * (n_pos + 1)) * 500000 DIV (n_pos * n_neg)"))
          .as("auc_ppm")): _*)
  }
}
