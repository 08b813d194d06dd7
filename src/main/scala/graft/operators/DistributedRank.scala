package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed DENSE RANK over the distinct key tuples of a frame — the
  * ranking primitive behind suffix-array prefix doubling
  * (`llm_suffix_repeats`), built to avoid the two antipatterns a naive
  * rank invites at scale:
  *
  *  - `dense_rank() OVER (ORDER BY …)` — a single-partition window
  *    (Spark's own WindowExec warning), serializing the corpus through
  *    one task;
  *  - a driver-side collect of the key domain.
  *
  * Instead: distinct → distributed range-partitioned sort →
  * `zipWithIndex` (order-preserving, one lightweight count job for the
  * per-partition offsets). Ranks are 0-based, dense, and deterministic
  * for a total-order key. Cost: one shuffle for distinct, one for the
  * sort — the textbook O(n log n)-work suffix-array round. */
object DistributedRank {

  /** (keyCols…, rankCol) — one row per distinct key tuple of `df`.
    * `rankCol` is parameterized so doubling rounds whose key IS a prior
    * rank column can name the new rank without a collision. */
  def ofDistinct(df: DataFrame, keyCols: Seq[String],
      rankCol: String = "rank"): DataFrame = {
    require(!keyCols.contains(rankCol),
      s"rank column '$rankCol' collides with a key column")
    val distinct = df.select(keyCols.map(col): _*)
      .distinct().orderBy(keyCols.map(col): _*)
    val schema = StructType(
      distinct.schema.fields :+ StructField(rankCol, LongType, nullable = false))
    df.sparkSession.createDataFrame(
      distinct.rdd.zipWithIndex.map { case (r, ix) =>
        Row.fromSeq(r.toSeq :+ ix)
      }, schema)
  }
}
