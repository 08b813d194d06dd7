package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data layout behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the bits of two sort
  * dimensions makes rows close in EITHER dimension land in the same file,
  * so parquet row-group min/max stats prune scans filtered on either
  * column (a single-column sort only prunes its leading column).
  *
  * The bit-spread is the classic mask ladder (Morton 1966; the same
  * sequence Delta's `ZOrderClusteringExpression` and interleaving
  * libraries use), built ENTIRELY from Spark's built-in shift/and/or
  * column ops — whole-stage codegen'd, no UDF, and restatable verbatim in
  * DuckDB SQL for the oracle gate (`a22_zorder_layout`).
  *
  * 100 TB shape: `clusterBy` is one range-repartition on the morton key
  * (sampling-based range boundaries — the standard total-sort shuffle) +
  * an in-partition sort; cost is one pass over the data, identical to any
  * OPTIMIZE rewrite. Skipping then pays for it on every subsequent scan.
  */
object ZOrder {

  /** Mask ladder spreading the low 16 bits of `v` to even bit positions
    * (0x0000ABCD → bits at positions 0,2,4,…,30). Input beyond 16 bits
    * must be reduced first (callers mod/bucket into 16 bits). */
  def spread16(v: Column): Column = {
    val s8 = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s4 = (s8.bitwiseOR(shiftleft(s8, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = (s4.bitwiseOR(shiftleft(s4, 2))).bitwiseAND(lit(0x33333333L))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions: x on even bits, y odd. */
  def mortonCode(x: Column, y: Column): Column =
    spread16(x.cast("long")).bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** Rewrite `df` into `numFiles` range-clustered pieces ordered by the
    * morton code of (x, y) — each output partition then covers a compact
    * rectangle-ish region of the (x, y) plane, which is what row-group
    * stats pruning needs. */
  def clusterBy(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    val keyed = df.withColumn("__z", mortonCode(x, y))
    keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
