package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT sliding-window distinct count — trailing `windowDays` distinct
  * users per key, evaluated at every active day — without ever building a
  * per-window distinct set (the reason warehouses fall back to HLL here):
  *
  *  1. each sighting (k, d, u) contributes a presence interval
  *     [d, d + windowDays − 1] — "u counts toward every trailing window
  *     that includes d";
  *  2. per (k, u), overlapping/adjacent intervals merge into ISLANDS with
  *     one keyed window (the gaps-and-islands union walk);
  *  3. each island emits +1 at its start and −1 one past its end;
  *  4. ONE prefix sum per key over the merged (delta ∪ probe) day sequence
  *     reads the exact distinct count at every probe day. Deltas sort
  *     before probes at equal days, so a sighting at day t is inside t's
  *     own trailing window.
  *
  * Per-key cost is O(sightings); there is no day × user expansion and no
  * per-window state. Work parallelizes by key for the island walk and by
  * key again for the prefix sum; a single hot key degrades to one sorted
  * partition of its own sightings — the same bound a window aggregate has.
  *
  * Input `sightings(k, d, u)` need not be distinct (the first step
  * distincts). Output: (k, t, cnt) for every day t with ≥ 1 sighting of k.
  */
object SlidingDistinct {

  def exact(sightings: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"window must be >= 1 day, got $windowDays")
    // COUNT(DISTINCT u) semantics ignore NULL users: drop them here, or a
    // (k, NULL) group would form its own island and count as one user.
    val sight = sightings.select(col("k"), col("d").cast("long").as("d"),
      col("u")).where(col("u").isNotNull).distinct()
    val wKU = Window.partitionBy("k", "u").orderBy("d")
    val wPrev = wKU.rowsBetween(Window.unboundedPreceding, -1)
    val islands = sight
      .withColumn("brk",
        when(col("d") > coalesce(max(col("d") + (windowDays - 1)).over(wPrev),
          lit(Long.MinValue)), 1).otherwise(0))
      .withColumn("isl", sum("brk").over(
        wKU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("k", "u", "isl")
      .agg(min("d").as("a"), (max("d") + (windowDays - 1)).as("b"))
    val deltas = islands.select(col("k"), col("a").as("day"), lit(1L).as("delta"))
      .unionByName(islands.select(col("k"), (col("b") + 1).as("day"),
        lit(-1L).as("delta")))
      .groupBy("k", "day").agg(sum("delta").as("delta"))
      .select(col("k"), col("day"), col("delta"), lit(0).as("probe"),
        lit(null).cast("long").as("t"))
    val probes = sight.select("k", "d").distinct()
      .select(col("k"), col("d").as("day"), lit(0L).as("delta"),
        lit(1).as("probe"), col("d").as("t"))
    val wRun = Window.partitionBy("k").orderBy("day", "probe")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.unionByName(probes)
      .withColumn("cnt", sum("delta").over(wRun))
      .where(col("probe") === 1)
      .select(col("k"), col("t"), col("cnt"))
  }
}
