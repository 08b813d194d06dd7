package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** A9 (local form) — true Local Outlier Factor, bucketed by geocell.
  *
  * The paper names LOF explicitly for local outlier detection
  * (`documents/A Framework for Robust and Iterative Access Point Localization
  * from Crowdsourced Wi-Fi Data.md:109-115`); the part of textbook LOF that
  * cannot ship at 100 TB is the global kNN search. This implementation keeps
  * the LOF math exact but restricts each point's neighbor search to its
  * ~150 m geocell plus the 8 surrounding cells — every candidate edge comes
  * from an EQUI-join on (bssid, cell), never an all-pairs compare:
  *
  *   1. points → (bssid, cellX, cellY); over-dense cells (> maxCellPoints)
  *      are dropped whole, the same mega-bucket guardrail as MinHash/SimHash
  *      (a cell with m points contributes m² candidate edges);
  *   2. each point probes its 9 neighbor cells (explode of 9 offsets) and
  *      equi-joins candidate neighbors on (bssid, cellX, cellY) — one
  *      shuffle, candidate count bounded by 9 × cell density per point;
  *   3. kNN per point: row_number over (distance, neighbor id) — the
  *      deterministic total order matters because the driver's correctness
  *      gate hashes values;
  *   4. k-distance, reachability distance max(kdist(q), d(p,q)), local
  *      reachability density lrd = k / Σ reach, and LOF = mean(lrd(q))/lrd(p)
  *      are plain column arithmetic after two more equi-joins.
  *
  * Points whose 3×3 neighborhood holds no other point cannot be scored
  * (lof = NULL, `k_used` = 0) — being isolated by more than a cell is itself
  * a stronger signal than any LOF value, and callers flag it directly.
  * Neighborhood symmetry (p in q's 3×3 ⇔ q in p's 3×3) guarantees every
  * kNN neighbor has its own kdist/lrd row, so the joins never drop edges.
  */
object Lof {

  final case class Config(
      k: Int = 5,
      cellDegrees: Double = 0.0015,
      maxCellPoints: Int = 2000)

  /** points(bssid, point_id, latitude, longitude) →
    * (bssid, point_id, latitude, longitude, k_used, lof).
    * lof NULL ⇔ no neighbor in the 3×3 cell block (k_used = 0). */
  def score(points: DataFrame, cfg: Config = Config()): DataFrame = {
    val cellX = floor(col("latitude") / cfg.cellDegrees).cast("long")
    val cellY = floor(col("longitude") / cfg.cellDegrees).cast("long")
    val pts = points.select(
      col("bssid"), col("point_id"), col("latitude"), col("longitude"),
      cellX.as("cx"), cellY.as("cy"))

    // Mega-cell guardrail: quadratic candidate growth is per cell, so cap it
    // per cell. Dropped cells are dense by definition — their points are the
    // opposite of local outliers, so skipping them loses nothing.
    val cellSizes = pts.groupBy("bssid", "cx", "cy")
      .agg(count(lit(1)).as("__cell_n"))
    // usable feeds the probe side, the candidate side, and the final output
    // join — materialize the filtered point set once.
    val usable = pts.join(
      cellSizes.where(col("__cell_n") <= cfg.maxCellPoints)
        .select("bssid", "cx", "cy"),
      Seq("bssid", "cx", "cy"))
      .localCheckpoint(false) // lazy: compute-once on first action, no extra job

    val offsets = array(
      (for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val probe = usable.select(
      col("bssid"), col("point_id").as("p_id"),
      col("latitude").as("p_lat"), col("longitude").as("p_lon"),
      col("cx"), col("cy"))
      .withColumn("o", explode(offsets))
      .select(col("bssid"), col("p_id"), col("p_lat"), col("p_lon"),
        (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
    val cand = usable.select(
      col("bssid"), col("cx"), col("cy"), col("point_id").as("q_id"),
      col("latitude").as("q_lat"), col("longitude").as("q_lon"))

    val pairs = probe.join(cand, Seq("bssid", "cx", "cy"))
      .where(col("p_id") =!= col("q_id"))
      .select(col("bssid"), col("p_id"), col("q_id"),
        Geo.haversineMeters(col("p_lat"), col("p_lon"), col("q_lat"), col("q_lon"))
          .as("d"))

    val w = Window.partitionBy("bssid", "p_id").orderBy(col("d"), col("q_id"))
    // knn is consumed three times (k-distance, reachability, LOF numerator);
    // without materialization each consumer would re-run the full 9-cell
    // candidate join + window — the dominant cost of the whole operator.
    val knn = pairs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cfg.k)
      .select("bssid", "p_id", "q_id", "d")
      .localCheckpoint(false)

    val kdist = knn.groupBy("bssid", "p_id")
      .agg(max("d").as("kdist"), count(lit(1)).as("k_used"))

    // reach(p←q) = max(kdist(q), d(p,q)); lrd(p) = k_used / Σ reach.
    val reach = knn.join(
      kdist.select(col("bssid"), col("p_id").as("q_id"), col("kdist").as("q_kdist")),
      Seq("bssid", "q_id"))
      .select(col("bssid"), col("p_id"), col("q_id"),
        greatest(col("q_kdist"), col("d")).as("reach_d"))
    val lrd = reach.groupBy("bssid", "p_id")
      .agg((count(lit(1)).cast("double") /
        greatest(sum("reach_d"), lit(1e-12))).as("lrd"))

    val lof = knn.join(
      lrd.select(col("bssid"), col("p_id").as("q_id"), col("lrd").as("q_lrd")),
      Seq("bssid", "q_id"))
      .groupBy("bssid", "p_id")
      .agg(avg("q_lrd").as("__mean_q_lrd"))
      .join(lrd, Seq("bssid", "p_id"))
      .select(col("bssid"), col("p_id"), (col("__mean_q_lrd") / col("lrd")).as("lof"))

    usable
      .join(kdist.select("bssid", "p_id", "k_used")
        .withColumnRenamed("p_id", "point_id"), Seq("bssid", "point_id"), "left")
      .join(lof.withColumnRenamed("p_id", "point_id"), Seq("bssid", "point_id"), "left")
      .select(col("bssid"), col("point_id"), col("latitude"), col("longitude"),
        coalesce(col("k_used"), lit(0L)).as("k_used"), col("lof"))
  }
}
