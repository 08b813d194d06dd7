package graft.analytics

import org.apache.spark.sql.DataFrame
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

  /** Bounded kNN aggregator: keeps the k smallest (distance, neighbor id)
    * edges per point, ordered exactly like the former
    * `row_number over (order by d, q_id)` (ties and NaN per
    * `java.lang.Double.compare`, i.e. Spark's double sort order).
    *
    * The point of the custom Aggregator over the window formulation is
    * PARTIAL AGGREGATION: the 9-cell candidate join emits O(cell density)
    * edges per point, and a window must shuffle ALL of them to sort each
    * point's partition — the dominant shuffle of the whole operator. This
    * buffer caps at k entries, so the map side combines candidates down to
    * ≤ k edges per (point, map partition) before anything moves. */
  private final class TopKEdges(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      (Double, Long),
      scala.collection.mutable.ArrayBuffer[(Double, Long)],
      Seq[(Double, Long)]] {
    private def cmp(d1: Double, q1: Long, d2: Double, q2: Long): Int = {
      val c = java.lang.Double.compare(d1, d2)
      if (c != 0) c else java.lang.Long.compare(q1, q2)
    }
    private def insert(
        buf: scala.collection.mutable.ArrayBuffer[(Double, Long)],
        d: Double, q: Long): scala.collection.mutable.ArrayBuffer[(Double, Long)] = {
      if (buf.length == k && cmp(d, q, buf(k - 1)._1, buf(k - 1)._2) >= 0) return buf
      var i = buf.length
      while (i > 0 && cmp(d, q, buf(i - 1)._1, buf(i - 1)._2) < 0) i -= 1
      buf.insert(i, (d, q))
      if (buf.length > k) buf.remove(k)
      buf
    }
    def zero: scala.collection.mutable.ArrayBuffer[(Double, Long)] =
      scala.collection.mutable.ArrayBuffer.empty
    def reduce(
        buf: scala.collection.mutable.ArrayBuffer[(Double, Long)],
        e: (Double, Long)): scala.collection.mutable.ArrayBuffer[(Double, Long)] =
      insert(buf, e._1, e._2)
    def merge(
        a: scala.collection.mutable.ArrayBuffer[(Double, Long)],
        b: scala.collection.mutable.ArrayBuffer[(Double, Long)]): scala.collection.mutable.ArrayBuffer[(Double, Long)] = {
      b.foreach(e => insert(a, e._1, e._2)); a
    }
    def finish(buf: scala.collection.mutable.ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
      buf.toSeq // already sorted ascending by (d, q)
    def bufferEncoder: org.apache.spark.sql.Encoder[scala.collection.mutable.ArrayBuffer[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

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
    // join — materialize the filtered point set once. The explicit
    // repartition is load-bearing: everything downstream of this frame up
    // to the kNN aggregation (9-offset explode, candidate join, haversine
    // per candidate edge, top-k partial agg) is NARROW, so its parallelism
    // is whatever the point set's partitioning happens to be — a
    // single-file scan (or a broadcast-joined guardrail) collapses the
    // whole quadratic-ish section onto one task. Spreading by cell is also
    // the shape that holds at 100 TB: candidate work distributes by
    // spatial bucket, never by input file-split luck.
    val usable = pts.join(
      cellSizes.where(col("__cell_n") <= cfg.maxCellPoints)
        .select("bssid", "cx", "cy"),
      Seq("bssid", "cx", "cy"))
      .repartition(col("bssid"), col("cx"), col("cy"))
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

    // kNN per point through the bounded TopKEdges aggregator (exact same
    // (d, q_id) order a window row_number would give, but with map-side
    // combine — see the class doc). knn is consumed three times
    // (k-distance, reachability, LOF numerator); without materialization
    // each consumer would re-run the full 9-cell candidate join — the
    // dominant cost of the whole operator.
    val topk = udaf(new TopKEdges(cfg.k))
    val knn = pairs
      .where(col("d").isNotNull) // a null distance is no candidate
      .groupBy("bssid", "p_id")
      .agg(topk(col("d"), col("q_id").cast("long")).as("__top"))
      .select(col("bssid"), col("p_id"), explode(col("__top")).as("__e"))
      .select(col("bssid"), col("p_id"),
        col("__e._2").as("q_id"), col("__e._1").as("d"))
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
