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
      maxCellPoints: Int = 2000,
      /** Mean usable-cell occupancy at or above which the two-phase
        * geometrically-pruned kNN runs instead of the single-pass 9-cell
        * join. MEASURED trade (SCALING.md round 13): pruning wins exactly
        * where the Σ|cell|² pair term dominates (dense cells — interior
        * points skip all 8 neighbors), but on sparse corpora (mean
        * occupancy ≲ k) phase 1 rarely reaches k own-cell edges, every
        * point probes all 8 neighbors anyway, and the second aggregation
        * is pure loss (22.1 vs 16.4 s at sf1-distinct). 2k+2 is the
        * crossover shape: below it a typical point cannot even fill its
        * top-k from its own cell. */
      minMeanCellForPrune: Double = 12.0)

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

    val cand = usable.select(
      col("bssid"), col("cx"), col("cy"), col("point_id").as("q_id"),
      col("latitude").as("q_lat"), col("longitude").as("q_lon"))
    val topk = udaf(new TopKEdges(cfg.k))

    // STRATEGY PROBE: one aggregate over the USABLE frame (this is also
    // the action that materializes its checkpoint, so the probe costs no
    // extra input scan — aggregating cellSizes instead would re-scan the
    // raw points). Mean usable-cell occupancy below the crossover → the
    // single-pass 9-cell join (sparse cells: phase 1 cannot fill top-k,
    // everything probes anyway); above it → the two-phase geometric prune
    // below (dense cells: interior points skip all 8 neighbors and the
    // Σ|cell|² term collapses). Both plans select identical kNN sets
    // (scores equal to ~1 ulp, under the oracle's 4-decimal round);
    // LofSpec pins the equality on both sides of the threshold.
    val occ = usable
      .agg(count(lit(1)).as("s"),
        count_distinct(col("bssid"), col("cx"), col("cy")).as("c")).head()
    val meanOcc =
      if (occ.getLong(1) == 0L) 0.0
      else occ.getLong(0).toDouble / occ.getLong(1)

    val knnEdges: DataFrame = if (meanOcc < cfg.minMeanCellForPrune) {
      // single-pass: each point probes its full 3×3 block
      val offsets9 = array(
        (for (dx <- -1 to 1; dy <- -1 to 1)
          yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
      usable.select(
        col("bssid"), col("point_id").as("p_id"),
        col("latitude").as("p_lat"), col("longitude").as("p_lon"),
        col("cx"), col("cy"))
        .withColumn("o", explode(offsets9))
        .select(col("bssid"), col("p_id"), col("p_lat"), col("p_lon"),
          (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
        .join(cand, Seq("bssid", "cx", "cy"))
        .where(col("p_id") =!= col("q_id"))
        .select(col("bssid"), col("p_id"), col("q_id").cast("long").as("q_id"),
          Geo.haversineMeters(col("p_lat"), col("p_lon"),
            col("q_lat"), col("q_lon")).as("d"))
        .where(col("d").isNotNull)
    } else twoPhaseEdges(usable, cand, topk, cfg)

    // kNN per point through the bounded TopKEdges aggregator (exact same
    // (d, q_id) order a window row_number would give, but with map-side
    // combine — see the class doc). knn is consumed three times
    // (k-distance, reachability, LOF numerator); without materialization
    // each consumer would re-run the candidate joins — the dominant cost
    // of the whole operator.
    val knn = knnEdges
      .groupBy("bssid", "p_id")
      .agg(topk(col("d"), col("q_id")).as("__top"))
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

  /** TWO-PHASE candidate edges with a rigorous geometric prune — the
    * dense-cell kNN plan. Phase 1 ranks each point against its OWN cell
    * only (1/9 of the single-pass candidate volume). Phase 2 probes a
    * neighbor cell ONLY when it could still contribute a top-k edge:
    * every q in cell B satisfies
    *   d(p,q) >= 2R*asin(sqrt(sin^2(dPhiMin/2)
    *                          + cos(pLat)*minCos(B)*sin^2(dLamMin/2)))
    * (each haversine term lower-bounded over B's lat/lon box; cos is
    * unimodal on [-90,90], so min over the box's lat range sits at an
    * endpoint), so when a point already holds k own-cell edges tighter
    * than that bound, B is skipped WHOLE. Interior points of dense cells
    * — exactly the Σ|cell|² term that grows 3.2x/decade — prune all
    * 8 neighbors; edge-hugging and sparse points keep them, so the
    * selected kNN SETS are identical to the single-pass plan's (the
    * 1e-6 m margin dwarfs the few-ulp rounding of either side while
    * being ~1e4x below any real coordinate resolution). The LOF float
    * can still differ by ~1 ulp — the two plans feed the lrd/avg sums
    * in different row orders — which the oracle's 4-decimal round
    * absorbs; LofSpec pins the bound at 1e-12 relative. */
  private def twoPhaseEdges(
      usable: DataFrame, cand: DataFrame,
      topk: org.apache.spark.sql.expressions.UserDefinedFunction,
      cfg: Config): DataFrame = {
    val p0 = usable.select(
      col("bssid"), col("point_id").as("p_id"),
      col("latitude").as("p_lat"), col("longitude").as("p_lon"),
      col("cx"), col("cy"))
    val ownPairs = p0.join(cand, Seq("bssid", "cx", "cy"))
      .where(col("p_id") =!= col("q_id"))
      .select(col("bssid"), col("p_id"), col("q_id"),
        Geo.haversineMeters(col("p_lat"), col("p_lon"), col("q_lat"), col("q_lon"))
          .as("d"))
      .where(col("d").isNotNull)
    val ownTop = ownPairs
      .groupBy("bssid", "p_id")
      .agg(topk(col("d"), col("q_id").cast("long")).as("__own"))
      // consumed twice (probe gate + edge union): never re-run the
      // own-cell pair scan
      .localCheckpoint(false)

    val withKth = p0.join(ownTop, Seq("bssid", "p_id"), "left")
      .withColumn("own_n", coalesce(size(col("__own")), lit(0)))
      .withColumn("kth_d",
        when(col("own_n") >= cfg.k,
          element_at(col("__own"), cfg.k).getField("_1")))

    val offsets8 = array(
      (for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0)
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val cdeg = cfg.cellDegrees
    val bLo = (col("cx") + col("o.dx")) * cdeg
    val bHi = (col("cx") + col("o.dx") + 1) * cdeg
    val lLo = (col("cy") + col("o.dy")) * cdeg
    val lHi = (col("cy") + col("o.dy") + 1) * cdeg
    val dPhiMin = greatest(lit(0.0), bLo - col("p_lat"), col("p_lat") - bHi)
    val dLamMin = greatest(lit(0.0), lLo - col("p_lon"), col("p_lon") - lHi)
    val minCosB = greatest(lit(0.0), least(cos(radians(bLo)), cos(radians(bHi))))
    val bound = lit(2.0 * graft.functions.Geo.EarthRadiusMeters) * asin(sqrt(
      pow(sin(radians(dPhiMin) / 2), 2) +
        cos(radians(col("p_lat"))) * minCosB * pow(sin(radians(dLamMin) / 2), 2)))
    val pairs2 = withKth
      .withColumn("o", explode(offsets8))
      .withColumn("__bound", bound)
      .where(col("own_n") < cfg.k || col("kth_d") >= col("__bound") - lit(1e-6))
      .select(col("bssid"), col("p_id"), col("p_lat"), col("p_lon"),
        (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
      .join(cand, Seq("bssid", "cx", "cy"))
      .select(col("bssid"), col("p_id"), col("q_id").cast("long").as("q_id"),
        Geo.haversineMeters(col("p_lat"), col("p_lon"), col("q_lat"), col("q_lon"))
          .as("d"))
      .where(col("d").isNotNull)

    // Phase-1 edges re-enter as plain (d, q_id) rows; cells are disjoint,
    // so no edge appears twice in the union the caller aggregates.
    val edges1 = withKth
      .select(col("bssid"), col("p_id"), explode(col("__own")).as("__e"))
      .select(col("bssid"), col("p_id"),
        col("__e._2").as("q_id"), col("__e._1").as("d"))
    edges1.unionByName(pairs2)
  }
}
