package graft.localize

import graft.algo.AlgoUtil

/** A11 — DBSCAN bi-modality analysis for relocation detection.
  *
  * The paper distinguishes a genuine AP relocation from bi-modal noise by
  * clustering the measurement positions: "bi-modal DBSCAN clusters"
  * (PAPER.md:71-77). A lag-jump or CUSUM detector alone fires on ANY
  * repeated large displacement — but an AP whose fixes alternate between
  * two anchors (multipath, two mounting points of one venue, MAC reuse)
  * jumps back and forth forever without having moved. The discriminator is
  * TEMPORAL structure: a relocation's clusters are time-disjoint (all of
  * cluster A before all of cluster B), while bi-modal noise interleaves.
  *
  * Runs inside `flatMapGroups` next to the localizer over one AP's capped,
  * deterministically-ordered measurement group — pure Scala, no Spark
  * dependency. Neighbor search uses a geocell hash index (cell = eps), so
  * the cost is O(n · cell-density), not the textbook O(n²), with n already
  * bounded by the localizer's group cap.
  */
object Relocation {

  /** One position fix with its event-time millis. */
  final case class Fix(lat: Double, lon: Double, tsMillis: Long)

  sealed trait Verdict
  /** One dominant cluster (or none formable) — the AP sits still. */
  case object Stationary extends Verdict
  /** Two+ time-disjoint clusters: the AP moved. `fromIdx`/`toIdx` index
    * `clusters` (earliest and latest by median time). */
  final case class Relocated(fromIdx: Int, toIdx: Int) extends Verdict
  /** Two+ clusters whose time ranges interleave — noise, not movement. */
  case object Bimodal extends Verdict

  final case class Analysis(
      verdict: Verdict,
      clusters: Seq[Seq[Fix]],
      noise: Seq[Fix])

  final case class Config(
      epsMeters: Double = 150.0,
      minPts: Int = 5,
      /** Clusters smaller than this fraction of the group are ignored for
        * the verdict (stray mini-clusters shouldn't flip it). */
      minClusterFraction: Double = 0.2,
      /** Max tolerated temporal overlap (fraction of the shorter cluster's
        * time span) for clusters to still count as time-disjoint. */
      maxTimeOverlap: Double = 0.2)

  /** Plain DBSCAN over haversine distance with a geocell index.
    * Deterministic: fixes are visited in input order (callers pass the
    * localizer's deterministically-ordered group). Returns (clusters,
    * noise); clusters ordered by first-member input position. */
  def dbscan(fixes: IndexedSeq[Fix], epsMeters: Double, minPts: Int)
      : (Seq[Seq[Fix]], Seq[Fix]) = {
    val n = fixes.length
    if (n == 0) return (Nil, Nil)
    // ~eps-sized cells; neighbor candidates live in the 3×3 block. A degree
    // of longitude shrinks by cos(latitude), so the lon cell width must grow
    // with it or genuine eps-neighbors at high latitude land outside the
    // block (120 m apart but 2 lon-cells away at lat 60). One AP's fixes
    // span at most a few km, so a single cos at the group's first fix is
    // uniform across the group; clamp keeps polar edge cases finite.
    val cellDegLat = epsMeters / 111320.0 // meters per degree latitude
    val cellDegLon = cellDegLat /
      math.max(0.01, math.cos(math.toRadians(fixes.head.lat)))
    def cell(f: Fix): (Long, Long) =
      (math.floor(f.lat / cellDegLat).toLong, math.floor(f.lon / cellDegLon).toLong)
    val index = scala.collection.mutable.HashMap
      .empty[(Long, Long), scala.collection.mutable.ArrayBuffer[Int]]
    fixes.indices.foreach { i =>
      index.getOrElseUpdate(cell(fixes(i)), scala.collection.mutable.ArrayBuffer.empty) += i
    }
    def neighbors(i: Int): IndexedSeq[Int] = {
      val (cx, cy) = cell(fixes(i))
      val out = IndexedSeq.newBuilder[Int]
      var dx = -1L
      while (dx <= 1) {
        var dy = -1L
        while (dy <= 1) {
          index.get((cx + dx, cy + dy)).foreach(_.foreach { j =>
            if (j != i && AlgoUtil.distanceMeters(
              fixes(i).lat, fixes(i).lon, None,
              fixes(j).lat, fixes(j).lon, None) <= epsMeters) out += j
          })
          dy += 1
        }
        dx += 1
      }
      out.result()
    }

    val UNVISITED = -2; val NOISE = -1
    val label = Array.fill(n)(UNVISITED)
    var clusterId = 0
    var i = 0
    while (i < n) {
      if (label(i) == UNVISITED) {
        val hood = neighbors(i)
        if (hood.size + 1 < minPts) label(i) = NOISE
        else {
          label(i) = clusterId
          val queue = scala.collection.mutable.Queue(hood: _*)
          while (queue.nonEmpty) {
            val j = queue.dequeue()
            if (label(j) == NOISE) label(j) = clusterId
            else if (label(j) == UNVISITED) {
              label(j) = clusterId
              val jHood = neighbors(j)
              if (jHood.size + 1 >= minPts) queue.enqueueAll(jHood)
            }
          }
          clusterId += 1
        }
      }
      i += 1
    }
    val clusters = (0 until clusterId).map(c =>
      fixes.indices.collect { case j if label(j) == c => fixes(j) })
    val noise = fixes.indices.collect { case j if label(j) == NOISE => fixes(j) }
    (clusters, noise)
  }

  /** Fraction of the shorter cluster's time span that overlaps the other's. */
  private def timeOverlap(a: Seq[Fix], b: Seq[Fix]): Double = {
    val (a0, a1) = (a.map(_.tsMillis).min, a.map(_.tsMillis).max)
    val (b0, b1) = (b.map(_.tsMillis).min, b.map(_.tsMillis).max)
    val overlap = math.min(a1, b1) - math.max(a0, b0)
    if (overlap <= 0) 0.0
    else {
      val shorter = math.max(1L, math.min(a1 - a0, b1 - b0))
      overlap.toDouble / shorter
    }
  }

  /** Classify one AP's fix history. */
  def analyze(fixes: Seq[Fix], cfg: Config = Config()): Analysis = {
    val (clusters, noise) = dbscan(fixes.toIndexedSeq, cfg.epsMeters, cfg.minPts)
    val substantial = clusters.zipWithIndex
      .filter(_._1.size >= math.max(cfg.minPts, cfg.minClusterFraction * fixes.size))
    if (substantial.size < 2)
      return Analysis(Stationary, clusters, noise)
    // pairwise temporal relationship of the substantial clusters
    val disjoint = substantial.combinations(2).forall {
      case Seq((a, _), (b, _)) => timeOverlap(a, b) <= cfg.maxTimeOverlap
      case _                   => true
    }
    if (disjoint) {
      val byMedianTs = substantial.sortBy { case (c, _) =>
        val ts = c.map(_.tsMillis).sorted
        ts(ts.size / 2)
      }
      Analysis(Relocated(byMedianTs.head._2, byMedianTs.last._2), clusters, noise)
    } else Analysis(Bimodal, clusters, noise)
  }
}
