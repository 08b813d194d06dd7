package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) for community
  * detection: every node starts labeled with its own id; each round, a node
  * adopts the most frequent label among its neighbors, ties broken to the
  * SMALLEST label (the determinism the correctness gate needs — textbook
  * LPA breaks ties randomly, which can never hash-gate). A fixed iteration
  * count makes the operator a pure function of the graph.
  *
  * Scale shape: each round is one equi-join of the edge list with the
  * label frame plus two keyed aggregates — the same per-round cost
  * envelope as [[ConnectedComponents]], O(E) shuffled rows per round, no
  * windows (argmax via max-of-struct keeps the round whole-stage
  * codegen'd and partially aggregated map-side). `localCheckpoint` cuts
  * the lineage each round so K rounds never replan K joins deep. Nodes
  * without neighbors keep no row after a round — callers wanting isolated
  * nodes back join the node frame at the end (the queries here build
  * graphs where every node has degree ≥ 1).
  */
object LabelPropagation {

  /** edges(u, v) must contain BOTH directions of every undirected edge and
    * no self-loops; nodes(id) seeds the labels. Returns (v, label).
    *
    * SIZE-PROBED DRIVER FAST PATH (the ConnectedComponents / LinkRank
    * bounded-collect discipline): K fixed rounds × 2 shuffles is pure
    * per-round overhead when the edge list fits in one bounded collect;
    * the in-memory loop reproduces the synchronous update and the
    * (cnt, −label) argmax exactly, so the hash gate is indifferent to
    * the path. Past the bound the distributed loop runs unchanged;
    * `maxDriverEdges = 0` disables the probe (spec hook). */
  def run(nodes: DataFrame, edges: DataFrame, iterations: Int,
      maxDriverEdges: Int = 2000000): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")

    if (maxDriverEdges > 0) {
      val eProbe = edges.select(col("u").cast("long"), col("v").cast("long"))
        .limit(maxDriverEdges + 1).collect()
      if (eProbe.length <= maxDriverEdges) {
        val es = eProbe.map(r => (r.getLong(0), r.getLong(1)))
        // node count is bounded by 2·|edges| for every row that can ever
        // surface (isolated nodes drop after round 1 by contract), but the
        // SEED must still come from `nodes` — collect it bounded too (a
        // node frame larger than 2·maxDriverEdges+1 falls back)
        val nProbe = nodes.select(col("id").cast("long"))
          .limit(2 * maxDriverEdges + 1).collect()
        if (nProbe.length <= 2 * maxDriverEdges) {
          var labels: Map[Long, Long] =
            nProbe.iterator.map(r => r.getLong(0)).map(n => n -> n).toMap
          for (_ <- 1 to iterations) {
            val cnt = scala.collection.mutable.Map.empty[(Long, Long), Long]
            es.foreach { case (u, v) =>
              labels.get(u).foreach { l =>
                cnt((v, l)) = cnt.getOrElse((v, l), 0L) + 1L
              }
            }
            // argmax(cnt) with min-label tie-break = max of (cnt, -label)
            val best = scala.collection.mutable.Map.empty[Long, (Long, Long)]
            cnt.foreach { case ((v, l), c) =>
              val cand = (c, -l)
              if (best.get(v).forall(b =>
                  cand._1 > b._1 || (cand._1 == b._1 && cand._2 > b._2)))
                best(v) = cand
            }
            labels = best.iterator.map { case (v, (_, nl)) => v -> -nl }.toMap
          }
          val spark = nodes.sparkSession
          import spark.implicits._
          return labels.toSeq.toDF("v", "label")
        }
      }
    }

    var labels = nodes.select(col("id").as("v"), col("id").as("label"))
    for (_ <- 1 to iterations) {
      labels = edges
        .join(labels.select(col("v").as("u"), col("label")), "u")
        .groupBy(col("v"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        // argmax(cnt) with min-label tie-break = max of (cnt, -label)
        .groupBy("v")
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("mx"))
        .select(col("v"), (-col("mx.nl")).as("label"))
        .localCheckpoint(false)
    }
    labels
  }
}
