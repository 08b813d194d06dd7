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
    * no self-loops; nodes(id) seeds the labels. Returns (v, label). */
  def run(nodes: DataFrame, edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
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
