package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the missing step between pairwise near-duplicate detection and
  * actionable dedup: LSH emits PAIRS (a~b, b~c), but keep/drop decisions
  * need the transitive CLUSTER {a,b,c} with one canonical representative.
  *
  * Each round every node lowers its label to the minimum label in its
  * neighborhood (including itself); a fixpoint assigns every node the
  * smallest node id reachable from it. All data-sized state stays
  * distributed: edges and labels are DataFrames, each round is one
  * hash-join + one aggregation, and the driver sees only the single
  * changed-label COUNT that decides convergence (the same loop shape as
  * GraphX/Pregel). `localCheckpoint` cuts the lineage each round so the
  * plan does not grow exponentially with iterations.
  *
  * Rounds needed = graph diameter. Near-duplicate graphs are
  * diameter-bounded in practice (clusters are cliques-ish around a shared
  * template), so this converges in a handful of rounds; for adversarially
  * long chains the large-star/small-star variant (O(log n) rounds,
  * Kiveris et al., "Connected Components in MapReduce and Beyond") drops in
  * behind the same signature. `maxIterations` fail-fasts rather than
  * silently emitting a non-fixpoint labeling.
  */
object ConnectedComponents {

  /** @param edges undirected pair list (each pair listed once is enough)
    * @return (node, component) — component is the min node id reachable */
  def run(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIterations: Int = 50): DataFrame = {
    val und = edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .unionByName(edges.select(col(bCol).cast("long").as("a"), col(aCol).cast("long").as("b")))
      .distinct()
      .localCheckpoint()

    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()

    // Convergence probe: labels only ever DECREASE, so the label sum is
    // strictly monotone until the fixpoint — comparing one aggregate per
    // round replaces a join-and-count (half the actions per round). Summed
    // in DECIMAL: overflow-free at any node-id scale.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)

    // No edges → no nodes → sum() over the empty frame returns null; that
    // IS the emptiness signal (a corpus with zero near-duplicate pairs is
    // normal input, not an error) — no extra isEmpty action needed.
    val initialSum = labelSum(labels)
    if (initialSum == null) return labels

    var prevSum = initialSum
    var iteration = 0
    var converged = false
    while (!converged && iteration < maxIterations) {
      // min label over each node's neighborhood
      val nbrMin = und
        .join(labels.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a").as("node"))
        .agg(min("comp").as("nbr_min"))
      val next = labels.as("l")
        .join(nbrMin.as("p"), Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iteration += 1
    }
    require(converged,
      s"connected components did not converge in $maxIterations rounds — " +
        "graph diameter exceeds the cap; raise maxIterations or switch to " +
        "the large-star/small-star variant")
    labels
  }
}
