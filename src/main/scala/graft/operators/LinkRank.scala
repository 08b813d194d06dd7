package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed link-graph rank propagation (PageRank, Page et al. 1999,
  * "The PageRank Citation Ranking") — the web-graph quality signal a
  * pretraining corpus pipeline uses to weight or filter crawled documents
  * (host- and page-level rank is a standard Common Crawl curation
  * feature alongside the per-document rules in `llm_gopher_rules`).
  *
  * Deviation from standard PageRank semantics, deliberately: dangling-node
  * mass DECAYS rather than being redistributed (a sink's rank contributes
  * to no one next round), and ranks are unnormalized (initial mass =
  * `scale` per node, not 1/|V|) — so total mass shrinks toward the
  * teleport-only fixpoint instead of summing to a constant. Consumers
  * rank/threshold by relative order, which is unaffected; do not expect
  * ranks to sum to |V|·scale.
  *
  * Engine-portable INTEGER arithmetic throughout: ranks are BIGINTs
  * scaled by `scale`, the damping factor is the exact rational
  * `dampNum/dampDen`, and every per-edge contribution is an integer
  * division — so the fixpoint iterate is exactly reproducible in any
  * engine (no floating-point sum-order sensitivity), which is what lets
  * the `llm_linkrank` gate pin this against a DuckDB restatement
  * bit-for-bit. Truncation loss per division is < 1 ulp of the scale and
  * deterministic.
  *
  * Scale shape (the GraphX/Pregel loop, same discipline as
  * [[ConnectedComponents]]): node set and edge list stay distributed;
  * each round is one hash-join (ranks ⋈ edges on src) + one aggregation
  * (contributions by dst) + one left join back onto the node set (nodes
  * with no in-links keep the teleport term). The iteration count is
  * FIXED (synchronous power iteration), so the driver runs no data-sized
  * action at all; `localCheckpoint` cuts lineage each round. At 100 TB
  * the edge list and rank vector would share a bucketed layout on the
  * join key so every round's join is exchange-free (the `a20` layout
  * precedent).
  *
  * Overflow headroom: a node's rank is bounded by dampDen·scale·|V| /
  * (dampDen−dampNum); with the default 1e9 scale the BIGINT math is safe
  * past 1e8 nodes — shrink `scale` for larger graphs.
  */
object LinkRank {

  /** @param edges      directed edge list (multi-edges allowed and counted;
    *                    out-degree is computed per source with multiplicity)
    * @param iterations  synchronous power-iteration rounds (fixed, no
    *                    convergence probe — rank consumers want a budget,
    *                    not a fixpoint)
    * @return (node, rank_scaled) over every node appearing as src or dst */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      scale: Long = 1000000000L,
      dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampNum > 0 && dampNum < dampDen, s"damping $dampNum/$dampDen not in (0,1)")
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    // Out-degree with multiplicity, attached once; the per-round join then
    // carries everything a contribution needs.
    val withDeg = e.join(
      e.groupBy("src").agg(count(lit(1)).as("odeg")), "src")
      .localCheckpoint(false)

    val teleport = (dampDen - dampNum) * scale / dampDen
    var ranks = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to iterations) {
      val contrib = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst"), expr("r div odeg").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("csum"))
      ranks = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampNum * coalesce(csum, cast(0 as bigint))) div $dampDen"))
            .as("r"))
        .localCheckpoint(false)
    }
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }
}
