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
      dampDen: Long = 100,
      maxDriverEdges: Int = 2000000): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampNum > 0 && dampNum < dampDen, s"damping $dampNum/$dampDen not in (0,1)")
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))

    // SIZE-PROBED DRIVER FAST PATH (the ConnectedComponents / o41 / o46
    // bounded-collect discipline): a fixed-round power iteration is pure
    // per-round shuffle overhead when the edge list fits in one bounded
    // collect. The in-memory loop reproduces the distributed integer
    // arithmetic EXACTLY — same `r div odeg` per edge (multiplicity
    // counted), same `teleport + (dampNum·csum) div dampDen` per round,
    // all Long — so the llm_linkrank oracle's bit-exact gate is
    // indifferent to the path. Past the bound the distributed loop runs
    // unchanged; `maxDriverEdges = 0` disables the probe (spec hook).
    if (maxDriverEdges > 0) {
      val probe = e.limit(maxDriverEdges + 1).collect()
      if (probe.length <= maxDriverEdges) {
        val es = probe.map(r => (r.getLong(0), r.getLong(1)))
        val odeg = scala.collection.mutable.Map.empty[Long, Long]
        es.foreach { case (s, _) => odeg(s) = odeg.getOrElse(s, 0L) + 1L }
        val ns = es.iterator.flatMap(p => Iterator(p._1, p._2)).toArray.distinct
        val teleport = (dampDen - dampNum) * scale / dampDen
        var r = ns.iterator.map(_ -> scale).toMap
        for (_ <- 1 to iterations) {
          val csum = scala.collection.mutable.Map.empty[Long, Long]
          es.foreach { case (s, d) =>
            csum(d) = csum.getOrElse(d, 0L) + r(s) / odeg(s)
          }
          r = ns.iterator.map(n =>
            n -> (teleport + dampNum * csum.getOrElse(n, 0L) / dampDen)).toMap
        }
        val spark = edges.sparkSession
        import spark.implicits._
        return ns.map(n => (n, r(n))).toSeq.toDF("node", "rank_scaled")
      }
    }

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
