package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.mutation.MergeOps

/** Incremental connected-component LABEL maintenance over a persisted
  * (node, label) store — the device behind `llm_incremental_clusters`.
  *
  * Each batch of new undirected edges costs O(batch + affected rows),
  * never O(corpus): endpoints look up their current labels (default
  * self), components run on the LABEL GRAPH only (O(batch) nodes — a
  * merge of two million-row clusters is ONE label-to-label edge), and the
  * resulting (old label → merged min label) map relabels exactly the
  * affected store rows through the MergeOps keyed-merge protocol.
  * Labels are component MINIMA at every step: the label graph's nodes are
  * current labels (themselves component minima-so-far), so the merged
  * component's new label is the global min — the same invariant a
  * one-shot large-star/small-star run produces, which is what makes
  * batching invisible to the final cluster list. */
object IncrementalClusters {

  /** Create an empty (node, label) store at `path`. */
  def init(spark: SparkSession, path: String): Unit = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("node", LongType),
        StructField("label", LongType))))
      .write.parquet(path)
  }

  /** Fold one batch of undirected edges (`a`, `b` long columns) into the
    * label store. No-op on an empty edge frame.
    *
    * The label graph has O(batch) nodes BY CONSTRUCTION, so when it fits
    * under `maxDriverEdges` the component fold runs as in-memory
    * union-find (one bounded collect, zero per-round job overhead — the
    * trainCodebooksExact discipline); an oversized batch falls back to
    * the distributed large-star/small-star loop. Both produce component
    * MINIMA, so the choice is invisible to the store. */
  def applyBatch(spark: SparkSession, path: String, edges: DataFrame,
      maxDriverEdges: Int = 2000000): Unit = {
    val pairs = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
      .localCheckpoint(false) // consumed by the lookup, CC, and upsert
    MergeOps.recoverIfNeeded(spark, path)
    val labels = spark.read.parquet(path)
    // current labels of the new edges' endpoints (default: self)
    val labelEdges = pairs
      .join(labels.select(col("node").as("a"), col("label").as("la")),
        Seq("a"), "left")
      .join(labels.select(col("node").as("b"), col("label").as("lb")),
        Seq("b"), "left")
      .select(coalesce(col("la"), col("a")).as("id_a"),
        coalesce(col("lb"), col("b")).as("id_b"))
    // size probe and driver fetch in ONE incremental job (CollectLimit
    // stops scanning once the bound is passed)
    val probe = labelEdges.limit(maxDriverEdges + 1).collect()
    if (probe.isEmpty) return
    val lmap =
      if (probe.length <= maxDriverEdges) {
        // in-memory union-find with min-root selection: comp = component
        // min, deterministic regardless of edge order
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) {
            val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
          }
          r
        }
        probe.foreach { row =>
          val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
          if (ra != rb) {
            val root = math.min(ra, rb)
            parent(math.max(ra, rb)) = root
            parent(root) = root
          }
        }
        val nodes = probe.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
        import spark.implicits._
        nodes.map(n => (n, find(n))).toSeq.toDF("node", "comp")
      } else
        // CC over LABELS only — O(batch) nodes regardless of cluster sizes
        ConnectedComponents.runStar(labelEdges, "id_a", "id_b")
          .localCheckpoint(false)
    val updatedOld = labels
      .join(lmap.select(col("node").as("label"), col("comp")), Seq("label"))
      .select(col("node"), col("comp").as("label"))
    val endpoints = pairs.select(col("a").as("node"))
      .unionByName(pairs.select(col("b").as("node"))).distinct()
    val upserts = endpoints
      .join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("cur"))
      .join(lmap.select(col("node").as("cur"), col("comp")), Seq("cur"))
      .select(col("node"), col("comp").as("label"))
    MergeOps.mergeByKey(spark, path,
      updatedOld.unionByName(upserts).distinct(), "node",
      insertUnmatched = true)
  }

  /** Current (node, label) store contents. */
  def labels(spark: SparkSession, path: String): DataFrame = {
    MergeOps.recoverIfNeeded(spark, path)
    spark.read.parquet(path)
  }
}
