package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental connected-component LABEL maintenance over persisted state —
  * the device behind `llm_incremental_clusters` — with per-batch WRITE
  * volume proportional to the batch (plus the merged redirect chain),
  * never to the accumulated corpus.
  *
  * State is two tables under one root (the IncrementalNearDup LSM
  * discipline):
  *
  *  - `nodes/b<seq>/` — append-only (node, label0): a node's label AT
  *    INSERTION TIME (its component min at that moment). A node's row is
  *    written exactly once and never rewritten — later merges are
  *    expressed through the redirect table, so inserting a batch costs
  *    O(new nodes) bytes.
  *  - `redirect/{d,c}<seq>/` — an LSM delta log of (label, root, seq)
  *    upserts, collapsed on read by last-writer-wins (max seq per label).
  *    The collapsed map is kept DEPTH-1 by construction: when roots merge,
  *    the batch writes both the new (merged-away root → min) entries AND
  *    repairs every existing entry that pointed at a merged-away root.
  *    Resolution is therefore a single join, and per-batch write volume is
  *    O(batch + |repaired chain|) — the chain is labels (component ids),
  *    of which there are at most one per ever-created cluster, not nodes.
  *
  * Each batch of new undirected edges: endpoints look up their current
  * labels (node store + one redirect hop, default self), components run on
  * the LABEL GRAPH only (O(batch) nodes — a merge of two million-row
  * clusters is ONE label-to-label edge), and the resulting
  * (old root → merged min) map lands as one redirect delta segment.
  * Labels are component MINIMA at every step: the label graph's nodes are
  * current labels (themselves component minima-so-far), so the merged
  * component's new label is the global min — the same invariant a one-shot
  * large-star/small-star run produces, which is what makes batching
  * invisible to the final cluster list.
  *
  * Read amplification is bounded by threshold-gated COMPACTION: when
  * either table exceeds `maxDeltas` segments it is collapsed into one base
  * directory — an O(store) job amortized over the threshold's worth of
  * batches (the standard LSM cost model). Segments are staged as
  * `<name>.tmp` and renamed into place; readers skip `.tmp`, so a crashed
  * writer never leaves a half-readable segment, and a replayed batch
  * converges because folding the same edges twice is a semantic no-op
  * (union-find is idempotent).
  *
  * Reference shape: the reference's ingestion keeps consumer state in an
  * external keyed store and never rewrites history per message
  * (wifi-scan-ingestion pipeline); this reproduces that steady-state cost
  * profile on files alone. */
object IncrementalClusters {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed segment dirs under `dir` (staging `.tmp` dirs excluded). */
  private def listDirs(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.toString).filterNot(_.endsWith(".tmp")).sorted
  }

  private def seqOf(dir: String): Long = {
    val name = dir.substring(dir.lastIndexOf('/') + 1)
    name.drop(1).toLong
  }

  /** Committed segment dirs that are LIVE at read time: a compaction base
    * (`c<seq>`) supersedes every segment with a LOWER seq — by
    * construction it collapsed exactly the segments that existed when it
    * was allocated, all of which have lower seqs (seq allocation is
    * monotone across both tables). Compaction is therefore crash-atomic
    * at the READER: the base directory appears in one rename, and stale
    * survivors of a delete pass that crashed midway are invisible here
    * (then reaped by [[maybeCompact]]'s sweep) instead of duplicating
    * every surviving node row in labels() output. */
  private def liveDirs(spark: SparkSession, dir: String): Seq[String] = {
    val all = listDirs(spark, dir)
    val base = all
      .filter(d => d.substring(d.lastIndexOf('/') + 1).startsWith("c"))
      .map(seqOf).sorted.lastOption
    base.fold(all)(b => all.filter(seqOf(_) >= b))
  }

  private def nextSeq(spark: SparkSession, path: String): Long = {
    val all = listDirs(spark, s"$path/nodes") ++ listDirs(spark, s"$path/redirect")
    if (all.isEmpty) 0L else all.map(seqOf).max + 1L
  }

  /** Stage-and-rename segment write: never exposes a partial directory.
    * `partCols` layouts the segment hive-style (the bucketed node store)
    * so later reads prune at partition-discovery time. */
  private def writeSegment(df: DataFrame, dir: String,
      partCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val tmp = new Path(dir + ".tmp")
    val dst = new Path(dir)
    if (partCols.isEmpty) df.write.mode("overwrite").parquet(tmp.toString)
    else df.write.mode("overwrite").partitionBy(partCols: _*)
      .parquet(tmp.toString)
    if (f.exists(dst)) f.delete(dst, true)
    f.rename(tmp, dst)
    ()
  }

  private def emptyLongPair(spark: SparkSession, c1: String, c2: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField(c1, LongType), StructField(c2, LongType))))
  }

  /** Node-store BUCKET WIDTH: 0 = flat (the default layout). When `init`
    * set a width W > 0, every node segment is laid out hive-style by
    * `bk = node DIV W` — the Iceberg truncate-transform for longs, chosen
    * over hash bucketing deliberately: the read-side win exists only when
    * a batch's endpoints are KEY-LOCAL (a contiguous id range, the
    * time-ordered-ingest shape), and hashing destroys exactly that
    * locality. Recorded once at init so every segment shares the layout
    * (mixed layouts would break partition discovery). */
  private def bucketWidthOf(spark: SparkSession, path: String): Long = {
    val p = new Path(path, "_bucket_width")
    val f = fs(spark, path)
    if (!f.exists(p)) 0L
    else {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(f.open(p), "UTF-8"))
      try in.readLine().trim.toLong finally in.close()
    }
  }

  /** The bucketed layout's leaf directories (`<segment>/bk=<k>`) across
    * `dirs`, optionally restricted to the buckets in `want` — ONE
    * listStatus per live segment (≤ maxDeltas + 1 driver-side listings),
    * never a partition-discovery pass: sibling partitioned roots would
    * conflict, and a union of per-segment relations measured ~1.5× the
    * flat scan on bucket-spanning batches. The pruned set reads as one
    * plain multi-path scan — the bk column (derivable from node) never
    * materializes. */
  private def nodeLeafDirs(spark: SparkSession, dirs: Seq[String],
      want: Option[Set[Long]]): Seq[String] =
    dirs.flatMap { d =>
      fs(spark, d).listStatus(new Path(d)).filter(_.isDirectory)
        .map(_.getPath)
        .filter { p =>
          p.getName.startsWith("bk=") &&
            want.forall(_.contains(p.getName.stripPrefix("bk=").toLong))
        }
        .map(_.toString)
    }

  /** Raw multi-segment node read. Bucketed stores expand to their bk=…
    * leaf dirs (see [[nodeLeafDirs]]); flat stores scan the segment dirs
    * directly. Either way it is ONE multi-path parquet scan. */
  private def readNodeDirs(
      spark: SparkSession, path: String, dirs: Seq[String],
      width: Option[Long] = None): DataFrame =
    if (width.getOrElse(bucketWidthOf(spark, path)) <= 0L)
      spark.read.parquet(dirs: _*)
    else {
      val leaves = nodeLeafDirs(spark, dirs, None)
      if (leaves.isEmpty) emptyLongPair(spark, "node", "label0")
      else spark.read.parquet(leaves: _*)
    }

  /** Union view of the append-only node store: (node, label0). */
  private def nodeStore(spark: SparkSession, path: String): DataFrame = {
    val dirs = liveDirs(spark, s"$path/nodes")
    if (dirs.isEmpty) emptyLongPair(spark, "node", "label0")
    else readNodeDirs(spark, path, dirs).select(col("node"), col("label0"))
  }

  /** Node-store view pruned to the buckets `endpoints` (a `node` column,
    * batch-sized) can possibly match — the applyBatch lookup path. On a
    * bucketed store only the matching `bk=` leaf directories are handed
    * to the scan, so other buckets are never listed past the segment
    * level, let alone opened (gated in IncrementalClustersSpec via the
    * scan's root paths); capped at 256 distinct buckets, beyond which
    * pruning cannot save much — the lookup falls back to the full leaf
    * set. Flat stores return the plain union. */
  private[operators] def nodeStoreFor(
      spark: SparkSession, path: String, endpoints: DataFrame,
      width: Option[Long] = None): DataFrame = {
    val w = width.getOrElse(bucketWidthOf(spark, path))
    val dirs = liveDirs(spark, s"$path/nodes")
    if (dirs.isEmpty) emptyLongPair(spark, "node", "label0")
    else if (w <= 0L)
      readNodeDirs(spark, path, dirs, Some(w))
        .select(col("node"), col("label0"))
    else {
      // null endpoints (edges whose a/b cast to null) can never match a
      // stored node — drop them before the probe, or getLong(0) NPEs
      val bks = endpoints.where(col("node").isNotNull)
        .select(expr(s"CAST(node AS BIGINT) div $w")
        .as("bk")).distinct().limit(257).collect().map(_.getLong(0))
      val leaves = nodeLeafDirs(spark, dirs,
        if (bks.length > 256) None else Some(bks.toSet))
      if (leaves.isEmpty) emptyLongPair(spark, "node", "label0")
      else spark.read.parquet(leaves: _*).select(col("node"), col("label0"))
    }
  }

  /** Collapsed depth-1 (label, root) view of the redirect delta log —
    * last-writer-wins by seq, identical to the eagerly-merged map. */
  private def redirectMap(spark: SparkSession, path: String): DataFrame = {
    val dirs = liveDirs(spark, s"$path/redirect")
    if (dirs.isEmpty) emptyLongPair(spark, "label", "root")
    else spark.read.parquet(dirs: _*)
      .groupBy("label")
      .agg(max(struct(col("seq"), col("root"))).as("m"))
      .select(col("label"), col("m.root").as("root"))
  }

  /** Create an empty store at `path`. `bucketWidth` > 0 lays every node
    * segment out by `bk = node DIV bucketWidth` so key-local batches read
    * only their own buckets (see [[nodeStoreFor]]); 0 keeps the flat
    * layout. The choice is fixed for the store's lifetime. */
  def init(spark: SparkSession, path: String, bucketWidth: Long = 0L): Unit = {
    val f = fs(spark, path)
    f.mkdirs(new Path(path, "nodes"))
    f.mkdirs(new Path(path, "redirect"))
    if (bucketWidth > 0L) {
      val out = f.create(new Path(path, "_bucket_width"), false)
      try out.write(s"$bucketWidth\n".getBytes("UTF-8")) finally out.close()
    }
    ()
  }

  /** Fold one batch of undirected edges (`a`, `b` long columns) into the
    * store. No-op on an empty edge frame.
    *
    * The label graph has O(batch) nodes BY CONSTRUCTION, so when it fits
    * under `maxDriverEdges` the component fold runs as in-memory
    * union-find (one bounded collect, zero per-round job overhead — the
    * trainCodebooksExact discipline); an oversized batch falls back to
    * the distributed large-star/small-star loop. Both produce component
    * MINIMA, so the choice is invisible to the store. */
  def applyBatch(spark: SparkSession, path: String, edges: DataFrame,
      maxDriverEdges: Int = 2000000, maxDeltas: Int = 16): Unit = {
    val pairs = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
      .localCheckpoint(false) // consumed by the lookup, CC, and insert path
    // init-time-immutable: read the width ONCE per batch and thread it
    // through (nodeStoreFor + the insert branch used to re-read the
    // _bucket_width file 3-4 times per batch — driver FS round-trips)
    val w = bucketWidthOf(spark, path)
    val redirect = redirectMap(spark, path)
    // current labels of the batch endpoints: node store hop (default self)
    // then ONE redirect hop (the depth-1 invariant). Endpoints are
    // batch-sized; on a bucketed store the lookup opens only the buckets
    // the endpoints can live in (nodeStoreFor), on a flat store the
    // store-side joins prune via parquet stats + runtime filters.
    val endpoints = pairs.select(col("a").as("node"))
      .unionByName(pairs.select(col("b").as("node"))).distinct()
      .localCheckpoint(false) // bucket probe + the lookup join share it
    val nodes = nodeStoreFor(spark, path, endpoints, Some(w))
    val epCur = endpoints
      .join(nodes, Seq("node"), "left")
      .withColumn("l0", coalesce(col("label0"), col("node")))
      .join(redirect.select(col("label").as("l0"), col("root")), Seq("l0"), "left")
      .select(col("node"), col("label0").isNull.as("fresh"),
        coalesce(col("root"), col("l0")).as("cur"))
      .localCheckpoint(false) // reused by the label graph and the insert path
    val labelEdges = pairs
      .join(epCur.select(col("node").as("a"), col("cur").as("id_a")), Seq("a"))
      .join(epCur.select(col("node").as("b"), col("cur").as("id_b")), Seq("b"))
      .select(col("id_a"), col("id_b"))
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
        val ns = probe.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
        import spark.implicits._
        ns.map(n => (n, find(n))).toSeq.toDF("node", "comp")
      } else
        // CC over LABELS only — O(batch) nodes regardless of cluster sizes.
        // maxDriverEdges = 0: this probe already proved the edge list
        // exceeds the identical driver bound, so runStar must not re-probe
        ConnectedComponents.runStar(labelEdges, "id_a", "id_b",
          maxDriverEdges = 0)
          .localCheckpoint(false)
    val seq = nextSeq(spark, path)
    // 1. APPEND new nodes, written once with their post-batch component min
    //    as label0 — O(new nodes) bytes, history untouched.
    val inserts = epCur.where(col("fresh"))
      .join(lmap.select(col("node").as("cur"), col("comp")), Seq("cur"))
      .select(col("node"), col("comp").as("label0"))
    if (inserts.limit(1).count() > 0) {
      if (w > 0L)
        writeSegment(inserts
          .withColumn("bk", expr(s"node div $w"))
          .sortWithinPartitions("node"),
          f"$path/nodes/b$seq%06d", partCols = Seq("bk"))
      else
        writeSegment(inserts.sortWithinPartitions("node"),
          f"$path/nodes/b$seq%06d")
    }
    // 2. ONE redirect delta: merged-away roots point at the new min, and
    //    every existing entry whose root merged away is repaired in the
    //    same segment — the depth-1 invariant. The two sets are disjoint
    //    (new entries' labels were terminal roots; repaired labels were
    //    not), so last-writer-wins within the segment is unambiguous.
    val nontrivial = lmap.where(col("node") =!= col("comp"))
      .localCheckpoint(false) // consumed by new-entry and repair branches
    // A merged-away root needs its own (root → min) entry only if some
    // PRE-EXISTING row's label0 resolves through it — i.e. it was the cur
    // of a non-fresh endpoint. A fresh endpoint's id can never be a stored
    // label0 (fresh inserts land with the post-batch min directly), so
    // emitting entries for those would only bloat future chain repairs.
    val liveRoots = epCur.where(!col("fresh"))
      .select(col("cur").as("node")).distinct()
    val newEntries = nontrivial.join(liveRoots, Seq("node"), "left_semi")
      .select(col("node").as("label"), col("comp").as("root"))
    val repaired = redirect
      .join(nontrivial.select(col("node").as("root"), col("comp")), Seq("root"))
      .select(col("label"), col("comp").as("root"))
    val delta = newEntries.unionByName(repaired).withColumn("seq", lit(seq))
    if (delta.limit(1).count() > 0)
      writeSegment(delta.sortWithinPartitions("label"),
        f"$path/redirect/d$seq%06d")
    maybeCompact(spark, path, maxDeltas)
  }

  /** Collapse either table into one base segment when it exceeds
    * `maxDeltas` directories. O(store) once per `maxDeltas` batches —
    * amortized O(store/maxDeltas) per batch; at warehouse scale this runs
    * out-of-band (the a19 partition-compaction discipline). */
  def maybeCompact(spark: SparkSession, path: String, maxDeltas: Int = 16): Boolean = {
    var ran = false
    val f = fs(spark, path)
    // self-heal: reap survivors of a compaction that crashed mid-delete.
    // Readers already ignore them (liveDirs' base-supersedes rule), so
    // this only reclaims bytes — commit order is write-base THEN delete,
    // and the base rename is the commit point.
    Seq("nodes", "redirect").foreach { sub =>
      val live = liveDirs(spark, s"$path/$sub").toSet
      listDirs(spark, s"$path/$sub").filterNot(live)
        .foreach(d => f.delete(new Path(d), true))
    }
    val seq = nextSeq(spark, path)
    val rDirs = liveDirs(spark, s"$path/redirect")
    if (rDirs.length > maxDeltas) {
      writeSegment(redirectMap(spark, path).withColumn("seq", lit(seq))
        .sortWithinPartitions("label"), f"$path/redirect/c$seq%06d")
      rDirs.foreach(d => f.delete(new Path(d), true))
      ran = true
    }
    val nDirs = liveDirs(spark, s"$path/nodes")
    if (nDirs.length > maxDeltas) {
      // one width read serves both the scan and the rewrite layout
      val w = bucketWidthOf(spark, path)
      val base = readNodeDirs(spark, path, nDirs, Some(w))
        .select(col("node"), col("label0"))
      if (w > 0L)
        writeSegment(base.withColumn("bk", expr(s"node div $w"))
            .repartition(col("bk")).sortWithinPartitions("node"),
          f"$path/nodes/c${seq + 1}%06d", partCols = Seq("bk"))
      else
        writeSegment(base.sortWithinPartitions("node"),
          f"$path/nodes/c${seq + 1}%06d")
      nDirs.foreach(d => f.delete(new Path(d), true))
      ran = true
    }
    ran
  }

  /** Live segment-directory count per table — the READ-amplification
    * surface of one applyBatch (each lookup opens every live segment of
    * both tables, bounded by `maxDeltas` + 1 between compactions). Spec
    * hook for the read-side gate. */
  def liveSegments(spark: SparkSession, path: String): (Int, Int) =
    (liveDirs(spark, s"$path/nodes").length,
      liveDirs(spark, s"$path/redirect").length)

  /** Current (node, label) view: node store resolved through the single
    * redirect hop. */
  def labels(spark: SparkSession, path: String): DataFrame = {
    nodeStore(spark, path)
      .join(redirectMap(spark, path)
        .select(col("label").as("label0"), col("root")), Seq("label0"), "left")
      .select(col("node"), coalesce(col("root"), col("label0")).as("label"))
  }

  /** Total bytes currently under the store — spec hook for the per-batch
    * write-volume gate. */
  def bytesUnder(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) 0L else f.getContentSummary(p).getLength
  }
}
