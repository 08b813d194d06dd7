package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Pins the semantics the llm_incremental_clusters oracle cannot see from
  * the final answer alone: labels between batches (the store really is
  * maintained incrementally), the cross-batch CLUSTER MERGE relabel path,
  * untouched-cluster isolation, idempotent no-op batches, and equivalence
  * with a one-shot large-star/small-star run on the union of all edges
  * under an adversarial arrival order. */
class IncrementalClustersSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def edges(ps: (Long, Long)*) = {
    import spark.implicits._
    ps.toDF("a", "b")
  }

  private def store(path: String): Map[Long, Long] =
    IncrementalClusters.labels(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  // Scratch roots this suite created, deleted in afterAll — the tmpfs
  // lives for the machine's uptime, so leaked spec dirs accumulate
  // across runs (136 observed before this cleanup existed).
  private val scratchRoots = scala.collection.mutable.ArrayBuffer.empty[String]

  private def scratch(tag: String): String = {
    val d = graft.Scratch.dir(s"graft_incc_spec_$tag")
    scratchRoots += d
    s"$d/labels"
  }

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    scratchRoots.foreach(d => rm(new java.io.File(d)))
    super.afterAll()
  }

  test("cross-batch merge relabels every member of both clusters") {
    val path = scratch("merge")
    IncrementalClusters.init(spark, path)
    // batch 1: two disjoint clusters {20,30} and {40,50}
    IncrementalClusters.applyBatch(spark, path, edges(20L -> 30L, 40L -> 50L))
    store(path) shouldBe Map(20L -> 20L, 30L -> 20L, 40L -> 40L, 50L -> 40L)
    // batch 2: 10 links to 30 — the whole {20,30} cluster must relabel to
    // 10 (including member 20, which is NOT an endpoint of the new edge),
    // and {40,50} must pass through untouched
    IncrementalClusters.applyBatch(spark, path, edges(10L -> 30L))
    store(path) shouldBe Map(
      10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 40L, 50L -> 40L)
  }

  test("merging two multi-member clusters via one label-to-label edge") {
    val path = scratch("twobig")
    IncrementalClusters.init(spark, path)
    IncrementalClusters.applyBatch(spark, path,
      edges(100L -> 101L, 100L -> 102L, 200L -> 201L, 200L -> 202L))
    store(path).values.toSet shouldBe Set(100L, 200L)
    // one edge between arbitrary members merges both clusters to min=100
    IncrementalClusters.applyBatch(spark, path, edges(102L -> 201L))
    store(path) shouldBe Map(
      100L -> 100L, 101L -> 100L, 102L -> 100L,
      200L -> 100L, 201L -> 100L, 202L -> 100L)
  }

  test("empty batch is a no-op; replayed edges are idempotent") {
    val path = scratch("idem")
    IncrementalClusters.init(spark, path)
    IncrementalClusters.applyBatch(spark, path, edges(7L -> 8L))
    val first = store(path)
    IncrementalClusters.applyBatch(spark, path, edges((Seq.empty[(Long, Long)]): _*))
    store(path) shouldBe first
    IncrementalClusters.applyBatch(spark, path, edges(7L -> 8L))
    store(path) shouldBe first
  }

  test("randomized: any batch split of a random graph equals one-shot CC") {
    // Seeded LCG so the case set is reproducible. Graphs are sparse over a
    // small id space to force multi-edge components and frequent
    // cross-batch merges; batch assignment is random, so merge order is
    // arbitrary relative to component structure.
    for (seed <- Seq(1L, 2L, 3L)) {
      var x = seed
      def next(bound: Int): Int = {
        x = x * 6364136223846793005L + 1442695040888963407L
        (((x >>> 33) % bound).toInt + bound) % bound
      }
      val es = Seq.fill(30)((next(40).toLong, next(40).toLong))
        .filter { case (a, b) => a != b }
      val nBatches = 4
      val batches = es.groupBy(_ => next(nBatches)).values.toSeq
      val path = scratch(s"rand$seed")
      IncrementalClusters.init(spark, path)
      batches.foreach(b => IncrementalClusters.applyBatch(spark, path, edges(b: _*)))
      val oneShot = ConnectedComponents.runStar(edges(es: _*), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"seed $seed")(store(path) shouldBe oneShot)
    }
  }

  test("distributed fallback path labels identically to the in-memory fold") {
    // maxDriverEdges = 1 forces the runStar fallback for every multi-edge
    // batch; the store must end up identical to the default path
    val pIn = scratch("fb_in"); val pFb = scratch("fb_fb")
    IncrementalClusters.init(spark, pIn); IncrementalClusters.init(spark, pFb)
    val batches = Seq(Seq(4L -> 5L, 8L -> 9L), Seq(1L -> 2L, 5L -> 8L), Seq(2L -> 4L))
    batches.foreach { b =>
      IncrementalClusters.applyBatch(spark, pIn, edges(b: _*))
      IncrementalClusters.applyBatch(spark, pFb, edges(b: _*), maxDriverEdges = 1)
    }
    store(pFb) shouldBe store(pIn)
    store(pFb).values.toSet shouldBe Set(1L)
  }

  test("bucketed store survives null edge endpoints (probe skips them)") {
    // edges whose a/b cast to null used to NPE the bucket probe's
    // getLong(0); the flat path just dropped them through the joins —
    // both layouts must agree
    import spark.implicits._
    val path = scratch("nullep")
    IncrementalClusters.init(spark, path, bucketWidth = 16L)
    IncrementalClusters.applyBatch(spark, path, edges(3L -> 4L))
    val withNull = Seq((Some(3L), Some(5L)), (None, Some(9L)))
      .toDF("a", "b")
    IncrementalClusters.applyBatch(spark, path, withNull)
    store(path) shouldBe Map(3L -> 3L, 4L -> 3L, 5L -> 3L)
  }

  test("per-batch writes are O(batch): a tiny batch never rewrites the store") {
    // Build a store with ~600 nodes, then fold in one 2-edge batch of
    // fresh nodes: the bytes added must be a small fraction of the
    // accumulated store, and every pre-existing segment directory must
    // survive untouched (append-only history + delta log, not
    // union-and-rewrite). maxDeltas is raised so compaction cannot
    // legitimately rewrite history mid-test.
    val path = scratch("obatch")
    IncrementalClusters.init(spark, path)
    for (b <- 0 until 6) {
      val es = (0 until 100).map(i => (b * 1000L + i, b * 1000L + i + 100))
      IncrementalClusters.applyBatch(spark, path, edges(es: _*), maxDeltas = 100)
    }
    def segments(sub: String): Set[String] =
      Option(new java.io.File(s"$path/$sub").listFiles())
        .getOrElse(Array.empty)
        .filter(_.isDirectory).map(d => s"$sub/${d.getName}").toSet
    val before = IncrementalClusters.bytesUnder(spark, path)
    val segsBefore = segments("nodes") ++ segments("redirect")
    IncrementalClusters.applyBatch(spark, path,
      edges(90001L -> 90002L, 90003L -> 90004L), maxDeltas = 100)
    val after = IncrementalClusters.bytesUnder(spark, path)
    val segsAfter = segments("nodes") ++ segments("redirect")
    // history preserved: every old segment still present
    assert(segsBefore.subsetOf(segsAfter))
    // batch-sized delta: far below the store size (an O(store) rewrite
    // would at least double the footprint)
    (after - before).toDouble should be < before.toDouble * 0.25
  }

  test("compaction collapses the log without changing labels") {
    val path = scratch("compact")
    IncrementalClusters.init(spark, path)
    // chain merges force redirect traffic every batch; maxDeltas=2 forces
    // repeated compactions interleaved with the folds
    val batches = (0 until 10).map(i => Seq(i.toLong -> (i + 1).toLong))
    batches.foreach(b =>
      IncrementalClusters.applyBatch(spark, path, edges(b: _*), maxDeltas = 2))
    val oneShot = ConnectedComponents
      .runStar(edges(batches.flatten: _*), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    store(path) shouldBe oneShot
    store(path).values.toSet shouldBe Set(0L)
  }

  test("compaction that crashes mid-delete never duplicates node rows") {
    // Simulate the crash window the r15 ADVICE flagged: the collapsed
    // base is committed (rename done) but the old-segment delete pass
    // died partway. Readers must treat the base as superseding every
    // lower-seq segment — labels() stays duplicate-free and identical —
    // and the next applyBatch's sweep must reap the leftovers.
    val path = scratch("crash")
    IncrementalClusters.init(spark, path)
    val batches = (0 until 6).map(i => Seq(i.toLong -> (i + 1).toLong))
    batches.foreach(b =>
      IncrementalClusters.applyBatch(spark, path, edges(b: _*), maxDeltas = 100))
    val healthy = store(path)
    // force a compaction, then resurrect one pre-compaction segment of
    // each table from a copy taken beforehand — exactly the on-disk state
    // of a crash that deleted some but not all old dirs
    def dirs(sub: String): Seq[java.io.File] =
      Option(new java.io.File(s"$path/$sub").listFiles())
        .getOrElse(Array.empty).filter(_.isDirectory).toSeq
    def copyTree(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles()).getOrElse(Array.empty)
          .foreach(c => copyTree(c, new java.io.File(dst, c.getName)))
      } else {
        java.nio.file.Files.copy(src.toPath, dst.toPath)
        ()
      }
    }
    val stash = new java.io.File(s"${path}_keep")
    val saved = (dirs("nodes") ++ dirs("redirect")).map { d =>
      val keep = new java.io.File(
        new java.io.File(stash, d.getParentFile.getName), d.getName)
      copyTree(d, keep); (d, keep)
    }
    IncrementalClusters.maybeCompact(spark, path, maxDeltas = 2) shouldBe true
    saved.foreach { case (orig, keep) =>
      if (!orig.exists()) copyTree(keep, orig)
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(stash)
    // stale survivors present on disk…
    val nLive = IncrementalClusters.liveSegments(spark, path)
    (dirs("nodes").length + dirs("redirect").length) should be >
      (nLive._1 + nLive._2)
    // …but invisible to reads: no duplicates, same labels
    val rows = IncrementalClusters.labels(spark, path).collect()
    rows.length shouldBe healthy.size
    rows.map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe healthy
    // and the next batch's sweep reaps them
    IncrementalClusters.applyBatch(spark, path, edges(100L -> 101L),
      maxDeltas = 100)
    val afterSweep = dirs("nodes").length + dirs("redirect").length
    val live2 = IncrementalClusters.liveSegments(spark, path)
    afterSweep shouldBe (live2._1 + live2._2)
    store(path) shouldBe healthy ++ Map(100L -> 100L, 101L -> 100L)
  }

  test("read amplification is bounded: live segments never exceed maxDeltas + 1") {
    // Every applyBatch lookup opens every live segment of both tables;
    // the compaction threshold is the bound that keeps that O(maxDeltas),
    // not O(batches). 30 chain batches at maxDeltas=4: the live count per
    // table must stay ≤ 5 at every step.
    val path = scratch("readamp")
    IncrementalClusters.init(spark, path)
    (0 until 30).foreach { i =>
      IncrementalClusters.applyBatch(spark, path,
        edges(i.toLong -> (i + 1).toLong), maxDeltas = 4)
      val (n, r) = IncrementalClusters.liveSegments(spark, path)
      withClue(s"after batch $i: ") {
        n should be <= 5
        r should be <= 5
      }
    }
    store(path).values.toSet shouldBe Set(0L)
  }

  test("bucketed store labels identically to flat, through merges and compaction") {
    // same batch sequence into a flat and a bucketWidth=8 store, with
    // maxDeltas=2 so compaction (which must preserve the hive layout)
    // fires several times; labels must be indistinguishable
    val flat = scratch("bk_flat")
    val bk = scratch("bk_hive")
    IncrementalClusters.init(spark, flat)
    IncrementalClusters.init(spark, bk, bucketWidth = 8L)
    val batches = Seq(
      Seq(1L -> 2L, 40L -> 41L), Seq(2L -> 3L, 100L -> 101L),
      Seq(41L -> 100L), Seq(7L -> 8L), Seq(3L -> 40L), Seq(8L -> 9L))
    batches.foreach { b =>
      IncrementalClusters.applyBatch(spark, flat, edges(b: _*), maxDeltas = 2)
      IncrementalClusters.applyBatch(spark, bk, edges(b: _*), maxDeltas = 2)
    }
    store(bk) shouldBe store(flat)
    store(bk).keySet should have size 10
  }

  test("bucketed lookup opens only the endpoint buckets (partition-pruned scan)") {
    // the a44-style files-read gate for the bucketed layout: a key-local
    // probe's store lookup must carry a partition filter and touch ONLY
    // the bucket directories its endpoints can live in — reading other
    // buckets is exactly the O(store)-bytes residual this layout removes
    import spark.implicits._
    val path = scratch("bk_prune")
    IncrementalClusters.init(spark, path, bucketWidth = 100L)
    // 1000 nodes spanning buckets 0..9, written across two segments
    IncrementalClusters.applyBatch(spark, path,
      spark.range(250).select((col("id") * 2).as("a"), (col("id") * 2 + 1).as("b")))
    IncrementalClusters.applyBatch(spark, path,
      spark.range(250).select((col("id") * 2 + 500).as("a"),
        (col("id") * 2 + 501).as("b")))
    val endpoints = Seq(110L, 137L, 181L).toDF("node") // all in bucket 1
    val view = IncrementalClusters.nodeStoreFor(spark, path, endpoints)
    val scans = view.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    scans should have size 1 // one plain multi-path scan, no union
    // bucket 1 lives only in the first segment → the scan's root set is
    // exactly that one bk=1 directory; every other bucket is never even
    // handed to the reader (the a44 files-opened discipline)
    val roots = scans.head.relation.location.rootPaths.map(_.toString)
    withClue(roots.mkString(","))(
      roots.forall(_.endsWith("/bk=1")) shouldBe true)
    roots should have size 1
    view.count() shouldBe 100 // bucket 1's nodes, nothing else
  }

  test("adversarial arrival order equals one-shot CC on the edge union") {
    // chain 1-2-3-4-5 delivered as (4,5), (1,2), (3,4), (2,3): the last
    // batch merges THREE existing clusters transitively
    val path = scratch("chain")
    IncrementalClusters.init(spark, path)
    val batches = Seq(Seq(4L -> 5L), Seq(1L -> 2L), Seq(3L -> 4L), Seq(2L -> 3L))
    batches.foreach(b => IncrementalClusters.applyBatch(spark, path, edges(b: _*)))
    val oneShot = ConnectedComponents
      .runStar(edges(batches.flatten: _*), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    store(path) shouldBe oneShot
    store(path).values.toSet shouldBe Set(1L)
  }
}
