package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite
import graft.llm.MinHash

class IncrementalNearDupSpec extends AnyFunSuite with Matchers with SparkSuite {

  private val cfg = MinHash.Config()

  private def mkDocs(ids: Range, tag: String) = {
    import spark.implicits._
    ids.map { i =>
      val words = (0 until 19).map(w => s"w${(i * 7 + w * 3) % 50}_$tag$i")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("per-batch written bytes stay O(batch) as the corpus accumulates") {
    val root = java.nio.file.Files.createTempDirectory("ind_state").toString
    try {
      // batch 0 is 8x the size of batches 1..3; if state maintenance
      // rewrote the corpus, every later batch's write volume would carry
      // batch 0's bulk. Equal-size later batches must write equal-ish,
      // small, NON-GROWING byte volumes.
      val batches = Seq(
        mkDocs(0 until 800, "base"),
        mkDocs(10000 until 10100, "b1"),
        mkDocs(20000 until 20100, "b2"),
        mkDocs(30000 until 30100, "b3"))
      val written = batches.zipWithIndex.map { case (b, i) =>
        val before = IncrementalNearDup.bytesUnder(spark, root)
        IncrementalNearDup.processBatch(b, i.toLong, root, cfg).count()
        IncrementalNearDup.bytesUnder(spark, root) - before
      }
      // corpus after batch 0 is ~8x any later batch; equal later batches
      // must not trend upward (allow parquet footer noise)
      written(1) should be < written(0) / 2
      written(3).toDouble should be <= written(1).toDouble * 1.25
      written(2).toDouble should be <= written(1).toDouble * 1.25
    } finally delete(root)
  }

  test("dedup semantics: earliest copy wins, verified by exact jaccard") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ind_sem").toString
    try {
      val base = mkDocs(0 until 50, "s")
      // batch 1: exact copies of docs 3 and 7 under new ids
      val copies = base.where(col("doc_id").isin(3L, 7L))
        .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
      // batch 2: an exact copy of doc 3 again — must dup to 3, not 1003
      val later = base.where(col("doc_id") === 3L)
        .select(lit(2003L).as("doc_id"), col("text"))
      IncrementalNearDup.processBatch(base, 0L, root, cfg).count() shouldBe 0
      val d1 = IncrementalNearDup.processBatch(copies, 1L, root, cfg)
        .as[(Long, Long, Double)].collect().sorted
      d1 shouldBe Array((1003L, 3L, 1.0), (1007L, 7L, 1.0))
      val d2 = IncrementalNearDup.processBatch(later, 2L, root, cfg)
        .as[(Long, Long, Double)].collect()
      d2 shouldBe Array((2003L, 3L, 1.0))
    } finally delete(root)
  }

  test("delta-log collapse equals eager merge; compaction preserves it") {
    val root = java.nio.file.Files.createTempDirectory("ind_cmp").toString
    try {
      val batches = (0 until 5).map(i => mkDocs(i * 100 until i * 100 + 60, "c"))
      batches.zipWithIndex.foreach { case (b, i) =>
        IncrementalNearDup.processBatch(b, i.toLong, root, cfg).count()
      }
      // eager-merge reference: band all docs at once, take per-bucket min
      val all = batches.reduce(_ unionByName _)
      def triples(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2)))
        .sorted
      val eager = triples(MinHash.banded(
        MinHash.signed(all, "doc_id", "text", cfg), cfg)
        .groupBy("band", "bucket").agg(min("id").as("min_id"))
        .collect())
      def collapsed() =
        triples(IncrementalNearDup.bucketMins(spark, root).get.collect())
      collapsed() shouldBe eager
      // force compaction (threshold below current 5 segments) and re-check
      IncrementalNearDup.maybeCompact(spark, root, 99L, maxDeltas = 2) shouldBe true
      new java.io.File(s"$root/buckets").listFiles().count(_.isDirectory) shouldBe 1
      collapsed() shouldBe eager
      IncrementalNearDup.maybeCompact(spark, root, 100L, maxDeltas = 2) shouldBe false
    } finally delete(root)
  }

  test("a crashed compaction (base written, deltas not yet deleted) stays correct") {
    val root = java.nio.file.Files.createTempDirectory("ind_crash").toString
    try {
      (0 until 3).foreach(i => IncrementalNearDup
        .processBatch(mkDocs(i * 100 until i * 100 + 50, "x"), i.toLong, root, cfg)
        .count())
      def collapsed() = IncrementalNearDup.bucketMins(spark, root).get
        .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2)))
        .sorted
      val before = collapsed()
      // simulate the crash window: the compacted base lands next to the
      // still-live deltas (maybeCompact deletes them only AFTER the write)
      IncrementalNearDup.bucketMins(spark, root).get
        .write.parquet(s"$root/buckets/c999")
      // duplicated rows are absorbed by the min-merge monoid: same state
      collapsed() shouldBe before
      // and a subsequent real compaction converges to one segment
      IncrementalNearDup.maybeCompact(spark, root, 1000L, maxDeltas = 1) shouldBe true
      collapsed() shouldBe before
      new java.io.File(s"$root/buckets").listFiles().count(_.isDirectory) shouldBe 1
    } finally delete(root)
  }

  test("batch replay overwrites its own state segment (idempotent)") {
    val root = java.nio.file.Files.createTempDirectory("ind_rep").toString
    try {
      IncrementalNearDup.processBatch(mkDocs(0 until 40, "r"), 0L, root, cfg).count()
      IncrementalNearDup.processBatch(mkDocs(100 until 140, "r"), 1L, root, cfg).count()
      val before = IncrementalNearDup.bytesUnder(spark, root)
      val docsBefore = IncrementalNearDup.docShingles(spark, root).get.count()
      // replay batch 1 (post-failure rerun): same dirs overwritten, no growth
      IncrementalNearDup.processBatch(mkDocs(100 until 140, "r"), 1L, root, cfg).count()
      IncrementalNearDup.docShingles(spark, root).get.count() shouldBe docsBefore
      IncrementalNearDup.bytesUnder(spark, root) shouldBe before
    } finally delete(root)
  }

  private def delete(root: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(root))
  }
}
