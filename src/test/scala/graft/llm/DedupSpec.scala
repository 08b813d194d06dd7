package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Near-dup detection: planted duplicates found, candidate sets ≪ n², and
  * NO CartesianProduct in any plan (the 100 TB acceptance criterion). */
class DedupSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def corpus = {
    import spark.implicits._
    val base = (0 until 200).map { i =>
      val words = (0 until 30).map(j => s"w${(i * 31 + j * 7) % 500}")
      (i.toLong, words.mkString(" "))
    }
    // plant: 201 = copy of 0; 202 = near-copy of 1 (one word changed);
    // 203 = unrelated short doc
    val planted = Seq(
      (201L, base(0)._2),
      (202L, base(1)._2.replaceFirst("w38", "wX")),
      (203L, "tiny doc"))
    (base ++ planted).toDF("doc_id", "text")
  }

  test("minhash finds planted exact and near duplicates") {
    val dups = MinHash.nearDuplicates(corpus, "doc_id", "text").collect()
    val pairs = dups.map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((0L, 201L))
    pairs should contain((1L, 202L))
    val j = dups.find(r => r.getLong(0) == 0L && r.getLong(1) == 201L).get.getDouble(2)
    j shouldBe 1.0 +- 1e-9 // exact copy
  }

  test("minhash candidate count is far below n^2 and plan has no CartesianProduct") {
    val signed = MinHash.signed(corpus, "doc_id", "text", MinHash.Config())
    val candidates = MinHash.candidatePairs(signed, MinHash.Config())
    val n = corpus.count()
    candidates.count() should be < (n * (n - 1) / 20) // ≪ all pairs
    val plan = MinHash.nearDuplicates(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("minhash mega-bucket cap drops degenerate buckets") {
    import spark.implicits._
    // 50 identical docs would form one 50-doc bucket → 1225 pairs; cap at 10.
    val clones = (0 until 50).map(i => (i.toLong, "same same same same")).toDF("doc_id", "text")
    val cfg = MinHash.Config(maxBucketSize = 10)
    MinHash.candidatePairs(MinHash.signed(clones, "doc_id", "text", cfg), cfg)
      .count() shouldBe 0
  }

  test("simhash: identical docs at Hamming 0; near-copy within 3; plan bucketed") {
    val dups = SimHash.nearDuplicates(corpus, "doc_id", "text").collect()
    val byPair = dups.map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    byPair((0L, 201L)) shouldBe 0
    byPair.get((1L, 202L)).foreach(_ should be <= 3)
    val plan = SimHash.nearDuplicates(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
  }

  test("span strip agrees with span coverage on exactly which docs lose tokens") {
    // measurement half vs action half of Lee et al. substring dedup: a doc
    // whose coverage query reports zero duplicated spans must come through
    // the strip untouched; one with any duplicated span must lose at least
    // one full 8-token span's worth of positions.
    import graft.queries.LlmQueries
    val cov = LlmQueries.dupSpanCoverage.build(spark, sfDir)
      .select(col("doc_id"), col("dup_spans"))
    val strip = LlmQueries.dupSpanStrip.build(spark, sfDir)
    val j = strip.join(cov, Seq("doc_id")).collect()
    j.length should be > 0
    j.foreach { r =>
      val (n, kept, dup) = (r.getLong(1), r.getLong(2), r.getLong(4))
      withClue(s"doc ${r.getLong(0)}: ") {
        if (dup == 0L) kept shouldBe n
        else kept should be <= (n - 8L)
      }
    }
    // reassembly sanity: kept tokens of an untouched doc reproduce the text
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val untouched = strip.join(cov, Seq("doc_id"))
      .where(col("dup_spans") === 0)
      .join(docs, Seq("doc_id"))
      .where(col("stripped_text") =!= col("text"))
    untouched.count() shouldBe 0L
  }

  test("shingles: n-gram set with short-text fallback") {
    import spark.implicits._
    val df = Seq(("a b c d", 1), ("ab", 2)).toDF("text", "id")
      .select(MinHash.shingles(col("text"), 3).as("sh"))
    val rows = df.collect()
    rows(0).getSeq[String](0) shouldBe Seq("a b c", "b c d")
    rows(1).getSeq[String](0) shouldBe Seq("ab")
  }
}
