package graft.queries

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSuite, Tables}

/** Semantic invariants for the corpus-modeling operators (the DuckDB hash
  * gate proves cross-engine equality; these pin the properties the numbers
  * must have regardless of engine). */
class CorpusModelSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("bigram LM: one score row per multi-word doc, log-probs negative") {
    val out = CorpusModelQueries.bigramLm.build(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
      .where(F.size(F.split(F.col("text"), " ", -1)) >= 2).count()
    out.count() shouldBe docs
    // add-1 smoothed probabilities are < 1, so every quantized ln sum < 0
    out.where(F.col("lm_qscore") >= 0).count() shouldBe 0
    // n_bigrams is words-1 summed over docs
    val expectBigrams = Tables.documents(spark, sfDir)
      .select((F.size(F.split(F.col("text"), " ", -1)) - 1).as("nb"))
      .where(F.col("nb") >= 1).agg(F.sum("nb")).head().getLong(0)
    out.agg(F.sum("n_bigrams")).head().getLong(0) shouldBe expectBigrams
    out.unpersist()
    ()
  }

  test("vocab coverage: OOV bounded by totals, permille in [0, 1000]") {
    val out = CorpusModelQueries.vocabCoverage.build(spark, sfDir).cache()
    out.where(F.col("oov_tokens") > F.col("total_tokens")).count() shouldBe 0
    out.where(F.col("oov_permille") < 0 || F.col("oov_permille") > 1000)
      .count() shouldBe 0
    // the corpus token total is conserved through the vocab left join
    val totalTokens = Tables.documents(spark, sfDir)
      .select(F.size(F.split(F.col("text"), " ", -1)).as("n"))
      .agg(F.sum("n")).head().getLong(0)
    out.agg(F.sum("total_tokens")).head().getLong(0) shouldBe totalTokens
    out.unpersist()
    ()
  }

  test("BPE pairs: 20 two-char pairs in weakly decreasing frequency") {
    val rows = CorpusModelQueries.bpePairs.build(spark, sfDir).collect()
    rows.length shouldBe 20
    all(rows.map(_.getString(0).length)) shouldBe 2
    val counts = rows.map(_.getLong(1))
    counts.sliding(2).foreach { case Array(a, b) => a should be >= b }
  }

  test("kmeans assignment: partitions all vectors, seeds assign to themselves") {
    val out = CorpusModelQueries.kmeansAssign.build(spark, sfDir).collect()
    val vectors = Tables.embeddings(spark, sfDir).count()
    out.map(_.getLong(1)).sum shouldBe vectors
    all(out.map(_.getLong(0))) should (be >= 0L and be < 8L)
    // a seed's distance to itself is 0, so every seed's cluster is nonempty
    out.length shouldBe 8
  }

  test("BPE round 2: merged symbol shrinks the pair stream, top pair consumed") {
    val r1 = CorpusModelQueries.bpePairs.build(spark, sfDir).collect()
    val r2 = CorpusModelQueries.bpeRound2.build(spark, sfDir).collect()
    r2.length shouldBe 20
    // the merged pair can no longer occur as two raw characters: its round-1
    // count must not survive unchanged at the top of round 2
    val top1 = r1.head
    r2.find(_.getString(0) == top1.getString(0))
      .foreach(_.getLong(1) should be < top1.getLong(1))
  }

  test("char entropy: non-negative, zero iff single-symbol, n matches text length") {
    val out = CorpusModelQueries.charEntropy.build(spark, sfDir).cache()
    out.where(F.col("entropy_micro") < 0).count() shouldBe 0
    out.where(F.col("per_char_micro") < 0).count() shouldBe 0
    val lens = Tables.documents(spark, sfDir)
      .select(F.sum(F.length(F.col("text")))).head().getLong(0)
    out.agg(F.sum("n_chars")).head().getLong(0) shouldBe lens
    out.unpersist()
    ()
  }

  test("pq codes: each subspace partitions all vectors over codes 0..3") {
    val out = CorpusModelQueries.pqCodes.build(spark, sfDir).collect()
    val vectors = Tables.embeddings(spark, sfDir).count()
    out.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      rows.map(_.getLong(2)).sum shouldBe vectors
    }
    all(out.map(_.getInt(0))) should (be >= 0 and be <= 3)
    all(out.map(_.getLong(1))) should (be >= 0L and be <= 3L)
  }
}
