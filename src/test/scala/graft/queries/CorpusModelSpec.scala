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

  test("charEntropyMetrics == the explode-restatement arithmetic on random strings") {
    // the fused UDF replaced a per-character explode plan; this pins the
    // pure function to the exact integer arithmetic the DuckDB oracle runs
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 300) {
      val len = trial % 40 // include 0: empty must map to None (drop row)
      val s = (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val got = graft.llm.TextAnalysis.charEntropyMetrics(s)
      if (len == 0) got shouldBe None
      else {
        val n = len.toLong
        val total = s.groupBy(identity).values
          .map(g => g.length.toLong *
            math.floor(math.log(g.length.toDouble / n) * 1e6).toLong)
          .sum
        got shouldBe Some((n, -total))
      }
    }
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

  test("perplexity filter: exactly ceil(N/10) drops, and they are the worst scores") {
    val out = CorpusModelQueries.perplexityFilter.build(spark, sfDir).collect()
    val n = out.length.toLong
    n shouldBe CorpusModelQueries.bigramLm.build(spark, sfDir).count()
    val dropped = out.filter(_.getString(3) == "drop")
    dropped.length.toLong shouldBe (n + 9) / 10
    // the drop set is an upward-closed prefix of the (avg_nll desc, doc_id)
    // order: every kept doc ranks strictly below every dropped doc
    def key(r: org.apache.spark.sql.Row) = (r.getLong(2), -r.getLong(0))
    val worstKept = out.filter(_.getString(3) == "keep").map(key).maxOption
    val bestDropped = dropped.map(key).minOption
    for (wk <- worstKept; bd <- bestDropped)
      Ordering[(Long, Long)].lt(wk, bd) shouldBe true
    // scores are positive: every smoothed bigram carries nll > 0
    all(out.map(_.getLong(2))) should be > 0L
  }

  test("PMI co-occurrence: canonical pairs, support floor, rank order total") {
    val rows = CorpusModelQueries.pmiCooccur.build(spark, sfDir).collect()
    rows.length should be <= 50
    // unordered-pair canonicalization: w1 <= w2 always
    rows.foreach(r => r.getString(0) should be <= r.getString(1))
    all(rows.map(_.getLong(2))) should be >= 5L
    // the ORDER BY is total: pmi weakly decreasing, ties broken by (w1, w2)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (pa, pb) = (a.getLong(3), b.getLong(3))
        pa should be >= pb
        if (pa == pb)
          (a.getString(0), a.getString(1)) should be < ((b.getString(0), b.getString(1)))
      case _ => ()
    }
  }

  test("dup-span coverage: conserved span totals, permille bounded, exact copies covered") {
    val out = graft.queries.LlmQueries.dupSpanCoverage.build(spark, sfDir).cache()
    out.where(F.col("dup_spans") > F.col("n_spans")).count() shouldBe 0
    out.where(F.col("dup_permille") < 0 || F.col("dup_permille") > 1000)
      .count() shouldBe 0
    // every 8-word-capable doc contributes len(w) - 7 positions
    val expect = Tables.documents(spark, sfDir)
      .select((F.size(F.split(F.col("text"), " ", -1)) - 7).as("n"))
      .where(F.col("n") >= 1).agg(F.sum("n")).head().getLong(0)
    out.agg(F.sum("n_spans")).head().getLong(0) shouldBe expect
    // byte-identical duplicate docs (if the corpus plants any) must be
    // fully covered: every span of each copy occurs in the other
    val dupDocs = Tables.documents(spark, sfDir)
      .groupBy("text").agg(F.collect_list("doc_id").as("ids"))
      .where(F.size(F.col("ids")) >= 2)
      .select(F.explode(F.col("ids")).as("doc_id"))
    dupDocs.join(out, "doc_id")
      .where(F.col("dup_permille") =!= 1000).count() shouldBe 0
    out.unpersist()
    ()
  }

  test("random projection: deterministic, one row per vector, linear in the input") {
    val a = CorpusModelQueries.randProj.build(spark, sfDir).collect()
    val b = CorpusModelQueries.randProj.build(spark, sfDir).collect()
    a should contain theSameElementsInOrderAs b
    a.length.toLong shouldBe Tables.embeddings(spark, sfDir).count()
    // recompute one vector's projection locally from the {-1,0,+1} hash
    // matrix — pins the lattice quantization and the hash convention
    val first = Tables.embeddings(spark, sfDir)
      .orderBy("vec_id").select("vec_id", "embedding").head()
    val qv = first.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e3).toLong)
    def w(i: Int, j: Int): Long = ((i.toLong * 1315423911L + j * 2654435761L) % 6) match {
      case 0 => 1L
      case 1 => -1L
      case _ => 0L
    }
    val expected = (0 to 3).map(j => qv.zipWithIndex.map { case (v, i) => v * w(i, j) }.sum)
    val got = a.find(_.getLong(0) == first.getLong(0)).get
    (1 to 4).map(got.getLong) shouldBe expected
    // the four hash rows are genuinely different directions
    (0 to 3).map(j => (0 until qv.length).map(i => w(i, j))).distinct.size shouldBe 4
  }
}
