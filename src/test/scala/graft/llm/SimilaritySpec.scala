package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** ANN over the driver's embeddings table: brute-force is the exact
  * baseline; LSH must be bucketed (no crossJoin) and recall the planted /
  * true neighbors. */
class SimilaritySpec extends AnyFunSuite with Matchers with SparkSuite {

  private lazy val embeddings =
    spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("cosine expression matches a local computation") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f, 0.0f), Array(0.6f, 0.8f, 0.0f))).toDF("a", "b")
    df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0) shouldBe 0.6 +- 1e-6
  }

  test("native cosine expression is bit-identical to the UDF reference") {
    // The oracle matches (llm_ann_brute vs DuckDB list_cosine_similarity)
    // were established on the UDF's strict left fold; the codegen'd
    // expression must reproduce it exactly — on real embeddings and on the
    // degenerate inputs (null / empty / length mismatch → NULL, not 0.0).
    import spark.implicits._
    val q = embeddings.where(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val both = embeddings.crossJoin(q).limit(200)
      .select(
        Similarity.cosine(col("embedding"), col("q_emb")).as("native"),
        Similarity.cosineUdfRef(col("embedding"), col("q_emb")).as("ref"))
      .collect()
    both should not be empty
    both.foreach { r => r.getDouble(0) shouldBe r.getDouble(1) } // exact ==

    val edge = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)), // length mismatch
      (Array.empty[Float], Array.empty[Float]),      // empty
      (null.asInstanceOf[Array[Float]], Array(1.0f)) // null side
    ).toDF("a", "b").select(Similarity.cosine(col("a"), col("b")))
    edge.collect().foreach(r => r.isNullAt(0) shouldBe true)
    Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")))
      .head.getDouble(0) shouldBe 0.0 // zero norm → 0.0, not NULL
  }

  test("brute-force top-k agrees with a local exact computation") {
    val queries = embeddings.where(col("vec_id") < 3)
    val got = Similarity.bruteForceTopK(embeddings, queries, k = 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank")))

    // local recompute
    val local = embeddings.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for (q <- 0L until 3L) {
      val expectTop = local.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(local(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5)
      val gotTop = got.filter(_._1 == q).sortBy(_._4).map(t => (t._2, t._3))
      gotTop.map(_._1) shouldBe expectTop.map(_._1)
      gotTop.zip(expectTop).foreach { case ((_, g), (_, e)) => g shouldBe e +- 1e-9 }
    }
  }

  test("LSH top-k: bucketed plan, decent recall of the exact top-5") {
    val queries = embeddings.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(embeddings, queries, k = 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Random gaussian corpus = hardest case (true neighbors only ~0.4
    // cosine): use the low-bits/many-tables end of the trade-off.
    val approx = Similarity.lshTopK(embeddings, queries, k = 5, tables = 16, bits = 4)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    recall should be >= 0.6

    val plan = Similarity.lshTopK(embeddings, queries, k = 5)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
  }

  test("IVF top-k: planted scaled copy guaranteed found, cell-join plan") {
    import spark.implicits._
    // ×2 copy of vec 7: normalizes bit-identically, so it must share vec 7's
    // coarse cell regardless of where k-means converged.
    val dup = embeddings.where(col("vec_id") === 7)
      .select(lit(9999L).as("vec_id"),
        transform(col("embedding"), x => (x * 2.0).cast("float")).as("embedding"))
    val corpus = embeddings.select("vec_id", "embedding").unionByName(dup)
    val queries = embeddings.where(col("vec_id") === 7)
    val df = Similarity.ivfTopK(corpus, queries, k = 3, nlist = 16, nprobe = 4)
    val top = df.collect().sortBy(_.getAs[Int]("rank"))
    top.head.getAs[Long]("vec_id") shouldBe 9999L
    top.head.getAs[Double]("cosine") shouldBe 1.0 +- 1e-9

    df.queryExecution.executedPlan.toString should not include "CartesianProduct"
  }

  test("IVF top-k: decent recall of the exact top-5 on natural neighbors") {
    // The planted-copy oracle proves structural recall only (exact/scaled
    // copies share a cell by construction); this pins recall on NATURAL
    // moderate-cosine neighbors, the regime 100 TB corpora actually live in.
    val queries = embeddings.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(embeddings, queries, k = 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(embeddings, queries, k = 5, nlist = 8, nprobe = 4)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    recall should be >= 0.6
  }

  test("IVF training set is capped at a bounded deterministic sample") {
    // 20-row corpus with a 10-row training cap: the quantizer must still fit
    // (structural argument: planted copies land with their originals no
    // matter where the sampled k-means converged) and the result stays a
    // valid top-k.
    val corpus = embeddings.where(col("vec_id") < 20)
    val queries = embeddings.where(col("vec_id") < 2)
    val df = Similarity.ivfTopK(corpus, queries, k = 3, nlist = 4, nprobe = 4,
      maxTrainVectors = 10)
    val rows = df.collect()
    rows.map(_.getAs[Long]("q_id")).distinct.sorted shouldBe Array(0L, 1L)
    rows.foreach(_.getAs[Int]("rank") should be <= 3)
  }

  test("IVF probes a strict subset of the corpus (sub-linear candidates)") {
    val queries = embeddings.where(col("vec_id") < 10)
    val candidates = Similarity.ivfTopK(embeddings, queries, k = 500,
      nlist = 16, nprobe = 4).count()
    // 10 queries × 500 corpus = 5000 exhaustive pairs; probing 4/16 cells
    // must stay well under that (cells are uneven, allow 2× headroom).
    candidates.toDouble should be < 5000.0 * 4.0 / 16.0 * 2.0
  }

  test("embedding near-dup finds a planted duplicate vector via buckets only") {
    import spark.implicits._
    val dup = embeddings.where(col("vec_id") === 7)
      .select(lit(9999L).as("vec_id"), col("embedding"), col("label"))
    val corpus = embeddings.unionByName(dup)
    val pairs = Similarity.embeddingNearDup(corpus, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((7L, 9999L))
  }

  test("semanticDedup: groups keep their lowest id; naturals survive") {
    import org.apache.spark.sql.functions._
    // Plant a 3-member group on vec_id 6 (x2 at +100, x4 at +200): only the
    // original survives; every natural vector is far below the threshold.
    val copies = embeddings.where(col("vec_id") === 6)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => (x * 2.0).cast("float")).as("embedding"))
      .unionByName(embeddings.where(col("vec_id") === 6)
        .select((col("vec_id") + 200000).as("vec_id"),
          transform(col("embedding"), x => (x * 4.0).cast("float")).as("embedding")))
    val corpus = embeddings.select("vec_id", "embedding").unionByName(copies)
    val kept = Similarity.semanticDedup(corpus, threshold = 0.95, nlist = 8)
    val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    keptIds should contain(6L)
    keptIds.contains(100006L) shouldBe false
    keptIds.contains(200006L) shouldBe false
    keptIds.size.toLong shouldBe corpus.count() - 2
    kept.queryExecution.executedPlan.toString.contains("CartesianProduct") shouldBe false
  }
}
