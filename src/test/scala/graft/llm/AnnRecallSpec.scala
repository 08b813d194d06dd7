package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Retrieval-QUALITY gate for the approximate ANN paths: the oracle gates
  * (llm_ann_ivf / llm_ann_lsh) pin determinism on the fixed driver corpus,
  * but a parameter regression — too few probes, too many hash bits — could
  * stay hash-green on that fixture while gutting recall on anything else.
  * This spec pins recall@10 >= 0.9 against the exact brute-force baseline
  * on seeded random clustered embeddings across three seeds.
  *
  * Corpus model: a mixture of Gaussians (8 centers, cluster spread well
  * below center spread) — the shape real embedding spaces have and the one
  * IVF's coarse quantizer is designed for. Uniform-random vectors would be
  * the degenerate no-structure case where NO sublinear index can beat a
  * scan; a gate there would only measure luck. */
class AnnRecallSpec extends AnyFunSuite with Matchers with SparkSuite {

  private val Dim = 32
  private val Clusters = 8
  private val PerCluster = 50
  private val K = 10

  /** Seeded clustered corpus: vec_id, embedding (array<float>). */
  private def corpus(seed: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(Clusters, Dim)(rnd.nextGaussian() * 5.0)
    val rows = (0 until Clusters * PerCluster).map { id =>
      val c = centers(id % Clusters)
      val emb = Array.tabulate(Dim)(d => (c(d) + rnd.nextGaussian() * 0.8).toFloat)
      (id.toLong, emb)
    }
    rows.toDF("vec_id", "embedding").repartition(6)
  }

  /** recall@K of `approx` against `exact`, averaged over queries. */
  private def recall(exact: DataFrame, approx: DataFrame): Double = {
    def sets(df: DataFrame): Map[Long, Set[Long]] = df
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val e = sets(exact)
    val a = sets(approx)
    // keysIterator, not keys: mapping a Set would collapse equal recalls
    e.keysIterator
      .map(q => a.getOrElse(q, Set.empty).intersect(e(q)).size.toDouble / e(q).size)
      .sum / e.size
  }

  for (seed <- Seq(7, 21, 99)) {
    test(s"IVF and LSH recall@$K >= 0.9 vs brute force (seed $seed)") {
      val c = corpus(seed).cache()
      try {
        val queries = c.where(col("vec_id") % 40 === 0) // 10 queries, all clusters
        val exact = Similarity.bruteForceTopK(c, queries, K)
        val ivf = Similarity.ivfTopK(c, queries, K, nlist = Clusters, nprobe = 4)
        val lsh = Similarity.lshTopK(c, queries, K, tables = 8, bits = 6)
        val rIvf = recall(exact, ivf)
        val rLsh = recall(exact, lsh)
        withClue(s"seed $seed IVF recall $rIvf: ")(rIvf should be >= 0.9)
        withClue(s"seed $seed LSH recall $rLsh: ")(rLsh should be >= 0.9)
      } finally c.unpersist()
    }
  }
}
