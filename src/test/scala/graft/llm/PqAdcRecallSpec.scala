package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Retrieval-QUALITY gate for the PQ asymmetric-distance search: the
  * oracle gate (llm_ann_pq_adc) pins exactness of codes/LUT/ADC/re-rank on
  * the fixed corpus, but a parameter regression — too few subspaces, a
  * shortlist smaller than k — could stay hash-green there while gutting
  * retrieval quality. This spec pins recall@10 against exact brute-force
  * lattice L2 on seeded clustered embeddings (the AnnRecallSpec corpus
  * model: mixture of Gaussians, the structure PQ codebooks compress well;
  * codebook entries are the first `ksub` vectors, which interleave one per
  * cluster by construction of the generator). */
class PqAdcRecallSpec extends AnyFunSuite with Matchers with SparkSuite {

  private val Dim = 32
  private val Clusters = 8
  private val PerCluster = 50
  private val K = 10

  private def quantized(seed: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(Clusters, Dim)(rnd.nextGaussian() * 5.0)
    val rows = (0 until Clusters * PerCluster).map { id =>
      val c = centers(id % Clusters)
      val qv = Array.tabulate(Dim)(d =>
        math.floor((c(d) + rnd.nextGaussian() * 0.8) * 1e3).toLong)
      (id.toLong, qv)
    }
    rows.toDF("vec_id", "qv").repartition(6)
  }

  private def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.L2SqExpression(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  private def exactTopK(q: DataFrame, queryPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("d"), col("vec_id"))
    q.join(broadcast(q.where(queryPred(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("qv").as("qq"))), usingColumns = Seq.empty,
      joinType = "cross") // broadcast NL over the 10-query side only
      .select(col("q_id"), col("vec_id"), l2sq(col("qv"), col("qq")).as("d"))
      .withColumn("r", row_number().over(w)).where(col("r") <= K)
  }

  private def recallAt(q: DataFrame, shortlist: Int): Double = {
    val pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _ % 40 === 0 // 10 queries across clusters
    val exact = exactTopK(q, pred)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Similarity.pqAdcTopK(q, pred, k = K,
      m = 4, ksub = Clusters, shortlist = shortlist)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    exact.keysIterator
      .map(k => approx.getOrElse(k, Set.empty).intersect(exact(k)).size.toDouble / exact(k).size)
      .sum / exact.size
  }

  // THE SHORTLIST SIZING RULE, pinned from both sides. Every vector of a
  // cluster takes the same 4 codes (its own cluster's centroid per
  // subspace), so ADC distance cannot rank WITHIN a cell — the shortlist
  // must exceed the within-cell candidate multiplicity (here the cluster
  // size, 50) for the exact re-rank to see the true neighbors. This is
  // exactly the nprobe/shortlist capacity rule production PQ systems tune,
  // demonstrated as a measurement rather than asserted as prose.
  for (seed <- Seq(7, 21, 99)) {
    test(s"shortlist > cell multiplicity ⇒ recall@$K >= 0.95 (seed $seed)") {
      val q = quantized(seed).cache()
      try {
        val rec = recallAt(q, shortlist = PerCluster + 10)
        info(f"recall@$K = $rec%.3f (shortlist ${PerCluster + 10})")
        rec should be >= 0.95
      } finally { q.unpersist(); () }
    }
  }

  test("negative control: a shortlist below the cell multiplicity degrades recall") {
    val q = quantized(7).cache()
    try {
      val starved = recallAt(q, shortlist = K) // 10 < cluster size 50
      info(f"recall@$K = $starved%.3f (shortlist $K)")
      // ADC ties within the cell make the starved shortlist arbitrary —
      // if this ever PASSES 0.9, the quantizer resolves within-cell
      // structure and the sizing rule documented above no longer binds
      starved should be < 0.9
    } finally { q.unpersist(); () }
  }

  // ---- TRAINED codebooks on an ID-SKEWED corpus (the round-10/11 flag) --

  /** 64-dim corpus of 16 Gaussian clusters with NON-UNIFORM sizes laid out
    * in CONTIGUOUS id blocks — cluster 0 owns ids 0..n0-1, and so on — and
    * cluster 0 is an EXACT-DUPLICATE group (one vector repeated). This is the realistic adversarial case for the legacy
    * "first ksub vectors" codebook: the head of a crawl-ordered id space
    * is dup-heavy, so all 16 codewords land on the SAME lattice point —
    * ADC distances carry zero signal and the shortlist degenerates to the
    * vec_id tie-break (i.e. cluster 0 itself). The hash-shuffle-init
    * Lloyd trainer must not care about id order at all. */
  private val SkewDim = 64
  private val SkewSizes = Array(150, 120, 100, 80, 60, 50, 40, 30, 25, 22,
    20, 19, 18, 17, 16, 15) // 782 vectors, 10:1 size skew; 6 clusters <= 20
  private def skewedQuantized(seed: Int): (DataFrame, Seq[Long]) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(SkewSizes.length, SkewDim)(rnd.nextGaussian() * 5.0)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]()
    val queryIds = scala.collection.mutable.ArrayBuffer[Long]()
    var id = 0L
    SkewSizes.zipWithIndex.foreach { case (n, c) =>
      queryIds += id + n / 2 // one mid-block query per cluster
      val sigma = if (c == 0) 0.0 else 0.8 // head block = exact dups
      (0 until n).foreach { _ =>
        rows += ((id, Array.tabulate(SkewDim)(d =>
          math.floor((centers(c)(d) + rnd.nextGaussian() * sigma) * 1e3).toLong)))
        id += 1
      }
    }
    (rows.toSeq.toDF("vec_id", "qv").repartition(6), queryIds.toSeq)
  }

  private def recallOf(approx: DataFrame, exact: Map[Long, Set[Long]]): Double = {
    val got = approx.select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    exact.keysIterator
      .map(k => got.getOrElse(k, Set.empty).intersect(exact(k)).size.toDouble / exact(k).size)
      .sum / exact.size
  }

  for (seed <- Seq(5, 42)) {
    test(s"trained codebooks (m=8, ksub=16): recall@$K >= 0.9 on the skewed corpus (seed $seed)") {
      val (q0, qids) = skewedQuantized(seed)
      val q = q0.cache()
      try {
        val pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
          _.isin(qids: _*)
        val exact = exactTopK(q, pred)
          .select("q_id", "vec_id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val shortlist = SkewSizes.max + 20
        val trained = recallOf(
          Similarity.pqAdcTopK(q, pred, k = K, m = 8, ksub = 16,
            shortlist = shortlist, trainIters = 3), exact)
        info(f"trained recall@$K = $trained%.3f (shortlist $shortlist)")
        trained should be >= 0.9
      } finally { q.unpersist(); () }
    }
  }

  test("trained codebooks keep recall where the untrained near-dup-head codebook collapses") {
    // The case the trainer exists for. All 16 untrained codewords come
    // from the near-duplicate head block, i.e. the SAME lattice point —
    // every corpus vector gets an identical code word per subspace, ADC
    // is constant, and the shortlist degenerates to the vec_id tie-break
    // (cluster 0 itself), so recall for every other cluster's query goes
    // to ~0 no matter the shortlist. Trained codewords (hash-shuffle
    // init + Lloyd) spread over the data regions and keep the true
    // cluster strictly first in ADC order, so a TIGHT shortlist (24 for
    // K=10) still achieves full recall on small-cluster queries.
    val (q0, qids) = skewedQuantized(5)
    val q = q0.cache()
    try {
      // queries from the 6 clusters of size <= 20 (< tight shortlist)
      val smallQids = qids.takeRight(6)
      val pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        _.isin(smallQids: _*)
      val exact = exactTopK(q, pred)
        .select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val tight = 24
      val trained = recallOf(
        Similarity.pqAdcTopK(q, pred, k = K, m = 8, ksub = 16,
          shortlist = tight, trainIters = 3), exact)
      val untrained = recallOf(
        Similarity.pqAdcTopK(q, pred, k = K, m = 8, ksub = 16,
          shortlist = tight), exact)
      info(f"tight-shortlist recall@$K: trained = $trained%.3f, untrained = $untrained%.3f")
      trained should be >= 0.9
      untrained should be < 0.7
      trained should be > untrained
    } finally { q.unpersist(); () }
  }

  test(s"trained IVF+PQ two-level index: recall@$K >= 0.9 on the skewed corpus") {
    val (q0, qids) = skewedQuantized(5)
    val q = q0.cache()
    try {
      val pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        _.isin(qids: _*)
      val exact = exactTopK(q, pred)
        .select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      // 8 trained cells over 16 clusters (~2 clusters/cell): probe wide
      // enough (4) that a query's own cell is never the one pruned, and
      // size the shortlist past the probed-cell multiplicity
      val trained = recallOf(
        Similarity.ivfPqTopK(q, pred, k = K, nSeeds = 8, nprobe = 4,
          m = 8, ksub = 16, shortlist = 2 * SkewSizes.max + 40,
          trainIters = 3), exact)
      info(f"trained ivfpq recall@$K = $trained%.3f")
      trained should be >= 0.9
    } finally { q.unpersist(); () }
  }
}
