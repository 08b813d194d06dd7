package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** The exact-integer Lloyd trainer has two renderings — in-memory over the
  * collected bounded sample (the FAISS-style default) and the distributed
  * job loop for oversized train sets — plus a third in the DuckDB oracle's
  * unrolled CTEs. The first two are pinned bitwise-equal here on the same
  * inputs (the third is pinned by the llm_ann_* hash gates): identical
  * init order, identical (d, code) tie-breaks, identical floor(sum/n)
  * re-centering, identical empty-code fallback. */
class TrainCodebookSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def corpus(seed: Int, n: Int, dim: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(6, dim)(rnd.nextGaussian() * 4.0)
    (0 until n).map { id =>
      val c = centers(id % 6)
      (id.toLong, Array.tabulate(dim)(d =>
        math.floor((c(d) + rnd.nextGaussian()) * 1e3).toLong))
    }.toDF("vec_id", "qv").repartition(5)
  }

  private def flat(cbs: Seq[Array[Array[Array[Long]]]]): Seq[Seq[Seq[Seq[Long]]]] =
    cbs.map(_.toSeq.map(_.toSeq.map(_.toSeq)))

  test("in-memory and distributed Lloyd paths agree bitwise") {
    val df = corpus(11, 240, 32).cache()
    try {
      val specs = Seq((1, 4), (4, 8)) // coarse + PQ shapes, fused
      for (iters <- Seq(1, 3)) {
        val mem = Similarity.trainCodebooksExact(df, specs, iters)
        val dist = Similarity.trainCodebooksExact(df, specs, iters,
          maxDriverTrain = 0L) // force the distributed branch
        withClue(s"iters=$iters")(flat(dist) shouldBe flat(mem))
      }
    } finally { df.unpersist(); () }
  }

  test("trainMod restricts training to the modulo sample on both paths") {
    val df = corpus(23, 240, 32).cache()
    try {
      val sub = df.where(org.apache.spark.sql.functions.col("vec_id") % 3 === 0)
      val viaMod = Similarity.trainCodebooksExact(df, Seq((4, 8)), 2, trainMod = 3)
      val viaFilter = Similarity.trainCodebooksExact(sub, Seq((4, 8)), 2)
      flat(viaMod) shouldBe flat(viaFilter)
      val viaModDist = Similarity.trainCodebooksExact(df, Seq((4, 8)), 2,
        trainMod = 3, maxDriverTrain = 0L)
      flat(viaModDist) shouldBe flat(viaMod)
    } finally { df.unpersist(); () }
  }

  test("empty codes keep their previous centroid (both paths)") {
    import spark.implicits._
    // 3 tight points + ksub=4: the 4th init code (one of the 3 points,
    // duplicated never — here ksub > distinct data forces an empty cell
    // after assignment ties collapse onto the smaller code)
    val rows = Seq(
      (0L, Array(0L, 0L)), (1L, Array(1000L, 1000L)),
      (2L, Array(1001L, 1001L)), (3L, Array(1002L, 999L)))
    val df = rows.toDF("vec_id", "qv")
    val mem = Similarity.trainCodebooksExact(df, Seq((1, 4)), 3)
    val dist = Similarity.trainCodebooksExact(df, Seq((1, 4)), 3,
      maxDriverTrain = 0L)
    flat(dist) shouldBe flat(mem)
  }
}
