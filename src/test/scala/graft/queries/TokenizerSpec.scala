package graft.queries

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSuite, Tables}

/** Independent in-process re-implementations of the tokenizer operators
  * (plain Scala collections, no Spark, no SQL) — a third engine besides
  * Spark and the DuckDB oracle. Exact equality is required because both
  * paths quantize to BIGINT micro-nats before any comparison. */
class TokenizerSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def texts(): Seq[String] =
    Tables.documents(spark, sfDir).select("text").collect().map(_.getString(0)).toSeq

  test("unigram Viterbi: linear DP equals brute-force segmentation enumeration") {
    val words = texts().flatMap(_.split(" ", -1)).filter(_.nonEmpty)
    val wf = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // piece counts: all substrings of length 1..3, weighted by word freq
    val pc = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- wf; i <- 1 to w.length; l <- 1 to math.min(3, i))
      pc.updateWith(w.substring(i - l, i)) { v => Some(v.getOrElse(0L) + f) }
    val tot = pc.values.sum
    val vocab = pc.collect {
      case (p, c) if c >= 5 || p.length == 1 =>
        p -> math.floor(-math.log(c.toDouble / tot.toDouble) * 1e6).toLong
    }.toMap
    val sel = wf.filter(_._1.length <= 12).toSeq
      .sortBy { case (w, f) => (-f, w) }.take(200).toMap
    // brute force: enumerate every composition into pieces of length 1..3
    def allCosts(w: String, pos: Int): Seq[Long] =
      if (pos == w.length) Seq(0L)
      else for {
        l <- 1 to math.min(3, w.length - pos)
        c <- vocab.get(w.substring(pos, pos + l)).toSeq
        rest <- allCosts(w, pos + l)
      } yield c + rest
    val expected = sel.map { case (w, _) => w -> allCosts(w, 0).min }
    val got = TokenizerQueries.unigramViterbi.build(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    got.keySet shouldBe expected.keySet
    for ((w, c) <- expected) withClue(w) { got(w) shouldBe c }
  }

  test("Kneser-Ney: scores match an independent count-based computation") {
    val bigrams = texts().map(_.split(" ", -1)).filter(_.length >= 2)
      .flatMap(ws => ws.init.zip(ws.tail))
    val cab = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca = cab.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1pA = cab.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val ncB = cab.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val npairs = cab.size.toLong
    def kn(w1: String, w2: String): Long = {
      val p = (cab((w1, w2)).toDouble - 0.75) / ca(w1).toDouble +
        (0.75 * n1pA(w1).toDouble / ca(w1).toDouble) *
          (ncB(w2).toDouble / npairs.toDouble)
      math.floor(math.log(p) * 1e6).toLong
    }
    val rows = TokenizerQueries.kneserNey.build(spark, sfDir).collect()
    rows.length shouldBe math.min(100, npairs)
    for (r <- rows) withClue(s"${r.getString(0)} ${r.getString(1)}") {
      r.getLong(3) shouldBe kn(r.getString(0), r.getString(1))
      r.getLong(3) should be < 0L // probabilities < 1
    }
  }

  test("Kneser-Ney: conditionals normalize — sum over the vocab is exactly 1") {
    val bigrams = texts().map(_.split(" ", -1)).filter(_.length >= 2)
      .flatMap(ws => ws.init.zip(ws.tail))
    val cab = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca = cab.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1pA = cab.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val ncB = cab.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val npairs = cab.size.toLong
    val vocabW2 = ncB.keySet
    for (w1 <- ca.keys) {
      val s = vocabW2.toSeq.map { w2 =>
        val disc = cab.get((w1, w2)).map(c => (c - 0.75) / ca(w1)).getOrElse(0.0)
        disc + (0.75 * n1pA(w1) / ca(w1)) * (ncB(w2).toDouble / npairs)
      }.sum
      s shouldBe 1.0 +- 1e-9
    }
  }
}
