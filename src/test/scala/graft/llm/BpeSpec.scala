package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class BpeSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def train(words: Seq[String], k: Int): Seq[(Long, String, Long)] = {
    import spark.implicits._
    Bpe.trainMerges(spark, words.toDF("w"), "w", k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("hand-computable corpus: merges, counts, and early dry-out") {
    // "abab"x2 + "abc": ab appears 2+2+1=5 times, ba 2, bc 1.
    // r1 merges "ab"->X(=chr 1): words XX, XX, Xc.
    // r2 merges "XX" (cnt 2) -> chr(2), both collapse to length-1, dropped.
    // r3 merges "Xc" (cnt 1); nothing left -> rounds 4..6 never run.
    val x = 1.toChar.toString
    train(Seq("abab", "abab", "abc"), 6) shouldBe Seq(
      (1L, "ab", 5L),
      (2L, x + x, 2L),
      (3L, x + "c", 1L))
  }

  test("tie on count broken by pair ascending") {
    // "xy" and "yz" both appear once; "xy" < "yz" lexicographically
    val got = train(Seq("xy", "yz"), 1)
    got shouldBe Seq((1L, "xy", 1L))
  }

  test("duplicate words weight counts (vocab compression is invisible)") {
    val many = Seq.fill(40)("qr") ++ Seq("rs")
    train(many, 1) shouldBe Seq((1L, "qr", 40L))
  }

  test("words shorter than two symbols contribute nothing") {
    train(Seq("a", "b", ""), 3) shouldBe empty
  }

  test("encode applies merges in training order, keeps sub-2-char words") {
    import spark.implicits._
    val corpus = Seq("abab", "abab", "abc", "a")
    val merges = Bpe.trainMerges(spark, corpus.toDF("w"), "w", 6)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val enc = Bpe.encode(corpus.toDF("w"), "w", merges)
      .collect().map(_.getString(0)).toSeq
    // r1 ab->chr(1); r2 chr(1)chr(1)->chr(2); r3 chr(1)c->chr(3)
    enc shouldBe Seq(
      2.toChar.toString, 2.toChar.toString, 3.toChar.toString, "a")
  }

  test("same result on any partitioning") {
    import spark.implicits._
    val words = (0 until 300).map(i => s"w${i % 7}x${i % 3}")
    val df1 = words.toDF("w").repartition(1)
    val df7 = words.toDF("w").repartition(7)
    Bpe.trainMerges(spark, df1, "w", 4).collect().map(_.toString) shouldBe
      Bpe.trainMerges(spark, df7, "w", 4).collect().map(_.toString)
  }
}
