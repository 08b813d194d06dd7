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

  test("driver trainer == distributed trainer across random corpora and k") {
    import spark.implicits._
    for (seed <- Seq(3, 17, 123)) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abcdef"
      val words = (0 until 400).map { _ =>
        (0 until 2 + rnd.nextInt(6))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val df = words.toDF("w")
      for (k <- Seq(1, 5, 12)) {
        val dist = Bpe.trainMerges(spark, df, "w", k)
          .collect().map(_.toString).toSeq
        val drv = Bpe.trainMergesDriver(spark, df, "w", k)
          .collect().map(_.toString).toSeq
        withClue(s"seed=$seed k=$k")(drv shouldBe dist)
      }
    }
  }

  test("driver trainer == distributed trainer on non-BMP corpora") {
    // supplementary characters (UTF-16 surrogate pairs) mixed with BMP
    // chars >= U+E000 — the exact region where Java's UTF-16 unit order
    // and a UTF-16 substring walk both diverge from the code-point
    // semantics of Spark/DuckDB. Exercises BOTH fixes: pair enumeration
    // by code point (a surrogate pair is ONE symbol) and the
    // codePointCompare argmax tie-break.
    import spark.implicits._
    val grin = new String(Character.toChars(0x1F600)) // U+1F600
    val dsx = new String(Character.toChars(0x1D54F)) // U+1D54F
    val rep = "\uFFFD" // BMP, > surrogates in UTF-16, < supplementary in UTF-8
    val pua = "\uE001"
    val rnd = new scala.util.Random(31)
    val sym = Vector("a", "b", grin, dsx, rep, pua)
    val words = (0 until 300).map { _ =>
      (0 until 2 + rnd.nextInt(5)).map(_ => sym(rnd.nextInt(sym.length))).mkString
    }
    val df = words.toDF("w")
    for (k <- Seq(1, 4, 10)) {
      val dist = Bpe.trainMerges(spark, df, "w", k)
        .collect().map(_.toString).toSeq
      val drv = Bpe.trainMergesDriver(spark, df, "w", k)
        .collect().map(_.toString).toSeq
      withClue(s"k=$k")(drv shouldBe dist)
    }
  }

  test("driver trainer handles k=64 with private-use-area placeholders") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val words = (0 until 1500).map { _ =>
      (0 until 3 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(10)).toChar).mkString
    }
    val got = Bpe.trainMergesDriver(spark, words.toDF("w"), "w", 64,
      placeholder = r => (0xE000 + r - 1).toChar)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    got.length shouldBe 64
    got.map(_._1).toSeq shouldBe (1L to 64L)
    // counts are non-increasing ONLY per identical symbol universe is not
    // guaranteed (a merge can create a new frequent pair), but every count
    // must be >= 1 and every merged pair exactly 2 symbols
    got.foreach { case (_, m, c) => m.length shouldBe 2; c should be >= 1L }
    // placeholders stay in the PUA, never colliding with corpus letters
    got.flatMap(_._2.toCharArray).filter(_ >= 0xE000).foreach { ch =>
      ch.toInt should be < (0xE000 + 64)
    }
  }

  test("in-memory incremental trainer == brute-force recount reference") {
    // property check of the inverted-index maintenance against a dumb
    // full-recount implementation of the same semantics
    def brute(vocab: Seq[(String, Long)], k: Int): Seq[(Long, String, Long)] = {
      var vs = vocab
      val out = Seq.newBuilder[(Long, String, Long)]
      var r = 1
      var dry = false
      while (r <= k && !dry) {
        val pc = scala.collection.mutable.HashMap.empty[String, Long]
        vs.foreach { case (w, c) =>
          (0 until w.length - 1).foreach { j =>
            val p = w.substring(j, j + 2)
            pc.update(p, pc.getOrElse(p, 0L) + c)
          }
        }
        if (pc.isEmpty) dry = true
        else {
          val (mp, cnt) = pc.toSeq.minBy { case (p, c) => (-c, p) }
          out += ((r.toLong, mp, cnt))
          vs = vs.map { case (w, c) => (w.replace(mp, r.toChar.toString), c) }
          r += 1
        }
      }
      out.result()
    }
    for (seed <- Seq(1, 2, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 120).map { _ =>
        ((0 until 2 + rnd.nextInt(7)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString,
          (1 + rnd.nextInt(9)).toLong)
      }.toArray
      val got = Bpe.trainInMemory(vocab, 10, _.toChar)
      withClue(s"seed=$seed")(got shouldBe brute(vocab.toSeq, 10))
    }
  }
}
