package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class TextAnalysisSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).collect().head.get(0).asInstanceOf[T]
  }

  test("token count keeps empty trailing tokens (oracle parity shape)") {
    one[Int](TextAnalysis.tokenCount(col("text")), "a b c") shouldBe 3
    one[Int](TextAnalysis.tokenCount(col("text")), "a b c ") shouldBe 4
  }

  test("BPE-ish estimate adds punctuation and long-word fragments") {
    // 3 words + 1 comma + extra fragments for "extraordinarily" (15 chars → +2)
    one[Int](TextAnalysis.tokenEstimate(col("text")), "an extraordinarily long, word")
      .should(be >= 6)
    one[Int](TextAnalysis.tokenEstimate(col("text")), "hi") shouldBe 1
  }

  test("language-id markers: first match wins, unknown falls through") {
    one[String](TextAnalysis.langId(col("text")), "the cat sat") shouldBe "en"
    one[String](TextAnalysis.langId(col("text")), "was ist der sinn und zweck") shouldBe "de"
    one[String](TextAnalysis.langId(col("text")), "xyzzy qqq") shouldBe "unk"
  }

  test("quality score bounded in [0,1], rewards stopwords and length") {
    val textLen = org.apache.spark.sql.functions.length(col("text"))
    val short = one[Double](TextAnalysis.qualityScore(col("text"), textLen), "zz")
    val rich = one[Double](TextAnalysis.qualityScore(col("text"), textLen),
      "the quick brown fox jumps over the lazy dog and runs into the woods " * 8)
    short should be >= 0.0
    rich should be <= 1.0
    rich should be > short
  }

  test("prefix fingerprint: same first-n tokens collide, different ones don't") {
    import spark.implicits._
    val fp = TextAnalysis.prefixFingerprint(col("text"), 3)
    val vals = Seq("a b c d", "A B C zzz", "x y z d").toDF("text")
      .select(fp).collect().map(_.getLong(0))
    vals(0) shouldBe vals(1) // case-insensitive shared prefix
    vals(0) should not be vals(2)
  }

  test("winnowing: shared >= w+k-1 substring guarantees a shared fingerprint") {
    import spark.implicits._
    val shared = "GUARANTEED COMMON RUN" // 21 chars >= w + k - 1 = 11
    val rows = Seq(
      s"left context before $shared and unrelated tail one",
      s"completely different heads $shared with another ending",
      "no overlap with the others at all, different text entirely",
      "tiny") // < k chars → empty fingerprint set
      .toDF("text")
      .select(TextAnalysis.winnow(col("text"), k = 8, w = 4).as("fps"))
      .collect().map(_.getSeq[Long](0).toSet)
    (rows(0) & rows(1)) should not be empty  // the winnowing guarantee
    (rows(0) & rows(2)) shouldBe empty        // no shared 8-gram at all
    rows(3) shouldBe empty
    // deterministic: recomputation yields identical sets
    val again = Seq(s"left context before $shared and unrelated tail one").toDF("text")
      .select(TextAnalysis.winnow(col("text"), k = 8, w = 4)).head.getSeq[Long](0).toSet
    again shouldBe rows(0)
  }

  test("winnowing rolling-hash UDF is bit-identical to the restatable HOF form") {
    // The DuckDB oracle states the HOF arithmetic literally; the hot path
    // runs the O(n) rolling UDF — this parity over REAL corpus rows is what
    // licenses the swap.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val both = docs.select(
      TextAnalysis.winnow(col("text"), k = 8, w = 4).as("fast"),
      TextAnalysis.winnowHof(col("text"), 8, 4).as("ref"))
      .collect()
    both should not be empty
    both.foreach { r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1) }
  }

  test("repetition stats: hand-computed fractions, deterministic tie-break") {
    import spark.implicits._
    // "a b a b c": words 5, distinct 3 -> dup_word 1 - 3/5 = 0.4
    // 2-grams: [a b, b a, a b, b c] -> 4 total, 3 distinct -> dup 0.25
    // top gram "a b" x2, 3 chars, text 9 chars -> 2*3/9 = 0.666...
    val r = Seq("a b a b c").toDF("text")
      .select(TextAnalysis.repetitionStats(col("text")).as("r"))
      .select("r._1", "r._2", "r._3").head
    r.getDouble(0) shouldBe 0.4 +- 1e-12
    r.getDouble(1) shouldBe 0.25 +- 1e-12
    r.getDouble(2) shouldBe (2.0 * 3.0 / 9.0) +- 1e-12

    // tie on gram counts ("x y" and "y x" both once): lexicographically
    // least gram wins -> "x y" picked either way the map iterates
    val t = Seq("x y x").toDF("text")
      .select(TextAnalysis.repetitionStats(col("text")).as("r"))
      .select("r._3").head.getDouble(0)
    t shouldBe (1.0 * 3.0 / 5.0) +- 1e-12

    // under 2 words: null (gated upstream)
    Seq("solo").toDF("text")
      .select(TextAnalysis.repetitionStats(col("text")).as("r"))
      .head.isNullAt(0) shouldBe true
  }
}
