package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** The collation property gate: every DRIVER-SIDE string comparison that
  * can cross an oracle hash must order like Spark's UTF8String and
  * DuckDB — UTF-8 bytes, i.e. code points — not Java's UTF-16
  * `compareTo`, which sorts U+E000..U+FFFF after supplementary
  * characters. Round 11's BPE argmax bug was one instance of the class;
  * this suite pins the shared comparator and feeds non-BMP strings
  * through every swept path (BPE argmax is pinned in BpeSpec). */
class CollationSpec extends AnyFunSuite with Matchers with SparkSuite {

  private val grin = new String(Character.toChars(0x1F600)) // U+1F600
  private val dsx = new String(Character.toChars(0x1D54F)) // U+1D54F
  private val rep = "\uFFFD" // BMP above the surrogate range
  private val pua = "\uE001"

  test("Collation.codePointCompare == unsigned UTF-8 byte order (property)") {
    val rnd = new scala.util.Random(7)
    val pool = Vector("a", "z", "0", rep, pua, grin, dsx, "\u00E9", "\u4E2D")
    def randStr() = (0 until rnd.nextInt(5)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    def utf8Compare(a: String, b: String): Int = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      var i = 0
      while (i < x.length && i < y.length) {
        val c = Integer.compare(x(i) & 0xFF, y(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      Integer.compare(x.length, y.length)
    }
    (0 until 2000).foreach { _ =>
      val a = randStr(); val b = randStr()
      withClue(s"'$a' vs '$b'") {
        Integer.signum(Collation.codePointCompare(a, b)) shouldBe
          Integer.signum(utf8Compare(a, b))
      }
    }
    // and Java's compareTo genuinely diverges on the documented region —
    // the property above would be vacuous otherwise
    Collation.codePointCompare(rep, grin) should be < 0
    rep.compareTo(grin) should be > 0
  }

  test("driver ordering matches Spark's ORDER BY on non-BMP strings") {
    import spark.implicits._
    val vals = Seq("b", grin, rep, pua, dsx + "x", "a" + grin, "a" + rep, "")
    val sparkOrder = vals.toDF("s").orderBy("s").collect().map(_.getString(0)).toSeq
    vals.sorted(Collation.ordering) shouldBe sparkOrder
  }

  test("repetition top-gram tie-break follows engine collation (score-visible)") {
    // tokens: [x, �zz, x, <grin>] → 2-grams each counted once; the
    // UTF-16 vs UTF-8 divergent contenders are "x �zz" (5 cp) and
    // "x <grin>" (3 cp) — the winner's LENGTH feeds the char-fraction
    // metric, so a wrong tie-break is a wrong NUMBER, not just a wrong
    // label. Code-point order must pick "x �zz" (UTF-16 picks the
    // 3-cp gram: 0xFFFD sorts above the lead surrogate 0xD83D).
    val text = s"x ${rep}zz x $grin"
    val ncp = text.codePointCount(0, text.length) // 9
    val Some((_, _, topFrac)) = graft.llm.TextAnalysis.repetitionMetrics(text)
    topFrac shouldBe (5.0 / ncp) +- 1e-12
  }

  test("greedy subword encode walks code points, not UTF-16 units") {
    // vocab holds the 2-code-point piece "<grin>a" plus the single chars.
    // A UTF-16 walk would try substring(0, 2) = "<grin>" (one code point,
    // two units), find it in vocab as a CHAR piece, and emit 1-cp pieces —
    // the code-point walk must match the longest piece "<grin>a" first.
    val vocab = Set(grin + "a", grin, "a", "b")
    graft.queries.TokenizerQueries.greedyEncode(vocab, grin + "ab") shouldBe
      Seq(grin + "a", "b")
    // end-of-word shorter than the probe length never matches a longer
    // piece by accident
    graft.queries.TokenizerQueries.greedyEncode(vocab, grin) shouldBe Seq(grin)
    // and a supplementary char NOT followed by a match stays whole
    graft.queries.TokenizerQueries.greedyEncode(vocab, grin + "b") shouldBe
      Seq(grin, "b")
  }

  test("partition-value processing order follows engine collation") {
    val vals = Seq(grin, rep, "2024-01-01", pua, "a")
    vals.sorted(Collation.ordering) shouldBe
      Seq("2024-01-01", "a", pua, rep, grin)
  }
}
