package graft.mutation

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** The footer-based stats path must agree with the scan it replaced —
  * manifest stats gate PRUNING, so a divergence here silently drops rows
  * from every readPruned consumer. Each case writes a parquet dir and
  * pins footerStats == scanStats (or a sound conservative None). */
class FooterStatsSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def scratch(tag: String): String =
    graft.Scratch.dir(s"graft_fstats_$tag") + "/d"

  private def both(path: String, cols: Seq[String]) = {
    val footer = VersionedTable.footerStats(spark, path, cols)
    val scan = VersionedTable.scanStats(spark, path, cols)
    (footer, scan)
  }

  test("long/int/string columns: footer equals scan exactly") {
    import spark.implicits._
    val path = scratch("basic")
    Seq((1L, 5, "apple"), (-7L, 9, "zebra"), (1000000007L, 0, "mango"))
      .toDF("l", "i", "s")
      .repartition(2).write.parquet(path)
    val (footer, scan) = both(path, Seq("l", "i", "s"))
    footer shouldBe defined
    footer.get shouldBe scan
    footer.get._1("l") shouldBe (Math.nextDown(-7.0), Math.nextUp(1000000007.0))
    footer.get._2("s") shouldBe ("apple", "zebra")
  }

  test("float/double columns bail: parquet footers hide NaN (PARQUET-1222)") {
    import spark.implicits._
    val path = scratch("nan")
    Seq(1.0, Double.NaN, 3.0).toDF("d").write.parquet(path)
    // the footer REALLY does hide the NaN — [1.0, 3.0] with no NaN trace —
    // which is exactly why doubles must take the scan path (no stat)
    VersionedTable.footerStats(spark, path, Seq("d")) shouldBe None
    VersionedTable.scanStats(spark, path, Seq("d"))._1.get("d") shouldBe None
  }

  test("all-null and empty segments record no stat in both paths") {
    import spark.implicits._
    val nullPath = scratch("nulls")
    Seq[Option[Long]](None, None).toDF("l").write.parquet(nullPath)
    val (f1, s1) = both(nullPath, Seq("l"))
    s1._1 shouldBe empty
    f1.foreach(_._1 shouldBe empty)

    val emptyPath = scratch("empty")
    Seq.empty[Long].toDF("l").write.parquet(emptyPath)
    val (f2, s2) = both(emptyPath, Seq("l"))
    s2._1 shouldBe empty
    f2.foreach(_._1 shouldBe empty)
  }

  test("non-ASCII string bounds record no sstat in both paths") {
    import spark.implicits._
    val path = scratch("nonascii")
    Seq("héllo", "zz").toDF("s").write.parquet(path)
    val (footer, scan) = both(path, Seq("s"))
    scan._2 shouldBe empty
    footer.foreach(_._2 shouldBe empty)
  }

  test("date and decimal columns bail to the scan, never a wrong footer stat") {
    import spark.implicits._
    val path = scratch("typed")
    Seq(("2024-01-01", BigDecimal("1.50")), ("2024-06-01", BigDecimal("2.25")))
      .toDF("ds", "dec")
      .select(F.col("ds").cast("date").as("dt"),
        F.col("dec").cast("decimal(10,2)").as("dec"))
      .write.parquet(path)
    VersionedTable.footerStats(spark, path, Seq("dt")) shouldBe None
    VersionedTable.footerStats(spark, path, Seq("dec")) shouldBe None
  }

  test("bound merge order is unsigned UTF-8 bytes, where Java compareTo disagrees") {
    // U+FF01 encodes EF BC 81; U+10000 encodes F0 90 80 80 — UTF-8 byte
    // order puts U+FF01 FIRST, while Java's UTF-16 code-unit compareTo
    // (surrogate D800 < FF01) puts it LAST. The per-file bound merge must
    // follow the bytes (parquet-mr's and UTF8String's order) so that a
    // future non-ASCII widening of truncStrBounds cannot make manifest
    // pruning unsound via a wrong-order merge.
    val (bmp, astral) = ("！", "𐀀")
    (bmp.compareTo(astral) > 0) shouldBe true // Java order: astral first
    VersionedTable.utf8Lt(bmp, astral) shouldBe true // byte order: bmp first
    VersionedTable.utf8Lt(astral, bmp) shouldBe false
    VersionedTable.utf8Lt("a", "ab") shouldBe true // prefix is smaller
    VersionedTable.utf8Lt("ab", "ab") shouldBe false
  }

  test("a corrupt footer degrades to the scan path instead of failing the commit") {
    import spark.implicits._
    val path = scratch("corrupt")
    Seq(1L, 2L).toDF("l").write.parquet(path)
    // plant a garbage file with a parquet name: ParquetFileReader throws
    // on it (whatever exception class parquet-mr picks), and footerStats
    // must answer None — the scan decides — never propagate
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "part-corrupt.parquet"),
      "PAR1 this is not really a parquet file".getBytes("UTF-8"))
    VersionedTable.footerStats(spark, path, Seq("l")) shouldBe None
  }

  test("end to end: a statted create prunes identically to the scan era") {
    import spark.implicits._
    val root = graft.Scratch.dir("graft_fstats_e2e") + "/t"
    VersionedTable.create(spark, root,
      (1L to 100L).toDF("id"), statCols = Seq("id"))
    VersionedTable.append(spark, root,
      (200L to 300L).toDF("id"), statCols = Seq("id"))
    VersionedTable.resolveSegments(spark, root, "id", 150, 180) shouldBe empty
    VersionedTable.resolveSegments(spark, root, "id", 50, 60) should have size 1
    VersionedTable.readPruned(spark, root, "id", 250, 260)
      .count() shouldBe 11
  }
}
