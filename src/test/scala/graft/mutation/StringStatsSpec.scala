package graft.mutation

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Truncated string bounds in the manifest (Iceberg truncate-transform
  * substance): ASCII-guarded lower/upper recording, sound pruning
  * through truncation, grammar-safe round-trips, compaction unions, and
  * rename remaps. */
class StringStatsSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def freshRoot(): String =
    graft.Scratch.dir("graft_sstat_spec") + "/t"

  private def df(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("truncStrBounds: shrink-only lower, incremented upper, ASCII guard") {
    VersionedTable.truncStrBounds("apple", "zebra") shouldBe
      Some(("apple", "zebra"))
    // long upper truncates to 16 and increments the last kept char, so it
    // still bounds every string sharing the 16-prefix
    val Some((lo, hi)) =
      VersionedTable.truncStrBounds("apple", "zebra_aaaaaaaaaaaaaaaZZ")
    lo shouldBe "apple"
    hi shouldBe "zebra_aaaaaaaaab"
    (hi > "zebra_aaaaaaaaaaaaaaaZZ") shouldBe true
    // long lower truncates (shrinking only keeps it a lower bound)
    VersionedTable.truncStrBounds("aaaaaaaaaaaaaaaaaaaa", "b")
      .get._1 shouldBe "aaaaaaaaaaaaaaaa"
    // non-ASCII bounds record nothing (Java vs UTF-8-byte order differ)
    VersionedTable.truncStrBounds("café", "zzz") shouldBe None
  }

  test("segment pruning on string bounds: only intersecting files open") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      df("alpha" -> 1L, "bravo" -> 2L), statCols = Seq("k"))
    VersionedTable.append(spark, root,
      df("mike" -> 3L, "november" -> 4L), statCols = Seq("k"))
    VersionedTable.append(spark, root,
      df("xray" -> 5L, "zulu" -> 6L), statCols = Seq("k"))
    VersionedTable.resolveSegmentsStr(spark, root, "k", "mike", "mike")
      .length shouldBe 1
    VersionedTable.resolveSegmentsStr(spark, root, "k", "a", "n")
      .length shouldBe 2
    VersionedTable.readPrunedStr(spark, root, "k", "mike", "mike")
      .select("v").collect().map(_.getLong(0)).toSet shouldBe Set(3L)
    VersionedTable.readPrunedStr(spark, root, "k", "b", "y")
      .select("v").collect().map(_.getLong(0)).toSet shouldBe
      Set(2L, 3L, 4L, 5L)
    // a disjoint probe opens nothing but still returns the right schema
    VersionedTable.readPrunedStr(spark, root, "k", "q", "r")
      .count() shouldBe 0L
  }

  test("truncated bounds never prune a qualifying long value") {
    val root = freshRoot()
    val long = "prefix_shared_16_and_then_some_tail"
    VersionedTable.create(spark, root, df(long -> 1L), statCols = Seq("k"))
    VersionedTable.append(spark, root, df("zzz" -> 2L), statCols = Seq("k"))
    // the probe value is ABOVE the truncated 16-char prefix but below the
    // incremented upper — pruning must keep the segment
    VersionedTable.readPrunedStr(spark, root, "k", long, long)
      .select("v").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }

  test("grammar-hostile values round-trip through the manifest") {
    val root = freshRoot()
    // tab, '=', ':' inside bounds would break a naive manifest line
    VersionedTable.create(spark, root,
      df("a=b:c\td" -> 1L, "e=f" -> 2L), statCols = Seq("k"))
    val seg = VersionedTable.segmentsOf(spark, root, 0L).head
    seg.sstats("k") shouldBe (("a=b:c\td", "e=f"))
    VersionedTable.readPrunedStr(spark, root, "k", "a", "f")
      .count() shouldBe 2L
  }

  test("compaction unions string bounds; rename remaps them") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df("bb" -> 1L), statCols = Seq("k"))
    VersionedTable.append(spark, root, df("mm" -> 2L), statCols = Seq("k"))
    VersionedTable.compactSmall(spark, root, smallBytes = 1L << 20)
    val seg = VersionedTable.segmentsOf(spark, root,
      VersionedTable.currentVersion(spark, root).get)
      .filterNot(s => s.isDelete || s.isPosDelete)
    seg should have length 1
    seg.head.sstats("k") shouldBe (("bb", "mm"))
    VersionedTable.renameColumn(spark, root, "k", "key")
    VersionedTable.resolveSegmentsStr(spark, root, "key", "mm", "mm")
      .length shouldBe 1
    VersionedTable.readPrunedStr(spark, root, "key", "mm", "zz")
      .select("v").collect().map(_.getLong(0)).toSet shouldBe Set(2L)
  }

  test("mixed stat columns: numeric and string stats coexist on one segment") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      df("kilo" -> 10L, "lima" -> 20L), statCols = Seq("k", "v"))
    val seg = VersionedTable.segmentsOf(spark, root, 0L).head
    seg.sstats("k") shouldBe (("kilo", "lima"))
    seg.mayIntersect("v", 15, 30) shouldBe true
    seg.mayIntersect("v", 25, 30) shouldBe false
    seg.mayIntersectStr("k", "a", "b") shouldBe false
  }
}
