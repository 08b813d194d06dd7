package graft.mutation

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Randomized-layout invariants of the manifest-stats machinery: for ANY
  * segmentation of the data and ANY probe interval, a pruned read must
  * equal the full read plus the predicate, and a stat-scoped COW merge
  * must equal the same transform applied to the whole table — i.e. data
  * skipping and merge scoping are pure OPTIMIZATIONS, never semantics.
  * Seeded RNG: failures reproduce. */
class VersionedTablePropertySpec extends AnyFunSuite with Matchers with SparkSuite {

  private def freshRoot(): String =
    graft.Scratch.dir("graft_vtab_prop") + "/t"

  test("readPruned == full read + predicate, for random layouts and probes") {
    import spark.implicits._
    val rnd = new scala.util.Random(4177)
    for (trial <- 1 to 5) {
      val root = freshRoot()
      // random number of segments with random (possibly overlapping,
      // possibly statless) id ranges
      val nSegs = 2 + rnd.nextInt(5)
      val ranges = Seq.fill(nSegs) {
        val lo = rnd.nextInt(100).toLong
        (lo, lo + 1 + rnd.nextInt(60))
      }
      ranges.zipWithIndex.foreach { case ((lo, hi), i) =>
        val df = (lo to hi).toDF("id")
        val stats = if (rnd.nextBoolean()) Seq("id") else Nil // some statless
        if (i == 0) VersionedTable.create(spark, root, df, statCols = stats)
        else VersionedTable.append(spark, root, df, statCols = stats)
        ()
      }
      val all = VersionedTable.read(spark, root)
        .collect().map(_.getLong(0)).sorted
      for (_ <- 1 to 4) {
        val a = rnd.nextInt(180).toLong - 10
        val b = a + rnd.nextInt(80)
        val pruned = VersionedTable.readPruned(spark, root, "id", a.toDouble,
          b.toDouble).collect().map(_.getLong(0)).sorted
        withClue(s"trial=$trial probe=[$a,$b] layout=$ranges: ") {
          pruned.toSeq shouldBe all.filter(v => v >= a && v <= b).toSeq
        }
      }
    }
  }

  test("mergeWhere == whole-table transform, for random layouts and intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(9087)
    for (trial <- 1 to 5) {
      val root = freshRoot()
      val nSegs = 2 + rnd.nextInt(4)
      val ranges = Seq.fill(nSegs) {
        val lo = rnd.nextInt(80).toLong
        (lo, lo + 1 + rnd.nextInt(50))
      }
      ranges.zipWithIndex.foreach { case ((lo, hi), i) =>
        val df = (lo to hi).toDF("id")
        if (i == 0) VersionedTable.create(spark, root, df, statCols = Seq("id"))
        else VersionedTable.append(spark, root, df, statCols = Seq("id"))
        ()
      }
      val before = VersionedTable.read(spark, root)
        .collect().map(_.getLong(0)).sorted.toSeq
      val a = rnd.nextInt(100).toLong
      val b = a + rnd.nextInt(60)
      val mod = 2 + rnd.nextInt(3)
      // the transform deletes a residue class WITHIN the interval; rows the
      // transform sees but does not target must round-trip unchanged
      val del = (v: Long) => v >= a && v <= b && v % mod == 0
      VersionedTable.mergeWhere(spark, root, "id", a.toDouble, b.toDouble,
        df => df.where(!(F.col("id") >= a && F.col("id") <= b &&
          F.col("id") % mod === 0)), statCols = Seq("id"))
      val after = VersionedTable.read(spark, root)
        .collect().map(_.getLong(0)).sorted.toSeq
      withClue(s"trial=$trial [$a,$b] mod=$mod layout=$ranges: ") {
        after shouldBe before.filterNot(del)
      }
      // the untouched snapshot is still the untouched data
      VersionedTable.read(spark, root, Some((nSegs - 1).toLong))
        .collect().map(_.getLong(0)).sorted.toSeq shouldBe before
    }
  }
}
