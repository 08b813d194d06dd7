package graft.mutation

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Position deletes (Delta deletion-vector / Iceberg v2 position-delete
  * substance): delta-sized keyless deletes bound to (file, row-index),
  * applied scan-side, materialized by rewrites, retired by maintenance —
  * and NEVER able to resurrect onto re-inserted rows. */
class PositionDeleteSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def freshRoot(): String =
    graft.Scratch.dir("graft_pdel_spec") + "/t"

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.map(i => (i, i % 3)).toDF("id", "grp")
  }

  private def ids(root: String, v: Option[Long] = None): Set[Long] =
    VersionedTable.read(spark, root, v).select("id")
      .collect().map(_.getLong(0)).toSet

  private def segNames(root: String): Seq[String] =
    VersionedTable.segmentsOf(spark, root,
      VersionedTable.currentVersion(spark, root).get).map(_.name)

  test("posDelete removes rows with one delta write; history intact") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 10L: _*))
    val before = segNames(root)
    val (v, n) = VersionedTable.posDelete(spark, root,
      col("id") % 2 === 0)
    n shouldBe 5L
    v shouldBe 1L
    ids(root) shouldBe Set(1L, 3L, 5L, 7L, 9L)
    // prior snapshot unaffected
    ids(root, Some(0L)) shouldBe (1L to 10L).toSet
    // zero data segments rewritten: the old segment carries by reference,
    // the only new entry is the deletion vector
    val after = segNames(root)
    before.toSet.subsetOf(after.toSet) shouldBe true
    (after.toSet -- before.toSet).toSeq match {
      case Seq(one) => one should startWith("pdel_")
      case other    => fail(s"expected exactly one pdel segment, got $other")
    }
    // a second pass over the same predicate sees only live rows: no-op
    VersionedTable.posDelete(spark, root, col("id") % 2 === 0) shouldBe
      ((1L, 0L))
  }

  test("re-inserted rows never resurrect under an old deletion vector") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L, 2L, 3L))
    VersionedTable.posDelete(spark, root, col("id") === 2L)
    ids(root) shouldBe Set(1L, 3L)
    // re-insert id=2: NEW file, so the old position tuple cannot touch it
    VersionedTable.append(spark, root, df(2L))
    ids(root) shouldBe Set(1L, 2L, 3L)
  }

  test("pruned and point-lookup reads still apply deletion vectors") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 100L: _*),
      statCols = Seq("id"))
    VersionedTable.append(spark, root, df(101L to 200L: _*),
      statCols = Seq("id"))
    VersionedTable.posDelete(spark, root, col("id") === 50L || col("id") === 150L)
    VersionedTable.readPruned(spark, root, "id", 40, 60)
      .select("id").collect().map(_.getLong(0)).toSet shouldBe
      ((40L to 60L).toSet - 50L)
    VersionedTable.readPoint(spark, root, "id", 150L).count() shouldBe 0L
    VersionedTable.readPoint(spark, root, "id", 151L).count() shouldBe 1L
  }

  test("position and equality deletes compose on one table") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 10L: _*))
    VersionedTable.morDelete(spark, root, Seq("id"),
      v => v.where(col("id") <= 2))
    VersionedTable.posDelete(spark, root, col("id") >= 9)
    ids(root) shouldBe (3L to 8L).toSet
    // COW merge through the middle materializes both kinds for the
    // touched slice and keeps the survivors exact
    VersionedTable.mergeWhere(spark, root, "id", 0, 1000,
      d => d.where(col("id") =!= 5))
    ids(root) shouldBe Set(3L, 4L, 6L, 7L, 8L)
  }

  test("compaction folds deletion vectors into fresh files") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L, 2L))
    VersionedTable.append(spark, root, df(3L, 4L))
    VersionedTable.append(spark, root, df(5L, 6L))
    VersionedTable.posDelete(spark, root, col("id") === 3L)
    val (_, folded, _) = VersionedTable.compactSmall(spark, root,
      smallBytes = 1L << 20)
    folded should be >= 2
    ids(root) shouldBe Set(1L, 2L, 4L, 5L, 6L)
  }

  test("morMaterialize retires deletion vectors, content identical") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 10L: _*))
    VersionedTable.append(spark, root, df(11L to 20L: _*))
    VersionedTable.posDelete(spark, root, col("id") % 7 === 0)
    val expect = ids(root)
    val (_, rewritten, dropped) = VersionedTable.morMaterialize(spark, root)
    rewritten should be >= 1
    dropped shouldBe 1
    ids(root) shouldBe expect
    segNames(root).exists(_.startsWith("pdel_")) shouldBe false
  }

  test("changelogRows resolves position retractions to full rows") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 6L: _*))
    VersionedTable.posDelete(spark, root, col("id").isin(2L, 4L))
    val sets = VersionedTable.changelogRows(spark, root, 0L, 1L)
    sets should have length 1
    sets.head.deletedRows.get.select("id")
      .collect().map(_.getLong(0)).toSet shouldBe Set(2L, 4L)
    // a plain key-based fold cannot consume a position-delete commit
    an[IllegalArgumentException] should be thrownBy
      VersionedTable.applyChangelog(
        VersionedTable.read(spark, root, Some(0L)),
        VersionedTable.changelog(spark, root, 0L, 1L))
  }

  test("shallow clone carries deletion vectors by reference") {
    val w = graft.Scratch.dir("graft_pdel_clone")
    val (src, dst) = (s"$w/src", s"$w/dst")
    VersionedTable.create(spark, src, df(1L to 8L: _*))
    VersionedTable.posDelete(spark, src, col("id") > 6)
    VersionedTable.shallowClone(spark, src, dst)
    ids(dst) shouldBe (1L to 6L).toSet
    // clone evolves independently: a clone-side pos delete on external
    // (source-owned) files still applies, and the source never sees it
    VersionedTable.posDelete(spark, dst, col("id") === 1L)
    ids(dst) shouldBe (2L to 6L).toSet
    ids(src) shouldBe (1L to 6L).toSet
  }

  test("write volume is delta-sized: vector bytes << table bytes") {
    val root = freshRoot()
    import spark.implicits._
    VersionedTable.create(spark, root,
      (1L to 20000L).map(i => (i, s"payload_$i" * 8)).toDF("id", "s"))
    val f = new java.io.File(root)
    def bytes(p: java.io.File): Long =
      if (p.isFile) p.length
      else Option(p.listFiles()).getOrElse(Array.empty).map(bytes).sum
    val tableBytes = bytes(f)
    VersionedTable.posDelete(spark, root, col("id") <= 100L)
    val pdelDir = Option(f.listFiles()).get
      .find(_.getName.startsWith("pdel_")).get
    bytes(pdelDir).toDouble should be < tableBytes.toDouble * 0.2
    VersionedTable.read(spark, root).count() shouldBe 19900L
  }
}
