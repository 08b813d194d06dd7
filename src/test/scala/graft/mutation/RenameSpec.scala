package graft.mutation

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Column rename as a metadata-only commit: the `#rename` chain maps old
  * PHYSICAL parquet names to current logical names per segment era, time
  * travel keeps snapshot-scoped schemas, and every scan path (read, MOR,
  * pruned read, compaction, incremental read) resolves across the
  * boundary. */
class RenameSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def freshRoot(): String =
    graft.Scratch.dir("graft_rename_spec") + "/t"

  private def kv(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("rename is metadata-only; head reads map old eras, time travel keeps old names") {
    val root = freshRoot()
    VersionedTable.create(spark, root, kv(1L -> 10L, 2L -> 20L),
      statCols = Seq("v")) shouldBe 0L
    VersionedTable.append(spark, root, kv(3L -> 30L),
      statCols = Seq("v")) shouldBe 1L
    val segsBefore = VersionedTable.segmentsOf(spark, root, 1L).map(_.name)
    VersionedTable.renameColumn(spark, root, "v", "val") shouldBe 2L
    // zero data movement: the same segment files, same count
    VersionedTable.segmentsOf(spark, root, 2L).map(_.name) should
      contain theSameElementsAs segsBefore
    // head schema carries the new name for ALL eras
    val head = VersionedTable.read(spark, root)
    head.columns.toSeq should contain theSameElementsAs Seq("id", "val")
    head.select(F.sum("val")).head.getLong(0) shouldBe 60L
    // post-rename appends use the new name and coexist with old eras
    VersionedTable.append(spark, root,
      kv(4L -> 40L).withColumnRenamed("v", "val"),
      statCols = Seq("val")) shouldBe 3L
    VersionedTable.read(spark, root).select(F.sum("val"))
      .head.getLong(0) shouldBe 100L
    // time travel: the pre-rename snapshot reads under its OWN schema
    val old = VersionedTable.read(spark, root, Some(1L))
    old.columns.toSeq should contain theSameElementsAs Seq("id", "v")
    old.select(F.sum("v")).head.getLong(0) shouldBe 60L
    // manifest stats were remapped, so pruning works on the NEW name
    VersionedTable.readPruned(spark, root, "val", 35.0, 45.0)
      .collect().map(_.getAs[Long]("id")).toSet shouldBe Set(4L)
  }

  test("MOR delete/upsert key on the renamed column across physical eras") {
    val root = freshRoot()
    VersionedTable.create(spark, root, kv(1L -> 10L, 2L -> 20L, 3L -> 30L))
    VersionedTable.renameColumn(spark, root, "id", "key")
    // delete keyed on the NEW name must remove a row stored under the OLD
    // physical name
    val (v, n) = VersionedTable.morDelete(spark, root, Seq("key"),
      _.where(F.col("key") === 2L))
    n shouldBe 1L
    VersionedTable.read(spark, root, Some(v))
      .collect().map(_.getAs[Long]("key")).toSet shouldBe Set(1L, 3L)
    // upsert mixes eras in one table: update key 1, insert key 9
    VersionedTable.morUpsert(spark, root,
      kv(1L -> 111L, 9L -> 99L).withColumnRenamed("id", "key"), Seq("key"))
    val rows = VersionedTable.read(spark, root)
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("v")).toMap
    rows shouldBe Map(1L -> 111L, 3L -> 30L, 9L -> 99L)
    // materialization rewrites affected segments under CURRENT names
    VersionedTable.morMaterialize(spark, root)
    VersionedTable.read(spark, root)
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("v"))
      .toMap shouldBe rows
  }

  test("compaction migrates old physical names; incremental reads map eras") {
    val root = freshRoot()
    VersionedTable.create(spark, root, kv(1L -> 10L))
    VersionedTable.append(spark, root, kv(2L -> 20L))
    VersionedTable.renameColumn(spark, root, "v", "metric") shouldBe 2L
    VersionedTable.append(spark, root,
      kv(3L -> 30L).withColumnRenamed("v", "metric")) shouldBe 3L
    // incremental read spanning the rename surfaces CURRENT names for all
    val inc = VersionedTable.incrementalRead(spark, root, 0L, 3L).get
    inc.columns.toSeq should contain theSameElementsAs Seq("id", "metric")
    inc.select(F.sum("metric")).head.getLong(0) shouldBe 50L
    // compaction reads across eras and writes ONE new-name segment
    val (cv, merged, _) =
      VersionedTable.compactSmall(spark, root, smallBytes = 1L << 30)
    merged shouldBe 3
    val headSeg = VersionedTable.segmentsOf(spark, root, cv)
    headSeg should have length 1
    // the compacted segment's PHYSICAL schema is already current: reading
    // its file raw (no chain) shows the new name
    spark.read.parquet(root + "/" + headSeg.head.name)
      .columns should contain("metric")
    VersionedTable.read(spark, root).select(F.sum("metric"))
      .head.getLong(0) shouldBe 60L
  }

  test("rename chain rejects ambiguity and absent/duplicate columns") {
    val root = freshRoot()
    VersionedTable.create(spark, root, kv(1L -> 10L))
    VersionedTable.renameColumn(spark, root, "v", "w")
    // retired physical name may not be reused while the chain maps it
    an[IllegalArgumentException] should be thrownBy
      VersionedTable.renameColumn(spark, root, "w", "v")
    an[IllegalArgumentException] should be thrownBy
      VersionedTable.renameColumn(spark, root, "nope", "x")
    an[IllegalArgumentException] should be thrownBy
      VersionedTable.renameColumn(spark, root, "id", "w")
    // chained renames compose: w -> u, old era maps v -> w -> u
    VersionedTable.renameColumn(spark, root, "w", "u")
    VersionedTable.read(spark, root).columns.toSeq should
      contain theSameElementsAs Seq("id", "u")
    VersionedTable.read(spark, root).select(F.sum("u"))
      .head.getLong(0) shouldBe 10L
  }
}
