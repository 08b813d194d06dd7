package graft.mutation

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** importDir (Iceberg add_files / Delta CONVERT substance): by-reference
  * registration of existing parquet directories — zero copy, native
  * pruning, append-like delete scoping, vacuum safety. */
class ImportDirSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def work(): String = graft.Scratch.dir("graft_import_spec")

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.map(i => (i, s"k$i")).toDF("id", "name")
  }

  private def ids(root: String, v: Option[Long] = None): Set[Long] =
    VersionedTable.read(spark, root, v).select("id")
      .collect().map(_.getLong(0)).toSet

  test("import is zero-copy and reads as part of the snapshot") {
    val w = work()
    val root = s"$w/t"
    df(100L, 101L).write.parquet(s"$w/external")
    VersionedTable.create(spark, root, df(1L, 2L))
    val rootDirs = new java.io.File(root).listFiles().map(_.getName).toSet
    val srcFiles = new java.io.File(s"$w/external").listFiles()
      .map(f => f.getName -> f.lastModified()).toSet
    VersionedTable.importDir(spark, root, s"$w/external",
      statCols = Seq("id", "name")) shouldBe 1L
    // no data bytes copied: the only new entry under root is the manifest
    new java.io.File(root).listFiles().map(_.getName).toSet shouldBe rootDirs
    new java.io.File(s"$w/external").listFiles()
      .map(f => f.getName -> f.lastModified()).toSet shouldBe srcFiles
    ids(root) shouldBe Set(1L, 2L, 100L, 101L)
    // pre-import snapshot intact
    ids(root, Some(0L)) shouldBe Set(1L, 2L)
  }

  test("imported stats prune like native segments, numeric and string") {
    val w = work()
    val root = s"$w/t"
    df(500L, 600L).write.parquet(s"$w/ext")
    VersionedTable.create(spark, root, df(1L, 2L), statCols = Seq("id", "name"))
    VersionedTable.importDir(spark, root, s"$w/ext",
      statCols = Seq("id", "name"))
    VersionedTable.resolveSegments(spark, root, "id", 550, 700)
      .length shouldBe 1
    VersionedTable.resolveSegments(spark, root, "id", 0, 10)
      .length shouldBe 1
    VersionedTable.resolveSegmentsStr(spark, root, "name", "k5", "k7")
      .length shouldBe 1
    VersionedTable.readPruned(spark, root, "id", 550, 700)
      .select("id").collect().map(_.getLong(0)).toSet shouldBe Set(600L)
  }

  test("delete scoping: imports are NEW data to earlier deletes") {
    val w = work()
    val root = s"$w/t"
    df(7L, 8L).write.parquet(s"$w/ext")
    VersionedTable.create(spark, root, df(7L, 8L, 9L))
    // delete 7 and 8 BEFORE the import: the equality delete is scoped to
    // strictly older data, so the imported copies must survive it
    VersionedTable.morDelete(spark, root, Seq("id"),
      v => v.where(col("id") <= 8))
    ids(root) shouldBe Set(9L)
    VersionedTable.importDir(spark, root, s"$w/ext")
    ids(root) shouldBe Set(7L, 8L, 9L)
    // a delete AFTER the import applies to imported rows like any data
    VersionedTable.morDelete(spark, root, Seq("id"),
      v => v.where(col("id") === 7))
    ids(root) shouldBe Set(8L, 9L)
    // and position deletes bind to the external files just as well
    VersionedTable.posDelete(spark, root, col("id") === 8L)
    ids(root) shouldBe Set(9L)
  }

  test("vacuum and expiry never touch external files") {
    val w = work()
    val root = s"$w/t"
    df(40L).write.parquet(s"$w/ext")
    VersionedTable.create(spark, root, df(1L))
    VersionedTable.importDir(spark, root, s"$w/ext")
    VersionedTable.append(spark, root, df(2L))
    VersionedTable.expireSnapshots(spark, root, keep = 1)
    VersionedTable.removeOrphans(spark, root)
    spark.read.parquet(s"$w/ext").count() shouldBe 1L
    ids(root) shouldBe Set(1L, 2L, 40L)
  }

  test("a directory named like a delete segment is rejected") {
    val w = work()
    val root = s"$w/t"
    df(1L).write.parquet(s"$w/del_evil")
    VersionedTable.create(spark, root, df(2L))
    an[IllegalArgumentException] should be thrownBy
      VersionedTable.importDir(spark, root, s"$w/del_evil")
  }
}
