package graft.mutation

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Snapshot tags (Iceberg named-reference substance): immutable
  * name→version pins that survive expiry with everything they
  * reference. */
class TagSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def freshRoot(): String =
    graft.Scratch.dir("graft_tag_spec") + "/t"

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  test("tag pins a version through expiry; deleteTag releases it") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L))         // v0
    VersionedTable.append(spark, root, df(2L))         // v1
    VersionedTable.replace(spark, root, df(9L))        // v2 (drops v0/v1 refs)
    VersionedTable.append(spark, root, df(10L))        // v3
    VersionedTable.tag(spark, root, "gold", 1L)
    VersionedTable.tags(spark, root) shouldBe Map("gold" -> 1L)
    // expiry keeps the window AND the tagged version's whole closure
    val (droppedN, _) = VersionedTable.expireSnapshots(spark, root, keep = 1)
    droppedN shouldBe 2 // v0 and v2; v1 is pinned, v3 is the window
    ids(VersionedTable.readTag(spark, root, "gold")) shouldBe Set(1L, 2L)
    ids(VersionedTable.read(spark, root)) shouldBe Set(9L, 10L)
    an[Exception] should be thrownBy
      VersionedTable.read(spark, root, Some(0L))
    // releasing the tag makes the version expirable again
    VersionedTable.deleteTag(spark, root, "gold") shouldBe true
    VersionedTable.expireSnapshots(spark, root, keep = 1)
    an[Exception] should be thrownBy
      VersionedTable.read(spark, root, Some(1L))
    ids(VersionedTable.read(spark, root)) shouldBe Set(9L, 10L)
  }

  test("tags are immutable and must bind an existing version") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L))
    VersionedTable.tag(spark, root, "r1", 0L)
    (the[java.io.IOException] thrownBy
      VersionedTable.tag(spark, root, "r1", 0L))
      .getMessage should include("immutable")
    an[Exception] should be thrownBy
      VersionedTable.tag(spark, root, "ghost", 7L)
    an[IllegalArgumentException] should be thrownBy
      VersionedTable.tag(spark, root, "bad/name", 0L)
    an[IllegalArgumentException] should be thrownBy
      VersionedTable.readTag(spark, root, "absent")
  }

  test("8 racing taggers for one name: exactly one wins, binding is consistent") {
    // the tag claim rides the same create-exclusive primitive as the
    // commit CAS; a real thread race is the only honest test of that
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L))          // v0
    (1 to 8).foreach(i => VersionedTable.append(spark, root, df(i + 1L)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence((1 to 8).map { i =>
          scala.concurrent.Future {
            barrier.await()
            try { VersionedTable.tag(spark, root, "release", i.toLong); Some(i) }
            catch { case _: java.io.IOException => None }
          }
        }), scala.concurrent.duration.Duration.Inf)
      val winners = results.flatten
      winners should have length 1
      // the binding is the winner's version, not a torn mix
      VersionedTable.tags(spark, root) shouldBe
        Map("release" -> winners.head.toLong)
    } finally pool.shutdown()
  }

  test("reference resolution is manifest-only: answers with every data byte gone") {
    // The a56/a61 scale claim — tag/version/segment resolution costs one
    // manifest read, never a data scan. Proof by destruction: wipe every
    // segment directory and every resolution API must still answer
    // identically from _log alone (a read of ROWS would now throw).
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L, 2L), statCols = Seq("id"))
    VersionedTable.append(spark, root, df(30L), statCols = Seq("id"))
    VersionedTable.tag(spark, root, "gold", 0L)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    val wiped = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName != "_log")
    wiped should not be empty
    wiped.foreach(rm)
    VersionedTable.currentVersion(spark, root) shouldBe Some(1L)
    VersionedTable.tags(spark, root) shouldBe Map("gold" -> 0L)
    VersionedTable.segmentsOf(spark, root, 1L) should have size 2
    VersionedTable.versionAsOf(spark, root, System.currentTimeMillis()) shouldBe 1L
    // stats pruning resolves from manifest stats, no file opened
    VersionedTable.resolveSegments(spark, root, "id", 25.0, 35.0) should have size 1
    VersionedTable.resolveSegments(spark, root, "id", 100.0, 200.0) shouldBe empty
  }

  test("a tag pins exactly its closure: shared segments survive, others go") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L))          // v0: seg A
    VersionedTable.append(spark, root, df(2L))          // v1: A + B
    VersionedTable.replace(spark, root, df(5L))         // v2: seg C only
    VersionedTable.tag(spark, root, "keepv1", 1L)
    VersionedTable.expireSnapshots(spark, root, keep = 1)
    // v1's segments (A, B) survive via the tag; v0's manifest is gone
    ids(VersionedTable.readTag(spark, root, "keepv1")) shouldBe Set(1L, 2L)
    ids(VersionedTable.read(spark, root)) shouldBe Set(5L)
  }
}
