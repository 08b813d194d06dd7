package graft.mutation

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Optimistic-concurrency commit (A55): replaceIf/commitIf CAS semantics. */
class CommitIfSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def work(): String =
    Files.createTempDirectory("graft_occ_spec").toString + "/t"

  private def rows(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo to hi).map(i => (i.toLong, (i % 5).toLong)).toDF("k", "v")
  }

  test("stale replaceIf loses to an interleaved append; retry sees both") {
    val root = work()
    VersionedTable.create(spark, root, rows(1, 10))
    val base = VersionedTable.currentVersion(spark, root).get
    val stale = VersionedTable.read(spark, root, Some(base))
      .where(col("k") % 2 === 1)
    VersionedTable.append(spark, root, rows(11, 20))
    an[java.io.IOException] should be thrownBy
      VersionedTable.replaceIf(spark, root, stale, base)
    // lost update did NOT happen: the append's rows are still at head
    VersionedTable.read(spark, root).count() shouldBe 20
    // OCC retry against the new head carries both changes
    val head = VersionedTable.currentVersion(spark, root).get
    val v2 = VersionedTable.replaceIf(spark, root,
      VersionedTable.read(spark, root, Some(head)).where(col("k") % 2 === 1),
      head)
    v2 shouldBe 2L
    VersionedTable.read(spark, root).count() shouldBe 10 // odds of 1..20
    VersionedTable.read(spark, root, Some(1L)).count() shouldBe 20
  }

  test("commitIf at the true head behaves exactly like commit") {
    val root = work()
    VersionedTable.create(spark, root, rows(1, 5))
    val v = VersionedTable.replaceIf(spark, root,
      VersionedTable.read(spark, root).where(col("k") <= 3), 0L)
    v shouldBe 1L
    VersionedTable.read(spark, root).count() shouldBe 3
  }

  test("a failed CAS leaves no committed version behind") {
    val root = work()
    VersionedTable.create(spark, root, rows(1, 5))
    VersionedTable.append(spark, root, rows(6, 8))
    intercept[java.io.IOException] {
      VersionedTable.replaceIf(spark, root, rows(100, 101), 0L)
    }
    VersionedTable.currentVersion(spark, root) shouldBe Some(1L)
    VersionedTable.read(spark, root).count() shouldBe 8
  }
}
