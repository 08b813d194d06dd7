package graft.mutation

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** REAL concurrent writers against the CAS commit protocol: threads race
  * appends/maintenance with the documented OCC retry loop; the invariant
  * is zero lost updates — every writer's rows land exactly once. */
class ConcurrentCommitSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def work(): String =
    Files.createTempDirectory("graft_race").toString + "/t"

  private def rows(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo to hi).map(i => (i.toLong, (i % 5).toLong)).toDF("k", "v")
  }

  /** The OCC loop a correct client runs: ops re-read the head on each
    * call, so retry == call again. */
  private def retrying[A](maxAttempts: Int = 60)(op: => A): A = {
    var last: Throwable = null
    var i = 0
    while (i < maxAttempts) {
      try return op
      catch {
        case e: java.io.IOException if e.getMessage.contains("lost the race") =>
          last = e; i += 1
      }
    }
    throw new IllegalStateException(s"gave up after $maxAttempts attempts", last)
  }

  test("8 racing appenders: no lost updates, one version per append") {
    val root = work()
    VersionedTable.create(spark, root, rows(0, 9))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val writers = (1 to 8).map { w =>
        Future(retrying() {
          VersionedTable.append(spark, root, rows(w * 100, w * 100 + 9))
        })
      }
      Await.result(Future.sequence(writers), Duration.Inf)
    } finally pool.shutdown()
    // every writer's rows landed exactly once
    val df = VersionedTable.read(spark, root)
    df.count() shouldBe 90
    df.select(countDistinct("k")).head().getLong(0) shouldBe 90
    VersionedTable.currentVersion(spark, root) shouldBe Some(8L)
    // and every intermediate version is a consistent superset chain
    (0L to 8L).map(v =>
      VersionedTable.read(spark, root, Some(v)).count()) shouldBe
      (0 to 8).map(i => 10L + i * 10)
  }

  test("compaction racing appenders never eats an append") {
    val root = work()
    VersionedTable.create(spark, root, rows(0, 9))
    (1 to 3).foreach(i =>
      VersionedTable.append(spark, root, rows(i * 10, i * 10 + 9)))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val appenders = (4 to 6).map { w =>
        Future(retrying() {
          VersionedTable.append(spark, root, rows(w * 10, w * 10 + 9))
        })
      }
      val compactor = Future(retrying() {
        VersionedTable.compactSmall(spark, root, smallBytes = Long.MaxValue)
      })
      Await.result(Future.sequence(appenders :+ compactor.map(_ => 0L)),
        Duration.Inf)
    } finally pool.shutdown()
    val df = VersionedTable.read(spark, root)
    df.count() shouldBe 70
    df.select(countDistinct("k")).head().getLong(0) shouldBe 70
  }
}
