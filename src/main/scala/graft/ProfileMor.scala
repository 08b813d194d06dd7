package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the merge-on-read vs copy-on-write trade
  * (kept in-tree as the evidence behind SCALING.md's MOR section).
  *
  * Scenario: a scattered key-delete touching EVERY partition of a
  * bucketed fact table — the worst case for COW (all segments rewrite)
  * and the case MOR exists for (one key-tuple segment written).
  * Measures, per SF dir:
  *   cow_delete_s      — mergeWhere over the full range (rewrites all)
  *   mor_delete_s      — morDelete (writes keys only)
  *   mor_read_s        — head read WITH the delete applied scan-side
  *   cow_read_s        — head read of the rewritten table
  *   materialize_s     — morMaterialize (deferred rewrite, out-of-band)
  *   post_mat_read_s   — head read after materialization
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileMor" */
object ProfileMor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env("SPARK_GRAFT_SF_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.mutation.VersionedTable

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def fact = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        (col("user_id") % 16).as("ub"))

    // ---- COW arm: scattered delete rewrites every intersecting segment
    val cowRoot = Scratch.dir("graft_pmor_cow") + "/t"
    VersionedTable.createPartitioned(spark, cowRoot, fact, "ub")
    val (_, cowDelS) = timed {
      VersionedTable.mergeWhere(spark, cowRoot, "ub", 0, 15,
        _.where(col("user_id") % 97 =!= 0), statCols = Seq("ub"))
    }
    val (cowN, cowReadS) = timed(VersionedTable.read(spark, cowRoot).count())

    // ---- MOR arm: same logical delete as one equality-delete segment
    val morRoot = Scratch.dir("graft_pmor_mor") + "/t"
    VersionedTable.createPartitioned(spark, morRoot, fact, "ub")
    val (_, morDelS) = timed {
      VersionedTable.morDelete(spark, morRoot, Seq("event_id"),
        _.where(col("user_id") % 97 === 0))
    }
    val (morN, morReadS) = timed(VersionedTable.read(spark, morRoot).count())
    val (_, matS) = timed(
      VersionedTable.morMaterialize(spark, morRoot, statCols = Seq("ub")))
    val (matN, postMatReadS) =
      timed(VersionedTable.read(spark, morRoot).count())
    require(cowN == morN && morN == matN,
      s"content diverged: cow=$cowN mor=$morN mat=$matN")

    println(f"""{"sf_dir":"$sfDir","rows":$cowN,""" +
      f""""cow_delete_s":$cowDelS%.2f,"mor_delete_s":$morDelS%.2f,""" +
      f""""cow_read_s":$cowReadS%.2f,"mor_read_s":$morReadS%.2f,""" +
      f""""materialize_s":$matS%.2f,"post_mat_read_s":$postMatReadS%.2f}""")
    spark.stop()
  }
}
