package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** COW-vs-MOR evidence for the round-16 SCD2 fold migration (kept
  * in-tree as the measurement behind SCALING.md's SCD2 section).
  *
  * Through round 15 `applyScd2Batch` committed via `MergeOps.mergeByKey`
  * — a full-dimension rewrite, per-batch I/O O(dimension). It now
  * commits via `VersionedTable.morUpsert` — one equality-delete + one
  * data segment, per-batch I/O O(changed keys). At bench scale (a ~10 k
  * key dimension) the rewrite was cheap and MOR pays a fixed
  * several-small-jobs cost; this harness measures where that flips by
  * growing ONLY the dimension while holding the batch fixed. Both arms
  * run the IDENTICAL fold ([[graft.queries.HistoryQueries.scd2Fold]]);
  * only the commit protocol differs.
  *
  * Per dimension size K: synthetic chains (3 closed + 1 open version per
  * key), one fixed 2 000-key day-monotone batch applied, reporting
  * seconds and bytes written per arm.
  * Usage: sbt "runMain graft.ProfileScd2 [K1,K2,...]" */
object ProfileScd2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.mutation.{MergeOps, VersionedTable}
    import graft.queries.HistoryQueries

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def bytesUnder(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else f.length()
      walk(new java.io.File(dir))
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }

    // 4-version chains per key: closed rows at days 100/200/300, open at
    // 400 — the shape a long-lived dimension converges to
    def dim(k: Long) = spark.range(k).select(col("id").as("custkey"))
      .crossJoin(spark.range(1, 5).select(col("id").as("version")))
      .select(col("custkey"),
        concat(lit("s"), col("version") % 3).as("status"),
        col("version"),
        (col("version") * 100).as("from_day"),
        when(col("version") < 4, (col("version") + 1) * 100)
          .cast("bigint").as("to_day"))
    // fixed 2000-key batch at a later day (keys hash-spread over the dim)
    def batch(k: Long) = spark.range(2000)
      .select(((col("id") * 1009L + 7L) % k).as("custkey"),
        lit("zz").as("status"), lit(1000L).as("day"),
        col("id").as("orderkey"))

    val ks = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(20000L, 100000L, 500000L, 2000000L))
    ks.foreach { k =>
      val work = Scratch.dir(f"graft_pscd2_$k")
      try {
        val d = dim(k).localCheckpoint()
        val b = batch(k).localCheckpoint()

        // ---- COW arm: plain parquet + keyed-merge full rewrite (r15 path)
        val cowPath = s"$work/cow"
        d.write.parquet(cowPath)
        val (_, cowS) = timed {
          val updates = HistoryQueries
            .scd2Fold(spark.read.parquet(cowPath), b)
          MergeOps.mergeByKey(spark, cowPath, updates, "custkey",
            insertUnmatched = true)
        }
        val cowBytes = bytesUnder(cowPath) // the rewrite IS the table

        // ---- MOR arm: VersionedTable + equality-delete upsert (r16 path)
        val morPath = s"$work/mor"
        VersionedTable.create(spark, morPath, d)
        val before = bytesUnder(morPath)
        val (_, morS) = timed(
          HistoryQueries.applyScd2Batch(spark, morPath, b))
        val morBytes = bytesUnder(morPath) - before

        println(f"""{"dim_keys":$k,"cow_s":$cowS%.2f,"mor_s":$morS%.2f,""" +
          f""""cow_bytes_written":$cowBytes,"mor_bytes_written":$morBytes}""")
      } finally rm(new java.io.File(work))
    }
    spark.stop()
  }
}
