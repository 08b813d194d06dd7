package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-amplification measurement for the incremental cluster store
  * (SCALING.md's round-16 row, the r15 ask): per applyBatch the lookup
  * collapses every LIVE segment of the node + redirect tables, so the
  * read surface is the live store — bounded in SEGMENT COUNT by
  * threshold compaction (liveSegments gate in IncrementalClustersSpec)
  * but O(store) in BYTES. This harness grows the store ~100× while
  * holding the batch at 1000 edges and reports, per store size: the
  * probe batch's wall time, the live bytes it had to collapse, the live
  * segment count, and the bytes the batch itself wrote.
  * Usage: sbt "runMain graft.ProfileClusterRead" */
object ProfileClusterRead {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.IncrementalClusters

    def edgesDf(lo: Long, n: Long) = spark.range(n)
      .select((col("id") * 2 + lo).as("a"), (col("id") * 2 + lo + 1).as("b"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }

    Seq(20000L, 200000L, 2000000L).foreach { storeNodes =>
      val work = Scratch.dir(s"graft_pcr_$storeNodes")
      val path = s"$work/labels"
      try {
        IncrementalClusters.init(spark, path)
        // 6 history batches build the store; default maxDeltas keeps all
        // segments live (no compaction mid-build), the worst case a probe
        // batch can face between compactions
        val per = storeNodes / 12 // nodes per batch = 2 * edges
        (0 until 6).foreach { b =>
          IncrementalClusters.applyBatch(spark, path,
            edgesDf(b * storeNodes / 6, per))
        }
        val liveBytes = IncrementalClusters.bytesUnder(spark, path)
        val (nSegs, rSegs) = IncrementalClusters.liveSegments(spark, path)
        val before = liveBytes
        val t0 = System.nanoTime()
        IncrementalClusters.applyBatch(spark, path,
          edgesDf(10 * storeNodes, 1000L))
        val probeS = (System.nanoTime() - t0) / 1e9
        val wrote = IncrementalClusters.bytesUnder(spark, path) - before
        println(f"""{"store_nodes":$storeNodes,"probe_batch_s":$probeS%.2f,""" +
          f""""live_bytes_read":$liveBytes,"live_segments":${nSegs + rSegs},""" +
          f""""batch_bytes_written":$wrote}""")
      } finally rm(new java.io.File(work))
    }
    spark.stop()
  }
}
