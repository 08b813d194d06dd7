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

    // layout matrix (round 17): flat vs range-bucketed node store, probed
    // with a KEY-LOCAL batch (fresh contiguous ids — the time-ordered
    // ingest shape, where bucket pruning should skip ~the whole store)
    // and a UNIFORM-RANDOM batch (endpoints scattered over the store's id
    // range — the no-locality shape, where pruning can save nothing and
    // the layout must not cost anything either).
    Seq(20000L, 200000L, 2000000L).foreach { storeNodes =>
      Seq(0L, storeNodes / 64).foreach { bucketWidth =>
        val work = Scratch.dir(s"graft_pcr_${storeNodes}_$bucketWidth")
        val path = s"$work/labels"
        try {
          IncrementalClusters.init(spark, path, bucketWidth)
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
            edgesDf(10 * storeNodes, 1000L)) // key-local: fresh id range
          val localS = (System.nanoTime() - t0) / 1e9
          val wrote = IncrementalClusters.bytesUnder(spark, path) - before
          // uniform-random probe: endpoints scattered across the whole
          // stored id range (edges between existing nodes)
          val rand = spark.range(1000L)
            .select(pmod(xxhash64(col("id")), lit(storeNodes)).as("a"),
              pmod(xxhash64(col("id") + 7777777L), lit(storeNodes)).as("b"))
            .where(col("a") =!= col("b"))
          val t1 = System.nanoTime()
          IncrementalClusters.applyBatch(spark, path, rand)
          val randomS = (System.nanoTime() - t1) / 1e9
          println(f"""{"store_nodes":$storeNodes,"bucket_width":$bucketWidth,""" +
            f""""probe_local_s":$localS%.2f,"probe_random_s":$randomS%.2f,""" +
            f""""live_bytes_read":$liveBytes,"live_segments":${nSegs + rSegs},""" +
            f""""batch_bytes_written":$wrote}""")
        } finally rm(new java.io.File(work))
      }
    }
    spark.stop()
  }
}
