package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING probe for the incremental cluster store's WRITE path: builds
  * label stores across store-size decades, then folds one fixed-size
  * probe batch into each and reports the bytes the commit wrote and its
  * wall time. The claim under test (VERDICT r14's weak flag, fixed in
  * r15): per-batch write volume tracks the BATCH, not the accumulated
  * store — the node store is append-only and the redirect LSM writes
  * one delta segment per batch. */
object ProfileIncClusters {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (n <- Seq(10000L, 100000L, 1000000L)) {
      val root = Scratch.dir(s"graft_incc_probe_$n") + "/labels"
      graft.operators.IncrementalClusters.init(spark, root)
      // build: disjoint 2-node clusters covering node ids [0, 2n)
      val build = spark.range(n).select(
        (col("id") * 2).as("a"), (col("id") * 2 + 1).as("b"))
      graft.operators.IncrementalClusters.applyBatch(spark, root, build,
        maxDeltas = 64)
      val storeBytes =
        graft.operators.IncrementalClusters.bytesUnder(spark, root)
      // probe: 500 fresh pairs (insert path) + 500 cross-cluster merges
      // (redirect path) — 1000 edges total, fixed regardless of store
      val fresh = spark.range(500).select(
        (col("id") * 2 + 10000000L).as("a"),
        (col("id") * 2 + 10000001L).as("b"))
      val merges = spark.range(500).select(
        (col("id") * 8).as("a"), (col("id") * 8 + 2).as("b"))
      val probe = fresh.unionByName(merges)
      val t0 = System.nanoTime()
      graft.operators.IncrementalClusters.applyBatch(spark, root, probe,
        maxDeltas = 64)
      val secs = (System.nanoTime() - t0) / 1e9
      val after =
        graft.operators.IncrementalClusters.bytesUnder(spark, root)
      println(f"""{"store_nodes":${2 * n},"store_bytes":$storeBytes,""" +
        f""""probe_edges":1000,"probe_bytes_written":${after - storeBytes},""" +
        f""""probe_secs":$secs%.3f}""")
    }
    spark.stop()
  }
}
