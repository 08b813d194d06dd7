package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Reproducible floor probe: measures Spark's OWN fixed cost per
  * streaming query/trigger under AvailableNow on this box — a trivial
  * 1-row-per-batch source, schema pre-supplied, tmpfs checkpoints,
  * no graft operator anywhere — so the s-family's per-query overhead can
  * be judged against what Structured Streaming itself charges. Findings
  * (SCALING.md "Streaming trigger floor"): ~0.6 s per query start +
  * ~0.3 s per micro-batch at right-sized state partitions; the shipped
  * streaming family averages ~1.8 s/query at ~3 batches each — i.e. it
  * already sits AT the floor, and further reduction requires changing
  * batch counts or semantics, not plans. Run:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.ProfileStream"`. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // setup: 3 single-row parquet files as a file-stream source
    def mkSrc(n: Int): String = {
      val work = Scratch.dir("prof_stream")
      val src = work + "/in"
      new java.io.File(src).mkdirs()
      (0 until n).foreach { i =>
        Seq((i.toLong, i.toString)).toDF("id", "v")
          .coalesce(1).write.parquet(work + s"/tmp$i")
        val part = new java.io.File(work + s"/tmp$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(src, s"b$i.parquet"))
      }
      work
    }

    def runStateless(nBatches: Int, maxPerTrigger: Boolean): Unit = {
      val work = mkSrc(nBatches)
      val schema = spark.read.parquet(work + "/in").schema
      var r = spark.readStream.schema(schema)
      val rdr = if (maxPerTrigger)
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      else spark.readStream.schema(schema)
      val q = rdr.parquet(work + "/in")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          b.count(); ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    def runStateful(nBatches: Int, parts: Int): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val work = mkSrc(nBatches)
        val schema = spark.read.parquet(work + "/in").schema
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(work + "/in")
          .groupBy("v").agg(count(lit(1)).as("n"))
          .writeStream
          .format("memory").queryName("prof_" + System.nanoTime())
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    // warm the machinery once (JIT, classloading of streaming internals)
    runStateless(1, maxPerTrigger = false)
    runStateful(1, 2)

    time("stateless 1-batch  (warm)") { runStateless(1, maxPerTrigger = false) }
    time("stateless 1-batch  (warm2)") { runStateless(1, maxPerTrigger = false) }
    time("stateless 3-batch  (maxFilesPerTrigger=1)") { runStateless(3, maxPerTrigger = true) }
    time("stateless 6-batch  (maxFilesPerTrigger=1)") { runStateless(6, maxPerTrigger = true) }
    time("stateful  3-batch  parts=2") { runStateful(3, 2) }
    time("stateful  3-batch  parts=8") { runStateful(3, 8) }
    time("stateful  3-batch  parts=32") { runStateful(3, 32) }
    time("stateful  6-batch  parts=2") { runStateful(6, 2) }
    spark.stop()
  }
}
