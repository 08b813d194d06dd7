package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. A query that throws is
  * recorded as -1 (never mistaken for "fast") and listed in "errors". */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: absorb JVM/codegen/scan-init cost so it doesn't land on the
    // alphabetically-first query (measured ~9 s of pure warmup otherwise).
    try SparkEntry.queries.values.headOption.foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }

    // Queries ordered by name for a stable report.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val timed = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -1.0, ok)
    }
    val qs = timed.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errors = timed.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = timed.filter(_._3).map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
