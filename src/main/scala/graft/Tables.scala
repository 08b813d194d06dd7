package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated synthetic star schema
  * (`/root/testdata/sf*`, see TESTDATA.md). All loads are plain
  * `spark.read.parquet` so Catalyst keeps full pushdown/pruning freedom —
  * never cache here; the bench measures cold scans.
  *
  * At 100 TB these would be partitioned/bucketed external tables; the
  * loaders centralize the access so a future catalog swap is one-line.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name),
      s"unknown table '$name' — expected one of: ${names.mkString(", ")}")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** `events.ts` has shipped in two physical forms: parquet TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects — read as long via the legacy
    * flag, then integer-`div` to µs; ns epoch > 2^53 would not survive a
    * double) and plain TIMESTAMP(MICROS) (reads directly). Branch on the
    * schema actually found in the file so either generation works, and only
    * touch the legacy session conf when the legacy form is present. A µs
    * timestamp without UTC adjustment arrives as TIMESTAMP_NTZ; all graft
    * sessions run with session.timeZone=UTC, so the cast to TIMESTAMP is
    * value-identical and keeps downstream code on a single timestamp type. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val df = load(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType => // legacy nanos file: keep the flag on for execution
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case dt =>
        prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
        if (dt == TimestampNTZType) df.withColumn("ts", col("ts").cast(TimestampType))
        else df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
