package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** The events table has shipped in two physical encodings (parquet
  * TIMESTAMP(NANOS) read as long under the legacy flag, and plain
  * TIMESTAMP(MICROS)); a driver-side regeneration flipping between them
  * once took out every events-reading query. This spec pins the loader's
  * schema-adaptive contract for both shapes. */
class TablesSpec extends AnyFunSuite with SparkSuite {

  test("events loads the current testdata with a TimestampType ts") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(1).count() == 1)
  }

  test("legacy long-ns ts files load to the same instants as micros files") {
    val real = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id").limit(10).cache()
    val work = java.nio.file.Files.createTempDirectory("graft_tables_spec")
    try {
      // Re-encode the sample the way the legacy generator did: ts as a raw
      // epoch-nanos BIGINT column. The loader must detect LongType and
      // rebuild the same µs timestamps.
      real.withColumn("ts", (unix_micros(col("ts")) * 1000L).as("ts"))
        .write.mode("overwrite").parquet(s"$work/events.parquet")
      val legacy = Tables.events(spark, work.toString)
      assert(legacy.schema("ts").dataType == TimestampType)
      val expect = real.orderBy("event_id").collect().toSeq
      val got = legacy.orderBy("event_id").collect().toSeq
      assert(got == expect)
    } finally {
      real.unpersist()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(work.toFile)
    }
  }
}
