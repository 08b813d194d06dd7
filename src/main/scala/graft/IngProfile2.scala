package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Codec
import graft.ingest.ScanIngest
object IngProfile2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](l: String)(f: => T): T = { val t = System.nanoTime(); val r = f; println(f"PROF $l: ${(System.nanoTime()-t)/1e9}%.2f s"); r }
    // replicate the query's stages
    val q = graft.queries.IngestQueries
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("warm")(docs.count())
    // reflectively rebuild the pieces: wire encode only
    val rawJson = concat(lit("{\"osVersion\":\"14\",\"model\":\"m\",\"device\":\"d\",\"manufacturer\":\"a\",\"appNameVersion\":\"v\",\"dataVersion\":\"1.0\",\"wifiConnectedEvents\":[],\"scanResults\":[]}"))
    val wire = docs.select(Codec.encodeLineCol(rawJson).as("value"))
    time("encode only")(wire.count())
    val decoded = ScanIngest.ingest(wire, ScanIngest.Config(nowMillis = Some(1700000000000L)))
    time("tiny ingest")(decoded.count())
    val full = q.ingestChain.build(spark, "/root/testdata/sf0.1")
    time("full query")(full.count())
    time("full query again")(q.ingestChain.build(spark, "/root/testdata/sf0.1").count())
    spark.stop()
  }
}
