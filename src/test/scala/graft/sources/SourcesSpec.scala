package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class SourcesSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("S4: valid S3 events parsed; wrong source / bad etag / bad bucket dropped") {
    import spark.implicits._
    def event(source: String, bucket: String, key: String, etag: String) =
      s"""{"Records":[{"eventSource":"$source","eventTime":"2024-01-15T10:00:00.000Z",
         |"s3":{"bucket":{"name":"$bucket"},
         |"object":{"key":"$key","size":1234,"eTag":"$etag"}}}]}"""
        .stripMargin.replaceAll("\n", "")
    val ok = event("aws:s3", "ingest-bucket", "wifi-scan/2024/file1.txt",
      "d41d8cd98f00b204e9800998ecf8427e")
    val badSource = event("aws:sns", "ingest-bucket", "k", "d41d8cd98f00b204e9800998ecf8427e")
    val badEtag = event("aws:s3", "ingest-bucket", "k", "nope")
    val badBucket = event("aws:s3", "UPPER_CASE", "k", "d41d8cd98f00b204e9800998ecf8427e")

    val parsed = Sources.parseS3Events(
      Seq(ok, badSource, badEtag, badBucket, "not json").toDF("body")).collect()
    parsed.length shouldBe 1
    parsed.head.getAs[String]("bucket") shouldBe "ingest-bucket"
    parsed.head.getAs[Long]("size") shouldBe 1234L
  }

  test("S6: feed dispatch by key prefix with default fallback") {
    import spark.implicits._
    val keys = Seq("wifi-scan/a.txt", "connected-events/b.txt", "other/c.txt").toDF("key")
    keys.select(Sources.feedType(col("key"))).collect().map(_.getString(0)) shouldBe
      Array("wifi_scan", "connected_events", "default")
  }

  test("S8/S9: point lookup pushes the predicate; batch get is a broadcast semi-join") {
    import spark.implicits._
    val aps = Seq(
      ("aa:aa", 40.0, -75.0, "active"), ("bb:bb", 41.0, -74.0, "active"),
      ("cc:cc", 42.0, -73.0, "expired"))
      .toDF("mac_addr", "latitude", "longitude", "status")

    Sources.apLookup(aps, "bb:bb").collect().map(_.getString(0)) shouldBe Array("bb:bb")

    val got = Sources.apBatchGet(spark, aps, Seq("aa:aa", "cc:cc", "zz:zz"))
    got.collect().map(_.getString(0)).sorted shouldBe Array("aa:aa", "cc:cc")
    val plan = got.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should include("LeftSemi")
  }

  test("S10: AP state write creates then merges on mac_addr") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("apstate").toString + "/aps"
    Sources.writeApState(spark, path,
      Seq(("aa:aa", 40.0), ("bb:bb", 41.0)).toDF("mac_addr", "latitude"))
    Sources.writeApState(spark, path,
      Seq(("bb:bb", 41.5), ("cc:cc", 42.0)).toDF("mac_addr", "latitude"))
    val t = Sources.readApState(spark, path).collect()
      .map(r => r.getAs[String]("mac_addr") -> r.getAs[Double]("latitude")).toMap
    t shouldBe Map("aa:aa" -> 40.0, "bb:bb" -> 41.5, "cc:cc" -> 42.0)
  }

  test("S1: kafka source requires the connector jar (absent here, documented)") {
    // spark-sql-kafka is a separate artifact not shipped in /opt/spark/jars;
    // the constructor is correct Spark API — pin the exact failure mode so a
    // silent environment change surfaces.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Sources.kafkaLines(spark, "localhost:9092", "scans")
    }
    e.getMessage should include("kafka")
  }
}
