package graft.mutation

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Join-and-rewrite MERGE/UPDATE/DELETE emulation over parquet (A6–A8). */
class MergeOpsSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def freshTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    (1 to 10).map(i => (s"e$i", s"bssid${i % 3}", i * 1.0, Option.empty[Boolean]))
      .toDF("event_id", "bssid", "value", "is_global_outlier")
      .write.parquet(dir)
    dir
  }

  test("mergeByKey: matched rows replaced; unmatched updates ignored or upserted") {
    import spark.implicits._
    val path = freshTable()
    val updates = Seq(
      ("e3", "bssidX", 99.0, Option.empty[Boolean]),
      ("e99", "new", 1.0, Option.empty[Boolean]))
      .toDF("event_id", "bssid", "value", "is_global_outlier")

    MergeOps.mergeByKey(spark, path, updates, "event_id")
    val afterUpdate = spark.read.parquet(path)
    afterUpdate.count() shouldBe 10 // pure UPDATE: e99 not inserted
    afterUpdate.where("event_id = 'e3'").head.getAs[Double]("value") shouldBe 99.0

    MergeOps.mergeByKey(spark, path, updates, "event_id", insertUnmatched = true)
    spark.read.parquet(path).count() shouldBe 11 // upsert adds e99
  }

  test("labelOutliers sets the global_* columns only for the hit keys") {
    import spark.implicits._
    val path = freshTable()
    // add the full global_* column set the labeler touches
    val widened = spark.read.parquet(path)
      .withColumn("global_outlier_distance", lit(null).cast("double"))
      .withColumn("global_outlier_threshold", lit(null).cast("double"))
      .withColumn("global_detection_algorithm", lit(null).cast("string"))
      .withColumn("global_detection_timestamp", lit(null).cast("timestamp"))
      .withColumn("global_detection_version", lit(null).cast("string"))
    widened.write.mode("overwrite").parquet(path + "2")

    val outliers = Seq(("e2", 812.5), ("e7", 431.0)).toDF("event_id", "distance")
    MergeOps.labelOutliers(spark, path + "2", outliers, threshold = 300.0)

    val t = spark.read.parquet(path + "2")
    t.where("is_global_outlier = true").count() shouldBe 2
    val e2 = t.where("event_id = 'e2'").head
    e2.getAs[Double]("global_outlier_distance") shouldBe 812.5
    e2.getAs[Double]("global_outlier_threshold") shouldBe 300.0
    e2.getAs[String]("global_detection_algorithm") shouldBe "MAD"
    t.where("event_id = 'e1'").head.isNullAt(
      t.schema.fieldIndex("global_detection_algorithm")) shouldBe true
  }

  test("deleteWhere removes exactly the predicate hits (A7 outlier purge shape)") {
    val path = freshTable()
    MergeOps.deleteWhere(spark, path, col("bssid") === "bssid0")
    val t = spark.read.parquet(path)
    t.count() shouldBe 7
    t.where("bssid = 'bssid0'").count() shouldBe 0
  }

  test("rewrite is a swap: table remains readable and complete after mutation") {
    val path = freshTable()
    MergeOps.deleteWhere(spark, path, col("value") > 8.0)
    val t = spark.read.parquet(path)
    t.count() shouldBe 8
    t.columns should contain allOf ("event_id", "bssid", "value")
  }
}
