package graft.mutation

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite
import graft.mutation.SchemaEvolution.Era

class SchemaEvolutionSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("widen follows the numeric promotion lattice and rejects non-numeric drift") {
    SchemaEvolution.widen(IntegerType, LongType) shouldBe LongType
    SchemaEvolution.widen(LongType, IntegerType) shouldBe LongType
    SchemaEvolution.widen(IntegerType, DoubleType) shouldBe DoubleType
    SchemaEvolution.widen(FloatType, FloatType) shouldBe FloatType
    SchemaEvolution.widen(StringType, StringType) shouldBe StringType
    an[IllegalArgumentException] should be thrownBy
      SchemaEvolution.widen(StringType, LongType)
  }

  test("rename + widening + missing-as-null unify three eras") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_se_spec").toString
    try {
      // era 1: old column name, INT
      Seq((1, 10), (2, 20)).toDF("id", "qual")
        .write.parquet(root + "/e1")
      // era 2: new name, LONG, plus a brand-new column
      Seq((3L, 3000000030L, "x"), (4L, 3000000040L, "y"))
        .toDF("id", "quality_weight", "note")
        .write.parquet(root + "/e2")
      // era 3: misses the weight column entirely
      Seq(Tuple1(5)).toDF("id").write.parquet(root + "/e3")

      val out = SchemaEvolution.readUnified(spark, Seq(
        Era(root + "/e1", renames = Map("qual" -> "quality_weight"), tag = "1"),
        Era(root + "/e2", tag = "2"),
        Era(root + "/e3", tag = "3")))

      out.schema("id").dataType shouldBe LongType
      out.schema("quality_weight").dataType shouldBe LongType
      out.schema("note").dataType shouldBe StringType
      out.columns.toSeq shouldBe Seq("id", "quality_weight", "note", "data_version")
      out.orderBy("id").collect() shouldBe Array(
        Row(1L, 10L, null, "1"),
        Row(2L, 20L, null, "1"),
        Row(3L, 3000000030L, "x", "2"),
        Row(4L, 3000000040L, "y", "2"),
        Row(5L, null, null, "3"))
    } finally {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }
}
