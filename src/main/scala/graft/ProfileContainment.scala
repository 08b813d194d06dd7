package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost breakdown of llm_containment_dedup at the extent decade —
  * the measurement behind the round-16 trim (SCALING.md). Each stage is
  * timed CUMULATIVELY (gram-gen, df aggregate, candidate join, exact
  * verify) so the dominant term is attributable before reshaping it.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileContainment" */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env("SPARK_GRAFT_SF_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"CONT $tag%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    val aug = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .unionByName(docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 40000000L).as("doc_id"),
          concat(lower(col("text")), lit(" "),
            array_join(expr(
              "transform(sequence(1, 2 * size(split(text, '\\\\s+'))), " +
                "j -> concat('zzq', doc_id, 'x', j))"), " ")).as("t")))
    def g = aug
      .select(col("doc_id"), split(col("t"), "\\s+").as("ws"))
      .select(col("doc_id"),
        expr("""CASE WHEN size(ws) >= 3 THEN
               |  array_distinct(transform(sequence(1, size(ws) - 2),
               |    i -> concat_ws(' ', slice(ws, i, 3))))
               |ELSE array() END""".stripMargin).as("grams"))
    def ex = g.select(col("doc_id"), explode(col("grams")).as("gram"))

    timed("aug")(aug.count())
    timed("gram-gen+ex")(ex.count())
    timed("df-agg") {
      ex.groupBy("gram").agg(count(lit(1)).as("nd"))
        .where(col("nd") >= 2 && col("nd") <= 4).count()
    }
    val gk = g.localCheckpoint(false)
    val exk = gk.select(col("doc_id"), explode(col("grams")).as("gram"))
    timed("g-checkpoint")(gk.count())
    val rare = exk.groupBy("gram")
      .agg(count(lit(1)).as("nd"))
      .where(col("nd") >= 2 && col("nd") <= 4).select("gram")
    val rareU = exk.groupBy("gram")
      .agg(count(lit(1)).as("nd"))
      .where(col("nd") >= 2 && col("nd") <= 4).select("gram")
    val fxU = exk.join(rareU, "gram")
    val candU = fxU.select(col("gram"), col("doc_id").as("id_a"))
      .join(fxU.select(col("gram"), col("doc_id").as("id_b")), "gram")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 5)
      .select("id_a", "id_b")
    timed("cand UNHINTED")(candU.count())
    val fx = exk.join(broadcast(rare), "gram")
    val cand = fx.select(col("gram"), col("doc_id").as("id_a"))
      .join(fx.select(col("gram"), col("doc_id").as("id_b")), "gram")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 5)
      .select("id_a", "id_b")
    val candk = cand.localCheckpoint(false)
    timed("cand (ckpt g)")(candk.count())
    timed("verify") {
      broadcast(candk)
        .join(gk.select(col("doc_id").as("id_a"), col("grams").as("ga")), "id_a")
        .join(gk.select(col("doc_id").as("id_b"), col("grams").as("gb")), "id_b")
        .select(
          size(array_intersect(col("ga"), col("gb"))).cast("bigint").as("inter"),
          size(col("ga")).cast("bigint").as("na"),
          size(col("gb")).cast("bigint").as("nb"))
        .where(expr("(inter * 1000000) div least(na, nb)") >= 900000L &&
          expr("(inter * 1000000) div (na + nb - inter)") < 500000L)
        .count()
    }
    spark.stop()
  }
}
