package graft.queries

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSuite, Tables}

/** Invariants of the temporal-history operators (cross-engine equality is
  * the oracle gate's job; these pin what the shapes must mean). */
class HistorySpec extends AnyFunSuite with Matchers with SparkSuite {

  test("scd2: versions are gapless per key and validity chains link exactly") {
    val out = HistoryQueries.scd2History.build(spark, sfDir).cache()
    // versions 1..n per customer with no gaps
    val badVersions = out.groupBy("custkey")
      .agg(F.count(F.lit(1)).as("n"), F.max("version").as("mx"),
        F.min("version").as("mn"))
      .where(F.col("mx") =!= F.col("n") || F.col("mn") =!= 1)
    badVersions.count() shouldBe 0
    // each row's to_day equals the next version's from_day (half-open chain)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("custkey").orderBy("version")
    val chained = out.withColumn("next_from", F.lead("from_day", 1).over(w))
    chained.where(F.col("to_day").isNotNull &&
      F.col("to_day") =!= F.col("next_from")).count() shouldBe 0
    // exactly one open-ended (current) row per customer
    out.where(F.col("to_day").isNull).groupBy("custkey")
      .count().where(F.col("count") =!= 1).count() shouldBe 0
    // consecutive versions always change status
    chained.withColumn("next_status", F.lead("status", 1).over(w))
      .where(F.col("next_status").isNotNull &&
        F.col("next_status") === F.col("status")).count() shouldBe 0
    out.unpersist()
    ()
  }

  test("islands: conservation and coverage bounds against the raw intervals") {
    val out = HistoryQueries.intervalIslands.build(spark, sfDir).cache()
    val iv = Tables.lineitem(spark, sfDir).select(
      F.col("l_suppkey").as("suppkey"),
      F.datediff(F.col("l_shipdate").cast("date"),
        F.lit("1970-01-01").cast("date")).as("s"),
      (F.datediff(F.col("l_shipdate").cast("date"),
        F.lit("1970-01-01").cast("date"))
        + F.lit(1) + F.col("l_orderkey") % 7).as("e"))
    val perKey = iv.groupBy("suppkey").agg(
      F.count(F.lit(1)).as("n_iv"),
      F.sum(F.col("e") - F.col("s") + 1).as("sum_len"),
      (F.max("e") - F.min("s") + 1).as("span"))
    val j = out.join(perKey, "suppkey")
    // every interval lands in exactly one island
    j.where(F.col("n_intervals") =!= F.col("n_iv")).count() shouldBe 0
    // union is at most the sum of lengths and at most the total span,
    // and at least the longest single interval could require: >= 1 island
    j.where(F.col("covered_days") > F.col("sum_len") ||
      F.col("covered_days") > F.col("span") ||
      F.col("n_islands") < 1 ||
      F.col("n_islands") > F.col("n_intervals")).count() shouldBe 0
    out.unpersist()
    ()
  }

  test("scd2 upsert: any day-monotone batch split folds to the one-shot table") {
    // One-shot reference: the a24-style fold over ALL events at once.
    val e = Tables.orders(spark, sfDir).select(
      F.col("o_custkey").as("custkey"), F.col("o_orderstatus").as("status"),
      F.datediff(F.col("o_orderdate").cast("date"),
        F.lit("1970-01-01").cast("date")).cast("bigint").as("day"),
      F.col("o_orderkey").as("orderkey"))
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy("custkey").orderBy("day", "orderkey")
    val oneShot = e
      .withColumn("prev", F.lag("status", 1).over(wKey))
      .where(F.col("prev").isNull || F.col("status") =!= F.col("prev"))
      .withColumn("version", F.row_number().over(wKey).cast("bigint"))
      .withColumn("to_day", F.lead("day", 1).over(wKey))
      .select(F.col("custkey"), F.col("status"), F.col("version"),
        F.col("day").as("from_day"), F.col("to_day").cast("bigint"))
      .collect().map(_.toString).sorted

    val (lo, hi) = {
      val r = e.agg(F.min("day"), F.max("day")).head()
      (r.getLong(0), r.getLong(1))
    }
    // Randomized cut sets (fixed seed): uneven splits, duplicate cuts
    // (→ EMPTY batches), single-batch, and many tiny batches.
    val rnd = new scala.util.Random(4242)
    val cutSets: Seq[Seq[Long]] =
      Seq(Seq.empty[Long], Seq(lo), Seq(hi)) ++ // 1-batch + empty-batch edges
        (1 to 3).map(n => Seq.fill(2 * n)(lo + (rnd.nextDouble() *
          (hi - lo)).toLong).sorted)
    cutSets.foreach { cuts =>
      val bounds = (Long.MinValue +: cuts.sorted) :+ Long.MaxValue
      val batches = bounds.sliding(2).map { case Seq(a, b) =>
        e.where(F.col("day") > a && F.col("day") <= b)
      }.toSeq
      val work = graft.Scratch.dir("graft_scd2u_spec")
      val path = s"$work/scd2"
      try {
        HistoryQueries.initScd2Dim(spark, path, e)
        batches.zipWithIndex.foreach { case (b, i) =>
          HistoryQueries.applyScd2Batch(spark, path, b, fenceId = Some(i.toLong))
          // at-least-once replay: a re-delivered batch whose original
          // committed is FENCED OUT whole (the fold is not idempotent —
          // same-day multi-version chains would re-fold wrong), exactly
          // how the s25 streaming sink runs it
          if (i == 1)
            HistoryQueries.applyScd2Batch(spark, path, b, fenceId = Some(i.toLong))
        }
        val folded = HistoryQueries.readScd2Dim(spark, path)
          .collect().map(_.toString).sorted
        withClue(s"cuts=$cuts: ") {
          folded should contain theSameElementsInOrderAs oneShot
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(work))
      }
    }
  }

  test("scd2 upsert commits O(changed keys): a tiny batch never rewrites the dimension") {
    // Fold the full orders changelog into the dimension in two day-monotone
    // halves, then apply a 5-key batch at a later day. The commit must be
    // delta-sized (one equality-delete + one data segment for those keys)
    // and every pre-existing file must survive untouched — the r15
    // full-dimension rewrite (MergeOps.mergeByKey) is the regression this
    // gate exists to catch.
    val e = Tables.orders(spark, sfDir).select(
      F.col("o_custkey").as("custkey"), F.col("o_orderstatus").as("status"),
      F.datediff(F.col("o_orderdate").cast("date"),
        F.lit("1970-01-01").cast("date")).cast("bigint").as("day"),
      F.col("o_orderkey").as("orderkey"))
    val (lo, hi) = {
      val r = e.agg(F.min("day"), F.max("day")).head()
      (r.getLong(0), r.getLong(1))
    }
    val mid = lo + (hi - lo) / 2
    val work = graft.Scratch.dir("graft_scd2u_bytes")
    val path = s"$work/scd2"
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    def files(): Map[String, Long] =
      walk(new java.io.File(path)).map(f => f.getPath -> f.length()).toMap
    try {
      HistoryQueries.initScd2Dim(spark, path, e)
      HistoryQueries.applyScd2Batch(spark, path, e.where(F.col("day") <= mid))
      HistoryQueries.applyScd2Batch(spark, path,
        e.where(F.col("day") > mid && F.col("day") <= hi))
      val before = files()
      val dimBefore = HistoryQueries.readScd2Dim(spark, path)
        .collect().map(_.toString).toSet
      // 5 keys flip to a fresh status at day hi+1 — day-monotone by construction
      val tiny = e.where(F.col("custkey") % 31 === 0)
        .groupBy("custkey").agg(F.max("orderkey").as("orderkey"))
        .limit(5)
        .select(F.col("custkey"), F.lit("Z").as("status"),
          F.lit(hi + 1).as("day"), F.col("orderkey"))
      val tinyKeys = tiny.select("custkey").collect().map(_.getLong(0)).toSet
      tinyKeys should have size 5
      HistoryQueries.applyScd2Batch(spark, path, tiny)
      val after = files()
      // append-only: every pre-existing file survives byte-identical
      before.foreach { case (p, len) =>
        withClue(s"$p: ") { after.get(p) shouldBe Some(len) }
      }
      // delta-sized commit: far below the accumulated dimension (the old
      // rewrite path would at least double the footprint)
      val delta = after.values.sum - before.values.sum
      delta.toDouble should be < before.values.sum.toDouble * 0.25
      // and the fold itself is correct: untouched keys read back identical,
      // changed keys gained exactly one open 'Z' version at day hi+1
      val dimAfter = HistoryQueries.readScd2Dim(spark, path).cache()
      val unchanged = dimAfter
        .where(!F.col("custkey").isInCollection(tinyKeys))
        .collect().map(_.toString).toSet
      unchanged shouldBe dimBefore.filterNot { s =>
        tinyKeys.exists(k => s.startsWith(s"[$k,"))
      }
      dimAfter.where(F.col("custkey").isInCollection(tinyKeys) &&
        F.col("status") === "Z" && F.col("from_day") === (hi + 1) &&
        F.col("to_day").isNull).count() shouldBe 5
      dimAfter.unpersist()
      ()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(work))
    }
  }
}
