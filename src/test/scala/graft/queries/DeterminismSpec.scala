package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Re-execution determinism gate: the driver's correctness harness hashes
  * row values, so ANY run-to-run wobble (shuffle fetch order feeding float
  * accumulation, arbitrary tie-breaks, uncapped collect_list order) fails a
  * round even when the math is right. The per-group/per-window paths are the
  * risky ones — run each twice and require identical results. */
class DeterminismSpec extends AnyFunSuite with Matchers with SparkSuite {

  private val risky = Seq(
    CoreQueries.o6Dedup,           // row_number tie-breaking
    CoreQueries.o3MaxBy,           // max(struct) under ties
    CoreQueries.a9MadOutliers,     // double percentile + joins
    CoreQueries.p2WeightedCentroid, // float sums over shuffled input
    ServeQueries.proximityTier,    // per-request mapGroups panel
    LlmQueries.winnowNearDup,      // UDF fingerprints + pair join + countDistinct
    ServeQueries.combinerBlend,    // per-group float accumulation (sorted members)
    ServeQueries.rssiRatio,        // pair enumeration + float sums per request
    LlmQueries.repetitionFilter,   // UDF hash-map counting + top-gram tie-break
    LlmQueries.sourceMix,          // global-window denominators over an agg frame
    ServeQueries.trilaterationSweep, // LAPACK LSQ solve per scenario in a map
    LlmQueries.semanticDedup,      // seeded k-means quantizer + cell pair join
    LlmQueries.decontaminate,      // gram explode + broadcast join + counts
    AnalyticsQueries.j6AsofJoin,   // running-last window under equal-time ties
    AnalyticsQueries.o9Sessionize, // session merge + float avg over shuffled input
    AnalyticsQueries.j8SaltedJoin, // hash-salt spread must not wobble the join
    AnalyticsQueries.o12TimeRangeWindow, // range-frame peers under ms ties
    AnalyticsQueries.o14GapFill,   // forward-fill carry under shuffled input
    AnalyticsQueries.o15RollingMedian, // sliding order statistic under frame ties
    AnalyticsQueries.q22DormantCustomers, // scalar float threshold gating the scan
    LlmQueries.seqPacking,         // per-shard fold over a sorted group iterator
    LlmQueries.importanceResample, // ln()+floor quantization feeding a top-k
    LlmQueries.bm25TopK,           // same class: per-term float expr + top-k ties
    LlmQueries.clusterReps,        // max(struct) argmax under planted ties
    LlmQueries.boilerplateStrip    // distinct-doc frequency join + collect_list sort
  )

  risky.foreach { q =>
    test(s"${q.name} returns identical rows on re-execution") {
      val a = q.build(spark, sfDir).collect().map(_.toString)
      val b = q.build(spark, sfDir).collect().map(_.toString)
      a shouldBe b
    }
  }

  test("batch localizer is re-execution deterministic") {
    val l1 = graft.queries.LocalizeQueries.batchLocalize.build(spark, sfDir)
      .collect().map(_.toString)
    val l2 = graft.queries.LocalizeQueries.batchLocalize.build(spark, sfDir)
      .collect().map(_.toString)
    l1 shouldBe l2
  }

  test("localizer cap keeps a deterministic subset when a group exceeds it") {
    import graft.localize.BatchLocalizer
    import spark.implicits._
    // 500 distinct measurements for one AP, cap at 100: membership of the
    // capped subset (not just its accumulation order) must be identical
    // across runs with different partition layouts / shuffle fetch orders.
    val ms = (0 until 500).map { i =>
      BatchLocalizer.Measurement(
        "ap_overcap", 40.0 + (i % 97) * 1e-4, -75.0 - (i % 89) * 1e-4,
        -40.0 - (i % 60), 1.0 + (i % 3) * 0.5)
    }
    def run(shufflePartitions: Int, seed: Int): Array[String] = {
      val shuffled = new scala.util.Random(seed).shuffle(ms)
      val ds = spark.createDataset(shuffled).repartition(shufflePartitions)
      BatchLocalizer.localizeAll(spark, ds, maxMeasurementsPerAp = 100)
        .collect().map(_.toString)
    }
    val a = run(4, 1)
    val b = run(7, 42)
    a shouldBe b
    a.length shouldBe 1
  }

  test("request scorer is re-execution deterministic") {
    val s1 = graft.queries.ServeQueries.batchScoring.build(spark, sfDir)
      .collect().map(_.toString)
    val s2 = graft.queries.ServeQueries.batchScoring.build(spark, sfDir)
      .collect().map(_.toString)
    s1 shouldBe s2
  }
}
