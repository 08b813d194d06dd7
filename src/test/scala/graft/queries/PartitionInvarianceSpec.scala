package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Partition-count invariance for the round-14 stats/content waves: the
  * determinism double-dump proves run-to-run stability at ONE
  * configuration; this gate proves the stronger claim the docs make —
  * results do not depend on how the data is partitioned. Every query
  * here carries a total-order ORDER BY, so collected rows must be
  * EQUAL AS SEQUENCES across shuffle-partition settings (3 vs 17): any
  * order-dependent float reduction, partition-local rank, or
  * non-commutative fold would flip something. */
class PartitionInvarianceSpec extends AnyFunSuite with Matchers with SparkSuite {

  private val targets: Seq[Reg] = Seq(
    RobustStatsQueries.o49KendallTau,
    RobustStatsQueries.o50SeasonalDecompose,
    RobustStatsQueries.o51BootstrapCi,
    RobustStatsQueries.o52WelchTtest,
    RobustStatsQueries.o53KmvSetOps,
    RobustStatsQueries.o54ResampleInterp,
    RobustStatsQueries.o55SeasonalAnomaly,
    RobustStatsQueries.o57Sprt,
    LlmQueries.tfidfTerms,
    LlmQueries.spanCorrupt,
    LlmQueries.mixTemperature,
    // j20_knn_join excluded: the sf0.001 supplier corpus has no pair
    // within the 500 m radius, so the empty-result guard cannot hold
    // (its determinism is carried by the sf0.01/sf0.1 oracle instead)
    BehaviorQueries.o56CalibrationBins,
    // round-15 wave
    RobustStatsQueries.o58HodgesLehmann,
    RobustStatsQueries.o59EwmaHalflife,
    RobustStatsQueries.o60GramMatrix,
    RobustStatsQueries.o61HoltLinear,
    RobustStatsQueries.o62Benford,
    RobustStatsQueries.o63Pettitt,
    RobustStatsQueries.o64RankAcf,
    LlmQueries.jwLinkage,
    CorpusModelQueries.selfBleu,
    // round-16 wave
    MutationQueries.prunedCandidates,
    CorpusModelQueries.indexRetrain,
    LlmQueries.containmentDedup,
    LlmQueries.suffixRepeats,
    RobustStatsQueries.o65MannKendall,
    // round-17 wave
    LlmQueries.kAnonymity,
    LlmQueries.lDiversity,
    LlmQueries.sourceGini,
    RobustStatsQueries.o66Spearman,
    RobustStatsQueries.o67RunsTest,
    RobustStatsQueries.o68CoxStuart,
    LlmQueries.vocabGrowth)

  private def collectAt(r: Reg, parts: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try r.build(spark, sfDir).collect().toSeq.map(_.toString)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  targets.foreach { r =>
    test(s"${r.name}: identical rows under 3 vs 17 shuffle partitions") {
      val a = collectAt(r, 3)
      val b = collectAt(r, 17)
      a should not be empty
      a shouldBe b
    }
  }
}
