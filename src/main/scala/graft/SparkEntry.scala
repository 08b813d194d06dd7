package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, BehaviorQueries, CoreQueries, CorpusModelQueries, GraphStatsQueries, HistoryQueries, IngestQueries, LlmQueries, LocalizeQueries, MutationQueries, Reg, RobustStatsQueries, ServeQueries, StarQueries, TokenizerQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are defined in `graft.queries.*` as Spark-first DataFrame
  * builders with paired DuckDB oracle SQL; this object only aggregates them.
  */
object SparkEntry {

  def registered: Seq[Reg] =
    CoreQueries.all ++ LlmQueries.all ++ LocalizeQueries.all ++ IngestQueries.all ++
      MutationQueries.all ++ ServeQueries.all ++ AnalyticsQueries.all ++
      StarQueries.all ++ BehaviorQueries.all ++ CorpusModelQueries.all ++
      HistoryQueries.all ++ TokenizerQueries.all ++ GraphStatsQueries.all ++
      RobustStatsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.3 minimum slice generalized: per-key sufficiency gate
    * (A4, N>=20) feeding a weighted centroid (P2 batch form). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.p2WeightedCentroid.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registered.map(r => r.name -> r.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    registered.flatMap(r => r.oracle.map(r.name -> _)).toMap
}
