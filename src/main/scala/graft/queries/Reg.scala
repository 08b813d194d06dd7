package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark-first DataFrame builder plus an
  * optional DuckDB-compatible oracle SQL over the same parquet tables.
  *
  * The driver's correctness harness sorts result columns by name and hashes
  * values, so builders and oracles must agree on column names, types (we
  * standardize on BIGINT counts / DOUBLE measures / DATE days / STRING keys)
  * and row order (every query ends in a total-order ORDER BY).
  *
  * Floating-point discipline (so Spark and DuckDB hash identically):
  *  - money sums go through DECIMAL(18,2) (exact, order-independent), then
  *    back to DOUBLE for a stable schema;
  *  - sums of integer-valued doubles (quantities, weights in {1.0,1.5,2.0})
  *    are exact in IEEE double regardless of order — left unrounded;
  *  - averages/stddevs are rounded (error ~1e-10 relative, far below the
  *    rounding grid);
  *  - raw nanosecond timestamps never appear in outputs (Spark truncates
  *    parquet ns to µs; DuckDB keeps ns) — only CAST(... AS DATE).
  */
final case class Reg(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Reg {
  def sql(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): Reg =
    Reg(name, build, Some(oracle))

  /** No DuckDB-expressible oracle — driver records a rows-only check. */
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): Reg =
    Reg(name, build, None)
}
