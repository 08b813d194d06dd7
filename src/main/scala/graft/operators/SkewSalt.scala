package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the shuffle-join rescue when BOTH
  * sides are fact-sized (broadcast is off the table) and a handful of hot
  * keys would funnel into single straggler tasks. AQE's skew-join split
  * handles moderate skew; salting is the explicit form for the pathological
  * key that exceeds what one task can hold even after splits — and the only
  * form that also works inside aggregations-over-join pipelines where AQE
  * cannot re-split.
  *
  * Encoding: the probe (skewed) side gets a DETERMINISTIC salt in
  * [0, salts) derived from a hash of its other columns — never `rand()`,
  * which flakes re-execution and breaks the correctness gate; the build
  * side replicates each row `salts` times. The join key becomes
  * (key, salt): hot keys spread across `salts` tasks, at the price of a
  * `salts`× blow-up of the build side — so pick the SMALLER input as
  * `build` and keep `salts` near the observed skew factor.
  *
  * Result is row-identical to the plain equi-join (inner); the unit spec
  * asserts that identity and the spread.
  */
object SkewSalt {

  /** @param probe  the skewed (usually larger) side
    * @param build  the replicated side — pays a `salts`× row blow-up
    * @param on     equi-join key columns present on both sides
    * @param salts  spread factor (≈ observed skew multiple), ≥ 1
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      on: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(on.nonEmpty, "saltedJoin needs at least one equi-key")
    // Salt from a hash of the probe row's non-key columns: deterministic
    // (re-execution returns identical rows) yet decorrelated from the key,
    // so a hot key's rows spread ~uniformly over the salt range.
    // PRECONDITION: the non-key columns must vary within a hot key — a
    // key-only probe would give every hot row the same salt (hash of
    // nothing), silently paying the build replication for zero spread, so
    // it is rejected rather than degraded. (Constant non-key columns have
    // the same collapse and cannot be detected cheaply — caller's contract.)
    val nonKey = probe.columns.filterNot(on.contains)
    require(nonKey.nonEmpty,
      "saltedJoin probe needs at least one non-key column to derive the " +
        "salt from — a key-only probe cannot spread a hot key")
    val saltExpr = pmod(hash(nonKey.map(col): _*), lit(salts))
    val p = probe.withColumn("__salt", saltExpr)
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, on :+ "__salt").drop("__salt")
  }
}
