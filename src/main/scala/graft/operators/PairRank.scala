package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense injective rank of the DISTINCT (keyA, keyB) long pairs of a frame
  * — the doubling-round primitive of the distributed suffix array
  * (`llm_suffix_repeats`), built to survive ANY key domain.
  *
  * The obvious trick — pack the pair into one long (`keyA * domain + keyB`)
  * and rank the scalar — silently wraps BIGINT once domain² ≥ 2⁶³
  * (domain ≳ 3.04e9), which a 100 TB corpus's suffix-rank domain exceeds by
  * orders of magnitude; with ANSI off the wrap corrupts ranks instead of
  * erroring (the o63 Pettitt bug class, found again by the round-16 review
  * in the pack this operator replaced). This is the documented two-pass
  * high/low SPLIT RANK instead — no multiplication anywhere, so there is
  * nothing to overflow:
  *
  *   1. per-keyA pair counts (one hash aggregate over the distinct pairs);
  *   2. running offsets of those counts in keyA order — a two-level
  *      [[PrefixSum.globalCumsum]], bucket width scaled so the offset frame
  *      stays ≤ ~2M rows at any domain;
  *   3. within each keyA group, `row_number() OVER (PARTITION BY keyA
  *      ORDER BY keyB)` — hash-partitioned, fully parallel;
  *   4. rank = offset + within-group position: dense over the distinct
  *      pairs and equal exactly when the pairs are equal, which is all the
  *      doubling round needs (grouping is by EQUALITY; the rank also
  *      happens to preserve (keyA, keyB) lexicographic order).
  *
  * `keyA` must be a non-negative long (a prior dense rank); `keyB` any
  * long (negative sentinels/frozen ids welcome). Skew residual, shared
  * with the packed form this replaces: one keyA group's distinct-keyB set
  * sorts inside one window partition — pathological only when a single
  * k-prefix group keeps ~O(corpus) DISTINCT continuations, which natural
  * text does not (groups split geometrically per round); salt keyA with a
  * keyB prefix and re-offset if a corpus ever manufactures it. */
object PairRank {

  /** One row per distinct (keyA, keyB) pair of `df`, plus `rankCol` —
    * dense 0-based, injective on pairs. Callers join back on both keys. */
  def ofDistinct(df: DataFrame, keyA: String, keyB: String,
      rankCol: String = "rank2"): DataFrame = {
    require(keyA != keyB && !Seq(keyA, keyB).contains(rankCol),
      s"key/rank columns must be distinct, got ($keyA, $keyB, $rankCol)")
    val pairs = df.select(col(keyA), col(keyB)).distinct()
      .localCheckpoint(false) // consumed by the counts agg AND the window
    val counts = pairs.groupBy(keyA).agg(count(lit(1)).as("__n"))
      .localCheckpoint(false) // consumed by the max probe AND the cumsum
    // domain + SKEW probe in ONE job over the |keyA-domain|-sized counts
    // frame (never the pairs): max(keyA) sizes the prefix-sum buckets;
    // max(__n) guards the one skew point of this construction — a single
    // keyA group's distinct-keyB set sorts inside one window partition
    // (step 3), so a group holding ~O(corpus) distinct continuations
    // would serialize one task. Natural text cannot produce it (groups
    // split geometrically per doubling round); an adversarial corpus can,
    // so the probe fails LOUDLY with the mitigation named instead of
    // letting one straggler task eat the cluster.
    val probeRow = counts.agg(max(col(keyA)), max(col("__n"))).head()
    val maxA = if (probeRow.isNullAt(0)) 0L else probeRow.getLong(0)
    val maxGroup = if (probeRow.isNullAt(1)) 0L else probeRow.getLong(1)
    require(maxA >= 0L, s"$keyA must be non-negative, saw max $maxA")
    val maxGroupBound = df.sparkSession.conf
      .get("spark.graft.pairrank.maxGroup", "100000000").toLong
    require(maxGroup <= maxGroupBound,
      s"PairRank: one $keyA group holds $maxGroup distinct $keyB values " +
        s"(bound $maxGroupBound, spark.graft.pairrank.maxGroup) — its " +
        "within-group window would serialize one task. Mitigation: salt " +
        s"$keyA with a $keyB prefix (order-preserving, e.g. shiftright) " +
        "and re-offset the per-salt ranks before retrying.")
    // offset frame ≈ domain/width rows: cap it at ~2M so its internal
    // ordering window stays trivial at any corpus scale
    val width = math.max(64L, maxA / 2000000L + 1L)
    val offs = PrefixSum.globalCumsum(counts, keyA, "__n", width)
      .select(col(keyA), col("cum_before").as("__off"))
    val wIn = Window.partitionBy(keyA).orderBy(keyB)
    pairs
      .withColumn("__rin", row_number().over(wIn).cast("long") - lit(1L))
      .join(offs, keyA) // hint-free: offs scales with domain, AQE decides
      .select(col(keyA), col(keyB), (col("__off") + col("__rin")).as(rankCol))
  }
}
