package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the explicit form of the runtime filter
  * every warehouse engine applies to selective fact⋈dim joins at scale:
  * when the dimension side is small-after-filtering but the fact side is
  * 100 TB, shuffling fact rows that can never match is pure waste. A Bloom
  * filter of the dimension keys (a few MB for millions of keys at 1% fpp)
  * rides to every fact task and discards non-matching rows AT THE SCAN,
  * before the shuffle.
  *
  * Correctness: a Bloom filter has NO false negatives, so pruning never
  * drops a matching row; false positives only let some non-matching rows
  * through to the real join, which removes them — the result is exactly the
  * plain join's (the registered query's oracle states precisely that).
  * Spark's AQE injects this automatically in some shapes
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); the explicit
  * operator covers the shapes AQE misses and makes the prune visible and
  * testable.
  *
  * The filter is built with DataFrameStatFunctions.bloomFilter — a
  * distributed aggregation whose driver-side result is dimension-bounded
  * (like any broadcast), never fact-sized.
  */
object BloomPrune {

  /** Prune `fact` to rows whose `factKey` might appear in `dim`'s
    * `dimKey` column, then (optionally) the caller completes the exact
    * join. `expectedKeys` sizes the filter; `fpp` trades filter bytes for
    * pass-through rate. */
  def prunedSemiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    // The probe must hash EXACTLY the representation the filter was built
    // over — a blanket cast('long') would null out string keys and silently
    // drop every row. Dispatch on the fact key's type; reject types the
    // sketch does not support rather than mis-probe them.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    def family(t: org.apache.spark.sql.types.DataType): String = t match {
      case LongType | IntegerType | ShortType | ByteType => "integral"
      case StringType => "string"
      case other => other.typeName
    }
    val keyType = fact.schema(factKey).dataType
    require(family(keyType) == family(dim.schema(dimKey).dataType),
      s"fact key '$factKey' (${family(keyType)}) and dim key '$dimKey' " +
        s"(${family(dim.schema(dimKey).dataType)}) must share a type family — " +
        "the sketch hashes the native representation")
    // The dimension subtree feeds THREE consumers (isEmpty probe, bloom
    // aggregation, exact semi-join) and the first two are eager actions at
    // construction time — materialize it ONCE so each consumer reads the
    // cached blocks instead of re-running the dim scan. The materialized
    // side is dimension-bounded by the operator's contract (that's the
    // premise of bloom pruning), so the storage cost is a broadcast-scale
    // footprint, never fact-sized.
    val dimM = dim.localCheckpoint(false)
    // An empty dimension yields no sketch to merge (stat.bloomFilter NPEs);
    // the prune is then the semi-join itself: nothing matches.
    val pruned =
      if (dimM.isEmpty) fact.where(lit(false))
      else {
        val bloom = dimM.stat.bloomFilter(dimKey, expectedKeys, fpp)
        val bloomBc = fact.sparkSession.sparkContext.broadcast(bloom)
        // null keys: a null input to these UDFs yields null, the filter
        // drops the row — matching semi-join semantics exactly
        val probe = keyType match {
          case LongType | IntegerType | ShortType | ByteType =>
            val f = udf((k: Long) => bloomBc.value.mightContainLong(k))
            f(col(factKey).cast("long"))
          case StringType =>
            // reference-typed UDFs ARE invoked with null (only primitive
            // params short-circuit) and mightContainString(null) NPEs —
            // guard explicitly
            val f = udf((k: String) =>
              if (k == null) false else bloomBc.value.mightContainString(k))
            f(col(factKey))
          case t => throw new IllegalArgumentException(
            s"BloomPrune supports integral and string keys, got $t for '$factKey'")
        }
        // null keys can never match a semi-join; drop them up front on
        // every type path rather than relying on probe null semantics
        fact.where(col(factKey).isNotNull && probe)
      }
    // exact semi-join removes bloom false positives
    pruned.join(dimM.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_semi")
  }
}
