package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

final case class WclIn(latQ: Long, lonQ: Long, w2: Long)
final case class WclBuf(sLat: Long, sLon: Long, sW: Long)
final case class WclOut(latMicro: Long, lonMicro: Long, w2Sum: Long)

/** The weighted-centroid aggregation (SURVEY §2.10's UDAF row) as a typed
  * `Aggregator[IN, BUF, OUT]` — the registration path a user extends when a
  * grouped computation doesn't decompose into built-in aggregates. The WCL
  * itself (reference `WeightedCentroid`/P2) IS expressible with built-ins
  * (and p2_weighted_centroid does exactly that); this Aggregator exists to
  * pin the extension type end to end: typed buffer, merge associativity,
  * `functions.udaf` registration, SQL/DataFrame use, and an oracle gate.
  *
  * All fields are quantized BIGINTs (micro-degree coordinates, half-unit
  * weights), so `reduce` and `merge` are exact integer monoid ops — the
  * aggregation is associative and commutative BY CONSTRUCTION, which is the
  * property Spark requires of a distributed Aggregator and the property the
  * cross-engine hash gate then proves held. */
object WclAggregator extends Aggregator[WclIn, WclBuf, WclOut] {

  override def zero: WclBuf = WclBuf(0L, 0L, 0L)

  override def reduce(b: WclBuf, a: WclIn): WclBuf =
    WclBuf(b.sLat + a.latQ * a.w2, b.sLon + a.lonQ * a.w2, b.sW + a.w2)

  override def merge(b1: WclBuf, b2: WclBuf): WclBuf =
    WclBuf(b1.sLat + b2.sLat, b1.sLon + b2.sLon, b1.sW + b2.sW)

  /** True floor division, matching DuckDB's `//` for ANY sign — negative
    * coordinates (southern/western hemispheres) are normal for the weighted
    * lat/lon centroids this Aggregator templates, and Scala's `/` truncates
    * toward zero, which would diverge by 1 on negative sums. */
  override def finish(r: WclBuf): WclOut =
    if (r.sW == 0) WclOut(0L, 0L, 0L)
    else WclOut(Math.floorDiv(r.sLat, r.sW), Math.floorDiv(r.sLon, r.sW), r.sW)

  override def bufferEncoder: Encoder[WclBuf] = Encoders.product[WclBuf]
  override def outputEncoder: Encoder[WclOut] = Encoders.product[WclOut]
}
