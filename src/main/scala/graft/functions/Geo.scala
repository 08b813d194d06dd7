package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic column expressions.
  *
  * Semantics: haversine great-circle distance with Earth radius 6,371,000 m,
  * matching the reference comparison service
  * (`wifi-positioning-integration-service/.../service/ComparisonService.java:29,288-290`)
  * and the trilateration algorithm's internal distance
  * (`wifi-positioning-service/.../impl/TrilaterationAlgorithm.java:1034-1055`).
  *
  * Everything here is a pure `Column` expression — it stays inside
  * whole-stage codegen (no UDF), so at 100 TB the distance math runs fused
  * with the scan with zero serialization overhead.
  */
object Geo {
  val EarthRadiusMeters: Double = 6371000.0

  /** Great-circle distance in meters between (lat1,lon1) and (lat2,lon2), degrees in. */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0 * EarthRadiusMeters) * asin(sqrt(a))
  }

  /** Combined 1-sigma uncertainty of two independent position estimates:
    * sqrt(acc1^2 + acc2^2) (`ComparisonService.java:293-299`). */
  def expectedUncertainty(acc1: Column, acc2: Column): Column =
    sqrt(acc1 * acc1 + acc2 * acc2)

  /** Whether the distance between two estimates is explained by their
    * combined uncertainty (the reference's "within expected" check). */
  def withinExpected(distanceM: Column, acc1: Column, acc2: Column): Column =
    distanceM <= expectedUncertainty(acc1, acc2)

  /** Point-in-polygon by ray casting on an INTEGER lattice — the geofence
    * predicate (is this AP/measurement inside the campus / region / market
    * boundary?) as a pure column expression. Coordinates and vertices are
    * integers (e.g. micro-degrees), and the crossing test uses cross-
    * multiplication instead of division, so every comparison is exact
    * BIGINT arithmetic — restatable verbatim by a SQL oracle and immune to
    * float boundary flapping. For each edge (x1,y1)→(x2,y2): the
    * horizontal ray from the point crosses it iff the edge spans the
    * point's y strictly on one side ((y1 > py) ≠ (y2 > py)) and the
    * intersection lies right of the point — (px−x1)(y2−y1) < (x2−x1)(py−y1)
    * sign-adjusted by the edge direction. Odd crossing count = inside.
    * Polygons may be non-convex; vertices in order, closed implicitly.
    * Stays inside whole-stage codegen (no UDF). */
  def pointInPolygon(px: Column, py: Column, vertices: Seq[(Long, Long)]): Column = {
    require(vertices.length >= 3, "polygon needs at least 3 vertices")
    val crossings = vertices.indices.map { i =>
      val (x1, y1) = vertices(i)
      val (x2, y2) = vertices((i + 1) % vertices.length)
      val spans = (lit(y1) > py) =!= (lit(y2) > py)
      val lhs = (px - lit(x1)) * lit(y2 - y1)
      val rhs = lit(x2 - x1) * (py - lit(y1))
      val rightOf = if (y2 - y1 > 0) lhs < rhs else lhs > rhs
      when(spans && rightOf, 1).otherwise(0)
    }.reduce(_ + _)
    // Bounding-box guard conjoined FIRST: semantically redundant (a point
    // outside the bbox casts zero crossings) but load-bearing at scale —
    // plain range predicates short-circuit the edge tests for the vast
    // majority of rows, and when the whole expression is used as a filter
    // they are the part Catalyst can push to the scan (the c8
    // CircleFilterRule precedent, needing no rule here because the box is
    // a static conjunction, not a derived one).
    val minX = vertices.map(_._1).min; val maxX = vertices.map(_._1).max
    val minY = vertices.map(_._2).min; val maxY = vertices.map(_._2).max
    px >= lit(minX) && px <= lit(maxX) &&
      py >= lit(minY) && py <= lit(maxY) &&
      crossings % 2 === 1
  }

  /** [[pointInPolygon]] for a TRANSLATED polygon family: the same base
    * vertex ring shifted per row by integer offset columns (dx, dy) — the
    * shape of a polygon DIMENSION TABLE whose members share one template
    * (tiles, per-market service areas). Translation preserves every edge
    * DELTA, so the per-edge cross-multiplication constants and direction
    * signs stay compile-time static exactly as in the fixed-polygon form;
    * only the vertex anchors shift by the row's offsets. Same exact
    * integer arithmetic, same bbox guard (translated), same non-convex
    * support. */
  def pointInPolygonT(
      px: Column, py: Column, dx: Column, dy: Column,
      baseVertices: Seq[(Long, Long)]): Column = {
    require(baseVertices.length >= 3, "polygon needs at least 3 vertices")
    val crossings = baseVertices.indices.map { i =>
      val (x1, y1) = baseVertices(i)
      val (x2, y2) = baseVertices((i + 1) % baseVertices.length)
      val spans = (lit(y1) + dy > py) =!= (lit(y2) + dy > py)
      val lhs = (px - (lit(x1) + dx)) * lit(y2 - y1)
      val rhs = lit(x2 - x1) * (py - (lit(y1) + dy))
      val rightOf = if (y2 - y1 > 0) lhs < rhs else lhs > rhs
      when(spans && rightOf, 1).otherwise(0)
    }.reduce(_ + _)
    val minX = baseVertices.map(_._1).min; val maxX = baseVertices.map(_._1).max
    val minY = baseVertices.map(_._2).min; val maxY = baseVertices.map(_._2).max
    px >= lit(minX) + dx && px <= lit(maxX) + dx &&
      py >= lit(minY) + dy && py <= lit(maxY) + dy &&
      crossings % 2 === 1
  }

  /** Exact polygon area on the integer lattice: the SHOELACE sum
    * Σ (xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ) over the closed ring — returned as
    * |2A| (twice the area), which is always an INTEGER for lattice
    * vertices, so the result is exact BIGINT arithmetic with no float and
    * orientation-independent. Input is one edge per row (the lead-over-
    * vertex-order shape); this is the per-edge TERM to SUM per polygon. */
  def shoelaceTerm(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    x1 * y2 - x2 * y1
}
