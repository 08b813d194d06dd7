package graft.algo

import factors._

/** R1–R4 — rule-based algorithm selection.
  *
  * Semantics per `wifi-positioning-service/.../selection/`:
  *  - R1 context (`SelectionContextBuilder.java:32-50`): AP count, signal
  *    quality from mean RSSI, signal distribution from RSSI stddev, geometric
  *    quality from AP collinearity/GDOP (fewer than 3 located APs → Poor).
  *  - R2 hard constraints (`AlgorithmSelector.java:51-161,577-640`): very
  *    weak → {proximity}; 1 AP → {proximity, log-distance}; 2 APs →
  *    +{rssi-ratio, weighted-centroid}; 3 APs → all but max-likelihood; 4+ →
  *    all; collinear/poor geometry knocks out trilateration.
  *  - R3 weighting (`AlgorithmSelector.java:273-294`): weight = base(apCount)
  *    × signalMult × geometricMult × distributionMult (tables live on each
  *    algorithm object).
  *  - R4 finalists (`AlgorithmSelector.java:31,362-439`): drop weight < 0.4
  *    unless sole survivor; top weight > 0.8 → keep top 2; else top 3 when
  *    more than 3 remain.
  */
object Selector {
  val WeightThreshold = 0.4
  val HighConfidenceThreshold = 0.8

  val AllAlgorithms: Seq[PositioningAlgorithm] =
    Seq(Proximity, RssiRatio, WeightedCentroid, Trilateration, MaxLikelihood, LogDistance)

  final case class SelectionContext(
      apCount: ApCount,
      signalQuality: SignalQuality,
      signalDistribution: SignalDistribution,
      geometricQuality: GeometricQuality)

  final case class Selected(algorithm: PositioningAlgorithm, weight: Double)

  /** R1 — evaluate scenario characteristics. */
  def buildContext(scans: Seq[WifiScan], aps: Map[String, AccessPoint]): SelectionContext = {
    val distinctMacs = scans.map(_.mac).distinct.size
    val rssis = scans.map(_.rssi)
    val signalQuality = SignalQuality.of(AlgoUtil.mean(rssis, -100.0))
    val distribution = SignalDistribution.of(AlgoUtil.stddevPop(rssis))

    val located = scans.flatMap(s => aps.get(s.mac)).distinct
    val geometric =
      if (located.size < 3) GeometricQuality.Poor
      else if (Gdop.isCollinear(located.map(_.lat), located.map(_.lon)))
        GeometricQuality.Collinear
      else {
        val cLat = located.map(_.lat).sum / located.size
        val cLon = located.map(_.lon).sum / located.size
        val gdop = Gdop.calculateGDOP(
          located.map(ap => Array(ap.lat, ap.lon)).toArray,
          Array(cLat, cLon), includeBiasTerm = true)
        GeometricQuality.of(gdop)
      }
    SelectionContext(ApCount.of(distinctMacs), signalQuality, distribution, geometric)
  }

  /** R2 — hard constraints on the candidate set. */
  def hardConstraints(ctx: SelectionContext): Seq[PositioningAlgorithm] = {
    if (ctx.signalQuality == SignalQuality.VeryWeak) return Seq(Proximity)
    val byCount: Seq[PositioningAlgorithm] = ctx.apCount match {
      case ApCount.Single => Seq(Proximity, LogDistance)
      case ApCount.Two    => Seq(Proximity, RssiRatio, WeightedCentroid, LogDistance)
      case ApCount.Three  => AllAlgorithms.filterNot(_ == MaxLikelihood)
      case ApCount.FourPlus => AllAlgorithms
    }
    ctx.geometricQuality match {
      case GeometricQuality.Collinear | GeometricQuality.Poor =>
        byCount.filterNot(_ == Trilateration)
      case _ => byCount
    }
  }

  /** R3 + R4 — weight eligible algorithms and pick the finalists. */
  def select(ctx: SelectionContext): Seq[Selected] = {
    val weighted = hardConstraints(ctx).map { a =>
      Selected(a,
        a.apCountWeight(ctx.apCount) *
          a.signalMultiplier(ctx.signalQuality) *
          a.geometryMultiplier(ctx.geometricQuality) *
          a.distributionMultiplier(ctx.signalDistribution))
    }
    if (weighted.isEmpty) return Nil

    // Threshold filter — a sole survivor keeps its weight regardless.
    val aboveThreshold =
      if (weighted.size == 1) weighted
      else weighted.filter(_.weight >= WeightThreshold)
    if (aboveThreshold.isEmpty) return Nil

    val sorted = aboveThreshold.sortBy(-_.weight)
    if (sorted.head.weight > HighConfidenceThreshold) sorted.take(2)
    else if (sorted.size > 3) sorted.take(3)
    else sorted
  }
}
