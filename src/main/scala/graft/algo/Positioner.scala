package graft.algo

/** R5 — full request-scoring flow: validate → status-filter (J3) →
  * context (R1) → select+weight (R2–R4) → run algorithms → combine (R6).
  *
  * Mirrors `wifi-positioning-service/.../service/PositioningServiceImpl.java:168-195`
  * and `algorithm/WifiPositioningCalculator.java:106-156,179-252`. The
  * reference runs algorithms on a thread pool with a 5 s timeout per
  * algorithm; here algorithms are pure, bounded-iteration functions, so a
  * sequential run per request is exact — batch scoring gets its parallelism
  * from Spark partitions instead of an executor pool.
  */
object Positioner {

  final case class Result(
      position: Position,
      algorithmsUsed: Seq[String],
      algorithmWeights: Map[String, Double],
      context: Selector.SelectionContext)

  /** Score one positioning request against the known-AP dimension subset. */
  def calculatePosition(scans: Seq[WifiScan], knownAps: Seq[AccessPoint]): Either[String, Result] = {
    if (scans == null || scans.isEmpty) return Left("empty scan")
    if (!SignalPhysics.isPhysicallyPossible(scans))
      return Left("physically impossible signal set")

    // J3 — drop APs whose status is not usable (e.g. expired).
    val usable = knownAps.filter(ap => AccessPoint.ValidStatuses.contains(ap.status))
    if (usable.isEmpty) return Left("no usable known APs")
    val apLookup = AlgoUtil.apMap(usable)
    val validScans = scans.filter(s => apLookup.contains(s.mac))
    if (validScans.isEmpty) return Left("no scans match known APs")

    val ctx = Selector.buildContext(validScans, apLookup)
    val selected = Selector.select(ctx)
    if (selected.isEmpty) return Left("no algorithm eligible")

    // Final weight = selection weight × algorithm self-confidence
    // (`WifiPositioningCalculator.java:222-230`).
    val produced = selected.flatMap { s =>
      s.algorithm.calculate(validScans, usable).map { p =>
        s.algorithm.name -> Combiner.WeightedPosition(p, s.weight * s.algorithm.baseConfidence)
      }
    }
    Combiner.combine(produced.map(_._2)) match {
      case Some(p) =>
        Right(Result(p, produced.map(_._1),
          selected.map(s => s.algorithm.name -> s.weight).toMap, ctx))
      case None => Left("no algorithm produced a position")
    }
  }
}
