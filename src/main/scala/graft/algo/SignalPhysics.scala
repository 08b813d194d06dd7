package graft.algo

/** P8 — Signal-physics validator: rejects physically impossible scan sets
  * before any positioning runs.
  *
  * Semantics per `wifi-positioning-service/.../service/SignalPhysicsValidator.java:31-112`:
  * every rssi must be in [−100, −30]; within each frequency group, if the
  * strongest signal exceeds −50 dBm the (max − min) spread must be ≤ 45 dB
  * (boundary pair −30/−100 explicitly allowed); weak groups pass.
  */
object SignalPhysics {
  val MaxSignal = -30.0
  val MinSignal = -100.0
  val StrongThreshold = -50.0
  val RangeThreshold = 45.0

  def isValidSignal(rssi: Double): Boolean = rssi >= MinSignal && rssi <= MaxSignal

  def isPhysicallyPossible(scans: Seq[WifiScan]): Boolean = {
    if (scans == null || scans.isEmpty) return false
    if (!scans.forall(s => isValidSignal(s.rssi))) return false
    scans.groupBy(_.frequencyMhz).values.forall(consistent)
  }

  private def consistent(group: Seq[WifiScan]): Boolean = {
    if (group.size < 2) return true
    val strongest = group.map(_.rssi).max
    val weakest = group.map(_.rssi).min
    if (strongest == MaxSignal && weakest == MinSignal) return true
    if (strongest > StrongThreshold) strongest - weakest <= RangeThreshold
    else true
  }
}
