package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Single source of truth for the host-speed normalization anchor: the
  * constant Bench.scala emits `value_norm` with must equal the frozen
  * value BENCH_NORM.md documents — the two drifting apart would silently
  * skew every future cross-round comparison (round-17 ADVICE). The spec
  * parses BOTH artifacts, so re-anchoring requires touching them
  * together (and starting a new BENCH_NORM table section per its own
  * contract). */
class BenchAnchorSpec extends AnyFunSuite with Matchers {

  test("Bench's calibNtRef matches the anchor BENCH_NORM.md documents") {
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/Bench.scala"))
    val codeAnchor = "val calibNtRef = ([0-9.]+)".r
      .findFirstMatchIn(src)
      .getOrElse(fail("Bench.scala no longer declares calibNtRef"))
      .group(1).toDouble
    val doc = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_NORM.md"))
    val docAnchor = "`calib_32t_ref`\\s*\\|\\s*([0-9.]+) s".r
      .findFirstMatchIn(doc)
      .getOrElse(fail("BENCH_NORM.md no longer documents calib_32t_ref"))
      .group(1).toDouble
    withClue("code anchor vs BENCH_NORM.md anchor")(
      codeAnchor shouldBe docAnchor)
  }
}
