package graft

import org.scalatest.funsuite.AnyFunSuite

/** The calibration is only a calibration if the workload never moves:
  * benchgate divides thresholds by the ratio of two hostcal_ms
  * samples, so a silently edited loop (different iteration count,
  * different fold) would re-zero every cross-round comparison while
  * still "working". The checksum is the tripwire; this spec pins it
  * and the measurement contract.
  */
class HostCalSpec extends AnyFunSuite {
  test("workload checksum is pinned at the measurement size") {
    assert(HostCal.workload(HostCal.measureN) == HostCal.expected)
  }

  test("workload is a pure function of n") {
    assert(HostCal.workload(1000L) == HostCal.workload(1000L))
    assert(HostCal.workload(1000L) != HostCal.workload(1001L))
  }

  test("hostcalMs measures a plausible wall time") {
    val ms = HostCal.hostcalMs()
    // 64M hash folds: > 10 ms on any real machine, < 60 s even on a
    // hopelessly contended one — the point is "did it time the loop",
    // not the value
    assert(ms > 10.0 && ms < 60000.0, s"hostcal_ms = $ms")
  }
}
