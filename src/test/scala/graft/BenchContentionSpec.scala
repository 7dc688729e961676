package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the self-enforcing contention gate's threshold (r15): a settled
  * calibration above 2x the clean-box median marks the whole bench run
  * CONTENDED — stderr warning + `"contended_run": true` in the artifact —
  * because the r13 driver bench was accepted 3x contended and its walls
  * minted a phantom +64% total that took a round to retire. The gate flags,
  * never aborts: a contended run still proves correctness.
  */
class BenchContentionSpec extends AnyFunSuite {

  test("isContended trips strictly above 2x the clean median") {
    assert(!Bench.isContended(0.9, 1.0))
    assert(!Bench.isContended(2.0, 1.0), "exactly 2x is the boundary, not a trip")
    assert(Bench.isContended(2.01, 1.0))
    assert(Bench.isContended(3.0, 1.0), "the accepted r13 shape (~3x) must trip")
  }

  test("clean median defaults to ~1 s (the rolling r12-r14 clean-calibration median)") {
    // env-overridable for a different box; unset in the test JVM
    if (!sys.env.contains("SPARK_GRAFT_CLEAN_CALIBRATION"))
      assert(Bench.cleanCalibrationSec === 1.0)
    // the recorded clean calibrations must all read as clean under the default
    for (c <- Seq(1.005, 0.92, 0.75))
      assert(!Bench.isContended(c), s"recorded clean calibration $c flagged")
    // and the r13 accepted-contended calibration must trip
    assert(Bench.isContended(2.97))
  }
}
