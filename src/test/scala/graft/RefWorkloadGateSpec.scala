package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** CI pin for the baseline-parity claim: the reference's own published
  * workload (BASELINE.md macro rows — load both fixture XMLs incl. ratio
  * columns, hot_path(0.01)×2, compact×2, flame geometry×2, each fully
  * materialized) must complete under the reference's single-threaded 40.7 s.
  *
  * The bound is deliberately the FULL baseline (ratio 1.0), not the ~0.36×
  * the harness measures cold at local[32] (graft.RefWorkload): this suite
  * runs at local[4] on a box whose throughput drifts ±2-3× (BASELINE.md's
  * calibration caveats), so a tight bound would flake. What the gate catches
  * is a structural regression in the hpct path — an accidental quadratic, a
  * lost broadcast, a driver-side loop — which shows up as >5× on this
  * workload, far past the headroom. Precise ratios stay the job of
  * `runMain graft.RefWorkload` (cold JVM, local[32]), re-measured per round.
  */
class RefWorkloadGateSpec extends AnyFunSuite {

  private val files = Seq(
    "/root/reference/test/data/experiment1.xml",
    "/root/reference/test/data/experiment2.xml")

  test("reference workload completes under the published pandas baseline (40.7 s)") {
    val bound = RefWorkload.baselineSec
    assume(files.forall(new java.io.File(_).exists()), "reference fixtures not present")
    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def runWorkload(): Double = {
      val t0 = System.nanoTime()
      val pfs = files.map(hpct.ProfileLoad.load(spark, _))
      pfs.foreach(pf => force(pf.df))
      pfs.foreach(pf => force(hpct.Ops.hotPath(pf, threshold = 0.01).df))
      pfs.foreach(pf => force(hpct.Ops.compact(pf).df))
      pfs.foreach(pf => force(hpct.Ops.flameGeometry(pf)))
      (System.nanoTime() - t0) / 1e9
    }
    // measured 5.8 s warm at local[4] (chain-3 run) — ~7x headroom vs the bound,
    // so the documented ±2-3x box drift cannot flake the gate; a one-off
    // contention SPIKE past even that gets one retry before the assert, so a
    // single stalled sample cannot fail CI without any code regression (a
    // structural regression fails both runs)
    val first = runWorkload()
    val sec = if (first < bound) first else {
      info(f"first run $first%.1f s exceeded the bound — retrying once to rule out a contention spike")
      runWorkload()
    }
    info(f"ref workload wall: $sec%.1f s (baseline $bound%.1f s)")
    assert(sec < bound,
      f"reference workload took $sec%.1f s (twice) — slower than the reference's own " +
        "single-threaded pandas run; the hpct path has structurally regressed")
  }
}
