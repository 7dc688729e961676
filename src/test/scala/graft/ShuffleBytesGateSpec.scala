package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** Quantitative plan-regression net (r15): pins per-query SHUFFLE-WRITE bytes
  * at sf0.1 for the top-shuffle rows plus two broadcast-protected joins.
  *
  * Why bytes, not plan strings: r14 measured spill/shuffle bytes repeating to
  * ~0.1% across reps at fixed memory shape while wall time drifts ±30%
  * cross-day (SCALECHECK.md) — bytes are a deterministic function of the
  * physical plan and the data. PlanAuditSpec asserts plan SHAPES (pushdown,
  * broadcast, no cartesian) for specific named properties; this gate catches
  * the quantitative residue those assertions can't name in advance: a lost
  * broadcast, a new exchange, a dropped pushdown, or a widened shuffle row
  * all move a pinned row's bytes far outside ±50%, while framing differences
  * between shapes (4 test partitions vs 32 bench partitions) move them a few
  * percent.
  *
  * Pins derive from target/bench_last.json (the r14 driver bench, calibration
  * 1.005, clean) at ±50%. The broadcast-protected rows pin a CEILING instead:
  * their correct plans shuffle ≈0 MB (only tiny pre-aggregated partials), and
  * losing the broadcast shuffles both join sides. The ceilings are sized from
  * MEASUREMENT, not guessed (r15, SCALECHECK.md): healthy b15 shuffles
  * 0.002 MB and a forced merge-join 0.152 MB — a 2 MB "generous" ceiling
  * would have passed the broken plan silently, so b15 pins 0.1 MB (50x the
  * healthy bytes, 1.5x under the broken ones). Two breakages were
  * demonstrated to trip in-tree before committing the pins: b15's broadcast
  * replaced by hint("merge") (0.002 -> 0.152 MB, over its ceiling) and an
  * extra repartition injected into b01 (8.3 -> 17.3 MB, over its +50% lid).
  *
  * Each query runs once UNMEASURED first (builds the shared caches the bench
  * prewarms before attaching its listener — without this, d11's first touch
  * would attribute its cache build's shuffle to the query) and once measured.
  */
class ShuffleBytesGateSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  // name -> (minMb, maxMb)
  private val pins: Seq[(String, Double, Double)] = Seq(
    ("b08_insert_column", 7, 21), // bench 14 MB: full-width projection sort
    ("b20_math", 6.5, 19.5), //      bench 13 MB: codegen projection + total sort
    ("b01_project", 4, 12), //       bench  8 MB: pruned-column projection sort
    ("b18_arrays", 4, 12), //        bench  8 MB: spill-safe count reconstruction
    ("e06_sessions_salted", 2.5, 7.5), // bench 5 MB: salted two-phase sessions
    ("e07_dedup_events", 2.5, 7.5), //    bench 5 MB: keyed dedup window
    // broadcast-protected: measured ceilings (see scaladoc) — healthy 0.002
    // and 0.217 MB; a lost broadcast lands at 0.15+ and ~1+ MB respectively
    ("b15_dimjoin", 0, 0.1),
    // 0.5 = 2.3x the measured healthy 0.217 MB; the old 1.0 ceiling sat ON
    // the measured broken-plan landing zone (~1+ MB) so a regression at
    // 0.9 MB would have passed (r15 ADVICE — same measured-ceiling method
    // as b15)
    ("d11_decontam", 0, 0.5),
    // r18: d12's single-exchange guarded shape — codegen'd count partials +
    // the pruned non-singleton membership remainder (the hot-key side
    // broadcasts). Measured healthy 0.271 MB; the nearest measured broken
    // plan (losing the singleton pre-drop: the full payload rides the
    // exchange) lands at 0.587 MB, and a multi-exchange regression (the old
    // candidates-then-two-signature-joins form) higher still — 0.45 sits
    // 1.7x over healthy and 30% under the closest broken landing zone, the
    // same measured-ceiling method as b15/d11.
    ("d12_simhash128_neardup", 0, 0.45))

  private lazy val metrics: StageMetrics = {
    val m = new StageMetrics
    spark.sparkContext.addSparkListener(m)
    m
  }

  private def measure(name: String): (Double, Double) = {
    val q = SparkEntry.queries(name)
    // warmup rep: shared-cache builds and codegen land outside the window
    q(spark, sf).write.format("noop").mode("overwrite").save()
    StageMetrics.drain(spark)
    val (sp0, sh0) = metrics.snapshot
    // noop sink, same as Bench: count() would let Catalyst prune every column
    q(spark, sf).write.format("noop").mode("overwrite").save()
    StageMetrics.drain(spark)
    val (sp1, sh1) = metrics.snapshot
    ((sh1 - sh0).toDouble / (1 << 20), (sp1 - sp0).toDouble / (1 << 20))
  }

  for ((name, lo, hi) <- pins)
    test(s"$name shuffle-write bytes within [$lo, $hi] MB of the pinned plan") {
      val (mb, spill) = measure(name)
      info(f"measured shuffle $mb%.3f MB spill $spill%.1f MB") // visible drift tell
      assert(mb >= lo && mb <= hi,
        f"$name shuffled $mb%.2f MB, outside the pinned [$lo, $hi] MB - a " +
          "plan structure change (lost broadcast / new exchange / dropped " +
          "pushdown), not noise: bytes repeat to ~0.1% at fixed shape")
      // sf0.1 fits execution memory with two decades to spare: ANY spill here
      // means a memory-hostile operator entered the plan (TypedImperative
      // aggregate, object hash map, unbounded sort buffer) - the class that
      // OOM'd sf100 before the fixed-width reformulations (SCALECHECK r12)
      assert(spill <= 1.0,
        f"$name spilled $spill%.1f MB at sf0.1 - a memory-hostile operator " +
          "entered the plan; it will not survive two more decades")
    }
}
