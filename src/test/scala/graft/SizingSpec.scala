package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark
import graft.queries.Sizing

/** Pins the volume-derived shuffle-sizing rule (Sizing): the pure math, the
  * raise-only clamp, and the AQE-aware application path. The rule exists
  * because sf100 proved 32 partitions OOM on ~500M-row aggregations while 256
  * complete (SCALECHECK.md); these tests make sure the automation can never
  * shrink an explicit setting or fire at test/bench scale.
  */
class SizingSpec extends AnyFunSuite {

  private val InitKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  /** Run `body` with conf captured and restored (including unset keys), so a
    * failure can't leak a mutated config into later suites sharing the session.
    */
  private def withConfRestored[A](keys: String*)(body: => A): A = {
    val s = spark
    val saved = keys.map(k => k -> s.conf.getOption(k))
    try body
    finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("computedPartitions: 32 MB per partition, clamped to 4096") {
    assert(Sizing.computedPartitions(0L) === 0)
    assert(Sizing.computedPartitions(1L) === 1)
    assert(Sizing.computedPartitions(32L << 20) === 1)
    assert(Sizing.computedPartitions((32L << 20) + 1) === 2)
    // the measured sf100 cliff: 240 OOMs d09, 256 completes — so a 15 GB dir
    // must size WELL above 256, not land next to the cliff (480 = 2x headroom)
    assert(Sizing.computedPartitions(15L << 30) === 480)
    assert(Sizing.computedPartitions(15L << 30) >= 2 * 240,
      "sizing must clear the measured OOM cliff with real margin")
    assert(Sizing.computedPartitions(1L << 40) === Sizing.MaxPartitions)
  }

  test("applyTarget never lowers the current setting") {
    withConfRestored("spark.sql.shuffle.partitions", InitKey) {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(Sizing.applyTarget(spark, 2) === 4)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
      assert(spark.conf.getOption(InitKey).isEmpty)
    }
  }

  test("applyTarget raises shuffle.partitions itself (base conf, not initialPartitionNum)") {
    // the r10 sf100 A/B found the two knobs equivalent at equal values; the
    // base conf wins on coverage (reaches direct conf readers too) — see
    // Sizing.applyTarget's scaladoc
    withConfRestored("spark.sql.shuffle.partitions", InitKey) {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(Sizing.applyTarget(spark, 256) === 256)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "256")
      assert(spark.conf.getOption(InitKey).isEmpty)
      // a second, smaller raise must not shrink the sized value
      assert(Sizing.applyTarget(spark, 128) === 256)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "256")
    }
  }

  test("applyTarget: concurrent raises are monotonic (smaller can never land over larger)") {
    // Bench's concurrent prewarm runs two different-valued sizing paths in
    // parallel (dir-footprint autoSize and 8x-documents autoSizeShingleExchange).
    // Before the synchronized max-apply, a smaller raise whose read happened
    // before a larger raise's set could overwrite it — a shingle cache
    // materialized in that window would run under-partitioned (the exact OOM
    // the rule prevents). Hammer the two values from racing threads; the
    // effective setting must always end at the max.
    withConfRestored("spark.sql.shuffle.partitions", InitKey) {
      (1 to 20).foreach { _ =>
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        try {
          Seq(1433, 344)
            .map(v => pool.submit(new Runnable {
              def run(): Unit = { Sizing.applyTarget(spark, v); () }
            }))
            .foreach(_.get())
        } finally pool.shutdown()
        assert(spark.conf.get("spark.sql.shuffle.partitions") === "1433")
      }
    }
  }

  test("applyTarget raises a pinned initialPartitionNum in lockstep (it would otherwise win)") {
    // Spark prefers initialPartitionNum over shuffle.partitions when AQE
    // coalescing is on — a session that pinned it small (pre-r10 graft did)
    // would silently defeat the base-conf raise and re-OOM at sf100
    withConfRestored("spark.sql.shuffle.partitions", InitKey) {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set(InitKey, "8")
      assert(Sizing.applyTarget(spark, 256) === 256)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "256")
      assert(spark.conf.get(InitKey) === "256")
      // a pin LARGER than the computed value is someone's explicit headroom —
      // leave it alone
      spark.conf.set(InitKey, "4096")
      assert(Sizing.applyTarget(spark, 512) === 512)
      assert(spark.conf.get(InitKey) === "4096")
    }
  }

  test("applyTarget raises a small pin even when the base conf is already large") {
    // the early-return hazard: cur=1024 >= computed=480 must NOT skip the
    // lockstep — Spark prefers the pinned initialPartitionNum, so a tiny pin
    // caps the effective initial count regardless of the big base
    withConfRestored("spark.sql.shuffle.partitions", InitKey) {
      spark.conf.set("spark.sql.shuffle.partitions", "1024")
      spark.conf.set(InitKey, "8")
      assert(Sizing.applyTarget(spark, 480) === 1024)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "1024",
        "raise-only: the larger base stays")
      assert(spark.conf.get(InitKey) === "1024",
        "the tiny pin must rise to the effective base or it silently wins")
    }
  }

  test("autoSize does not memoize a listing failure (next touch retries)") {
    withConfRestored("spark.sql.shuffle.partitions", InitKey) {
      Sizing.clearCache()
      val tmp = java.nio.file.Files.createTempDirectory("graft-sizing-retry")
      val dir = tmp.resolve("data").toString
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      // first touch: dir missing -> listing fails -> fall back, NOT memoized
      assert(Sizing.autoSize(spark, dir) === before.toInt)
      // dir appears (the transient error clears): the retry must size it
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "x"),
        new Array[Byte](1024))
      val second = Sizing.autoSize(spark, dir)
      assert(second === math.max(before.toInt, Sizing.computedPartitions(1024L)),
        "a transient listing failure must not disable sizing for the session")
      java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "x"))
      java.nio.file.Files.delete(java.nio.file.Paths.get(dir))
      java.nio.file.Files.delete(tmp)
      Sizing.clearCache()
    }
  }

  test("footprintBytesCached: -1 on error, never memoized; success memoized") {
    Sizing.clearCache()
    val bad = "/nonexistent/graft-sizing-spec-fp"
    assert(Sizing.footprintBytesCached(spark, bad) === -1L,
      "a listing failure must read as UNKNOWN, not as tiny input")
    // the failure must not poison the cache: create the dir and retry
    val tmp = java.nio.file.Files.createTempDirectory("graft-sizing-fp")
    java.nio.file.Files.write(tmp.resolve("x"), Array[Byte](1, 2, 3))
    try {
      assert(Sizing.footprintBytesCached(spark, bad) === -1L)
      assert(Sizing.footprintBytesCached(spark, tmp.toString) === 3L)
      // memoized: deleting the backing file must not change the cached answer
      java.nio.file.Files.delete(tmp.resolve("x"))
      assert(Sizing.footprintBytesCached(spark, tmp.toString) === 3L)
    } finally {
      java.nio.file.Files.deleteIfExists(tmp.resolve("x"))
      java.nio.file.Files.delete(tmp)
      Sizing.clearCache()
    }
  }

  test("autoSize on a small real dir is a no-op for the session config") {
    withConfRestored("spark.sql.shuffle.partitions", InitKey) {
      Sizing.clearCache()
      val dir = "/root/testdata/sf0.001"
      val bytes = Sizing.footprintBytes(spark, dir)
      assert(bytes > 0L, "footprint listing must see the parquet files")
      assert(Sizing.computedPartitions(bytes) < 4,
        "sf0.001 must sit far below the session default, or bench scale would re-plan")
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      assert(Sizing.autoSize(spark, dir) === before.toInt)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
      assert(spark.conf.getOption(InitKey).isEmpty)
      Sizing.clearCache()
    }
  }

  test("shingle-exchange expansion clears the measured fifth-decade wall with margin") {
    // sf1000's documents.parquet is ~5.6 GB; the round-10 campaign measured
    // auto-344 (the base dir rule) OOMing d09's verify and 1024 completing.
    // The expansion rule must size a 5.6 GB documents table WELL above 1024,
    // and must leave the bench corpora (sf0.1 docs ~6 MB) untouched.
    val fifth = Sizing.computedPartitions((56L << 30) / 10 * Sizing.ShingleExpansion)
    assert(fifth >= 1024, s"must clear the proven-good 1024, got $fifth")
    assert(fifth >= (1.3 * 1024).toInt,
      "sizing must clear the known-good point with real margin, not land on it")
    assert(Sizing.computedPartitions((6L << 20) * Sizing.ShingleExpansion) < 32,
      "small-sf corpora must stay below the session default (raise-only no-op)")
  }

  test("d09's per-query expansion derives its measured fifth-decade partition floor") {
    // r16 (SCALECHECK §7): on the aggregate candidate plan, d09 at sf1000
    // (5.4 GB documents) OOMs a shuffle write at the family rule's ~1400
    // partitions and completes at 2048 — a floor the r16 round documented
    // as a manual knob. The override must DERIVE >= 2048 from the
    // demonstrated footprint (with real margin, not landing on the cliff),
    // must exceed the family rule (or it is no override), and must leave
    // every other family member on the family rule.
    val d09 = Sizing.shingleExpansionFor("d09_dedup_clusters")
    val floor = Sizing.computedPartitions((54L << 30) / 10 * d09)
    assert(floor >= 2048, s"must clear the proven-good 2048, got $floor")
    assert(floor >= (1.2 * 2048).toInt,
      "sizing must clear the known-good point with real margin, not land on it")
    assert(d09 > Sizing.ShingleExpansion)
    for (q <- Seq("d05_jaccard", "d10_clean_corpus", "d10_clean_staged", "d11_decontam"))
      assert(Sizing.shingleExpansionFor(q) === Sizing.ShingleExpansion,
        s"$q ran green on the family rule at sf1000 — no override is measured for it")
    // and the small-sf no-op contract holds at the override too
    assert(Sizing.computedPartitions((6L << 20) * d09) < 32)
  }

  test("autoSizeShingleExchange: raises from the documents table footprint × expansion") {
    withConfRestored("spark.sql.shuffle.partitions", InitKey) {
      Sizing.clearCache()
      val tmp = java.nio.file.Files.createTempDirectory("graft-sizing-shingle")
      val doc = tmp.resolve("documents.parquet")
      java.nio.file.Files.createDirectories(doc)
      // 48 MB of fake footprint: base rule gives 2 partitions, ×8 gives 12
      java.nio.file.Files.write(doc.resolve("part-0"), new Array[Byte](48 << 20))
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        val sized = Sizing.autoSizeShingleExchange(spark, doc.toString)
        assert(sized === Sizing.computedPartitions((48L << 20) * Sizing.ShingleExpansion))
        assert(sized === 12)
        assert(spark.conf.get("spark.sql.shuffle.partitions") === "12")
        // unknown footprint fails SAFE to the current setting, not to tiny
        assert(Sizing.autoSizeShingleExchange(spark, "/nonexistent/graft-shingle") === 12)
      } finally {
        java.nio.file.Files.delete(doc.resolve("part-0"))
        java.nio.file.Files.delete(doc)
        java.nio.file.Files.delete(tmp)
        Sizing.clearCache()
      }
    }
  }

  test("autoSize survives an unreadable dir (falls back to current setting)") {
    withConfRestored("spark.sql.shuffle.partitions", InitKey) {
      Sizing.clearCache()
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      assert(Sizing.autoSize(spark, "/nonexistent/graft-sizing-spec") === before.toInt)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
      Sizing.clearCache()
    }
  }

  test("maxUsefulParallelism encodes the measured r12 density wall") {
    // the three measured sf100 shapes: 8g/32 and 8g/16 fail, 16g/16 passes
    assert(Sizing.maxUsefulParallelism(8L << 30) === 8,
      "an 8 GB heap must advise <= 8 slots (both measured 8g shapes OOM'd)")
    assert(Sizing.maxUsefulParallelism(16L << 30) === 16,
      "16 GB / 16 slots is the measured-green shape")
    assert(Sizing.maxUsefulParallelism(1L) === 1, "never advises zero slots")
  }

  test("adviseTaskMemory fires iff the session heap density is under the wall") {
    val heap = Runtime.getRuntime.maxMemory
    val slots = spark.sparkContext.defaultParallelism
    val expectWarn = heap / math.max(1, slots) < Sizing.HeapPerTaskBytes
    val advice = Sizing.adviseTaskMemory(spark)
    assert(advice.isDefined === expectWarn,
      s"heap=$heap slots=$slots wall=${Sizing.HeapPerTaskBytes}")
    advice.foreach { msg =>
      assert(msg.contains("GB/task wall") && msg.contains("cores at this heap"))
    }
  }

  test("adviseTaskMemoryFor is local-master-only and carries the repeat margin") {
    // under-the-wall density on a local master: fires, and the message now
    // includes the measured same-JVM-repeat margin (r13 sf1000: 0.5 GB/task
    // ran rep 1 green and OOM'd rep 2; 0.75 GB/task ran both reps)
    val low = Sizing.adviseTaskMemoryFor("local[32]", 8L << 30, 32)
    assert(low.isDefined)
    assert(low.get.contains("SAME JVM") &&
      low.get.contains(s"${Sizing.RepeatHeapPerTaskBytes >> 20} MB/task"),
      s"advisory must state the repeat margin: ${low.get}")
    // at-or-above-the-wall density: silent
    assert(Sizing.adviseTaskMemoryFor("local[16]", 16L << 30, 16).isEmpty)
    // non-local masters: the driver-heap / cluster-cores ratio is noise
    // (defaultParallelism counts cluster cores, maxMemory is the driver heap),
    // so the advisory must stay silent even at an apparently-awful density
    assert(Sizing.adviseTaskMemoryFor("spark://host:7077", 8L << 30, 1024).isEmpty)
    assert(Sizing.adviseTaskMemoryFor("yarn", 8L << 30, 1024).isEmpty)
    // local-cluster[...] matches the "local" prefix but runs executors as
    // SEPARATE JVMs — the driver-heap density is the same noise as yarn's
    assert(Sizing.adviseTaskMemoryFor("local-cluster[2,2,1024]", 8L << 30, 32).isEmpty)
  }

  test("adviseExecutorTaskMemory: fires on under-wall executor confs, stands down without evidence") {
    // 4g/16 cores = 256 MB/task: under the 1 GB wall -> fires with the
    // cores-per-executor guidance
    val low = Sizing.adviseExecutorTaskMemory(Some("4g"), Some("16"))
    assert(low.isDefined && low.get.contains("spark.executor.cores <= 4"), low.toString)
    // Spark's memory convention: a bare number is MiB (SparkContext's own
    // byteStringAsMb parsing) - "4096"/16 must equal "4g"/16, not 4096 bytes
    assert(Sizing.adviseExecutorTaskMemory(Some("4096"), Some("16")).isDefined)
    // at-or-above the wall: silent
    assert(Sizing.adviseExecutorTaskMemory(Some("16g"), Some("16")).isEmpty)
    assert(Sizing.adviseExecutorTaskMemory(Some("64g"), Some("16")).isEmpty)
    // either conf absent or garbage: stand down (RM defaults vary; guessing
    // re-creates the spurious-advisory class the master guard eliminated)
    assert(Sizing.adviseExecutorTaskMemory(None, Some("16")).isEmpty)
    assert(Sizing.adviseExecutorTaskMemory(Some("4g"), None).isEmpty)
    assert(Sizing.adviseExecutorTaskMemory(Some("a-lot"), Some("16")).isEmpty)
    assert(Sizing.adviseExecutorTaskMemory(Some("4g"), Some("zero")).isEmpty)
    assert(Sizing.adviseExecutorTaskMemory(Some("4g"), Some("0")).isEmpty)
  }

  test("usableScratchBytesFor sums dirs deduped by backing volume") {
    val a = java.nio.file.Files.createTempDirectory("graft-scratch-a").toString
    val b = java.nio.file.Files.createTempDirectory("graft-scratch-b").toString
    val one = Sizing.usableScratchBytesFor(Seq(a))
    assert(one > 0)
    // two dirs on the SAME filesystem share its free bytes: the sum must
    // dedup by volume, not double-count (tolerance: free space drifts a
    // little between the two statfs calls, never 20%)
    val two = Sizing.usableScratchBytesFor(Seq(a, b))
    assert(math.abs(two - one).toDouble / one < 0.2,
      s"same-volume dirs double-counted: one=$one two=$two")
    // a dir whose store can't resolve (not yet created) contributes 0 usable
    // bytes — never a throw, never an overcount
    val withMissing = Sizing.usableScratchBytesFor(Seq(a, "/nonexistent/graft-scratch"))
    assert(math.abs(withMissing - one).toDouble / one < 0.2)
    // the degenerate empty list is 0, not a crash
    assert(Sizing.usableScratchBytesFor(Seq.empty) === 0L)
  }

  test("RepeatHeapPerTaskBytes sits between the measured rep-2 shapes") {
    // 8g/16 = 512 MB/task OOM'd rep 2; 12g/16 = 768 MB/task ran both reps
    assert(Sizing.RepeatHeapPerTaskBytes > (8L << 30) / 16)
    assert(Sizing.RepeatHeapPerTaskBytes <= (12L << 30) / 16)
  }

  test("preflightScratch fires iff the family estimate exceeds usable scratch") {
    // a real (tiny) documents table so the footprint probe resolves
    val tmp = java.nio.file.Files.createTempDirectory("graft-preflight").toString
    spark.range(100).selectExpr("id as doc_id", "cast(id as string) as text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    try {
      // absurd expansion: a few KB of docs x 1e12 cannot fit any disk → fires
      val fired = Sizing.preflightScratch(spark, tmp, "d10_clean_corpus",
        Map("d10_clean_corpus" -> 1e12))
      assert(fired.isDefined && fired.get.contains("SPARK_GRAFT_PREFLIGHT=0"))
      // zero expansion: always fits → silent
      assert(Sizing.preflightScratch(spark, tmp, "d10_clean_corpus",
        Map("d10_clean_corpus" -> 0.0)).isEmpty)
      // unmeasured family: no ratio, no opinion
      assert(Sizing.preflightScratch(spark, tmp, "b01_project",
        Sizing.ScratchExpansion).isEmpty)
      // unknowable footprint (missing table): must not block on missing metadata
      assert(Sizing.preflightScratch(spark, "/nonexistent/graft-preflight",
        "d10_clean_corpus", Map("d10_clean_corpus" -> 1e12)).isEmpty)
      // warn-only callers inject their own tail: the message must not
      // advertise an override the caller ignores (r15 advice on Bench)
      val warned = Sizing.preflightScratch(spark, tmp, "d10_clean_corpus",
        Map("d10_clean_corpus" -> 1e12), tail = "warn-only tail")
      assert(warned.isDefined && warned.get.endsWith("warn-only tail") &&
        !warned.get.contains("SPARK_GRAFT_PREFLIGHT"), warned.toString)
      // cluster masters stand down: usableScratchBytes reads DRIVER disk,
      // which says nothing about executor scratch off local[N] — an
      // executor-shaped estimate vs driver disk would refuse runs on noise
      for (m <- Seq("spark://host:7077", "yarn", "k8s://https://host:443",
          "local-cluster[2,2,1024]"))
        assert(Sizing.preflightScratch(spark, tmp, "d10_clean_corpus",
          Map("d10_clean_corpus" -> 1e12), master = m).isEmpty,
          s"preflight must stand down under master=$m")
    } finally Sizing.clearCache()
  }

  test("ScratchExpansion clears every dense-measured sf1000 peak (500 ms polling)") {
    // measured global peaks / the 5.4 GB documents footprint. d05/d09: r15
    // 48.9 GB (9.05x) on the pre-rewrite join plan — the r16 aggregate
    // candidate plan shuffles one bands copy fewer, so these are safe upper
    // bounds pending re-measure. d10 fused: re-measured r16 on the aggregate
    // plan at 55.2 GB (10.22x; the r15 11.57x was the two-copy join, and the
    // short-lived windowed guard hit 12.94x — OVER the 12.0 table, the
    // measured reason the guard was rewritten). d10 staged: 45.7 GB (8.46x).
    // d11 31.9 GB (5.91x — the r13 sparse-poll 5x UNDERSTATED it by 15%).
    // Every table value must sit AT OR ABOVE its measured ratio — a ratio
    // under the true peak converts a refusal into an hour-long disk death —
    // and within ~1.35x of it (beyond that the preflight refuses shapes
    // that measurably fit).
    // d05 keeps its r15 worst-case 9.05x (the r16 aggregate plan re-measured
    // LOWER, 8.87x); d09 takes its r17 re-measure 9.37x at 8g/16 on the
    // auto-derived 2713 partitions (r16's 9.22x at manual 2048 sat a hair
    // OVER the old 9.2 table entry, the exact fatal direction this test
    // exists to catch; more partitions = more simultaneously-live shuffle
    // files, so the auto recipe's peak is the binding one).
    val measured = Map(
      "d05_jaccard" -> 9.05, "d09_dedup_clusters" -> 9.37,
      "d10_clean_corpus" -> 10.22, "d10_clean_staged" -> 8.46,
      "d11_decontam" -> 5.91)
    for ((q, m) <- measured) {
      val table = Sizing.ScratchExpansion(q)
      assert(table >= m, s"$q: table ratio $table under the measured peak $m")
      assert(table <= m * 1.35, s"$q: table ratio $table over-refuses vs measured $m")
    }
    // and the shapes that DEMONSTRABLY ran must still pass the preflight:
    // d05/d09 survived a 51 GB volume (troughs 2.1 GB), d10 fused a 65 GB
    // one (r15) and a 72.4 GB one (r16), staged a 72.4 GB one — a ratio
    // refusing a proven-fit shape trades a measured success for a refusal
    // (the over-conservative failure direction)
    assert(Sizing.ScratchExpansion("d05_jaccard") <= 51.0 / 5.4)
    // d09's 51 GB-box survival was OLD-plan evidence; its r16 peak (49.8 GB)
    // leaves only 1.2 GB slack there, so the demonstrated-fit bound is the
    // 72 GB box the r16 measurement ran on
    assert(Sizing.ScratchExpansion("d09_dedup_clusters") <= 72.0 / 5.4)
    // d10 fused demonstrably fit the r15 65 GB box (the stricter of its two
    // demonstrated boxes); the staged form's ONLY demonstrated box is the
    // r16 72.4 GB one, so its bound is 72/5.4 like d09's (r16 advice: the
    // old 65.0 constant was stricter than the staged run's actual evidence)
    assert(Sizing.ScratchExpansion("d10_clean_corpus") <= 65.0 / 5.4)
    assert(Sizing.ScratchExpansion("d10_clean_staged") <= 72.0 / 5.4)
  }

  test("relational spill family: lineitem-anchored ratios cover the measured peaks " +
    "at BOTH validated points (sf100, sf150)") {
    // dense-measured global peaks / the lineitem footprint (16g/16; b18 runs
    // two same-JVM reps). Each entry takes the WORSE of the two points:
    // b10/b20 scale flat-to-down (0.48→0.49, 1.39→1.29). b18's history:
    // its two-rep accumulation ratio ROSE 1.17→1.42 across decades because
    // GC timing held a scale-dependent number of dead reps' shuffle files
    // live (SCALECHECK r17) — r18 removed the mechanism (CleanerDrain
    // between reps, wired into Bench/PlanProbe) and re-measured BOTH
    // decades drained: 7.6 GB = 0.76x at sf100, 11.4 GB = 0.71x at sf150 —
    // the single-rep ratios, flat — with the drain-off control reproducing
    // r17's 22.7 GB = 1.42x to the digit the same day. The pinned points
    // are the drained ones (the shipped default); the accumulation regime
    // exists only behind SPARK_GRAFT_REP_DRAIN=0.
    val measured = Map(
      "b10_slice" -> 7.9 / 16.0, "b18_arrays" -> 7.6 / 9.94,
      "b20_math" -> 13.8 / 9.94)
    for ((q, m) <- measured) {
      assert(Sizing.ScratchInputTable(q) === "lineitem",
        s"$q must anchor on the table it actually exchanges")
      val table = Sizing.ScratchExpansion(q)
      assert(table >= m, s"$q: table ratio $table under the measured peak $m")
      assert(table <= m * 1.35, s"$q: table ratio $table over-refuses vs measured $m")
    }
    // the documents-family rows keep their historical anchor by default
    assert(!Sizing.ScratchInputTable.contains("d10_clean_corpus"))
  }

  test("drain-off preflight re-enters the accumulation-regime b18 entry (r19)") {
    // the r18 ADVICE item: b18's 1.0 entry is a DRAINED measurement; a run
    // with SPARK_GRAFT_REP_DRAIN=0 reproduces the 1.42x accumulation regime
    // and must size at the pre-drain 1.6 entry — the lookup consults the
    // knob, so the under-size cannot happen silently
    assert(Sizing.scratchExpansionForDrain(false)("b18_arrays") === 1.0)
    assert(Sizing.scratchExpansionForDrain(true)("b18_arrays") === 1.6)
    assert(Sizing.scratchExpansionForDrain(true)("b18_arrays") >= 1.42 * 1.1,
      "the drain-off entry must clear the measured accumulation point with margin")
    // only b18 has a drain-dependent entry; every other family row is
    // identical in both regimes
    assert(Sizing.scratchExpansionForDrain(true) - "b18_arrays"
      === Sizing.scratchExpansionForDrain(false) - "b18_arrays")
    // env unset in the test JVM -> the effective table is the drained one
    assert(Sizing.effectiveScratchExpansion === Sizing.ScratchExpansion)
  }
}
