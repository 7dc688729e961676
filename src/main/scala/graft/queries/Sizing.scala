package graft.queries

import org.apache.spark.sql.SparkSession

/** Volume-derived shuffle sizing.
  *
  * The sf100 measurement campaign (SCALECHECK.md) proved that shuffle partition
  * count must scale with input volume: two ~500M-row shingle aggregations (d09,
  * d11) OOM at 32 partitions (~15M rows per per-task hash map in an 8g heap) and
  * complete comfortably at 256. Until round 10 that fix was a manual
  * `SPARK_GRAFT_SHUFFLE_PARTITIONS` env var a user had to know about; this object
  * makes the engine turn the knob itself.
  *
  * Rule: on first table access per (session, data dir), size
  * `spark.sql.shuffle.partitions` to the on-disk parquet footprint of the dir —
  * one partition per 32 MB of compressed input (~2× headroom over the measured
  * OOM cliff, see [[BytesPerPartition]]), clamped to [current setting, 4096].
  * The application is RAISE-ONLY:
  *
  *   - With AQE partition coalescing enabled (the Spark 4 default) the raised
  *     base value acts as the initial partition count: small shuffles coalesce
  *     right back down at runtime and only the genuinely large aggregations
  *     keep the extra parallelism. Small-sf plans are untouched in practice
  *     (at sf0.1 the computed value never exceeds the session's 32).
  *   - Never lowers: an explicit user/test setting of 4 partitions on a tiny dir
  *     stays 4 (the computed value clamps below the current setting), and an
  *     explicit `SPARK_GRAFT_SHUFFLE_PARTITIONS` pin disables auto-sizing
  *     entirely — a human override outranks the heuristic.
  *
  * On a real cluster the same rule holds per-job: the footprint call is one
  * `FileSystem.getContentSummary` RPC (HDFS) or listing (S3A), cached per
  * (session, dir), never a data read.
  */
object Sizing {
  /** On-disk (compressed) input bytes per initial shuffle partition.
    *
    * 32 MB, i.e. ~2× headroom over the minimum the sf100 campaign proved
    * necessary. The measured cliff is SHARP: at 15 GB input, 240 partitions
    * OOMs d09's ~500M-row shingle aggregation (GCLocker-starved burst
    * allocations in the shuffle write under an 8g heap — both probe runs died
    * identically in stage 5) while 256 completes in 194 s. A rule that lands a
    * few partitions below the cliff is no rule at all, so the target sits at
    * 2× the proven-safe density: a 15 GB dir sizes to 480 partitions. Excess
    * partitions are cheap — AQE coalesces them on every small shuffle — while
    * a shortfall is an OOM, so the asymmetry wants the divisor small.
    */
  val BytesPerPartition: Long = 32L << 20

  /** Upper clamp: beyond 4096 initial partitions the per-partition scheduling
    * overhead dominates on any realistic executor count, and AQE coalescing
    * costs grow with the map-status size.
    */
  val MaxPartitions: Int = 4096

  /** Intermediate-to-input expansion of the shingle-exchange (pair-verify)
    * family — d04/d05/d09/d10's MinHash bands + hashed-Jaccard verify and
    * d11's decontam probe. Their dominant exchanges carry one fixed-width row
    * PER TOKEN (the shingle explode: ~50 hashed shingles/doc at 16 bytes,
    * live across the distinct plus both intersection-join sides), so the
    * intermediate bytes scale with the UNCOMPRESSED token count, not the
    * compressed input the base footprint rule sees. Measured at the fifth
    * decade (round 10, SCALECHECK.md): the 11 GB corpus dir auto-sized to 344
    * and d09's verify OOM'd the heap; 1024 completed — i.e. the verify wants
    * ≥ ~6× the partitions the 5.6 GB documents table's raw footprint
    * computes (175). 8× keeps the same shortfall-is-an-OOM asymmetry margin
    * the base rule uses (5.6 GB → 1400 ≥ 1.4× the proven-good 1024); excess
    * is AQE-coalesced on every shuffle that turns out small.
    */
  val ShingleExpansion: Int = 8

  /** Per-query expansion overrides on top of [[ShingleExpansion]] — the
    * family members whose measured partition floor exceeds the family rule.
    *
    * d09 (r16, SCALECHECK §7): on the aggregate candidate plan the 8× rule's
    * sf1000 outcome (5.4 GB docs → 1400 partitions) OOMs in a shuffle write
    * at 0.5 GB/task — d09 is the one family member that localCheckpoints the
    * full-corpus pair frame and loops joins against it, so its storage-pinned
    * blocks compete with the aggregation's execution appetite; 2048
    * partitions complete (531.9 s green). d05 (same candidates, same verify,
    * no loop) and d10 (checkpointed loop over survivor-restricted pairs)
    * keep the 8× recipe green, so the floor is d09's alone. 16× derives
    * ≥ 2048 from the demonstrated footprint with the same shortfall-is-an-OOM
    * margin the family rule carries (5.4 GB → 2576 ≥ 1.25× the proven-good
    * 2048), replacing the manual knob SCALECHECK r16 documented as prose —
    * the preflight turns it, not the operator. AQE coalesces the excess
    * everywhere smaller.
    */
  val ShingleExpansionOverride: Map[String, Int] = Map(
    "d09_dedup_clusters" -> 16)

  /** The effective shingle-exchange expansion for `query`: the override when
    * one is measured, the family rule otherwise.
    */
  def shingleExpansionFor(query: String): Int =
    ShingleExpansionOverride.getOrElse(query, ShingleExpansion)

  /** Measured minimum JVM heap per CONCURRENT TASK for the heavy
    * sorted-output family (the oracle contract's pinned total ORDER BY over
    * ~600M-row results: b06's semi-join sort, b18's array reconstruction,
    * b01/b20's full-width projections).
    *
    * The round-12 sf100 sweep measured the wall directly — same code, same
    * data, only the shape varied: 8g/local[32] (0.25 GB/task) dies in b06 at
    * UNABLE_TO_ACQUIRE_MEMORY then b18 at heap OOM; 8g/local[16] (0.5 GB/task)
    * still dies in b06; 16g/local[16] (1 GB/task) completes all 68 queries
    * (SCALECHECK.md round 12). Partition count cannot clear this wall —
    * partitions divide rows, but the per-task working set (wide-row sort
    * buffers + parquet read-ahead + the ~40% non-unified JVM overhead) has a
    * floor that survives division; the lever is heap × cores-per-executor.
    *
    * This is deliberately heap-per-task, not unified-pool-per-task: operators
    * see the pool, but the measured failures include non-pool allocations
    * (the parquet read-ahead thread OOM'd the 8g/16 run), so the
    * provisioning rule a cluster can act on is the whole-heap ratio.
    */
  val HeapPerTaskBytes: Long = 1L << 30

  /** Max task slots a heap of `heapBytes` can feed for the heavy sorted-output
    * family at the measured [[HeapPerTaskBytes]] density — the
    * cores-per-executor hint: an executor with a 16 GB heap wants ≤16 task
    * slots for this job class (and an 8 GB one ≤8, NOT the box's 32 threads).
    */
  def maxUsefulParallelism(heapBytes: Long): Int =
    math.max(1, (heapBytes / HeapPerTaskBytes).toInt)

  /** Measured heap-per-task margin for SAME-JVM REPETITION of fifth-decade
    * exchange-heavy queries (the bench/probe rep>=2 shape). The r13 sf1000
    * d11 probes measured the gap directly: 8g/local[16] (0.5 GB/task) runs
    * rep 1 green and dies UNABLE_TO_ACQUIRE_MEMORY on rep 2 — three repros,
    * on BOTH d11 plan forms — while 12g/local[16] (0.75 GB/task) runs both
    * reps green with rep 2 faster. One completion per JVM is fine at
    * 0.5 GB/task; repeating in-JVM wants this margin on top.
    */
  val RepeatHeapPerTaskBytes: Long = (3L << 30) / 4

  /** Startup advisory: compare the session's actual heap-per-task density
    * against [[HeapPerTaskBytes]] and return the warning line (also printed
    * to stderr) when the shape is below the measured wall, None when it is
    * fine. Advisory only — the master/core count is fixed at session start,
    * so the engine cannot turn this knob itself; it can only say, before ~20
    * minutes of sweep die in b06, what the round-12 campaign had to find by
    * dying there.
    */
  def adviseTaskMemory(s: SparkSession): Option[String] = {
    val master = s.sparkContext.master
    if (master.startsWith("local") && !master.startsWith("local-cluster"))
      adviseTaskMemoryFor(master,
        Runtime.getRuntime.maxMemory, s.sparkContext.defaultParallelism)
    else
      // Cluster masters: the driver heap/defaultParallelism ratio is noise
      // (see adviseTaskMemoryFor), but the session's OWN executor-shape
      // confs are exactly the density the wall is about
      adviseExecutorTaskMemory(
        s.sparkContext.getConf.getOption("spark.executor.memory"),
        s.sparkContext.getConf.getOption("spark.executor.cores"))
  }

  /** Cluster-master density advisory (r15, completes the cluster posture the
    * r14 local-only guard started): reads `spark.executor.memory` /
    * `spark.executor.cores` — the knobs the cluster operator actually sized —
    * and warns when heap-per-slot sits under [[HeapPerTaskBytes]]. Memory
    * parses with Spark's own convention (default unit MiB, as
    * `SparkContext.executorMemory` does via byteStringAsMb). Either conf
    * absent or unparseable → None: resource-manager defaults vary (YARN 1g,
    * k8s template, standalone all-cores), and guessing would re-create the
    * spurious-advisory class the master guard eliminated. Stand down without
    * evidence; warn on it.
    */
  private[graft] def adviseExecutorTaskMemory(memory: Option[String],
      cores: Option[String]): Option[String] = {
    val heap = memory.flatMap(v => scala.util.Try(
      org.apache.spark.network.util.JavaUtils.byteStringAsMb(v) << 20).toOption)
      .filter(_ > 0)
    val slots = cores.flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ > 0)
    (heap, slots) match {
      case (Some(h), Some(c)) if h / c < HeapPerTaskBytes =>
        val msg = f"[graft] executor density ${h / c / (1L << 20)}%d MB/task " +
          f"(spark.executor.memory ${h / (1L << 30)}%d GB / " +
          f"spark.executor.cores $c%d) is below the measured " +
          f"${HeapPerTaskBytes / (1L << 30)}%d GB/task wall for large " +
          f"sorted-output queries - prefer spark.executor.cores <= " +
          f"${maxUsefulParallelism(h)}%d at this memory (SCALECHECK.md " +
          "round 12: the wall survives partition-count division; the lever " +
          "is heap x cores-per-executor)"
        System.err.println(msg)
        Some(msg)
      case _ => None
    }
  }

  /** [[adviseTaskMemory]]'s decision, pure for testability. The density math
    * (driver `Runtime.maxMemory` / `defaultParallelism`) is only meaningful
    * under a `local[N]` master, where the driver JVM IS the executor: on a
    * standalone/YARN/k8s master, defaultParallelism counts CLUSTER-wide cores
    * while maxMemory is the driver heap, so the ratio is noise and the
    * advisory would fire spuriously (or stay silent wrongly) — there the
    * density to check is `spark.executor.memory` / executor cores, which the
    * cluster operator sizes, not this process. Non-local masters return None.
    */
  private[graft] def adviseTaskMemoryFor(master: String, heap: Long,
      slots: Int): Option[String] = {
    // local-cluster[...] also matches the "local" prefix but runs executors
    // as SEPARATE JVMs — there the driver maxMemory/defaultParallelism ratio
    // is exactly the noise this guard exists to eliminate (r15 advice)
    if (!master.startsWith("local") || master.startsWith("local-cluster")) None
    else if (slots <= 0 || heap / math.max(1, slots) >= HeapPerTaskBytes) None
    else {
      val perTask = heap / slots
      // ASCII only: the forked JVM's default stderr encoding mangles em-dashes
      val msg = f"[graft] heap density ${perTask / (1L << 20)}%d MB/task " +
        f"(${heap / (1L << 30)}%d GB heap / $slots%d task slots) is below the " +
        f"measured ${HeapPerTaskBytes / (1L << 30)}%d GB/task wall for large " +
        f"sorted-output queries - prefer <= ${maxUsefulParallelism(heap)}%d " +
        "cores at this heap (SCALECHECK.md round 12: 8g/32 and 8g/16 both " +
        "OOM'd b06/b18 at sf100; 16g/16 completed 68/68); repeating " +
        "exchange-heavy queries in the SAME JVM wants >= " +
        f"${RepeatHeapPerTaskBytes / (1L << 20)}%d MB/task " +
        "(r13 sf1000: 0.5 GB/task ran rep 1 green, OOM'd rep 2; 0.75 GB/task " +
        "ran both)"
      System.err.println(msg)
      Some(msg)
    }
  }

  /** Peak-scratch-bytes : compressed-documents-footprint expansion ratios for
    * the fifth-decade exchange-heavy query families, measured at sf1000
    * (5.6 GB documents table, SCALECHECK.md rounds 10-13). Shuffle files stay
    * live for ALL stages of one query, so the peak is the whole chain's sum:
    *
    *   - d11 (single-exchange pushed-down decontam): dense-MEASURED 5.91x
    *     in r15 (global peak 31.9 GB) — the r13 sparse-poll "~28 GB = 5x"
    *     UNDERSTATED the true peak by 15%, i.e. a volume between 5.0x and
    *     5.9x would have passed the old preflight and died mid-run; the
    *     table value is 6.5x (+10% over the measured peak, the same
    *     shortfall-is-fatal margin the other rows carry)
    *   - d05/d09 (band join + hashed-Jaccard verify): dense-MEASURED 9.05x
    *     in r15 (both global troughs 2.1 GB from a 51 GB baseline = 48.9 GB
    *     live peak, same day, back-to-back) — the old 9.0x sat 0.6% UNDER
    *     the true peak; the r14 "kernel plan may have halved it" hypothesis
    *     is dead. Table value 9.2x: above the measured peak, below the
    *     proven-fit 9.44x (the 51 GB box survived), so the demonstrated
    *     shape still passes while an estimate-sized volume now refuses
    *   - d10 (exact dedup + verify + components + anti-join, end-to-end):
    *     dense-MEASURED 11.57x in r15 on the two-copy join plan (global peak
    *     62.5 GB from a 65.0 GB baseline; the r13 death at 51 GB free is
    *     fully explained), re-measured 10.22x in r16 on the aggregate
    *     candidate plan (55.2 GB from 72.4) — and the short-lived r16
    *     windowed guard measured 12.94x, OVER this table, which is the
    *     measured reason that guard was rewritten (SCALECHECK r16 §5–6).
    *     The 12x table value keeps 17% margin over the current plan's peak.
    *     The staged form (d10_clean_staged) peaks at 8.46x and is FASTER —
    *     the shape a 100 TB deployment should run.
    *
    * Four fifth-decade runs in round 13 died (or were blocked) on scratch
    * exhaustion MID-RUN, each after minutes-to-hours of useful work;
    * [[preflightScratch]] turns that failure mode into pre-launch guidance.
    */
  val ScratchExpansion: Map[String, Double] = Map(
    "d05_jaccard" -> 9.2,
    // r16 re-measure on the aggregate candidate plan at 8g/16/2048: 49.8 GB
    // live peak = 9.22x — a hair OVER the old 9.2 entry (and the old
    // 1024-partition shape OOMs on this plan: execution memory, not disk —
    // SCALECHECK r16 §7). Raised to 9.8 (+6% over measured).
    "d09_dedup_clusters" -> 9.8,
    "d10_clean_corpus" -> 12.0,
    // The materialized-boundary form (r16, dense-measured at sf1000 on the
    // aggregate candidate plan): 45.7 GB live peak = 8.46x vs the fused
    // form's 10.22x — stage files free at each boundary instead of
    // accumulating to the final action. Table = measured + ~12%.
    "d10_clean_staged" -> 9.5,
    "d11_decontam" -> 6.5,
    // The relational spill family (r16), anchored on LINEITEM (see
    // [[ScratchInputTable]]), dense-measured at sf100 (9.94 GB lineitem,
    // 16g/16, 500 ms polling): b10 4.8 GB global peak (0.48x) — its 64 GB
    // cumulative spill frees per merge and never accumulates; b20 13.8 GB
    // (1.39x, its 14.1 GB shuffle write held live); b10 0.48→0.49 and b20
    // 1.39→1.29 scale flat-to-down across the sf100/sf150 decades.
    // Table = measured + ~15-25% (the shortfall-is-fatal margin).
    // b18's repeated-run history is the instructive one: r16 measured two
    // same-JVM reps at 1.17x, r17's second decade (sf150, 16 GB lineitem)
    // ROSE to 1.42x — GC timing held a scale-dependent number of dead reps'
    // shuffle files live, so the ratio was not footprint-proportional and
    // the entry was raised to 1.6. r18 removed the MECHANISM instead of
    // padding the table: Bench/PlanProbe drain the ContextCleaner between
    // reps (graft.CleanerDrain), and the same-day A/B reproduced both
    // worlds — drained 11.4 GB = 0.71x at sf150 and 7.6 GB = 0.76x at
    // sf100 (the single-rep ratios, flat across decades), drain-off 22.7 GB
    // = 1.42x (r17's digit exactly). Entry lowered to 1.0: +31% over the
    // worst drained point. A run that deliberately disables the drain
    // (SPARK_GRAFT_REP_DRAIN=0) re-enters the accumulation regime — the
    // preflight lookup consults the knob ([[effectiveScratchExpansion]]) and
    // sizes that leg at the pre-drain 1.6 entry automatically.
    "b10_slice" -> 0.6,
    "b18_arrays" -> 1.0,
    "b20_math" -> 1.6)

  /** Accumulation-regime overrides that apply only when the between-reps
    * ContextCleaner drain is explicitly disabled (r19, the r18 ADVICE item):
    * b18's 1.0 entry was lowered on DRAINED measurements, but a run with
    * SPARK_GRAFT_REP_DRAIN=0 re-enters the measured 1.42× regime (sf150,
    * r18 A/B) — above the shortfall-is-fatal 1.0 entry. The preflight lookup
    * consults the knob via [[effectiveScratchExpansion]], so disabling the
    * drain can never silently under-size; 1.6 is the pre-drain table value
    * (+13% over the worst measured accumulation point).
    */
  private[graft] val ScratchExpansionDrainOff: Map[String, Double] =
    Map("b18_arrays" -> 1.6)

  /** The family table for a given drain setting, pure for spec pinning. */
  private[graft] def scratchExpansionForDrain(drainDisabled: Boolean): Map[String, Double] =
    if (drainDisabled) ScratchExpansion ++ ScratchExpansionDrainOff
    else ScratchExpansion

  /** [[ScratchExpansion]] adjusted for this process's drain setting — what
    * every preflight consults. Env vars cannot change mid-process, so the
    * selection is stable for the run.
    */
  def effectiveScratchExpansion: Map[String, Double] =
    scratchExpansionForDrain(Knobs.bool("SPARK_GRAFT_REP_DRAIN").contains(false))

  /** Which table's on-disk footprint anchors each family's expansion ratio.
    * The text/dedup families key on the documents table (historical rows
    * above); the relational spill family (r16 — the sweep's largest
    * cumulative spillers at sf100: b10 72, b18 48, b20 46 GB) keys on
    * lineitem, the table those queries actually exchange. Families absent
    * here default to documents.
    */
  val ScratchInputTable: Map[String, String] = Map(
    "b10_slice" -> "lineitem",
    "b18_arrays" -> "lineitem",
    "b20_math" -> "lineitem")

  /** Usable bytes on Spark's shuffle-scratch volume(s): ALL configured local
    * dirs, resolved in the order Spark's own local-dir lookup uses for a
    * local master — `SPARK_LOCAL_DIRS` env OVERRIDES `spark.local.dir` conf
    * (Utils.getConfiguredLocalDirs), falling back to the JVM tmpdir. Spark
    * round-robins shuffle files across every configured dir, so capacity is
    * the SUM — deduped by backing volume (two dirs on one filesystem share
    * its free bytes; a naive sum would double-count and under-refuse). On a
    * real cluster the check belongs on each executor's local dirs; this
    * driver-side read is exact for local[N].
    */
  def usableScratchBytes(s: SparkSession): Long =
    usableScratchBytesFor(sys.env.get("SPARK_LOCAL_DIRS")
      .orElse(s.sparkContext.getConf.getOption("spark.local.dir"))
      .getOrElse(System.getProperty("java.io.tmpdir", "/tmp"))
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty))

  /** [[usableScratchBytes]]'s sum, pure in the dir list for testability:
    * usable bytes per UNIQUE backing volume (java.nio FileStore identity; a
    * dir whose store cannot be resolved — typically a not-yet-created local
    * dir — keys by its own path and contributes its `getUsableSpace`, which
    * is 0 for a missing path: never a throw, never an overcount).
    */
  private[graft] def usableScratchBytesFor(dirs: Seq[String]): Long =
    dirs.map { d =>
      val f = new java.io.File(d)
      val key =
        try java.nio.file.Files.getFileStore(f.toPath).toString
        catch { case _: Exception => s"unresolved:$d" }
      key -> f.getUsableSpace
    }.distinctBy(_._1).map(_._2).sum

  /** Default closing guidance of the preflight refusal line — the REFUSING
    * caller's wording (PlanProbe exits 2 unless overridden); a warn-only
    * caller passes its own tail so the message never advertises an override
    * the caller ignores.
    */
  private[graft] val RefuseTail: String =
    "free scratch or override with SPARK_GRAFT_PREFLIGHT=0"

  /** Scratch-disk preflight: estimate `query`'s peak live shuffle bytes on
    * `dataDir` from the documents footprint x the family's measured
    * [[ScratchExpansion]], compare against [[usableScratchBytes]], and return
    * the refusal line (also printed to stderr) when the estimate does not
    * fit. None when it fits, when the query has no measured family ratio, or
    * when the footprint is unknowable (-1) — the preflight must never block
    * a run on missing metadata, only on evidence. Callers choose the policy:
    * PlanProbe refuses (override: SPARK_GRAFT_PREFLIGHT=0), Bench warns.
    *
    * Local-master only: [[usableScratchBytes]] reads the DRIVER's local dirs,
    * which for local[N] are the executor scratch but on a standalone/YARN/k8s
    * master say nothing about each executor's disks — comparing an
    * executor-shaped estimate against driver disk would refuse (or pass)
    * runs on noise, the same spurious-advisory class adviseTaskMemory's
    * guard eliminates. Non-local masters (including local-cluster, whose
    * executors are separate JVMs with their own dirs) stand down with None.
    */
  def preflightScratch(s: SparkSession, dataDir: String,
      query: String): Option[String] =
    preflightScratch(s, dataDir, query, effectiveScratchExpansion)

  /** [[preflightScratch]] with the family-ratio table, message tail, and
    * master injectable (specs pin the fires, fits, and cluster-stand-down
    * branches without depending on the box's free scratch or a cluster).
    */
  private[graft] def preflightScratch(s: SparkSession, dataDir: String,
      query: String, expansion: Map[String, Double],
      tail: String = RefuseTail, master: String = null): Option[String] = {
    val m = Option(master).getOrElse(s.sparkContext.master)
    if (!m.startsWith("local") || m.startsWith("local-cluster")) None
    else expansion.get(query).flatMap { x =>
      val anchor = ScratchInputTable.getOrElse(query, "documents")
      val docBytes = footprintBytesCached(s, s"$dataDir/$anchor.parquet")
      if (docBytes < 0) None
      else {
        val est = (docBytes * x).toLong
        val usable = usableScratchBytes(s)
        if (est <= usable) None
        else {
          val msg = f"[graft] scratch preflight: $query%s on $dataDir%s " +
            f"wants ~${est >> 30}%d GB of live shuffle files " +
            f"(${docBytes >> 20}%d MB $anchor%s x ${x}%.0fx measured " +
            f"family peak, SCALECHECK.md) but the scratch volume has only " +
            f"${usable >> 30}%d GB usable - " + tail
          System.err.println(msg)
          Some(msg)
        }
      }
    }
  }

  private val sized =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Int]

  /** Pure sizing rule: partitions a footprint of `bytes` wants, before the
    * raise-only clamp against the session's current setting.
    */
  def computedPartitions(bytes: Long): Int =
    math.min(MaxPartitions.toLong,
      (bytes + BytesPerPartition - 1) / BytesPerPartition).toInt

  /** Size the session's shuffle for `dir` (idempotent per (session, dir));
    * returns the effective initial partition count after the raise-only apply.
    * Called from [[Tables.table]], so every query entry point gets it for free.
    */
  def autoSize(s: SparkSession, dir: String): Int =
    sized.get((s, dir)).getOrElse {
      if (sys.env.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS")) {
        val cur = currentPartitions(s)
        sized.putIfAbsent((s, dir), cur)
        cur
      } else {
        // A listing failure (transient S3 throttle, permissions, dir deleted
        // between listing and sizing) must not fail the query that triggered
        // sizing — fall through to the current setting — but it must NOT be
        // memoized either: caching the no-raise outcome would permanently
        // disable the OOM protection for this dir on one transient error. The
        // next table touch retries the one-RPC listing.
        val bytes = footprintBytesCached(s, dir)
        if (bytes < 0) currentPartitions(s)
        else {
          val r = applyTarget(s, computedPartitions(bytes))
          sized.putIfAbsent((s, dir), r)
          r
        }
      }
    }

  /** Shuffle sizing for the shingle-exchange family, from predicted
    * intermediate volume: `docBytes × ShingleExpansion` through the same
    * 32 MB/partition rule, raise-only, same human-override and fail-safe
    * semantics as [[autoSize]] (an explicit `SPARK_GRAFT_SHUFFLE_PARTITIONS`
    * pin wins; an unlistable table falls back to the current setting without
    * memoizing the failure). `docPath` is the documents TABLE, not the dir —
    * the corpus dir's other tables (embeddings) say nothing about shingle
    * volume, which is how the base rule under-sized the fifth decade.
    * Idempotent per call (applyTarget is raise-only and the footprint is
    * memoized), so the pair-verify entry points just call it inline.
    */
  def autoSizeShingleExchange(s: SparkSession, docPath: String): Int =
    autoSizeShingleExchange(s, docPath, ShingleExpansion)

  /** [[autoSizeShingleExchange]] at a query-specific expansion
    * ([[shingleExpansionFor]]) — the entry points with a measured
    * per-query floor (d09) call this with their own name's ratio; raise-only,
    * so the larger of the family and per-query targets wins regardless of
    * call order.
    */
  def autoSizeShingleExchange(s: SparkSession, docPath: String,
      expansion: Int): Int =
    if (sys.env.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS")) currentPartitions(s)
    else {
      val bytes = footprintBytesCached(s, docPath)
      if (bytes < 0) currentPartitions(s)
      else applyTarget(s, computedPartitions(bytes * expansion))
    }

  private def currentPartitions(s: SparkSession): Int =
    s.conf.get("spark.sql.shuffle.partitions").toInt

  /** Recursive on-disk byte footprint of `dir` via the Hadoop FS API (works for
    * local, HDFS, and object stores alike).
    */
  private[graft] def footprintBytes(s: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.getContentSummary(path).getLength
  }

  private val footprints =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Long]

  /** Memoized [[footprintBytes]] — the cheap metadata signal behind
    * volume-gated plan choices (e.g. d11's eval-side broadcast hint). One FS
    * listing per (session, path), never a data read; cleared with
    * [[clearCache]].
    *
    * Returns -1 (UNKNOWN) on a listing failure, and does NOT memoize the
    * failure — a transient FS error must neither masquerade as "tiny input"
    * (a 0 here would flip d11's gate to the broadcast path, the exact OOM the
    * gate prevents) nor poison every retry for the session's lifetime.
    * Callers must fail SAFE on -1: pick the plan that is correct at any size.
    */
  private[graft] def footprintBytesCached(s: SparkSession, path: String): Long =
    footprints.get((s, path)).getOrElse {
      try {
        val b = footprintBytes(s, path)
        footprints.putIfAbsent((s, path), b)
        b
      } catch { case _: Exception => -1L }
    }

  /** Raise-only application of a computed partition count; returns the
    * effective initial partition count.
    *
    * Raises `spark.sql.shuffle.partitions` itself, NOT
    * `...coalescePartitions.initialPartitionNum`. The r10 sf100 A/B measured
    * the two knobs equivalent at equal values (both OOM d09 at 240, 256 is
    * proven safe — the fix was headroom in [[BytesPerPartition]], not knob
    * choice), so the base conf wins on coverage: it also reaches any path
    * that reads `spark.sql.shuffle.partitions` directly rather than via
    * `SQLConf.numShufflePartitions`, and with AQE coalescing enabled (the
    * default) it behaves exactly like an initial count — small shuffles
    * coalesce back down at runtime.
    */
  private[graft] def applyTarget(s: SparkSession, computed: Int): Int = synchronized {
    // Synchronized: the read-then-set below is not atomic, and Bench's
    // concurrent prewarm runs two different-valued sizing paths in parallel
    // (autoSize from the dir footprint and autoSizeShingleExchange from 8×
    // the documents footprint). Unserialized, a smaller raise landing after a
    // larger one would overwrite it, and a shingle cache materialized in that
    // window would run under-partitioned — the exact OOM this rule prevents.
    // The monitor makes raises monotonic; target = max(cur, computed) keeps
    // the raise-only contract within the critical section too.
    val cur = currentPartitions(s)
    val target = math.max(cur, computed)
    if (target > cur) {
      s.conf.set("spark.sql.shuffle.partitions", target.toString)
      System.err.println(
        s"[graft] auto-sized spark.sql.shuffle.partitions to $target " +
          "(raise-only; AQE coalesces the excess on small shuffles)")
    }
    // A session that PINS coalescePartitions.initialPartitionNum (a common AQE
    // tuning knob — and what graft itself set before r10) would silently
    // defeat the base conf: Spark prefers that key when set, so a small pin
    // caps the effective initial count EVEN WHEN shuffle.partitions is already
    // large. Raise it in lockstep to the effective base whenever it is
    // present-and-smaller — outside the raise branch above, or a session with
    // a big base and a tiny pin would skip the fix entirely.
    val initKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    if (s.conf.getOption(initKey).exists(_.toInt < target))
      s.conf.set(initKey, target.toString)
    target
  }

  /** Forget sized (session, dir) pairs and cached footprints — harness hygiene
    * between phases whose inputs change underneath a live session (see
    * [[graft.Caches]]).
    */
  def clearCache(): Unit = { sized.clear(); footprints.clear() }
}
