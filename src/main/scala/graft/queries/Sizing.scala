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
  * Rule: on first table access per (session, data dir), size the number of
  * *initial* shuffle partitions to the on-disk parquet footprint of the dir —
  * one partition per 64 MB of compressed input, clamped to [current setting,
  * 4096]. The application is RAISE-ONLY and AQE-aware:
  *
  *   - With AQE partition coalescing enabled (the Spark 4 default) the raise goes
  *     to `spark.sql.adaptive.coalescePartitions.initialPartitionNum`, so small
  *     shuffles coalesce right back down at runtime and only the genuinely large
  *     aggregations keep the extra parallelism. Small-sf plans are untouched in
  *     practice (at sf0.1 the computed value never exceeds the session's 32).
  *   - With AQE off (e.g. a user session that disabled it) the raise must go to
  *     `spark.sql.shuffle.partitions` itself — correctness-of-completion beats
  *     small-query overhead.
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
  /** On-disk (compressed) input bytes per initial shuffle partition. 64 MB
    * reproduces the measured sf100 fix: a 16 GB dir sizes to 256 partitions —
    * the value that took d09/d11 from OOM to 194/156 s — while sf10 (1.6 GB)
    * and below stay at the session default.
    */
  val BytesPerPartition: Long = 64L << 20

  /** Upper clamp: beyond 4096 initial partitions the per-partition scheduling
    * overhead dominates on any realistic executor count, and AQE coalescing
    * costs grow with the map-status size.
    */
  val MaxPartitions: Int = 4096

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
    sized.getOrElseUpdate((s, dir), {
      if (sys.env.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS")) currentPartitions(s)
      else {
        // An unreadable dir (deleted between listing and sizing, permissions)
        // must not fail the query that triggered sizing — fall through to the
        // current setting; the read itself will surface the real error.
        val bytes = try footprintBytes(s, dir) catch { case _: Exception => 0L }
        applyTarget(s, computedPartitions(bytes))
      }
    })

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

  /** Raise-only application of a computed partition count; returns the
    * effective initial partition count.
    */
  private[graft] def applyTarget(s: SparkSession, computed: Int): Int = {
    val cur = currentPartitions(s)
    if (computed <= cur) cur
    else {
      val coalesceOn =
        s.conf.get("spark.sql.adaptive.enabled", "true").toBoolean &&
          s.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true").toBoolean
      if (coalesceOn) {
        val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
        val existing = s.conf.getOption(key).map(_.toInt).getOrElse(0)
        if (computed > existing) {
          s.conf.set(key, computed.toString)
          System.err.println(
            s"[graft] auto-sized initial shuffle partitions to $computed (AQE coalesces the excess)")
        }
        math.max(computed, existing)
      } else {
        s.conf.set("spark.sql.shuffle.partitions", computed.toString)
        System.err.println(
          s"[graft] auto-sized spark.sql.shuffle.partitions to $computed (AQE off)")
        computed
      }
    }
  }

  /** Forget sized (session, dir) pairs — harness hygiene between phases whose
    * inputs change underneath a live session (see [[graft.Caches]]).
    */
  def clearCache(): Unit = sized.clear()
}
