package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analytics over the `events` schema
  * (event_id, ts timestamp, user_id, event_type, value, props).
  *
  * The transforms are written against plain DataFrames so the SAME code runs in batch
  * (graft.queries.EventOps uses them with the parquet table, where they're oracle-
  * checked against DuckDB) and on a streaming source (`spark.readStream` + watermark,
  * exercised with a MemoryStream in EventStreamsSpec). That batch/stream symmetry is
  * the Spark-native design: the logical plan is identical, only the source/sink and
  * the watermark differ.
  *
  * At scale: both aggregations are keyed (user_id / window start), so state is
  * partitioned across executors by the shuffle; the watermark bounds state size —
  * sessions close `gap` + watermark after their last event, hourly windows drop when
  * the watermark passes their end.
  */
object EventStreams {

  /** Per-user sessionization with a `session_window` gap. In streaming mode, call
    * after `.withWatermark("ts", ...)`; output mode must be append/update as usual.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"),
        max("ts").as("session_end"), sum("value").as("session_value"))
      .select(col("user_id"), col("n_events"), col("session_start"),
        col("session_end"), col("session_value"))

  /** Tumbling-window event counts per type. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sv"))

  /** Watermarked streaming variant of [[sessionize]]: bounds the session state kept
    * by the executors (late events beyond `lateness` are dropped).
    */
  def sessionizeStream(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    sessionize(events.withWatermark("ts", lateness), gap)

  /** Watermarked streaming variant of [[tumblingCounts]]. */
  def tumblingCountsStream(events: DataFrame, width: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    tumblingCounts(events.withWatermark("ts", lateness), width)

  // ------------------------------------------------- custom-state sessionization

  // not private: encoder-generated code instantiates these reflectively
  final case class Ev(user_id: Long, tsMicros: Long, value: Double)
  /** Batch-path group key / slim event (see [[sessionizeCustom]]'s batch arm). */
  final case class UserDay(user_id: Long, day: Long)
  final case class EvSlim(tsMicros: Long, value: Double)
  /** One gap-separated session interval. */
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  /** Streaming state per user: ALL sessions the watermark hasn't finalized yet,
    * disjoint and gap-separated, sorted by start. More than one can be pending when
    * events arrive ahead of the watermark (the exact situation where emitting on the
    * gap rule alone would be premature: an admitted late event may still merge into
    * or bridge them).
    */
  final case class SessionsState(sessions: List[SessionState])
  final case class Session(user_id: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      session_value: Double)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the hand-rolled
    * equivalent of [[sessionize]] for session logic `session_window` can't express
    * (per-event predicates, value-dependent gaps, session caps). Semantics match
    * session_window exactly: events merge into gap-separated intervals (out-of-order
    * events extend sessions backwards and can BRIDGE two pending sessions into one,
    * exactly like session_window's merging state store).
    *
    * Batch (`events.isStreaming == false`): groups are pre-split by (user, DAY), so
    * no invocation ever buffers more than one user-day of events — a hot user with
    * an unbounded history cannot OOM an executor. Sessions split at a day boundary
    * are re-merged relationally afterwards by gaps-and-islands over the per-SESSION
    * rows (orders of magnitude fewer than events), exactly e06's trick moved
    * inside; results are identical to the un-split formulation.
    *
    * Streaming: ALL pending sessions persist in GroupState between micro-batches,
    * and a session is emitted ONLY once the watermark passes `session_end + gap` —
    * the first instant no admissible event can extend or bridge it (emitting on the
    * gap rule alone would be premature: a late-but-admitted event could still merge
    * backwards into the gap). Finalization happens on data arrival and via
    * EventTimeTimeout for idle keys. Callers must set `.withWatermark` upstream
    * ([[sessionizeCustomStream]] does). Sessions are therefore emitted exactly once,
    * complete — never as split or retracted partials.
    *
    * At scale: state is per-key and partitioned by the groupByKey shuffle. The
    * streaming per-invocation sort buffers one user's events for ONE MICRO-BATCH
    * (bounded by trigger interval × ingest rate) plus the watermark-pending
    * sessions — the same bound session_window's merging state carries; the batch
    * path's (user, day) pre-split bounds its buffer structurally
    * (EventStreamsSpec's hot-user test runs 10⁶ single-user events through it).
    */
  def sessionizeCustom(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0, s"calendar-month gaps unsupported: $gap")
    val gapMicros = iv.days * 86400000000L + iv.microseconds
    val streaming = events.isStreaming
    // the watermarked `ts` attribute must SURVIVE the projection: EventTimeTimeout
    // requires a watermark-tagged column in the stateful operator's child (projecting
    // it away fails analysis with "Event-time timeout not supported without
    // watermark"), and as[Ev] binds by name, ignoring the extra column
    val ds = events
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("tsMicros"), col("value").cast("double"), col("ts"))
      .as[Ev]
    def toTs(us: Long): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000))
    def emit(user: Long, st: SessionState): Session =
      Session(user, st.n, toTs(st.start), toTs(st.last), st.sum)
    // Interval merge: existing pending sessions + this batch's events (as degenerate
    // sessions), sorted by start, folded — adjacent pieces closer than the gap merge,
    // which handles in-order appends, backward extension, and bridging uniformly.
    // Deterministic accumulation order (sort is total on (start, last, sum)).
    def mergeAll(existing: List[SessionState], evs: Seq[Ev]): List[SessionState] = {
      val pieces = existing ++ evs.map(e => SessionState(e.tsMicros, e.tsMicros, 1L, e.value))
      pieces.sortBy(s => (s.start, s.last, s.sum))
        .foldLeft(List.empty[SessionState]) { (acc, s) =>
          acc match {
            case h :: t if s.start - h.last < gapMicros =>
              SessionState(h.start, math.max(h.last, s.last), h.n + s.n, h.sum + s.sum) :: t
            case _ => s :: acc
          }
        }.reverse
    }
    if (!streaming) {
      // Hot-key-safe batch path: group on (user, day-of-ts) so one invocation
      // buffers at most one user-day of events, then re-merge day-boundary splits
      // with gaps-and-islands over the per-session rows. A session crossing
      // midnight was split at an event boundary, so adjacent pieces closer than
      // the gap re-merge; sessions within one day are >= gap apart by
      // construction, so they never wrongly merge. The merge window runs over
      // session summaries, not events — per-user row counts there are harmless.
      //
      // Plumbing, tuned (r9): the key is COLUMNS via groupBy(...).as[K, V], not
      // a groupByKey lambda — the lambda form prepends an AppendColumns node
      // that serializes every row into an Ev object just to compute the key.
      // flatMapSortedGroups pushes the within-group ts order into the
      // exchange's own SortExec (codegen, off-heap rows), so the fold is a
      // LINEAR streaming pass per group: no per-group toSeq buffer, no boxed
      // sortBy, no per-event SessionState allocation — only per-SESSION output.
      val dayMicros = 86400000000L
      val perDay = events
        .select(col("user_id").cast("long").as("user_id"),
          unix_micros(col("ts")).as("tsMicros"), col("value").cast("double").as("value"))
        // floorDiv as (ts - pmod(ts, day)) / day: exact for pre-1970 (negative
        // micros) timestamps too, where long division would truncate toward 0
        .withColumn("day",
          ((col("tsMicros") - pmod(col("tsMicros"), lit(dayMicros))) / lit(dayMicros))
            .cast("long"))
        .groupBy("user_id", "day").as[UserDay, EvSlim]
        .flatMapSortedGroups(col("tsMicros")) { (key: UserDay, evs: Iterator[EvSlim]) =>
          // events arrive ts-ascending: a session is a maximal run with gaps
          // < gapMicros — same result as mergeAll, without materializing the group
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Double)]
          var start = 0L; var last = 0L; var n = 0L; var sum = 0.0; var open = false
          for (e <- evs) {
            if (open && e.tsMicros - last < gapMicros) {
              last = e.tsMicros; n += 1; sum += e.value
            } else {
              if (open) out += ((key.user_id, start, last, n, sum))
              open = true; start = e.tsMicros; last = e.tsMicros; n = 1; sum = e.value
            }
          }
          if (open) out += ((key.user_id, start, last, n, sum))
          out
        }
        .toDF("user_id", "start", "last", "n", "sum")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("start")
      return perDay
        .withColumn("__ns",
          when(col("start") - lag("last", 1).over(w) >= gapMicros, 1).otherwise(0))
        .withColumn("__island", sum("__ns").over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
        .groupBy("user_id", "__island")
        .agg(sum("n").as("n_events"),
          timestamp_micros(min("start")).as("session_start"),
          timestamp_micros(max("last")).as("session_end"),
          sum("sum").as("session_value"))
        .select("user_id", "n_events", "session_start", "session_end", "session_value")
    }
    val timeoutConf = GroupStateTimeout.EventTimeTimeout
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, Session](
        OutputMode.Append, timeoutConf) { (user, evs, state: GroupState[SessionsState]) =>
        val merged = mergeAll(state.getOption.map(_.sessions).getOrElse(Nil), evs.toSeq)
        // a session is final iff no admissible future event (ts >= watermark) can
        // reach it: last + gap <= watermark. Same rule on data arrival and timeout.
        val wmMicros = state.getCurrentWatermarkMs() * 1000L
        val (done, open) = merged.partition(s => s.last + gapMicros <= wmMicros)
        if (open.isEmpty) state.remove()
        else {
          state.update(SessionsState(open))
          // +1ms so the ms-floored target lands strictly past last + gap, and
          // clamped strictly past the watermark (Spark rejects earlier targets)
          state.setTimeoutTimestamp(math.max(
            open.map(_.last).min / 1000 + gapMicros / 1000 + 1,
            wmMicros / 1000 + 1))
        }
        done.map(emit(user, _)).iterator
      }
      .toDF()
  }

  /** Watermarked streaming variant of [[sessionizeCustom]]: the watermark both
    * bounds state and drives the EventTimeTimeout that flushes idle open sessions.
    */
  def sessionizeCustomStream(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    sessionizeCustom(events.withWatermark("ts", lateness), gap)

  /** Exactly-once event dedup by id, batch or streaming. Streaming uses
    * `dropDuplicatesWithinWatermark`: the dedup state for an id is dropped once the
    * watermark passes its event time + `lateness` — bounded state, unlike a plain
    * streaming dropDuplicates whose key set grows forever. A replay arriving while
    * the id is still in state is suppressed; one arriving later than `lateness` is
    * admitted as new — the standard at-least-once-source to effectively-once
    * contract, sized by the source's redelivery horizon.
    *
    * The batch path keeps the MIN-ts row per id (a rank window, d02's shape) —
    * NOT dropDuplicates, whose pick is whichever task scans first and therefore
    * nondeterministic on a corpus that actually contains duplicate ids (the one
    * input a dedup operator exists for). Min-ts mirrors what the streaming path
    * converges to when the source replays in order, and is what e07's oracle
    * checks.
    */
  def dedupEvents(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark("event_id")
    else {
      // Total order inside the window: duplicate ids can share an equal ts with
      // differing payloads, and a ts-only pick would be engine-arbitrary. Break
      // ties on every remaining column (name-sorted), which the e07 oracle's
      // row_number mirrors for the events schema.
      val tiebreak = events.columns.filter(c => c != "event_id" && c != "ts").sorted
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_id").orderBy(("ts" +: tiebreak.toSeq).map(col): _*)
      events.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
}
