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
  /** Open-session state carried between micro-batches per user. */
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      session_value: Double)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the hand-rolled
    * equivalent of [[sessionize]] for session logic `session_window` can't express
    * (per-event predicates, value-dependent gaps, session caps). Semantics match
    * session_window exactly: a new session starts iff the gap from the previous
    * event is >= `gap`.
    *
    * Batch (`events.isStreaming == false`): each user's events arrive as one group;
    * every session — including the trailing open one — is emitted, and no state
    * survives (batch state is always transient anyway).
    *
    * Streaming: the open session persists in GroupState between micro-batches and is
    * flushed ONLY by EventTimeTimeout, when the watermark passes
    * `session_end + gap` — the exact instant session_window would close it. Callers
    * must set `.withWatermark` upstream ([[sessionizeCustomStream]] does). A session
    * spanning micro-batches is therefore emitted once, complete — never as split
    * partials.
    *
    * At scale: state is per-user and partitioned by the groupByKey shuffle. The
    * per-invocation `sortBy` buffers one user's events for one micro-batch (batch
    * mode: one user's whole history) — bounded by per-user volume, the same bound
    * session_window's merging state carries; a hot key beyond memory needs a
    * pre-split (e.g. salt by day) in either formulation.
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
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) { (user, evs, state: GroupState[SessionState]) =>
        if (streaming && state.hasTimedOut) {
          // watermark passed session_end + gap: the open session can no longer grow
          val done = emit(user, state.get)
          state.remove()
          Iterator.single(done)
        } else {
          val sorted = evs.toSeq.sortBy(e => (e.tsMicros, e.value))
          val out = Seq.newBuilder[Session]
          var st = state.getOption.orNull
          for (e <- sorted) {
            if (st == null) st = SessionState(e.tsMicros, e.tsMicros, 1, e.value)
            else if (e.tsMicros - st.last >= gapMicros) {
              out += emit(user, st)
              st = SessionState(e.tsMicros, e.tsMicros, 1, e.value)
            } else st = SessionState(st.start, e.tsMicros, st.n + 1, st.sum + e.value)
          }
          if (st != null) {
            if (streaming) {
              // keep the open session; flush when the watermark passes last + gap
              state.update(st)
              state.setTimeoutTimestamp(st.last / 1000 + gapMicros / 1000)
            } else out += emit(user, st) // batch: the group is complete
          }
          out.result().iterator
        }
      }
      .toDF()
  }

  /** Watermarked streaming variant of [[sessionizeCustom]]: the watermark both
    * bounds state and drives the EventTimeTimeout that flushes idle open sessions.
    */
  def sessionizeCustomStream(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    sessionizeCustom(events.withWatermark("ts", lateness), gap)
}
