package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
