package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** Drives the streaming variants through an actual micro-batch execution
  * (MemoryStream source -> watermark -> session/tumbling aggregation -> memory sink)
  * and checks the batch/stream symmetry: the streamed result equals the batch
  * transform over the same rows.
  */
class EventStreamsSpec extends AnyFunSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val rows = Seq(
    // user 1: two sessions (gap 40 > 30 min between m=10 and m=50)
    (1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(50), 3.0),
    // user 2: one session
    (2L, ts(5), 4.0), (2L, ts(20), 5.0))

  test("sessionizeStream over MemoryStream equals batch sessionize") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val source = mem.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.sessionizeStream(source, gap = "30 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("sess_out").outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .select("user_id", "n_events", "session_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      val batch = EventStreams.sessionize(rows.toDF("user_id", "ts", "value"), "30 minutes")
        .select("user_id", "n_events", "session_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(streamed === batch)
      assert(streamed === Array((1L, 1L, 3.0), (1L, 2L, 3.0), (2L, 2L, 9.0)))
    } finally q.stop()
  }

  test("custom-state sessionizer (flatMapGroupsWithState) equals session_window on real data") {
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "n_events", "session_start", "session_end", "session_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        r.getTimestamp(3).getTime, math.round(r.getDouble(4) * 100)))
      .sorted
    val builtin = canon(EventStreams.sessionize(events, "30 minutes"))
    val custom = canon(EventStreams.sessionizeCustom(events, "30 minutes"))
    assert(custom.length === builtin.length)
    assert(custom === builtin)
  }

  test("batch custom sessionizer is hot-key-safe: 10^6 events for ONE user complete " +
      "with per-group buffering bounded to a user-day") {
    // one user, a million events, 10 s apart -> ~116 days, ONE unbroken session
    // (10 s < 30 min). The (user, day) pre-split means no flatMapGroups invocation
    // buffers more than 8640 events (one day at this rate) — the un-split
    // formulation would materialize all 10^6 in one executor Seq. Correctness:
    // day-boundary splits must re-merge into exactly one session end-to-end.
    val n = 1000000
    val base = Timestamp.valueOf("2024-01-01 00:00:05").getTime * 1000L
    val events = spark.range(n).select(
      lit(7L).as("user_id"),
      timestamp_micros(lit(base) + col("id") * 10000000L).as("ts"),
      lit(1.0).as("value"))
    val out = EventStreams.sessionizeCustom(events, "30 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
    assert(out.length === 1, s"expected one merged session, got ${out.length}")
    val (user, count, start, end) = out.head
    assert(user === 7L && count === n.toLong)
    assert(start === new Timestamp(base / 1000))
    assert(end === new Timestamp(base / 1000 + (n - 1) * 10000L))
    // same events with an hour-long gap every 100k: day-merge must still find
    // exactly the 10 gap-separated sessions
    val gappy = spark.range(n).select(
      lit(7L).as("user_id"),
      timestamp_micros(lit(base) + col("id") * 10000000L +
        (col("id") / 100000).cast("long") * 3600000000L).as("ts"),
      lit(1.0).as("value"))
    val sessions = EventStreams.sessionizeCustom(gappy, "30 minutes")
      .select("n_events").collect().map(_.getLong(0))
    assert(sessions.length === 10 && sessions.forall(_ === 100000L))
  }

  test("custom-state sessionizer withholds pending sessions across micro-batches " +
      "and finalizes them only when the watermark passes session_end + gap") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val source = mem.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.sessionizeCustomStream(source, gap = "30 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("custom_sess_out").outputMode("append").start()
    try {
      def emitted() = spark.table("custom_sess_out")
        .select("user_id", "n_events", "session_start", "session_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
        .sortBy(x => (x._1, x._3.getTime))
      // batch 1: an open session for user 1 — must NOT be emitted yet
      mem.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0))
      q.processAllAvailable()
      assert(emitted().isEmpty, "open session leaked out of batch 1")
      // batch 2: a user-1 event 40 min later starts a second session; processing this
      // batch advances the watermark to m=45, and the resulting no-data batch
      // finalizes session 1 (end 10:10 + gap = 10:40 <= 10:45)
      mem.addData((1L, ts(50), 3.0))
      q.processAllAvailable()
      assert(emitted() === Array((1L, 2L, ts(0), 3.0)))
      // batch 3: an unrelated user's much-later event advances the watermark past
      // m=50 + gap, finalizing user 1's second session via the event-time timeout
      mem.addData((2L, Timestamp.valueOf("2024-01-01 12:30:00"), 9.0))
      q.processAllAvailable()
      assert(emitted() === Array((1L, 2L, ts(0), 3.0), (1L, 1L, ts(50), 3.0)))
    } finally q.stop()
  }

  test("custom-state sessionizer merges an admitted out-of-order event BACKWARDS, " +
      "bridging two pending sessions instead of emitting them split") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val source = mem.toDF().toDF("user_id", "ts", "value")
    // lateness 60m: events up to an hour late are admitted, so sessions must stay
    // pending long enough that a late arrival can still bridge them
    val q = EventStreams.sessionizeCustomStream(source, gap = "30 minutes", lateness = "60 minutes")
      .writeStream.format("memory").queryName("bridge_sess_out").outputMode("append").start()
    try {
      def emitted() = spark.table("bridge_sess_out")
        .select("user_id", "n_events", "session_start", "session_end", "session_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getTimestamp(3), r.getDouble(4)))
        .sortBy(x => (x._1, x._3.getTime))
      mem.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0)) // pending session A [0,10]
      q.processAllAvailable()
      mem.addData((1L, ts(50), 3.0)) // pending session B [50,50] (gap 40 >= 30)
      q.processAllAvailable()
      assert(emitted().isEmpty, "sessions emitted before the watermark allowed")
      // late event at m=25 (admitted: watermark is 09:50): extends A to [0,25], and
      // now B is only 25 min away -> A and B BRIDGE into one session [0,50]
      mem.addData((1L, ts(25), 5.0))
      q.processAllAvailable()
      assert(emitted().isEmpty)
      // advance the watermark far past 10:50 + gap: exactly ONE merged session
      mem.addData((2L, Timestamp.valueOf("2024-01-01 13:00:00"), 9.0))
      q.processAllAvailable()
      assert(emitted() === Array((1L, 4L, ts(0), ts(50), 11.0)))
    } finally q.stop()
  }

  test("streaming dedup suppresses in-state replays and writes exactly-once to a " +
      "checkpointed parquet sink") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val source = mem.toDF().toDF("event_id", "ts", "value")
    val outDir = java.nio.file.Files.createTempDirectory("graft-dedup-sink").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-dedup-ck").toString
    // the real sink path: append-mode parquet files + checkpointed offsets/state
    val q = EventStreams.dedupEvents(source, lateness = "60 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckDir).outputMode("append").start()
    try {
      mem.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0))
      q.processAllAvailable()
      // batch 2 replays id=1 (still within the watermark horizon) and adds id=3
      mem.addData((1L, ts(0), 1.0), (3L, ts(2), 3.0))
      q.processAllAvailable()
      val out = spark.read.parquet(outDir)
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(out === Array(1L, 2L, 3L), "replayed id leaked through or a row was lost")
    } finally q.stop()
  }

  test("streaming dedup state survives a RESTART from the checkpoint: a replay " +
      "arriving in the second incarnation is still suppressed") {
    // exactly-once at 100 TB lives or dies on checkpoint recovery — this drives
    // two separate StreamingQuery incarnations over ONE checkpoint dir
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val source = mem.toDF().toDF("event_id", "ts", "value")
    val outDir = java.nio.file.Files.createTempDirectory("graft-dedup2-sink").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-dedup2-ck").toString
    def start() = EventStreams.dedupEvents(source, lateness = "60 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckDir).outputMode("append").start()
    val q1 = start()
    mem.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0))
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    try {
      // id=1 replays AFTER the restart: only the recovered state store can know
      // it was already emitted; id=3 is genuinely new
      mem.addData((1L, ts(0), 1.0), (3L, ts(2), 3.0))
      q2.processAllAvailable()
      val out = spark.read.parquet(outDir)
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(out === Array(1L, 2L, 3L),
        "restart lost dedup state (duplicate) or dropped a row")
    } finally q2.stop()
  }

  test("custom sessionizer recovers GroupState across a RESTART: a session spanning " +
      "the restart is emitted exactly once, complete") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val source = mem.toDF().toDF("user_id", "ts", "value")
    val outDir = java.nio.file.Files.createTempDirectory("graft-sess2-sink").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-sess2-ck").toString
    def start() = EventStreams.sessionizeCustomStream(source, gap = "30 minutes",
        lateness = "5 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckDir).outputMode("append").start()
    val q1 = start()
    mem.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0)) // open session, lives in GroupState
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    try {
      // extends the PRE-restart pending session — only recovered state can merge it
      mem.addData((1L, ts(20), 3.0))
      q2.processAllAvailable()
      // advance the watermark far past end + gap to finalize via timeout
      mem.addData((2L, Timestamp.valueOf("2024-01-01 12:30:00"), 9.0))
      q2.processAllAvailable()
      val out = spark.read.parquet(outDir).filter(col("user_id") === 1)
        .select("n_events", "session_start", "session_end", "session_value")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getDouble(3)))
      assert(out.length === 1, s"session split or duplicated across restart: ${out.toSeq}")
      assert(out.head === ((3L, ts(0), ts(20), 6.0)))
    } finally q2.stop()
  }

  test("batch dedup keeps the MIN-ts row per id — deterministic on duplicate ids") {
    // duplicate ids are the input a dedup operator exists for; dropDuplicates'
    // whichever-task-scans-first pick would be nondeterministic here
    val df = spark.sparkContext.parallelize(Seq(
        (42L, ts(10), 2.0), (42L, ts(0), 1.0), (7L, ts(5), 3.0)))
      .toDF("event_id", "ts", "value")
    val out = EventStreams.dedupEvents(df)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(out === Array((7L, ts(5), 3.0), (42L, ts(0), 1.0)))
  }

  test("e07 oracle's hard-coded tiebreak list tracks the events schema") {
    // dedupEvents derives its tiebreak columns dynamically from events.columns;
    // the e07 oracle hard-codes them. A new events column would silently change
    // the Spark pick order without the oracle following — make that drift fail
    // HERE, loudly, instead of as a hash mismatch in a driver round.
    val schema = graft.queries.Tables.events(spark, "/root/testdata/sf0.001").columns
    val expected = "ts" +: schema.filter(c => c != "event_id" && c != "ts").sorted.toSeq
    val sql = graft.SparkEntry.oracleSql("e07_dedup_events")
    val orderBy = """(?i)OVER\s*\(PARTITION BY event_id ORDER BY ([^)]*)\)""".r
      .findFirstMatchIn(sql)
      .getOrElse(fail(s"e07 oracle no longer matches the expected window shape:\n$sql"))
      .group(1)
    val oracleCols = orderBy.split(",").map(_.trim.stripSuffix(" NULLS FIRST").trim).toSeq
    assert(oracleCols === expected,
      s"oracle tiebreak list drifted from the events schema: oracle=$oracleCols schema=$expected")
  }

  test("an event later than the watermark horizon is DROPPED, not merged") {
    // the state-bounding side of the watermark contract: EventStreamsSpec's
    // bridging test pins that admitted-late events merge; this pins the
    // complement — an event behind the watermark never resurrects or extends a
    // finalized session (at 100 TB this is what lets executors drop state)
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val source = mem.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.sessionizeCustomStream(source, gap = "30 minutes",
        lateness = "5 minutes")
      .writeStream.format("memory").queryName("late_drop_out").outputMode("append").start()
    try {
      def emitted() = spark.table("late_drop_out")
        .select("user_id", "n_events", "session_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      mem.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0))
      q.processAllAvailable()
      // advance the watermark far past session end + gap: session finalizes
      mem.addData((2L, Timestamp.valueOf("2024-01-01 13:00:00"), 9.0))
      q.processAllAvailable()
      assert(emitted() === Array((1L, 2L, 3.0)))
      // an event INSIDE the finalized session's interval, far behind the
      // watermark (12:55): must be dropped — no new/updated user-1 session
      mem.addData((1L, ts(5), 100.0))
      q.processAllAvailable()
      mem.addData((2L, Timestamp.valueOf("2024-01-01 15:00:00"), 9.0))
      q.processAllAvailable()
      assert(emitted().filter(_._1 == 1L) === Array((1L, 2L, 3.0)),
        "a behind-watermark event resurrected a finalized session")
    } finally q.stop()
  }

  test("tumblingCountsStream aggregates into aligned hourly windows") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val source = mem.toDF().toDF("user_id", "ts", "value")
      .withColumn("event_type", when(col("user_id") === 1, "click").otherwise("view"))
    val q = EventStreams.tumblingCountsStream(source, width = "1 hour", lateness = "5 minutes")
      .writeStream.format("memory").queryName("hourly_out").outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("hourly_out")
        .select("win_start", "event_type", "n", "sv")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .sorted
      assert(got === Array(
        ("2024-01-01 10:00:00.0", "click", 3L, 6.0),
        ("2024-01-01 10:00:00.0", "view", 2L, 9.0)))
    } finally q.stop()
  }
}
