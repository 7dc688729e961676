package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet tables (repo:TESTDATA.md).
  * One `spark.read.parquet` per table; Catalyst prunes columns/pushes filters
  * into the scan, so these deliberately do NOT pre-select columns.
  */
object Tables {
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    // Volume-derived shuffle sizing rides on first table touch per (session,
    // dir), so every entry point — Verify, Bench, tests, a library user —
    // gets the sf100-proven partition rule without knowing a knob (Sizing).
    Sizing.autoSize(s, dir)
    s.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, dir: String): DataFrame    = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = table(s, dir, "lineitem")
  /** `events.parquet` has shipped with two physical types for `ts` across
    * testdata generations: epoch-NANOsecond int64 (which Spark 4 rejects as a
    * timestamp at scan time, [PARQUET_TYPE_ILLEGAL]) and, since the 2026-08-13
    * refresh, plain `timestamp[us]`. Adapt on the OBSERVED schema: with the
    * legacy conf set, a nanos column scans as raw BIGINT and is truncated to
    * microseconds with integer arithmetic — `ts div 1000` stays exact where
    * `(ts / 1e9).cast("timestamp")` would round (2024 epoch-nanos ≈ 1.7e18 >
    * 2^53) — while a micros column scans as a timestamp already and passes
    * through untouched (the two paths agree: nanos div 1000 IS the micros
    * value). The conf is set here, not in the session builders, so every entry
    * point (Verify, Bench, tests, driver smoke) reads the table identically.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // micros-without-tz scans as TIMESTAMP_NTZ; cast to the session-zone
        // TIMESTAMP the nanos path produced (session zone is pinned UTC, so
        // the instant is unchanged) — downstream plans and the driver's
        // schema compare see one type regardless of testdata generation
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
