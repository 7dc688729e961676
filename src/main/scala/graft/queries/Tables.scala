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
  /** `events.parquet` carries nanosecond timestamps, which Spark 4 rejects at scan
    * time ([PARQUET_TYPE_ILLEGAL]). Read them as raw longs and truncate to
    * microseconds with integer arithmetic — `ts div 1000` stays exact where
    * `(ts / 1e9).cast("timestamp")` would round (2024 epoch-nanos ≈ 1.7e18 > 2^53).
    * The conf is set here, not in the session builders, so every entry point
    * (Verify, Bench, tests, driver smoke) reads the table identically.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
