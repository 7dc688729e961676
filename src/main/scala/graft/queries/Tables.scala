package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet tables (repo:TESTDATA.md).
  * One `spark.read.parquet` per table; Catalyst prunes columns/pushes filters
  * into the scan, so these deliberately do NOT pre-select columns.
  */
object Tables {
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame    = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = table(s, dir, "lineitem")
  def events(s: SparkSession, dir: String): DataFrame    = table(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
