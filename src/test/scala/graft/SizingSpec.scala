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

  test("computedPartitions: 64 MB per partition, clamped to 4096") {
    assert(Sizing.computedPartitions(0L) === 0)
    assert(Sizing.computedPartitions(1L) === 1)
    assert(Sizing.computedPartitions(64L << 20) === 1)
    assert(Sizing.computedPartitions((64L << 20) + 1) === 2)
    // the measured sf100 point: a 16 GB dir sizes to the 256 that fixed d09/d11
    assert(Sizing.computedPartitions(16L << 30) === 256)
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

  test("applyTarget with AQE coalescing raises initialPartitionNum, not shuffle.partitions") {
    withConfRestored("spark.sql.shuffle.partitions", InitKey,
      "spark.sql.adaptive.enabled") {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      assert(Sizing.applyTarget(spark, 256) === 256)
      assert(spark.conf.get(InitKey) === "256")
      // the session default is untouched: AQE coalesces small shuffles back down
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
      // a second, smaller raise must not shrink the sized value
      assert(Sizing.applyTarget(spark, 128) === 256)
      assert(spark.conf.get(InitKey) === "256")
    }
  }

  test("applyTarget with AQE off raises shuffle.partitions directly") {
    withConfRestored("spark.sql.shuffle.partitions", InitKey,
      "spark.sql.adaptive.enabled") {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      assert(Sizing.applyTarget(spark, 256) === 256)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "256")
      assert(spark.conf.getOption(InitKey).isEmpty)
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

  test("autoSize survives an unreadable dir (falls back to current setting)") {
    withConfRestored("spark.sql.shuffle.partitions", InitKey) {
      Sizing.clearCache()
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      assert(Sizing.autoSize(spark, "/nonexistent/graft-sizing-spec") === before.toInt)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
      Sizing.clearCache()
    }
  }
}
