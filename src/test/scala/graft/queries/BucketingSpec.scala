package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** Bucketing = the 100 TB co-located-join strategy: writing both fact tables
  * bucketed (and sorted) by the join key lets every subsequent join on that key run
  * WITHOUT shuffling either side — the bucket files ARE the partitions. This spec
  * proves the property on the real tables: the bucketed join plan contains no
  * exchange on the join keys (broadcast disabled so the shuffle-free path is what's
  * actually exercised, not hidden by a small-table broadcast).
  */
class BucketingSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed-by-join-key tables join with no shuffle on either side") {
    val s = spark
    import s.implicits._
    Tables.orders(s, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_bkt")
    Tables.customer(s, sf).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_bkt")
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = s.table("orders_bkt")
        .join(s.table("customer_bkt"), $"o_custkey" === $"c_custkey")
        .select("o_orderkey", "o_totalprice", "c_mktsegment")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the join keys are co-located by bucketing: NO exchange anywhere in this plan
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // cross-check the result is the same as the plain parquet join
      val expected = Tables.orders(s, sf)
        .join(Tables.customer(s, sf), $"o_custkey" === $"c_custkey").count()
      assert(j.count() === expected)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS orders_bkt")
      s.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("date-partitioned writes prune the scan to the queried partitions") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.orders(s, sf)
      .withColumn("o_year", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val q = s.read.parquet(dir).filter($"o_year" === 1995).select("o_orderkey")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the partition filter must be applied at LISTING time (PartitionFilters on the
    // scan), not as a post-scan Filter over all years
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"), plan)
    val postScanFilters = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(postScanFilters.isEmpty, s"partition predicate did not prune the scan:\n$plan")
  }

  test("aggregation on the bucket key also skips the shuffle") {
    val s = spark
    import s.implicits._
    Tables.orders(s, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_bkt2")
    try {
      val a = s.table("orders_bkt2").groupBy("o_custkey").agg(sum("o_totalprice").as("t"))
      a.collect()
      val plan = a.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed groupBy still shuffles:\n$plan")
    } finally s.sql("DROP TABLE IF EXISTS orders_bkt2")
  }
}
