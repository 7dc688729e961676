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

  test("IVF inverted lists stored partitionBy(cid) prune a probe to the probed lists") {
    // the s03/s04 scale story made literal: centroid id as the storage partition
    // key means an nprobe-probe reads nprobe/K of the data at LISTING time
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val emb = Tables.embeddings(s, "/root/testdata/sf0.001")
    // toy assignment (pmod) — the layout property under test is independent of how
    // the real queries compute nearest-centroid
    emb.withColumn("cid", pmod($"vec_id", lit(16)))
      .write.mode("overwrite").partitionBy("cid").parquet(dir)
    val probe = s.read.parquet(dir).filter($"cid".isin(3, 7, 11, 15))
      .select("vec_id", "embedding")
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"), plan)
    val postScanFilters = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(postScanFilters.isEmpty, s"probe did not prune at listing time:\n$plan")
  }

  test("LSH bands stored partitionBy(bi, bucket) prune a probe to the probed buckets") {
    // the s02/d08 storage story VectorOps' scaladoc promises, made literal: the
    // (band, bucket) pair as the storage partition key means probing a query's
    // band buckets reads ONLY those buckets' files at LISTING time — at 100 TB
    // the exact-scoring candidate scan never touches the other ~4095 buckets/band
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-layout").toString
    val banded = VectorOps.banded(Tables.embeddings(s, "/root/testdata/sf0.001"))
    banded.write.mode("overwrite").partitionBy("bi", "bucket").parquet(dir)
    // bit-string bucket values ("0110…") must stay strings, not be inferred as
    // leading-zero-stripped integers
    val prevInfer = s.conf.get("spark.sql.sources.partitionColumnTypeInference.enabled")
    s.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    try {
      val stored = s.read.parquet(dir)
      // the query's own band buckets (what s02 probes / d08 co-groups on)
      val qb = banded.filter($"vec_id" === 0).select("bi", "bucket")
        .collect().map(r => (r.getInt(0), r.getString(1)))
      val probe = stored.filter(qb.map { case (bi, b) =>
        $"bi" === bi.toString && $"bucket" === b
      }.reduce(_ || _))
        .select("vec_id", "embedding")
      probe.collect()
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
      val postScanFilters = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FilterExec => f
      }
      assert(postScanFilters.isEmpty, s"band-bucket probe did not prune at listing time:\n$plan")
      // and the pruned read IS the candidate set the in-memory formulation scores
      val expected = banded.join(banded.filter($"vec_id" === 0).select("bi", "bucket"),
        Seq("bi", "bucket")).select("vec_id").distinct().count()
      assert(probe.select("vec_id").distinct().count() === expected)
    } finally s.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", prevInfer)
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
