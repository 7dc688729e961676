package graft.hpct

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** Public `addRatioColumn` (reference add_ratio_column, HD.py:340-385): ratios on a
  * SECOND metric (not the load-time percentage base), checked against an independent
  * recompute, plus insert-position and name-override contracts.
  */
class RatioColumnSpec extends AnyFunSuite {

  private val fixture = "/root/reference/test/data/experiment1.xml"

  test("ratio-of-total on a second metric equals value / root value") {
    assume(new File(fixture).exists())
    val pf = ProfileLoad.load(spark, fixture)
    val base = "CPUTIME (usec):Sum (I)"
    assume(pf.df.columns.contains(base), s"fixture lacks $base")
    assert(base !== pf.meta.percentageColumn) // genuinely a second metric
    val out = pf.addRatioColumn(base, "total")
    // metadata survives (reference T.py:40-45 behavior for derived frames)
    assert(out.meta === pf.meta)
    // inserted immediately after the base column (HD.py:354)
    val cols = out.df.columns.toSeq
    assert(cols(cols.indexOf(base) + 1) === s"$base ratio of total")
    // golden recompute: collect the root value once, compare every row
    val rootVal = pf.df.filter(col("id") === Model.RootId)
      .select(col(base)).head().getDouble(0)
    val bad = out.df
      .select(col("id"), col(base).as("v"), col(s"$base ratio of total").as("r"))
      .filter(col("v").isNotNull && abs(col("r") - col("v") / lit(rootVal)) > lit(1e-12))
      .count()
    assert(bad === 0)
  }

  test("ratio-of-parent on a second metric uses the reference walk-up semantics") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("callpath", ArrayType(LongType)),
      StructField("v", DoubleType)))
    // exclusive-metric shape: the parent (4.0) is smaller than the child (10.0), so
    // walk-up and direct-parent genuinely differ — the public API must walk up
    val rows = Seq(
      Row(-1L, Seq.empty[Long], 20.0),
      Row(1L, Seq(1L), 20.0),
      Row(2L, Seq(1L, 2L), 4.0),
      Row(3L, Seq(1L, 2L, 3L), 10.0))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val meta = ProfileMeta("synthetic", Nil, Map.empty, Map.empty, Map.empty, Map.empty,
      "v", "v", Seq("v"))
    val walk = ProfileFrame(df, meta).addRatioColumn("v", "parent").df
      .select(col("id"), col("`v ratio of parent`").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(walk(3L) - 0.5) < 1e-12) // 10/20 via walk-up, not 10/4
    val direct = ProfileFrame(df, meta).addRatioColumn("v", "parent_direct").df
      .select(col("id"), col("`v ratio of parent`").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(direct(3L) - 2.5) < 1e-12) // 10/4 direct
  }

  test("name override and unknown method") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("callpath", ArrayType(LongType)),
      StructField("v", DoubleType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(-1L, Seq.empty[Long], 2.0), Row(1L, Seq(1L), 1.0)), 1), schema)
    val named = ProfileLoad.addRatioColumn(df, "v", "total", Some("pct"))
    assert(named.columns.toSeq === Seq("id", "callpath", "v", "pct"))
    intercept[IllegalArgumentException] {
      ProfileLoad.addRatioColumn(df, "v", "nonsense")
    }
  }
}
