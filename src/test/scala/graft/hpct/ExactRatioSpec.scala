package graft.hpct

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** The exact walk-up ratio-of-parent (reference HD.py:360-385: divisor = deepest
  * proper ancestor with value >= own value) must agree with the plain parent join on
  * the fixtures — for inclusive metrics the direct parent always dominates (SURVEY
  * §7.4.2 documents the equivalence; this pins it).
  */
class ExactRatioSpec extends AnyFunSuite {

  private val fixture = "/root/reference/test/data/experiment1.xml"

  test("exact walk-up parent ratio equals the plain parent join on experiment1") {
    assume(new File(fixture).exists())
    val pf = ProfileLoad.load(spark, fixture)
    val base = pf.meta.percentageColumn
    val plain = s"$base ratio of parent"
    val exact = s"$base ratio of parent (exact)"
    val both = ProfileLoad.exactParentRatio(pf.df, base)
      .select(col("id"), col("`" + plain + "`").as("p"), col("`" + exact + "`").as("e"))
    val bad = both.filter(
      !(col("p").isNull && col("e").isNull) &&
        (col("p").isNull || col("e").isNull || abs(col("p") - col("e")) > lit(1e-12)))
    val badRows = bad.collect()
    assert(badRows.isEmpty, s"rows where exact != plain: ${badRows.take(5).mkString(", ")}")
    assert(both.count() === 3454)
  }

  test("synthetic walk-up case: ancestor chain skips smaller-valued parents") {
    // child(value 10) under parent(value 4) under grandparent(value 20): plain join
    // divides by 4; the reference's walk-up skips past the smaller parent to the
    // grandparent (ancestor >= own value), giving 10/20.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("callpath", ArrayType(LongType)),
      StructField("v", DoubleType)))
    val rows = Seq(
      Row(-1L, Seq.empty[Long], 20.0),
      Row(1L, Seq(1L), 20.0),
      Row(2L, Seq(1L, 2L), 4.0),
      Row(3L, Seq(1L, 2L, 3L), 10.0))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val out = ProfileLoad.exactParentRatio(df, "v")
      .select(col("id"), col("`v ratio of parent (exact)`").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(3L) - 0.5) < 1e-12)   // 10 / 20 via walk-up, NOT 10 / 4
    assert(math.abs(out(2L) - 0.2) < 1e-12)   // 4 / 20: parent dominates
    assert(math.abs(out(-1L) - 1.0) < 1e-12)  // root maps to itself
  }
}
