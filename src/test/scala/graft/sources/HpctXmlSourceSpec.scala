package graft.sources

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** The DSv2 scan source: schema inference across files, one partition per file,
  * raw-value fidelity, option handling, and column-pruning pushdown.
  */
class HpctXmlSourceSpec extends AnyFunSuite {

  private val dir = "/root/reference/test/data"
  private def fixture(n: Int) = s"$dir/experiment$n.xml"
  private def hasFixtures = new File(fixture(1)).exists()

  private def read(extra: (String, String)*) = {
    val base = spark.read.format("hpct-xml")
      .option("path", s"${fixture(1)},${fixture(2)}")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("reads both fixture files with a union schema, one partition each") {
    assume(hasFixtures)
    val df = read()
    assert(df.count() === 3454 + 2854)
    assert(df.select("db").distinct().count() === 2)
    assert(df.rdd.getNumPartitions === 2)
    // union schema contains both metric families plus db + location columns
    val cols = df.columns.toSet
    assert(cols.contains("CPUTIME (usec):Sum (I)") && cols.contains("PAPI_MEM_WCY:Sum (I)"))
    assert(cols.contains("db") && cols.contains("callpath") && cols.contains("id"))
  }

  test("raw metric values are emitted; other files' metrics are null") {
    assume(hasFixtures)
    val df = read()
    val row = df.filter(col("db") === fixture(1) && col("id") === 2)
      .select(col("`CPUTIME (usec):Sum (I)`"), col("`PAPI_MEM_WCY:Sum (I)`")).head()
    assert(row.getDouble(0) === 7.21356e7)
    assert(row.isNullAt(1))
  }

  test("maxDepth option prunes at parse time") {
    assume(hasFixtures)
    val df = read("maxDepth" -> "4")
    assert(df.filter(size(col("callpath")) === 4).count() > 0)
    assert(df.filter(size(col("callpath")) === 5).count() === 0)
  }

  test("column pruning reaches the scan (pushed readSchema)") {
    assume(hasFixtures)
    val df = read().select("db", "id")
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    // the BatchScan's output should be just the two pruned columns
    assert(scan.contains("db") && scan.contains("id"))
    assert(!scan.contains("CPUTIME"), s"metric columns not pruned from scan:\n$scan")
  }
}
