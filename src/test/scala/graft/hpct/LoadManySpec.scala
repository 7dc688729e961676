package graft.hpct

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** Distributed multi-file load: loadMany(f1, f2) must equal the two single-file
  * loads unioned by name — per-db root fix, per-db ratio columns, per-file formulas.
  */
class LoadManySpec extends AnyFunSuite {

  private val fixtureDir = "/root/reference/test/data"
  private def fixture(n: Int) = s"$fixtureDir/experiment$n.xml"
  private def hasFixtures = new File(fixture(1)).exists()

  test("loadMany(exp1, exp2) == union of the single-file loads") {
    assume(hasFixtures)
    val many = ProfileLoad.loadMany(spark, Seq(fixture(1), fixture(2)))
    val single1 = ProfileLoad.load(spark, fixture(1))
    val single2 = ProfileLoad.load(spark, fixture(2))

    assert(many.metas.keySet === Set(fixture(1), fixture(2)))
    assert(many.metas(fixture(1)).percentageColumn === single1.meta.percentageColumn)
    assert(many.metas(fixture(2)).percentageColumn === single2.meta.percentageColumn)

    // row counts per db
    val counts = many.df.groupBy("db").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(fixture(1)) === 3454L && counts(fixture(2)) === 2854L)

    // union schema: both files' metric + ratio columns present
    val cols = many.df.columns.toSet
    for (pf <- Seq(single1, single2); c <- pf.df.columns)
      assert(cols.contains(c), s"missing union column $c")

    // value parity vs single loads, compared on the doubles (complex columns carry
    // the same formulas; spot-checked via the base/ratio columns here, fully via
    // ParitySpec). Join per db on id and diff every shared double column.
    for ((path, single) <- Seq(fixture(1) -> single1, fixture(2) -> single2)) {
      val base = single.meta.percentageColumn
      val checkCols = Seq(base, s"$base ratio of total", s"$base ratio of parent")
      val ours = many.df.filter(col("db") === path)
        .select(col("id") +: checkCols.map(c => col("`" + c + "`").as("m_" + checkCols.indexOf(c))): _*)
      val want = single.df
        .select(col("id") +: checkCols.map(c => col("`" + c + "`").as("s_" + checkCols.indexOf(c))): _*)
      val joined = ours.join(want, "id")
      assert(joined.count() === single.df.count(), s"$path: id join lost rows")
      checkCols.indices.foreach { i =>
        val bad = joined.filter(
          !(col(s"m_$i").isNull && col(s"s_$i").isNull) &&
            (col(s"m_$i").isNull || col(s"s_$i").isNull ||
              abs(col(s"m_$i") - col(s"s_$i")) > abs(col(s"s_$i")) * 1e-12 + 1e-12))
        assert(bad.count() === 0, s"$path: ${checkCols(i)} differs from single-file load")
      }
    }
  }

  test("loadMany keeps cross-file metric families apart") {
    assume(hasFixtures)
    val many = ProfileLoad.loadMany(spark, Seq(fixture(1), fixture(2)))
    // exp1 rows have null PAPI columns and vice versa
    val papi = "PAPI_MEM_WCY:Sum (I)"
    val cpu = "CPUTIME (usec):Sum (I)"
    assert(many.df.filter(col("db") === fixture(1) && col("`" + papi + "`").isNotNull).count() === 0)
    assert(many.df.filter(col("db") === fixture(2) && col("`" + cpu + "`").isNotNull).count() === 0)
    // and the per-db ratio columns are populated for their own db
    val rot1 = "CPUTIME (usec):Mean (I) ratio of total"
    assert(many.df.filter(col("db") === fixture(1) && col("`" + rot1 + "`").isNotNull).count() === 3454)
  }
}
