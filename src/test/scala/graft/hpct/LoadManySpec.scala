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

  test("loadMany over renamed-family variants: union schema + per-db ratio parity") {
    assume(hasFixtures)
    // 6 files, 4 distinct renamed metric families (2 per source fixture, with a
    // third variant re-sharing family F00 of each source — both the disjoint
    // and the shared-name formula paths run). The rename (XmlFixtureSynth)
    // touches only the MetricTable's n= attributes, so every per-db value must
    // equal the source fixture's single-file load under the renamed column.
    val tmp = java.nio.file.Files.createTempDirectory("graft-loadmany-variants")
    try {
      val v1 = XmlFixtureSynth.variants(fixture(1), tmp, 3, 2, "exp1")
      val v2 = XmlFixtureSynth.variants(fixture(2), tmp, 3, 2, "exp2")
      val many = ProfileLoad.loadMany(spark, (v1 ++ v2).map(_._1))
      assert(many.df.count() === 3L * 3454 + 3L * 2854)

      // union schema: each variant's renamed family appears in the columns,
      // and renamed families never collide across variants of different names
      val cols = many.df.columns.toSet
      for ((p, fam) <- v1 ++ v2) {
        assert(cols.exists(_.startsWith(s"$fam:")), s"missing union columns for $fam of $p")
        assert(many.metas(p).percentageColumn.startsWith(s"$fam:"),
          s"$p: percentage base must live in the renamed family")
      }

      // per-db ratio spot value: variant 0's renamed ratio-of-total column must
      // sum to exactly the single-file load's value (identical bytes, renamed name)
      val single1 = ProfileLoad.load(spark, fixture(1))
      val base1 = single1.meta.percentageColumn
      val expect = single1.df.agg(sum(col(s"`$base1 ratio of total`"))).head().getDouble(0)
      val (p0, fam0) = v1.head
      val renamedCol = s"${many.metas(p0).percentageColumn} ratio of total"
      val got = many.df.filter(col("db") === p0)
        .agg(sum(col(s"`$renamedCol`"))).head().getDouble(0)
      assert(math.abs(got - expect) <= math.abs(expect) * 1e-12,
        s"$fam0 ratio-of-total sum drifted from the single-file load")
      // and that db contributes NOTHING to any other family's ratio columns
      val foreign = many.df.columns
        .filter(c => c.endsWith("ratio of total") && c != renamedCol)
      for (c <- foreign)
        assert(many.df.filter(col("db") === p0 && col(s"`$c`").isNotNull).count() === 0,
          s"$p0 leaked values into $c")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
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
