package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** Pins [[BoundedCollectMin]] — the bounded-state grouped collection behind
  * [[graft.queries.LshGuard]]:
  *  1. below the limit it matches count/min/collect_list exactly;
  *  2. beyond the limit `n` and `mn` stay EXACT while `items` truncates to
  *     the limit — the state bound is the point, the degradation contract is
  *     that only the list degrades;
  *  3. the min is exact even when it arrives after the buffer filled (the
  *     case a first-N-only state would get wrong);
  *  4. nulls are skipped like collect_list's;
  *  5. struct elements order by their first field (the (id, payload) carry
  *     format), through a real shuffle.
  */
class BoundedCollectMinSpec extends AnyFunSuite {

  private def grouped(vals: Seq[Long], limit: Int) = {
    val s = spark
    import s.implicits._
    BoundedCollectMin.register(s)
    // parallelize: the aggregation must cross real partition merges
    s.sparkContext.parallelize(vals, 4).toDF("v")
      .groupBy(lit(1))
      .agg(expr(s"bounded_collect_min(v, $limit)").as("g"))
      .select("g.n", "g.mn", "g.items")
      .collect().head
  }

  test("below the limit: exact count, exact min, complete list") {
    val r = grouped(Seq(5L, 3L, 9L, 7L), limit = 10)
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 3L)
    assert(r.getSeq[Long](2).sorted === Seq(3L, 5L, 7L, 9L))
  }

  test("beyond the limit: n and mn exact, items truncated to the limit") {
    val vals = (1L to 1000L).map(v => 1001L - v) // descending: min arrives LAST
    val r = grouped(vals, limit = 16)
    assert(r.getLong(0) === 1000L)
    assert(r.getLong(1) === 1L, "min must be exact even when seen after the buffer filled")
    val items = r.getSeq[Long](2)
    assert(items.length === 16)
    assert(items.forall(vals.contains), "retained items are real group members")
  }

  test("nulls are skipped like collect_list") {
    val s = spark
    import s.implicits._
    BoundedCollectMin.register(s)
    val r = s.sparkContext.parallelize(Seq[java.lang.Long](4L, null, 2L), 2)
      .toDF("v")
      .groupBy(lit(1)).agg(expr("bounded_collect_min(v, 8)").as("g"))
      .select("g.n", "g.mn", "g.items").collect().head
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 2L)
    assert(r.getSeq[Long](2).sorted === Seq(2L, 4L))
  }

  test("struct elements: min by first field, survives shuffle serialization") {
    val s = spark
    import s.implicits._
    BoundedCollectMin.register(s)
    val r = s.sparkContext.parallelize(
        Seq((7L, "x"), (2L, "y"), (9L, "z"), (2L, "a")), 4)
      .toDF("id", "p")
      // force a partial/final split with a real exchange between them
      .repartition(3, col("id"))
      .groupBy(lit(1))
      .agg(expr("bounded_collect_min(struct(id, p), 8)").as("g"))
      .select("g.n", "g.mn.id", "g.mn.p").collect().head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 2L)
    assert(r.getString(2) === "a", "ties on id break on the next struct field")
  }

  test("limit must be a positive literal") {
    val s = spark
    BoundedCollectMin.register(s)
    import s.implicits._
    val df = s.sparkContext.parallelize(Seq(1L)).toDF("v")
    intercept[Exception] {
      df.groupBy(lit(1)).agg(expr("bounded_collect_min(v, 0)")).collect()
    }
    intercept[Exception] {
      df.groupBy(lit(1)).agg(expr("bounded_collect_min(v, v)")).collect()
    }
  }

  test("an out-of-Int-range Long limit is rejected, never silently truncated") {
    val s = spark
    BoundedCollectMin.register(s)
    import s.implicits._
    val df = s.sparkContext.parallelize(Seq(1L)).toDF("v")
    // 2^32 + 1 truncates to 1 under the pre-r18 `.toInt` — passing the
    // >= 1 require while silently shrinking the retained state 4-billion-fold
    val e = intercept[Exception] {
      df.groupBy(lit(1)).agg(expr("bounded_collect_min(v, 4294967297)")).collect()
    }
    assert(e.getMessage.contains("fit in an Int") ||
      Option(e.getCause).exists(_.getMessage.contains("fit in an Int")),
      s"expected the out-of-range rejection, got: ${e.getMessage}")
  }
}
