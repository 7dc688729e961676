package graft.queries

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** e08's as-of join on the adversarial inputs the parquet fixtures don't contain
  * (the round-6 ADVICE finding): a matched view with a NULL value, and two views
  * at the same (user, ts). Both columns must come from ONE view row, and ties
  * must resolve deterministically (highest event_id wins).
  */
class AsofSpec extends AnyFunSuite {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def evDf(rows: (Long, Long, String, Timestamp, java.lang.Double)*) = {
    val s = spark
    import s.implicits._
    s.sparkContext.parallelize(rows.map { case (id, u, t, time, v) =>
      (id, u, t, time, Option(v).map(_.doubleValue))
    }).toDF("event_id", "user_id", "event_type", "ts", "value")
  }

  test("a null-valued matched view supplies BOTH columns (no row mixing)") {
    // user 1: view@0 value=5.0, view@10 value=NULL, click@20. The as-of match is
    // the ts=10 view — view_value must be NULL (from that row), NOT 5.0 carried
    // from the earlier view. The pre-fix last(__vv, ignoreNulls) would skip the
    // null and mix rows: view_ts=10:10 with view_value=5.0.
    val out = EventOps.asofViewBeforeClick(evDf(
        (100L, 1L, "view", ts(0), 5.0),
        (101L, 1L, "view", ts(10), null),
        (102L, 1L, "click", ts(20), 1.0)))
      .select("event_id", "view_ts", "view_value").collect()
    assert(out.length === 1)
    assert(out.head.getTimestamp(1) === ts(10), "matched the wrong view row")
    assert(out.head.isNullAt(2), "view_value leaked from an earlier view row")
  }

  test("equal-(user, ts) view ties resolve deterministically to the highest event_id") {
    val base = Seq[(Long, Long, String, Timestamp, java.lang.Double)](
      (200L, 2L, "view", ts(5), 7.0),
      (201L, 2L, "view", ts(5), 9.0), // same user, same ts — the tie
      (202L, 2L, "click", ts(6), 1.0))
    // same data, opposite input orders — the pick must not depend on row order
    for (rows <- Seq(base, base.reverse)) {
      val out = EventOps.asofViewBeforeClick(evDf(rows: _*))
        .select("view_ts", "view_value").collect()
      assert(out.length === 1)
      assert(out.head.getTimestamp(0) === ts(5))
      assert(out.head.getDouble(1) === 9.0, "tie must break on highest view event_id")
    }
  }

  test("views duplicated down to the event_id still pick one row deterministically " +
      "(value tiebreak, highest wins, null loses)") {
    // the corpus a dedup operator exists for can reach the as-of join too: two
    // view rows with the SAME (user, ts, event_id) but different values. Only
    // the final `__vv` window tiebreak separates them — the pick must be the
    // highest value (matching the oracle's r.value DESC NULLS LAST), stable
    // under input order, and a null value must lose to any non-null.
    val base = Seq[(Long, Long, String, Timestamp, java.lang.Double)](
      (400L, 4L, "view", ts(5), 3.0),
      (400L, 4L, "view", ts(5), 8.0), // exact duplicate id, differing value
      (400L, 4L, "view", ts(5), null),
      (402L, 4L, "click", ts(6), 1.0))
    for (rows <- Seq(base, base.reverse)) {
      val out = EventOps.asofViewBeforeClick(evDf(rows: _*))
        .select("view_ts", "view_value").collect()
      assert(out.length === 1)
      assert(out.head.getTimestamp(0) === ts(5))
      assert(out.head.getDouble(1) === 8.0,
        "duplicate-id view tie must break on highest value")
    }
  }

  test("a click with no preceding view gets nulls; equal-ts view matches (inclusive bound)") {
    val out = EventOps.asofViewBeforeClick(evDf(
        (300L, 3L, "click", ts(1), 1.0), // no view yet
        (301L, 3L, "view", ts(2), 4.0),
        (302L, 3L, "click", ts(2), 1.0))) // equal ts: view sorts first, matches
      .orderBy("event_id")
      .select("event_id", "view_ts", "view_value").collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).getTimestamp(1) === ts(2) && out(1).getDouble(2) === 4.0)
  }
}
