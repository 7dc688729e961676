package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` deployment path must resolve both
  * native functions in a session that never called the per-session `register`s.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects token_hash16 and vec_dot into a fresh session") {
    val base = SparkTestBase.spark // ensure the shared SparkContext exists first
    // getOrCreate returns the active/default session (extensions silently ignored)
    // unless both are cleared; the builder then makes a NEW session over the same
    // SparkContext. Restore the shared session afterwards — and never stop() here,
    // the SparkContext is shared by every suite in this JVM.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions()).getOrCreate()
      assert(s ne base, "expected a fresh session, got the shared one")
      val row = s.sql(
        "SELECT token_hash16('hello'), token_hash16('hello', 3), " +
          "vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))), " +
          "rolling_fp('abcdefgh').n_windows, simhash64('a b').s0, " +
          "size(shingle_hashes('a b c d')), bigram_stats('a b c').n_bigrams").head()
      assert(row.getInt(0) === graft.functions.TokenHash.hash16(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello"), 0))
      assert(row.getInt(1) === graft.functions.TokenHash.hash16(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello"), 3))
      assert(row.getDouble(2) === 11.0)
      assert(row.getLong(3) === 1L)
      assert(row.getLong(4) >= 0L && row.getLong(4) < 65536L)
      assert(row.getInt(5) === 2)  // 'a b c d' -> 2 distinct 3-gram shingles
      assert(row.getLong(6) === 2L) // 'a b c' -> 2 bigrams
      // the bounded-state aggregate resolves through the extension route too
      val agg = s.sql(
        "SELECT bounded_collect_min(v, 2) AS g FROM VALUES (3), (1), (2) t(v)")
        .selectExpr("g.n", "g.mn", "size(g.items)").head()
      assert(agg.getLong(0) === 3L)
      assert(agg.getInt(1) === 1)
      assert(agg.getInt(2) === 2)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
