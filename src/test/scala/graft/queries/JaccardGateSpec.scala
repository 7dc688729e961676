package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** The Jaccard verify has two footprint-gated strategies (TextOps.
  * jaccardCountsGated): cached full-corpus distinct shingles below the gate,
  * candidate-restricted scan-local shingles above it. The gate flips on the
  * documents footprint, so the oracle suite (sf0.01) only ever executes the
  * cached branch — this spec executes the BIG branch directly on the small
  * corpora and demands row-for-row equality, which is the whole correctness
  * argument for the gate: any shingle frame covering the candidate docs
  * yields identical counts.
  */
class JaccardGateSpec extends AnyFunSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("id_a", "id_b").collect().map(_.toString).toSeq

  test("restricted verify (arrays AND legacy) == cached verify, row for row " +
      "(sf0.001 and sf0.01)") {
    val s = spark
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val cand = TextOps.candidatePairs(s, dir)
      val cached = rows(TextOps.jaccardCountsFromCachedForTest(s, dir, cand))
      // the shipped restricted form: scan-local array_distinct shingles +
      // size() counts (round 13 — no distinct/groupBy exchanges)
      val restricted = rows(TextOps.jaccardCountsRestricted(s, dir, cand))
      // the pre-round-13 form: global distinct + groupBy count — the A/B
      // baseline SPARK_GRAFT_VERIFY_ARRAYS=0 routes to
      val legacy = rows(TextOps.jaccardCountsRestrictedLegacy(s, dir, cand))
      assert(restricted === cached, s"array branch disagrees with cached on $dir")
      assert(legacy === cached, s"legacy branch disagrees with cached on $dir")
      assert(cached.nonEmpty, s"vacuous compare on $dir — no candidate pairs")
    }
  }
}
