package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** The 128-bit SimHash kernel, pinned against the oracle-checked 64-bit one: both
  * vote from the same md5 digest, simhash128 just reads all 16 bytes instead of the
  * leading 8 — so its bands 0–3 must equal simhash64's s0..s3 bit-for-bit on every
  * input. That ties the new kernel to a signature already proven identical to the
  * DuckDB SimCte, leaving only the digest-byte widening untested — covered by an
  * independent per-token reimplementation below.
  */
class SimHash128Spec extends AnyFunSuite {

  test("bands 0-3 equal simhash64 on the sf0.01 corpus; codegen and eval agree") {
    val s = spark
    SimHash64.register(s)
    SimHash128.register(s)
    val docs = s.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val both = docs.select(
      expr("simhash64(lower(text))").as("a"),
      expr("simhash128(lower(text))").as("b"))
    val mismatches = both.filter(
      (0 to 3).map(i => col(s"a.s$i") =!= col(s"b.s$i")).reduce(_ || _)).count()
    assert(mismatches === 0L)
    // the upper 4 bands carry real signal (not constant/zero)
    assert(both.select(countDistinct(col("b.s7"))).head().getLong(0) > 1L)
  }

  test("4x32 banding keeps the pigeonhole guarantee at its own hamming budget") {
    // the 128-bit variant is a SHARPER criterion, not a superset of the 64-bit
    // one: a pair at hamming <= 3 of the LOWER 64 bits can hide extra flips in
    // the upper 64 and miss every 32-bit band (at sf0.01 exactly 2 of the 18
    // d07-verified pairs do). What the banding DOES guarantee — pinned here — is
    // its own budget: every pair within hamming <= 3 of the FULL 128 bits shares
    // a band, and every d07 pair the banding drops really is > 3 flips in 128.
    val s = spark
    val d = "/root/testdata/sf0.01"
    SimHash128.register(s)
    val sigs = s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), expr("simhash128(lower(text))").as("x"))
      .collect().map(r => r.getLong(0) ->
        (0 until 8).map(i => r.getStruct(1).getLong(i)).toArray).toMap
    def h128(a: Long, b: Long): Int =
      (0 until 8).map(i => java.lang.Long.bitCount(sigs(a)(i) ^ sigs(b)(i))).sum
    val verified = graft.queries.TextOps.queries("d07_simhash_neardup")(s, d)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wide = graft.queries.TextOps.simhash128CandidatePairs(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty)
    val (kept, dropped) = verified.partition(wide.contains)
    assert(kept.nonEmpty, "the wide banding should keep the genuinely close pairs")
    dropped.foreach { case (a, b) =>
      assert(h128(a, b) > 3, s"pigeonhole violated: ($a,$b) within 3 flips but unbucketed")
    }
    // and globally: every within-budget pair anywhere in the corpus is bucketed
    val ids = sigs.keys.toSeq.sorted
    for (i <- ids.indices; j <- i + 1 until ids.length
         if h128(ids(i), ids(j)) <= 3)
      assert(wide.contains((ids(i), ids(j))), s"missed (${ids(i)},${ids(j)})")
  }

  test("matches an independent per-token reimplementation on the full digest") {
    val text = "key agg row scan slow  fast" // double space: empty token included
    val votes = new Array[Int](128)
    val md = java.security.MessageDigest.getInstance("MD5")
    text.split(" ", -1).foreach { t =>
      val d = md.digest(t.getBytes("UTF-8"))
      for (b <- 0 until 8; j <- 0 until 16) {
        val v = ((d(2 * b) & 0xff) << 8) | (d(2 * b + 1) & 0xff)
        votes(16 * b + j) += (if (((v >> j) & 1) == 1) 1 else -1)
      }
    }
    val expected = (0 until 8).map { b =>
      (0 until 16).foldLeft(0L)((acc, j) =>
        if (votes(16 * b + j) >= 0) acc | (1L << j) else acc)
    }
    val row = SimHash128Kernel.eval(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    assert((0 until 8).map(row.getLong) === expected)
  }
}
