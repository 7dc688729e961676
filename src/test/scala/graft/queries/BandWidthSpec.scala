package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** Pins the corpus-derived sign-LSH band width rule ([[VectorOps.bandBitsFor]])
  * — the engine rule that replaced d08/s02's frozen 2×12-bit width after the
  * frozen width heap-OOM'd the round-11 one-pass sf100 sweep (~9.8e8 candidate
  * pairs at 2M vectors; SCALECHECK.md round-12 postmortem). The rule is the
  * measured "+4 band bits per decade" diagonal in closed form: smallest
  * multiple of 4 with 2^bits ≥ 2N, floored at the gate default 12, capped at
  * 32 (nBands × bits ≤ 64 dims). The DuckDB oracle computes the identical
  * rule in SQL (VectorOps.bandedSql), so these constants are pinned on BOTH
  * engines by the driver's hash compare; here we pin the Scala side and the
  * gate-scale invariance (results unchanged where the rule resolves to 12).
  */
class BandWidthSpec extends AnyFunSuite {

  private val sf0001 = "/root/testdata/sf0.001"

  test("bandBitsFor reproduces the measured +4-bits-per-decade diagonal") {
    // gate scales (oracle corpora) stay at today's 12 bits
    assert(VectorOps.bandBitsFor(1L) === 12)
    assert(VectorOps.bandBitsFor(500L) === 12) // sf0.001 / sf0.01
    assert(VectorOps.bandBitsFor(2000L) === 12) // sf0.1
    // the measured decades (SCALECHECK.md candidates tables)
    assert(VectorOps.bandBitsFor(20000L) === 16) // sf1
    assert(VectorOps.bandBitsFor(200000L) === 20) // sf10
    assert(VectorOps.bandBitsFor(2000000L) === 24) // sf100: 0.12 pairs/vec measured
    assert(VectorOps.bandBitsFor(20000000L) === 28) // sf1000
    // cap: nBands(2) × 32 = the 64 available dims
    assert(VectorOps.bandBitsFor(200000000L) === 32)
    assert(VectorOps.bandBitsFor(1000000000000L) === 32)
  }

  test("bandBitsFor power-of-two boundaries are exact (integer bit math)") {
    // 2n = 4096 exactly → ceil(log2) = 12, not 13; one vector more crosses
    assert(VectorOps.bandBitsFor(2048L) === 12)
    assert(VectorOps.bandBitsFor(2049L) === 16)
    assert(VectorOps.bandBitsFor(32768L) === 16)
    assert(VectorOps.bandBitsFor(32769L) === 20)
  }

  test("the capped width still satisfies banded's dims constraint") {
    val emb = Tables.embeddings(spark, sf0001)
    // must not throw the bands×bits require at the widest width the rule emits
    VectorOps.banded(emb, VectorOps.bandBitsFor(Long.MaxValue / 4)).schema
  }

  test("gate-scale invariance: the derived width IS 12 at oracle scale, so d08 is unchanged") {
    assert(VectorOps.embCountCached(spark, sf0001) === 500)
    assert(VectorOps.bandBitsFor(VectorOps.embCountCached(spark, sf0001)) === 12)
    // the registered query (derived width) and the explicit 12-bit candidate
    // set agree row-for-row — the rule changes nothing at oracle scale
    val derived = VectorOps.embedCandidatePairs(
      Tables.embeddings(spark, sf0001),
      VectorOps.bandBitsFor(VectorOps.embCountCached(spark, sf0001)))
    val pinned12 = VectorOps.embedCandidatePairs(Tables.embeddings(spark, sf0001), 12)
    assert(derived.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      pinned12.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
