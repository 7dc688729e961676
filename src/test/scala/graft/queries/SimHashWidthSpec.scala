package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** Pins the corpus-derived SimHash signature width rule
  * ([[TextOps.simhashBitsFor]], r18) — the same engine rule
  * [[VectorOps.bandBitsFor]] applies to the sign-LSH family, extended to the
  * SimHash dedup family after BucketStats r17 measured the 64-bit banding's
  * pruning spent at the fifth decade (mean (bi, bv) bucket 717 members at
  * 47 M docs; 9.7 M membership rows starred on a BENIGN corpus). The rule:
  * 64-bit signatures (4×16-bit bands) while 2^16 ≥ 2N, 128-bit (4×32-bit
  * bands) beyond — width is the random-collision precision knob; the band
  * COUNT (4) carries the hamming ≤ 3 pigeonhole guarantee at either width.
  */
class SimHashWidthSpec extends AnyFunSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("simhashBitsFor: 64 while a 16-bit band clears 2N, 128 beyond") {
    // gate scales (oracle corpora) stay on the pinned 64-bit semantics
    assert(TextOps.simhashBitsFor(1L) === 64)
    assert(TextOps.simhashBitsFor(500L) === 64) // sf0.001 / sf0.01
    assert(TextOps.simhashBitsFor(2000L) === 64) // sf0.1
    // exact power-of-two boundary (integer bit math): 2N = 65536 -> 16 bits
    assert(TextOps.simhashBitsFor(32768L) === 64)
    assert(TextOps.simhashBitsFor(32769L) === 128)
    // the measured decades: sf1 (50k docs) onward routes through the
    // 128-bit kernel — the SCALECHECK r17 §7 fifth-decade answer, self-applying
    assert(TextOps.simhashBitsFor(50000L) === 128)
    assert(TextOps.simhashBitsFor(4700000L) === 128) // sf100
    assert(TextOps.simhashBitsFor(47000000L) === 128) // sf1000
    assert(TextOps.simhashBitsFor(Long.MaxValue / 4) === 128)
  }

  test("gate-scale invariance: the derived width IS 64 at oracle scale, so d07 is unchanged") {
    assert(TextOps.docCountCached(spark, sf001) === 500L)
    assert(TextOps.simhashBitsFor(TextOps.docCountCached(spark, sf001)) === 64)
  }

  test("at the 128-bit width d07's route IS the d12 plan (one shared builder)") {
    // the width switch routes d07 through simhash128NearDup — the exact
    // function d12 registers, so the two rows cannot drift; compare the
    // registered queries' results on the oracle corpus to make the sharing
    // non-vacuous (12 near-dup pairs at hamming <= 3 over 128 bits)
    val d12 = TextOps.queries("d12_simhash128_neardup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val direct = TextOps.simhash128NearDup(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(d12 === direct)
    assert(d12.nonEmpty, "non-vacuous: the corpus has 128-bit simhash near-dups")
    // the 128-bit verify is a strict subset of the 64-bit one's candidates
    // regime only in spirit, not row-for-row — but every 128-bit near-dup
    // pair here must also be a 64-bit near-dup (hamming over a prefix of
    // the same md5 votes can only shrink)
    val d07 = TextOps.queries("d07_simhash_neardup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d12.map(t => (t._1, t._2)).forall(d07.contains),
      "every 128-bit near-dup pair must be a 64-bit near-dup pair")
  }

  test("the dumped oracle SQL tracks the resolved width (r19, the r18 ADVICE item)") {
    // pure-in-bits selection: at 64 bits nothing overrides — the static
    // oracle map is dumped byte-for-byte
    assert(TextOps.oraclesForBits(64) === Map.empty)
    // at 128 bits d07's substituted SQL IS d12's hash-checked oracle, so the
    // width-matched SQL is itself oracle-verified at every gate scale
    assert(TextOps.oraclesForBits(128) ===
      Map("d07_simhash_neardup" -> TextOps.oracles("d12_simhash128_neardup")))
    // the concrete resolver on the gate corpus: 500 docs -> 64-bit -> the
    // dumped map equals the static driver-contract map
    assert(TextOps.oraclesFor(spark, sf001) === TextOps.oracles)
    assert(graft.SparkEntry.oracleSqlFor(spark, sf001) === graft.SparkEntry.oracleSql)
  }
}
