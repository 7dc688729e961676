package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** Pins [[LshGuard]] — the r16 hot-bucket guard on LSH candidate self-joins:
  *  1. below the cap the guarded form is ROW-IDENTICAL to the clique form
  *     (so every oracle corpus, whose buckets BucketStats measured at ≤16 vs
  *     the 4096 default cap, is untouched);
  *  2. over the cap a bucket emits exactly the |bucket|−1 star edges on its
  *     min id, never the clique;
  *  3. connectivity is preserved: connected components over guarded edges
  *     equal components over clique edges (the property d09/d10 consume);
  *  4. the real pipeline entry (TextOps.candidatePairs) matches the clique
  *     baseline on a real corpus at the default cap.
  */
class BucketGuardSpec extends AnyFunSuite {

  private val sf001 = "/root/testdata/sf0.01"

  /** (id, bucket-key) membership rows via parallelize — the guard's input
    * arrives from a shuffle in production, never a LocalRelation.
    */
  private def members(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    s.sparkContext.parallelize(rows).toDF("id", "k")
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toSet

  // one oversized bucket (5 > cap 3), one exactly-at-cap bucket, one pair
  // spanning both regimes (7,8 share the small bucket AND the big one)
  private val mixed = members(
    1L -> "big", 3L -> "big", 7L -> "big", 8L -> "big", 9L -> "big",
    7L -> "sm", 8L -> "sm", 2L -> "sm")

  test("oversized bucket emits the star on its min id, not the clique") {
    val out = pairsOf(LshGuard.guardedSelfJoinPairs(mixed, "id", Seq("k"), cap = 3))
    // big bucket (min 1): star 1-3, 1-7, 1-8, 1-9 — NOT e.g. 3-7 or 7-9
    // sm bucket (size 3 = cap): full clique 2-7, 2-8, 7-8
    assert(out === Set(1L -> 3L, 1L -> 7L, 1L -> 8L, 1L -> 9L,
      2L -> 7L, 2L -> 8L, 7L -> 8L))
  }

  test("below the cap, guarded == clique (row-identical)") {
    val g = pairsOf(LshGuard.guardedSelfJoinPairs(mixed, "id", Seq("k"), cap = 5))
    val c = pairsOf(LshGuard.cliqueSelfJoinPairs(mixed, "id", Seq("k")))
    assert(g === c)
    assert(g.contains(3L -> 7L)) // a clique-only pair, proving the cap didn't fire
  }

  test("connectivity preserved: components over guarded edges == over clique edges") {
    // two disjoint mega-buckets plus a bridge pair — the consumer property:
    // d09/d10 read the pairs only through connected components
    val g2 = members((1L to 9L).map(_ -> "a") ++ (20L to 28L).map(_ -> "b")
      ++ Seq(9L -> "bridge", 20L -> "bridge"): _*)
    def labels(df: org.apache.spark.sql.DataFrame) =
      Components.minLabelComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val guarded = labels(LshGuard.guardedSelfJoinPairs(g2, "id", Seq("k"), cap = 4))
    val clique = labels(LshGuard.cliqueSelfJoinPairs(g2, "id", Seq("k")))
    assert(guarded === clique)
    assert(guarded.values.toSet === Set(1L)) // one component, min id 1
  }

  test("real corpus at the default cap: candidatePairs == clique baseline") {
    val g = TextOps.candidatePairs(spark, sf001)
    val c = LshGuard.cliqueSelfJoinPairs(
      TextOps.bandFrameForProbe(spark, sf001), "doc_id", Seq("band", "sig"))
    assert(pairsOf(g) === pairsOf(c))
    assert(g.count() > 0) // non-vacuous: the corpus has near-dup candidates
  }

  test("oversizedBuckets probe: empty below cap, exact over it") {
    assert(LshGuard.oversizedBuckets(mixed, Seq("k"), cap = 5).count() === 0)
    val over = LshGuard.oversizedBuckets(mixed, Seq("k"), cap = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(over.toSeq === Seq("big" -> 5L))
  }

  test("cap must be >= 2") {
    intercept[IllegalArgumentException] {
      LshGuard.guardedSelfJoinPairs(mixed, "id", Seq("k"), cap = 1)
    }
  }
}
