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

  test("state cap must cover the star cap") {
    intercept[IllegalArgumentException] {
      LshGuard.guardedSelfJoinPairs(mixed, "id", Seq("k"), cap = 8, stateCap = 4)
    }
  }

  // ---- r17: the payload-carrying variant (the SimHash families' route) ----

  /** (id, payload, bucket-key) membership rows as (member struct, key). */
  private def memberRows(rows: (Long, Long, String)*) = {
    val s = spark
    import s.implicits._
    s.sparkContext.parallelize(rows).toDF("id", "sig", "k")
      .select(struct(col("id"), col("sig")).as("m"), col("k"))
  }

  private def memberPairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("m_a.id", "m_a.sig", "m_b.id", "m_b.sig").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("member pairs carry the payload through both regimes, ordered by id") {
    val rows = memberRows(
      (1L, 10L, "big"), (3L, 30L, "big"), (7L, 70L, "big"), (9L, 90L, "big"),
      (7L, 70L, "sm"), (8L, 80L, "sm"))
    val out = memberPairsOf(LshGuard.guardedMemberPairs(rows, "m", Seq("k"), cap = 3))
    // big (4 > cap 3): star on min id 1, each edge carrying BOTH payloads;
    // sm (2 <= cap): the clique pair
    assert(out === Set(
      (1L, 10L, 3L, 30L), (1L, 10L, 7L, 70L), (1L, 10L, 9L, 90L),
      (7L, 70L, 8L, 80L)))
  }

  test("beyond the state cap the star degrades to the retained subset, min stays exact") {
    // 64 members, state cap 8: the guard cannot know all members, but the
    // a-side must still be the TRUE bucket min (tracked exactly at any size)
    val s = spark
    import s.implicits._
    val big = s.sparkContext.parallelize((1L to 64L).map(_ -> "b"), 8).toDF("id", "k")
    val out = LshGuard.guardedSelfJoinPairs(big, "id", Seq("k"), cap = 4, stateCap = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.nonEmpty && out.length <= 8, s"state-capped star must emit <= stateCap edges, got ${out.length}")
    assert(out.forall(_._1 === 1L), "every degraded-star edge keeps the exact bucket min as its source")
    assert(out.forall(p => p._2 > 1L && p._2 <= 64L))
    assert(out.distinct.length === out.length)
  }

  test("simhash d07 guarded == the unguarded banded self-join on a real corpus") {
    // the r16->r17 rewrite: same verified pair set as the clique-shaped banded
    // join it replaced, on a corpus whose buckets sit far below the default cap
    val s = spark
    val verified = TextOps.queries("d07_simhash_neardup")(s, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.functions.SimHash64.register(s)
    val sh = s.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), expr("simhash64(lower(text))").as("x"))
      .select(col("doc_id") +: (0 to 3).map(b => col(s"x.s$b").as(s"s$b")): _*)
    def banded(p: String) = sh
      .select(col("doc_id").as(s"id_$p") +:
        (0 to 3).map(b => col(s"s$b").as(s"$p$b")) :+
        explode(array((0 to 3).map(b =>
          struct(lit(b).as("bi"), col(s"s$b").as("bv"))): _*)).as("x"): _*)
      .select(col(s"id_$p") +: (0 to 3).map(b => col(s"$p$b")) :+
        col("x.bi").as("bi") :+ col("x.bv").as("bv"): _*)
    val clique = banded("a").join(banded("b"), Seq("bi", "bv"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming",
        (0 to 3).map(b => expr(s"bit_count(a$b ^ b$b)")).reduce(_ + _).cast("long"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(verified === clique)
    assert(verified.nonEmpty, "non-vacuous: the corpus has simhash near-dups")
  }

  test("simhash star regime: a megacluster of identical signatures stars, never cliques") {
    // 100 identical docs => identical signatures => one bucket per band, every
    // pair passing hamming 0 — the true-duplicate regime where inline
    // filtering alone is no defense. Guarded: |cluster|-1 star edges.
    val s = spark
    import s.implicits._
    val docs = (1L to 100L).map(i => (i, "same boilerplate text repeated verbatim"))
      .toDF("doc_id", "text")
    graft.functions.SimHash64.register(s)
    val sh = docs.select(col("doc_id"), expr("simhash64(lower(text))").as("x"))
      .select(col("doc_id") +: (0 to 3).map(b => col(s"x.s$b").as(s"s$b")): _*)
    val saved = sys.env.get("SPARK_GRAFT_BUCKET_CAP")
    assert(saved.isEmpty, "spec assumes the default cap")
    val pairs = TextOps.simhashNearDupPairs(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // default cap 4096 > 100: clique regime — all 4950 pairs at hamming 0
    assert(pairs.length === 4950)
    // now force the star with a tiny cap via the parameterized core
    val banded = sh.select(
        struct(col("doc_id").as("id"), lit(0L).as("sig")).as("m"),
        explode(array((0 to 3).map(b =>
          struct(lit(b).as("bi"), col(s"s$b").as("bv"))): _*)).as("x"))
      .select(col("m"), col("x.bi").as("bi"), col("x.bv").as("bv"))
    val starred = LshGuard.guardedMemberPairs(banded, "m", Seq("bi", "bv"), cap = 50)
      .select(col("m_a.id").as("id_a"), col("m_b.id").as("id_b")).distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(starred.length === 99)
    assert(starred.forall(_._1 === 1L))
  }

  // ---- r18: the distinct-members precondition, pinned not assumed ----

  test("duplicate members violate the stated precondition: the clique regime emits self-pairs") {
    // the r17 sorted-slice emission guarantees only m_a <= m_b — a duplicated
    // (member, key) row emits the (x, x) self-pair r16's id_a < id_b join
    // filter dropped. Every production caller builds one row per doc per
    // band; this pin documents WHY that precondition is load-bearing so a
    // future caller cannot rely on strictness the construction no longer
    // enforces (LshGuard scaladoc, r17 ADVICE).
    val dup = members(1L -> "k", 2L -> "k", 2L -> "k")
    val out = pairsOf(LshGuard.guardedSelfJoinPairs(dup, "id", Seq("k"), cap = 10))
    assert(out === Set(1L -> 2L, 2L -> 2L))
  }

  // ---- r18: in-plan fired-guard observability ----

  /** The listener bus posts observation metrics asynchronously; poll the
    * totals with a bounded deadline instead of sleeping blind.
    */
  private def awaitTotals(expectFired: Boolean): (Long, Long) = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var t = LshGuard.guardFiredTotals
    while (expectFired && t._1 == 0 && System.nanoTime() < deadline) {
      Thread.sleep(50)
      t = LshGuard.guardFiredTotals
    }
    t
  }

  test("guard telemetry: zero on a benign corpus, no opt-in required") {
    LshGuard.resetGuardFiredTotals()
    // the real pipeline entries (d04's route) at the default cap: no bucket
    // fires, so the observation must stay silent
    TextOps.candidatePairs(spark, sf001).write.format("noop").mode("overwrite").save()
    graft.StageMetrics.drain(spark)
    val (capped, starred) = awaitTotals(expectFired = false)
    assert(capped === 0L && starred === 0L,
      s"benign corpus must not fire the guard, got ($capped, $starred)")
  }

  test("guard telemetry: a planted megacluster fires the in-plan observation") {
    LshGuard.resetGuardFiredTotals()
    // one 5-member bucket over cap 3 -> 1 capped bucket, 5 membership rows
    LshGuard.guardedSelfJoinPairs(mixed, "id", Seq("k"), cap = 3)
      .write.format("noop").mode("overwrite").save()
    val (capped, starred) = awaitTotals(expectFired = true)
    assert(capped === 1L, s"expected exactly the big bucket capped, got $capped")
    assert(starred === 5L, s"expected the big bucket's 5 membership rows, got $starred")
  }
}
