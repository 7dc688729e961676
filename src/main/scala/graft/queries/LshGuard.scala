package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-bucket guard for LSH candidate generation (r16; the one scale hazard
  * r15's audit left open).
  *
  * A bucket self-join emits |bucket|²/2 pairs from a single (band, sig) key:
  * benign corpora never show it (every measured corpus sits at a flat ~0.15
  * pairs/doc because md5-128 band signatures make random collisions nil), but
  * a real 100 TB corpus has boilerplate mega-clusters — 10⁵ near-identical
  * docs in one bucket is 10¹⁰ pairs from one key, materialized by the
  * pair-level distinct and the verify checkpoint. This is the same failure
  * class d07 fixed in its random-collision regime (inline hamming, r10),
  * here for the TRUE-duplicate regime where the colliding docs really are
  * near-dups of each other.
  *
  * The guard: buckets over `cap` members short-circuit to a STAR on the
  * bucket's min id — every member pairs with the representative only
  * (|bucket|−1 edges instead of the clique). Members of an oversized bucket
  * share an identical LSH band signature, so they are mutual near-dup
  * candidates by construction; downstream the star preserves exactly what the
  * clique fed each consumer: d09/d10's connected components (a verified star
  * is one component, same as a verified clique), and dedup keep-min semantics.
  * What it deliberately gives up in the capped regime is the exhaustive
  * pair LIST (d04) and per-pair Jaccard values for non-representative pairs
  * (d05) — the documented trade, knob-controlled, and inactive below the cap:
  * `SPARK_GRAFT_BUCKET_CAP` defaults far above every measured benign corpus
  * (BucketGuardSpec pins guarded ≡ unguarded there, so all oracle rows are
  * bit-identical with the guard in place).
  *
  * Plan shape (r16, second iteration — the first was measured and replaced):
  * ONE aggregation exchange of the membership frame, then pair emission by
  * exploding each bucket's collected id list — no self-join at all.
  *
  * Why not the self-join: the original guard put the size/min accounting as
  * a WINDOW on the join's a-side, reasoning it would ride the SortMergeJoin's
  * own exchange. Measured (SCALECHECK.md r16): exchange REUSE does not fire
  * across the join/window/star consumers on Spark 4.1 + AQE + cached input,
  * so the membership frame was physically shuffled THREE times (window side,
  * plain c-side, star branch) — and even the pre-guard join wrote it TWICE
  * (both SMJ sides; d04 at sf100: 1530 MB unguarded, 2266 MB with the
  * windowed guard, one bands copy ≈ 736 MB). The aggregate form writes it
  * ONCE by construction: a single groupBy(keys).collect_list(id), with both
  * regimes emitted from the SAME pass — `explode(when(n <= cap, ids)
  * .otherwise(array(min)))` yields every member as an a-side below the cap
  * and only the representative above it, so no union, no second consumer,
  * no reliance on exchange reuse (measured 796 MB at sf100, −48% vs the
  * unguarded join, −65% vs the windowed guard).
  *
  * Memory bound, stated not hidden: the per-bucket id LIST is linear in
  * bucket size (the quadratic pair emission stays capped), so a bucket's
  * aggregation state is 8 B × members — the measured sf1000 max (2704) is
  * ~21 KB, the planted 10⁵ megacluster ~800 KB, and ObjectHashAggregate
  * falls back to sort-based aggregation (one group at a time) under
  * pressure. A 10⁸-member bucket (~800 MB list) would be the wall — but
  * members are EXACT-dedup survivors' band signatures, so a bucket that
  * size means 10⁸ DISTINCT texts sharing a MinHash band, far beyond any
  * boilerplate family this design targets. The ≤cap clique branch carries
  * the bucket's list once per member through the second explode (≤ cap × 8 B
  * per row), which the cap itself bounds.
  */
object LshGuard {

  /** Default cap, overridable via SPARK_GRAFT_BUCKET_CAP. Sized from
    * measurement (tools.BucketStats; SCALECHECK.md r16 bucket-size table):
    * MinHash (band, sig) buckets max out at 16 on sf0.1/sf1 and at 2704 on
    * sf1000 — the synthesis cipher's fixed-point residue family (all-digit /
    * stopword-invariant docs colliding across composite replicas), i.e. a
    * genuine boilerplate-class duplicate group, which the 4096 default still
    * clears so every recorded sf1000 measurement keeps its exact byte
    * profile; sign-LSH embedding buckets max at 5 everywhere (corpus-derived
    * band width holds occupancy flat — 20M vectors at 28 bits). At the next
    * decade the residue family would legitimately cross the cap and the
    * guard stars it — the intended behavior for a true mega-dup group. An
    * adversarial 10⁵-member bucket's 5·10⁹-pair clique becomes 10⁵−1 edges.
    */
  val DefaultCap = 4096

  def cap: Int = Knobs.int("SPARK_GRAFT_BUCKET_CAP").getOrElse(DefaultCap)

  /** Pairs of ids sharing any key-bucket of `b` (one row per id per bucket
    * membership), `id_a < id_b`, deduped across buckets — the LSH candidate
    * self-join — with buckets over `cap` members emitting a star on the
    * bucket min instead of the quadratic clique.
    */
  def guardedSelfJoinPairs(b: DataFrame, idCol: String, keyCols: Seq[String],
      cap: Int = cap): DataFrame = {
    require(cap >= 2, s"bucket cap must be >= 2, got $cap")
    val ids = col("__ids")
    b.groupBy(keyCols.map(col): _*)
      .agg(collect_list(col(idCol)).as("__ids"))
      // keys served their purpose (the grouping); prune them before the
      // explode so bucket rows ride as a bare list. Singleton buckets (the
      // overwhelming majority on a benign corpus) emit no pairs — drop them
      // before any generator runs.
      .select(ids)
      .filter(size(ids) > 1)
      // a-side: every member below the cap (clique regime), ONLY the min id
      // above it (star regime) — one branch, both semantics
      .select(explode(when(size(ids) <= cap, ids)
        .otherwise(array(array_min(ids)))).as("id_a"), ids)
      .select(col("id_a"), explode(ids).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
  }

  /** The unguarded clique form, kept as the equivalence baseline
    * (BucketGuardSpec pins guarded ≡ unguarded below the cap) and as the
    * explicit opt-out for a caller that truly wants the exhaustive pair list
    * of a skewed corpus.
    */
  def cliqueSelfJoinPairs(b: DataFrame, idCol: String,
      keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val a = b.select(col(idCol).as("id_a") +: keys: _*)
    val c = b.select(col(idCol).as("id_b") +: keys: _*)
    a.join(c, keyCols).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Measurement probe: the buckets the guard would cap — (keys…, bucket
    * size), largest first. ScaleCheck logs its count per corpus so a fired
    * guard is always driver-visible; empty on every benign corpus.
    */
  def oversizedBuckets(b: DataFrame, keyCols: Seq[String],
      cap: Int = cap): DataFrame =
    b.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > cap)
      .orderBy(desc("bucket_size"))
}
