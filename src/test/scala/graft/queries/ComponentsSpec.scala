package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

class ComponentsSpec extends AnyFunSuite {

  private def edgesDf(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    // through parallelize, not createDataFrame(local) — matches how edges arrive
    // in the real pipeline (from a shuffle, not a LocalRelation)
    s.sparkContext.parallelize(pairs).toDF("id_a", "id_b")
  }

  test("min-id labels across multiple components; non-edge nodes excluded") {
    val out = Components.minLabelComponents(edgesDf(10L -> 20L, 20L -> 30L, 5L -> 6L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 5L -> 5L, 6L -> 5L))
  }

  test("a 64-node chain converges within log-bounded rounds (pointer jumping)") {
    // plain min propagation needs diameter=63 rounds here; pointer jumping
    // compresses label chains, so 10 rounds must suffice (the operator throws
    // via require() if it has not converged by maxRounds)
    val chain = (0L until 63L).map(i => i -> (i + 1))
    val out = Components.minLabelComponents(edgesDf(chain: _*), maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length === 64)
    assert(out.forall(_._2 === 0L))
  }

  // mixes every retirement case: pure pairs (duplicate-edge pair too), a
  // degree-1 node whose neighbor is NOT degree-1 (must stay in the loop),
  // and a triangle. The pair fast path must change labels for none of them.
  private val mixedEdges = Seq(
    100L -> 200L,              // pair -> retired
    7L -> 3L, 3L -> 7L,        // pair via duplicate opposite-order edges
    1L -> 2L, 2L -> 4L,        // chain: 1 and 4 are degree-1 but 2 is not
    50L -> 60L, 60L -> 70L, 70L -> 50L) // triangle
  private val mixedExpected = Map(
    100L -> 100L, 200L -> 100L, 3L -> 3L, 7L -> 3L,
    1L -> 1L, 2L -> 1L, 4L -> 1L, 50L -> 50L, 60L -> 50L, 70L -> 50L)

  test("pair components retire early but merge correctly with loop-resolved ones") {
    // retirePairs forced ON: the RetireMinSymRows auto-gate would skip the
    // prepass at this size, and the retirement code must stay covered
    val out = Components.minLabelComponents(edgesDf(mixedEdges: _*),
        retirePairs = Some(true))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === mixedExpected)
  }

  test("retirement gate: both branches produce identical labels") {
    // the production path gates on sym-row count (skip below RetireMinSymRows);
    // this pins that the gate can only ever pick between two EQUAL answers
    val skip = Components.minLabelComponents(edgesDf(mixedEdges: _*),
        retirePairs = Some(false))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(skip === mixedExpected)
  }

  test("d09 clusters equal a driver-side union-find of the verified edges") {
    val s = spark
    val d = "/root/testdata/sf0.01"
    val got = TextOps.queries("d09_dedup_clusters")(s, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "sf0.01 must yield at least one verified near-dup cluster")
    assert(got.forall { case (doc, cl) => cl <= doc }, "cluster id is the min member")
    // independent reference: union-find over the same jaccard>=0.5 edge list
    val edges = TextOps.queries("d05_jaccard")(s, d)
      .filter(col("jaccard") >= 0.5) // d05 rounds to 6dp; safe as a test reference
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    assert(got === expected)
  }

  // CI pins of the r16 giant-component shapes (ScaleCheck's `giant` step runs
  // them at 1e6/1e5 nodes: 3 and 7 rounds against bounds 44/38); production
  // dedup graphs have 1e5-node boilerplate stars and chains of stars, and the
  // round count must stay logarithmic, not diameter-linear
  private def logBound(n: Long): Int =
    2 * (64 - java.lang.Long.numberOfLeadingZeros(n - 1)) + 4

  test("giant star centered at the MAX id: log-bounded rounds, min label wins") {
    // center = max id so the min label must propagate from a leaf, not ride
    // the start state
    val n = 10000L
    val star = spark.range(0L, n - 1)
      .select(col("id").as("id_a"), lit(n - 1).as("id_b"))
    val (labels, rounds) = Components.minLabelComponentsWithRounds(
      star, maxRounds = logBound(n))
    assert(rounds <= logBound(n))
    assert(labels.count() === n) // exactly one row per node, never edge-sized
    assert(labels.filter(col("lbl") =!= 0L).count() === 0)
  }

  test("chain of stars (diameter >> rounds): pointer jumping earns its keep") {
    // 20 stars of 100 leaves, centers chained: diameter ~40, plain propagation
    // would need ~20+ rounds; pointer jumping must stay within the log bound
    val stars = 20L
    val leaves = spark.range(0L, stars * 100)
      .select(((col("id") / 100).cast("long") * 101).as("id_a"),
        ((col("id") / 100).cast("long") * 101 + (col("id") % 100) + 1).as("id_b"))
    val chain = spark.range(0L, stars - 1)
      .select((col("id") * 101).as("id_a"), ((col("id") + 1) * 101).as("id_b"))
    val n = stars * 101
    val (labels, rounds) = Components.minLabelComponentsWithRounds(
      leaves.unionByName(chain), maxRounds = logBound(n))
    assert(rounds <= logBound(n))
    assert(labels.count() === n)
    assert(labels.filter(col("lbl") =!= 0L).count() === 0)
  }

  test("superseded round checkpoints are released, not held for the whole loop (r18)") {
    // the sf1000 d09 spill item: every round localCheckpoints a label frame,
    // and before r18 ALL of them stayed pinned in the unified pool until GC
    // + ContextCleaner noticed — ~7x spill-to-shuffle at the fifth decade.
    // A multi-round chain graph must finish holding only the SURVIVING
    // frames (final labels + the result's roots), not one per round.
    val before = spark.sparkContext.getPersistentRDDs.size
    val chain = (0L until 63L).map(i => i -> (i + 1))
    val (labels, rounds) = Components.minLabelComponentsWithRounds(
      edgesDf(chain: _*), maxRounds = 10)
    labels.write.format("noop").mode("overwrite").save()
    assert(rounds >= 3, s"need a multi-round run for this pin, got $rounds")
    val after = spark.sparkContext.getPersistentRDDs.size
    // surviving: final labels (+ pairLabels' root in the non-retire branch,
    // where residual IS sym). Anything per-round would add >= `rounds` more.
    assert(after - before <= 3,
      s"components leaked ${after - before} pinned RDDs across $rounds rounds" +
        " - superseded checkpoints must be unpersisted as each round lands")
  }
}
