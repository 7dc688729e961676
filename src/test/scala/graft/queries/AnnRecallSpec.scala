package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** Pins retrieval QUALITY, not just determinism: hash-matching s02/s03/s04 proves
  * they compute what they claim; this proves what they claim is worth computing.
  * The recall metric itself is the oracle-checked s05 query, run at bench scale.
  *
  * Measured geometry of the corpus (sf0.1, 2000 vectors, 64 dims): the exact top-5
  * neighbors of the query sit at cos 0.34-0.41 — about 3 sigma above the random
  * -cosine noise floor (sd = 1/sqrt(64) = 0.125). At that signal level:
  *  - IVF probing (the recommended general-ANN scale path) recalls 0.8 with raw
  *    seeds and 1.0 after one Lloyd iteration — asserted >= 0.8 here.
  *  - Sign-LSH bucketing is pruning-limited BY CONSTRUCTION: a 12-bit band admits
  *    a cos~0.4 neighbor with prob ~0.63^12 = 0.4%, so with 2 bands it prunes the
  *    scan to <5% of the corpus but recalls only the query itself. That is the
  *    intended operating point: s02's banding is the NEAR-DUP candidate generator
  *    (cos -> 1, where per-bit agreement -> 1 and collisions are near-certain —
  *    d08 finds its cos>=0.97 pairs through the same bands), not a general ANN.
  *    Asserted: it still retrieves the query (recall >= 0.2) AND keeps its pruning
  *    contract — recall that rises by scanning everything would be no ANN at all.
  */
class AnnRecallSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  test("s05: recall@5 — IVF variants >= 0.8, bucket variant documented floor") {
    val rows = VectorOps.queries("s05_ann_recall")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet === Set("bucket", "ivf", "ivf_trained"))
    rows.foreach { case (v, r) => info(f"$v%-12s recall@5 = $r%.2f") }
    assert(rows("ivf") >= 0.8, s"ivf recall@5 ${rows("ivf")} < 0.8")
    assert(rows("ivf_trained") >= 0.8, s"ivf_trained recall@5 ${rows("ivf_trained")} < 0.8")
    assert(rows("bucket") >= 0.2, s"bucket recall@5 ${rows("bucket")} < 0.2")
  }

  test("planted clusters: IVF recall far exceeds probed fraction when structure exists") {
    // The corpus above has no planted neighbor structure, so recall there can
    // only be read against the probed fraction. This test PLANTS structure
    // (C=50 Gaussian centroids + per-vector noise; in-cluster cos ~0.9,
    // cross-cluster ~0) and asserts the auto-K quantizer actually finds it:
    // recall@5 >= 0.9 while scanning < 10% of the corpus. If IVF degenerated to
    // random sampling, recall would match the probed fraction and this fails.
    // Same generator + measurement as ScaleCheck's `planted` step
    // (VectorOps.plantedEmbeddings / ivfRecallVsExact) so this pin and the
    // sf1/sf10 measurements can never drift apart.
    val s = spark
    graft.functions.VecDot.register(s)
    val emb = VectorOps.plantedEmbeddings(s, nVec = 2000, dim = 64, nClusters = 50)
    val r = VectorOps.ivfRecallVsExact(emb, nQ = 10)
    info(f"planted: k=${r.k} nprobe=${r.nprobe} probed=${r.probedFraction}%.3f recall@5=${r.recallAt5}%.2f")
    assert(r.probedFraction < 0.10,
      f"probed fraction ${r.probedFraction}%.3f lost its pruning contract")
    assert(r.recallAt5 >= 0.9,
      f"recall@5 ${r.recallAt5}%.2f on a clustered corpus — quantizer missing structure")
  }

  test("bucket variant holds its pruning contract while recalling the query") {
    // the flip side of the documented recall floor: the 2x12-bit bands prune the
    // exact-scoring candidate set to a small corpus fraction
    val s = spark
    graft.functions.VecDot.register(s)
    val emb = Tables.embeddings(s, sf)
    val n = emb.count()
    // candidates = rows sharing one of the query's band buckets (what s02 scores)
    val all = VectorOps.banded(emb)
    val q = all.filter(col("vec_id") === 0).select(col("bi"), col("bucket"))
    val candidates = all.join(q, Seq("bi", "bucket")).select("vec_id").distinct().count()
    info(f"bucket candidates: $candidates of $n (${candidates * 100.0 / n}%.1f%%)")
    assert(candidates.toDouble / n < 0.05, "bucket LSH stopped pruning")
  }
}
