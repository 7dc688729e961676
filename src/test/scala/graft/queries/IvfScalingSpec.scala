package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** IVF parameterization beyond the oracle-pinned (K=16, nprobe=4) demo constants:
  * at 100 TB, K must grow ~sqrt(N) so each inverted list stays ~sqrt(N) rows and an
  * nprobe-probe scans ~nprobe/K of the corpus. This spec runs the SAME plan at K=64
  * with 2 Lloyd iterations and pins the scale properties the scaladoc claims:
  * probing selects exactly nprobe of the K lists, the candidate scan is the probed
  * lists only (a strict minority of the corpus), and the search stays deterministic
  * and consistent with the K=16 oracle variants' exactness contract.
  */
class IvfScalingSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  test("K=64, 2 Lloyd iterations: probe scans nprobe lists = a bounded corpus fraction") {
    val s = spark
    graft.functions.VecDot.register(s)
    val emb = Tables.embeddings(s, sf).cache()
    try {
      val total = emb.count()
      val k = 64
      val nprobe = 4
      val cents = VectorOps.ivfCentroids(emb, k, lloydIters = 2).cache()
      assert(cents.count() === k, "Lloyd refinement must preserve all K lists here")
      val assigned = VectorOps.ivfAssign(emb, cents)
      val listSizes = assigned.groupBy("cid").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val probedIds = VectorOps.ivfProbe(cents, q, nprobe)
        .collect().map(_.getLong(0)).toSet
      assert(probedIds.size === nprobe, s"probe must select exactly $nprobe lists")
      // the candidate scan is the probed lists ONLY; with K=64 trained lists the
      // probed rows are a strict minority of the corpus (ideal nprobe/K = 6.25%;
      // the bound allows for assignment skew)
      val probedRows = probedIds.toSeq.map(listSizes.getOrElse(_, 0L)).sum
      val frac = probedRows.toDouble / total
      info(f"probed $probedRows of $total rows (${frac * 100}%.1f%% of corpus, ideal ${400.0 / k}%.1f%%)")
      assert(frac < 0.30, f"K=$k probe scanned ${frac * 100}%.1f%% of the corpus — lists too skewed")
      cents.unpersist()
    } finally emb.unpersist()
  }

  test("K=64 search is deterministic and returns the requested top-k") {
    val s = spark
    val r1 = VectorOps.ivfSearch(s, sf, k = 64, nprobe = 4, lloydIters = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val r2 = VectorOps.ivfSearch(s, sf, k = 64, nprobe = 4, lloydIters = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(r1.size === 5)
    assert(r1 === r2, "same parameters must reproduce the same ranked list")
    // the query vector itself (vec_id 0, cos 1.0) must be retrieved: its own list
    // is always the rank-1 probe
    assert(r1.head._1 === 0L && r1.head._2 === 1.0)
  }

  test("ivfDefaults codifies k ≈ √N with a ≈1/16 probed fraction") {
    // the sf1 embedding corpus (N = 20,000): the rule picks k=141/nprobe=8 —
    // SCALECHECK's ivf_auto step measures 5.3% probed vs the 5.7% ideal there
    assert(VectorOps.ivfDefaults(20000L) === ((141, 8)))
    assert(VectorOps.ivfDefaults(5000L) === ((71, 4)))
    // per-decade growth is √10: a 100× corpus grows k 10×, not 100×
    val (k1, _) = VectorOps.ivfDefaults(1000L * 1000)
    val (k2, _) = VectorOps.ivfDefaults(100L * 1000 * 1000)
    assert(k1 === 1000 && k2 === 10000)
    // degenerate corpora stay valid (k, nprobe >= 1)
    assert(VectorOps.ivfDefaults(1L) === ((1, 1)))
    for (n <- Seq(10L, 5000L, 1000000L)) {
      val (k, np) = VectorOps.ivfDefaults(n)
      assert(np >= 1 && np <= k, s"n=$n")
    }
  }

  test("oracle-pinned variants are the K=16 parameterizations (plan, not a fork)") {
    val s = spark
    val viaParam = VectorOps.ivfSearch(s, sf, k = 16, nprobe = 4, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaQuery = VectorOps.queries("s04_ann_ivf_trained")(s, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaParam === viaQuery)
  }
}
