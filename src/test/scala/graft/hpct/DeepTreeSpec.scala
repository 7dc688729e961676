package graft.hpct

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** The one-shot hot-path and flame-geometry formulations at ~30× fixture scale:
  * a synthetic comb tree of depth 40 with 100,000 nodes (the reference fixtures
  * are depth ≤ 25, ~3k nodes). Both operators are single declarative plans — no
  * per-depth driver jobs — so depth/width only grows the data, never the job
  * count; this spec pins their CORRECTNESS at that scale against closed-form
  * geometry (the comb makes every width/x0 analytically known), where running
  * the layer-per-job iterative baselines would cost ~40 driver jobs each.
  *
  * Comb shape: a spine of ones `[1], [1,1], …` (depth 40), each spine node also
  * has 2,500 leaf children. Spine nodes carry ratio-of-parent 0.6 and their
  * leaves (0.4 / 2500) each, so every sibling group sums to 1 and
  * width(spine_k) = 2π·0.6^(k-1) exactly; spine ids precede leaf ids, so every
  * spine b-offset is 0 and x0(spine_k) = 0 exactly.
  */
class DeepTreeSpec extends AnyFunSuite {

  private val D = 40
  private val B = 2500

  private lazy val pf: ProfileFrame = {
    val s = spark
    val rot = "v ratio of total"
    val rop = "v ratio of parent"
    val spine = s.range(1, D + 1).select(
      col("id"),
      expr("array_repeat(CAST(1 AS BIGINT), CAST(id AS INT))").as("callpath"),
      lit(0.9).as(rot), lit(0.6).as(rop),
      concat(lit("spine_"), col("id")).as("procedure"))
    val leaves = s.range(D.toLong * B)
      .withColumn("k", (col("id") / B).cast("int") + 1)
      .withColumn("j", col("id") % B + 2)
      .select((col("id") + 100).as("id"),
        concat(expr("array_repeat(CAST(1 AS BIGINT), k)"), array(col("j"))).as("callpath"),
        lit(1e-6).as(rot), lit(0.4 / B).as(rop),
        concat(lit("leaf_"), col("id")).as("procedure"))
    val root = s.range(1).select(
      lit(0L).as("id"), typedLit(Seq.empty[Long]).as("callpath"),
      lit(1.0).as(rot), lit(1.0).as(rop), lit("root").as("procedure"))
    val meta = ProfileMeta("synthetic-comb", Seq(0 -> "v"), Map.empty,
      Map.empty, Map.empty, Map.empty,
      percentageColumn = "v", hotPathColumn = rot,
      compactColumns = Seq("procedure", "id"))
    ProfileFrame(root.unionByName(spine).unionByName(leaves), meta)
  }

  test("one-shot hot path descends the full 40-deep spine in one plan") {
    val ids = Ops.hotPath(pf, threshold = 0.05).df
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    // root (always on the path) + every spine node; the rank-1 leaf under
    // spine_40 is below threshold, so the descent stops exactly at the spine end
    assert(ids === (0L to D.toLong))
  }

  test("one-shot flame geometry matches the comb's closed-form layout at 100k nodes") {
    val geo = Ops.flameGeometry(pf).cache()
    try {
      assert(geo.count() === D.toLong * B + D) // every non-root node gets geometry
      val twoPi = 2 * math.Pi
      def relEq(a: Double, b: Double): Boolean =
        math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
      // spine: width 2π·0.6^(k-1), x0 = 0 (spine id is min of every sibling group)
      val spineGeo: Map[Long, (Double, Double)] = geo.filter(col("id").between(1, D))
        .select("id", "x0", "width").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(spineGeo.size === D)
      for (k <- 1 to D) {
        val (x0, w) = spineGeo(k.toLong)
        assert(x0 === 0.0, s"spine_$k x0")
        assert(relEq(w, twoPi * math.pow(0.6, k - 1)), s"spine_$k width: $w")
      }
      // conservation: each parent's children tile exactly its width (depth 6
      // under spine_5 hits the per-parent normalization path at real fan-out)
      val kids = geo.filter(col("depth") === 6)
        .join(pf.df.filter(slice(col("callpath"), 1, 5) === lit(Array(1L, 1L, 1L, 1L, 1L)) &&
          size(col("callpath")) === 6).select("id"), "id")
      val row = kids.agg(sum("width"), min("x0"), max(col("x0") + col("width"))).collect().head
      val parentW = spineGeo(5L)._2
      assert(relEq(row.getDouble(0), parentW), "children widths must sum to the parent's")
      assert(row.getDouble(1) === 0.0) // first child (spine_6) starts at the parent's x0
      assert(relEq(row.getDouble(2), parentW), "last child must end at the parent's edge")
    } finally geo.unpersist()
  }
}
