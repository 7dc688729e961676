package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness: selectivity of the count-ratio necessary condition for
  * Jaccard-thresholded edges. For jac = i/(ca+cb-i) >= tau, i <= min(ca,cb)
  * implies jac <= min/max, so min(ca,cb)/max(ca,cb) >= tau is a pure
  * NECESSARY condition computable from per-doc shingle counts alone — i.e.
  * before the pairs-x-shingles intersection join. This probe measures, on one
  * dir, how many LSH candidate pairs the prefilter would drop vs how many the
  * full verify drops, to decide whether reordering d09/d10's edge build around
  * it is worth the plan surgery. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.EdgePrefilterProbe <dir> [tau]
  */
object EdgePrefilterProbe {
  def main(args: Array[String]): Unit = {
    graft.JvmCheck.warnIfModulesClosed()
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args(0)
    val tau = if (args.length > 1) args(1).toDouble else 0.5
    val spark = SparkSession.builder()
      .appName("graft-edge-prefilter-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", false)
      .config("spark.log.level", "WARN")
      .getOrCreate()
    graft.queries.Sizing.adviseTaskMemory(spark)
    try {
      val cand = graft.queries.TextOps.candidatePairs(spark, dir)
      val jc = graft.queries.TextOps
        .jaccardCountsRestricted(spark, dir, cand)
        .select(col("id_a"), col("id_b"), col("i"), col("ca"), col("cb"),
          (least(col("ca"), col("cb")).cast("double") /
            greatest(col("ca"), col("cb"))).as("cr"),
          (col("i").cast("double") / (col("ca") + col("cb") - col("i"))).as("jac"))
        .localCheckpoint()
      val total = jc.count()
      val prePass = jc.filter(col("cr") >= tau).count()
      val jacPass = jc.filter(col("jac") >= tau).count()
      // sanity: the prefilter must never drop a true edge
      val dropped = jc.filter(col("cr") < tau && col("jac") >= tau).count()
      println(f"""PREFILTER {"dir":"$dir","tau":$tau,"candidates":$total,""" +
        f""""pass_count_ratio":$prePass,"pass_jaccard":$jacPass,""" +
        f""""prefilter_keep_frac":${prePass.toDouble / math.max(1, total)}%.4f,""" +
        f""""edge_frac":${jacPass.toDouble / math.max(1, total)}%.4f,""" +
        f""""true_edges_dropped":$dropped}""")
    } finally spark.stop()
  }
}
