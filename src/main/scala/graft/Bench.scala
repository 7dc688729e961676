package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and prints one
  * JSON line. A query that throws is REPORTED (per-query "err" + nonzero exit), never
  * silently timed at ~0 — a bench that can't distinguish broken from fast is worse
  * than no bench.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: spin codegen/shuffle machinery on synthetic data so the first
    // measured query doesn't absorb one-time session costs (no test data touched).
    locally {
      import org.apache.spark.sql.functions._
      spark.range(1 << 16).select(col("id") % 7 as "k", col("id").cast("double") as "v")
        .groupBy("k").agg(sum("v")).orderBy("k").count()
    }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    var failed = List.empty[String]
    // SPARK_GRAFT_ONLY=csv-of-names limits the run (dev tool for isolating queries)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map {
      case (k, v, None) => s"\"${esc(k)}\":$v"
      case (k, _, Some(e)) => s"\"${esc(k)}\":{\"err\":\"${esc(e)}\"}"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.length}}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
