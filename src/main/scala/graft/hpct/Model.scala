package graft.hpct

import org.apache.spark.sql.DataFrame

/** Sidecar metadata for one experiment database, mirroring the reference's
  * pandas `_metadata` fields (reference: hpctoolkit_dataframe/hpctoolkit_dataframe.py:135-136)
  * and "meaningful columns" (ibid:201-204).
  *
  * Dimension tables (metric/module/file/procedure id->name) are small — hundreds of
  * entries — so they live as plain driver-side maps; when a lookup is needed inside a
  * plan, they become broadcast literal maps or tiny broadcast-joined DataFrames.
  */
final case class ProfileMeta(
    dbPath: String,
    /** metric id -> metric name, insertion order = ascending id (ibid:166, 190). */
    metricsById: Seq[(Int, String)],
    /** metric name -> finalize formula source (first `t="finalize"` wins; ibid:63-76). */
    metricsFormulas: Map[String, String],
    modulesById: Map[Int, String],
    filesById: Map[Int, String],
    proceduresById: Map[Int, String],
    /** "the" percentage base column (ibid:307-329). */
    percentageColumn: String,
    /** ranking column for hot-path descent = percentageColumn + " ratio of total" (ibid:145, 203). */
    hotPathColumn: String,
    /** compact projection column list (ibid:143, 194-204). */
    compactColumns: Seq[String]) {

  def metricNames: Seq[String] = metricsById.map(_._2)
}

object Model {
  /** Root pseudo-node id (reference ibid:48). */
  val RootId: Long = -1L

  /** Fixed location columns appended after the metric columns (ibid:33-35). */
  val LocationColumns: Seq[String] = Seq(
    "callpath", "module path", "module", "file path", "file", "line", "procedure", "id", "type")

  /** Compact projection's location half (ibid:37). */
  val CompactLocationColumns: Seq[String] = Seq("module", "file", "line", "procedure", "type")

  /** XML tag -> row `type` value (ibid:18-23). */
  val MeasurementTypes: Map[String, String] = Map(
    "PF" -> "procedure frame",
    "C" -> "callsite",
    "Pr" -> "procedure",
    "S" -> "statement",
    "L" -> "loop")

  val PercentageColumnCandidates: Seq[String] = Seq("Mean (I)", "Sum (I)")
  val FundamentalColumnPrefix: String = "CPUTIME (usec):"
  val CompactColumnSuffixes: Seq[String] = Seq("", " ratio of total", " ratio of parent")
  val HotPathColumnSuffix: String = " ratio of total"

  /** Percentage-base resolution (reference ibid:307-329): try
    * `CPUTIME (usec):` + each candidate; else scan distinct column-name prefixes
    * (text before ':') in first-appearance order and retry the candidates.
    */
  def determinePercentageColumnBase(columns: Seq[String]): String = {
    val direct = PercentageColumnCandidates.iterator
      .map(FundamentalColumnPrefix + _)
      .find(columns.contains)
    direct.getOrElse {
      val prefixes = columns.map(_.split(":", 2)(0)).distinct // preserves first-appearance order
      val fallback = prefixes.iterator.flatMap { p =>
        PercentageColumnCandidates.iterator.map(c => s"$p:$c").find(columns.contains)
      }
      require(fallback.hasNext, s"no percentage column base among $columns")
      fallback.next()
    }
  }
}

/** A profile table plus its sidecar metadata; the analog of the reference's
  * `HPCtoolkitDataFrame(pd.DataFrame)` subclass whose `_constructor` override keeps
  * metadata flowing through every derived frame (reference ibid:131-152). Every
  * operator on this wrapper returns a new [[ProfileFrame]] carrying the same meta.
  */
final case class ProfileFrame(df: DataFrame, meta: ProfileMeta)

/** A multi-file load ([[ProfileLoad.loadMany]]): one merged table keyed by the `db`
  * column plus the per-file metadata. The reference has no merged abstraction (its
  * notebooks hold one frame per file); this is the union-by-name analog with
  * per-db ratio semantics identical to per-file single loads.
  */
final case class MultiProfileFrame(df: DataFrame, metas: Map[String, ProfileMeta])
