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
  *
  * The reference's method surface is mirrored as instance methods (delegating to
  * [[Ops]]), so `df.hot_path().compact` call chains translate one-to-one:
  * `pf.hotPath().compact`. The underlying Spark `DataFrame` stays one field away
  * for the full generic relational surface.
  */
final case class ProfileFrame(df: DataFrame, meta: ProfileMeta) {
  /** reference `at_paths(prefix=..., suffix=...)` (HD.py:391-393). */
  def atPaths(prefix: Seq[Long] = Nil, suffix: Seq[Long] = Nil): ProfileFrame =
    Ops.atPaths(this, prefix, suffix)
  /** reference `at_depths(min, max)` (HD.py:395-398). */
  def atDepths(minDepth: Option[Int] = None, maxDepth: Option[Int] = None): ProfileFrame =
    Ops.atDepths(this, minDepth, maxDepth)
  /** reference `at_depth(depth)` (HD.py:400-401). */
  def atDepth(depth: Int): ProfileFrame = Ops.atDepth(this, depth)
  /** reference `.compact` property (HD.py:387-389). */
  def compact: ProfileFrame = Ops.compact(this)
  /** reference `hot_path(callpath, threshold)` (HD.py:403-428). */
  def hotPath(callpath: Seq[Long] = Nil, threshold: Double = 0.05,
      baseColumn: Option[String] = None): ProfileFrame =
    Ops.hotPath(this, callpath, threshold, baseColumn)
  /** reference `flame_graph(...)` minus rendering (HD.py:430-540): the geometry. */
  def flameGeometry(prefix: Seq[Long] = Nil, column: Option[String] = None,
      minDepth: Option[Int] = None, maxDepth: Option[Int] = None): DataFrame =
    Ops.flameGeometry(this, prefix, column, minDepth, maxDepth)
  /** reference `add_ratio_column(base, name, method)` (HD.py:340-385): add a
    * ratio-of-total or (walk-up) ratio-of-parent column for ANY double metric.
    */
  def addRatioColumn(base: String, method: String = "total",
      name: Option[String] = None): ProfileFrame =
    copy(df = ProfileLoad.addRatioColumn(df, base, method, name))
  /** reference `_str_or_regex_sequence_filter` (HD.py:95-120): string/regex
    * prefix/suffix filtering over any array-of-string column.
    */
  def seqFilter(column: String, prefix: Seq[Ops.SeqPattern] = Nil,
      suffix: Seq[Ops.SeqPattern] = Nil): ProfileFrame =
    copy(df = Ops.seqFilter(df, column, prefix, suffix))
}

/** A multi-file load ([[ProfileLoad.loadMany]]): one merged table keyed by the `db`
  * column plus the per-file metadata. The reference has no merged abstraction (its
  * notebooks hold one frame per file); this is the union-by-name analog with
  * per-db ratio semantics identical to per-file single loads.
  */
final case class MultiProfileFrame(df: DataFrame, metas: Map[String, ProfileMeta])
