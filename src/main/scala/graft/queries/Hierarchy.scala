package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tree-as-table queries over a synthetic hierarchy derived from the star schema
  * (region -> nation -> customer), mirroring the reference's decisive modeling choice:
  * the tree is one row per node with a materialized `path` array (reference
  * hpctoolkit_dataframe.py:283 `callpath`), so every tree operation is a relational
  * operation on arrays. These are the oracle-checkable analogs of SURVEY §2.A
  * A8 (ratio-of-total), A9 (ratio-of-parent), A11 (`at_paths`), A12 (`at_depths`),
  * A14 (`hot_path`), A15 (flame geometry) and §2.B B14 (path self-join).
  *
  * Node ids are offset per level so they're globally unique:
  * region = r_regionkey + 10, nation = n_nationkey + 100, customer = c_custkey + 1000.
  * Node value = c_acctbal rolled up (rounded to 2 dp at each level so Spark's and
  * DuckDB's summation orders can't produce different bits).
  */
object Hierarchy {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Per-(session, dir) cache of the nodes frame: seven hierarchy queries share it,
    * so one build + one in-memory copy instead of seven customer⋈nation rebuilds
    * (the dominant cost of a bench run; the frame is ~#customers rows, far under
    * executor memory at any tested SF).
    *
    * Staleness contract: entries key on (session, dir) and are never invalidated —
    * correct for the bench/verify harness (immutable input parquet, short-lived
    * session); a long-lived session that rewrites the input must call
    * [[clearCaches]] or it will read the stale cached frame.
    */
  private val nodesCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def nodesCached(s: SparkSession, d: String): DataFrame =
    nodesCache.getOrElseUpdate((s, d), nodes(s, d).cache())

  /** Materialize the shared cache up front (bench warmup) so per-query timings
    * attribute to plans, not to whichever query touches the cache first.
    */
  def prewarm(s: SparkSession, d: String): Unit =
    prewarmStages(s, d).foreach(_._2())

  /** Independent prewarm stages (see TextOps.prewarmStages for the contract). */
  def prewarmStages(s: SparkSession, d: String): Seq[(String, () => Unit)] =
    Seq("hierarchy-nodes" -> (() => { nodesCached(s, d).count(); () }))

  /** Unpersist and drop every cached frame (staleness/leak hook for long sessions). */
  def clearCaches(): Unit = {
    nodesCache.values.foreach(_.unpersist())
    nodesCache.clear()
  }

  /** The (id, path, value) nodes DataFrame. Built from two shuffled aggregations over
    * customer⋈nation (nation broadcast); at 100 TB the leaf level partitions by id and
    * the rollups are standard partial-agg shuffles.
    */
  def nodes(s: SparkSession, d: String): DataFrame = {
    val cn = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("c_custkey").cast("long").as("ck"),
        col("c_acctbal").as("ab"),
        (col("n_nationkey") + 100).cast("long").as("nk"),
        (col("n_regionkey") + 10).cast("long").as("rk"))
    val reg = cn.groupBy("rk")
      .agg(round(sum("ab"), 2).as("value"))
      .select(col("rk").as("id"), array(col("rk")).as("path"), col("value"))
    val nat = cn.groupBy("rk", "nk")
      .agg(round(sum("ab"), 2).as("value"))
      .select(col("nk").as("id"), array(col("rk"), col("nk")).as("path"), col("value"))
    val cust = cn.select(
      (col("ck") + 1000).as("id"),
      array(col("rk"), col("nk"), col("ck") + 1000).as("path"),
      col("ab").as("value"))
    reg.unionByName(nat).unionByName(cust)
  }

  /** Shared DuckDB CTE defining the identical nodes relation. */
  private val NodesCte: String =
    """WITH cn AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS ck, c_acctbal AS ab,
      |         CAST(n_nationkey + 100 AS BIGINT) AS nk,
      |         CAST(n_regionkey + 10 AS BIGINT) AS rk
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |), nodes AS (
      |  SELECT rk AS id, [rk] AS path, round(sum(ab), 2) AS value FROM cn GROUP BY rk
      |  UNION ALL
      |  SELECT nk, [rk, nk], round(sum(ab), 2) FROM cn GROUP BY rk, nk
      |  UNION ALL
      |  SELECT ck + 1000, [rk, nk, ck + 1000], ab FROM cn
      |)""".stripMargin.replace("\n", " ")

  private def pathStr: Column = concat_ws(",", col("path"))

  val queries: Map[String, Q] = Map(
    // B14: parent/child self-join on path prefix (reference parent lookup HD.py:374):
    // parent_path = slice(path, 1, size-1). Equi-join on the array key — Spark
    // shuffles both sides on the array hash; at scale, bucket by path hash.
    "b14_selfjoin_path" -> ((s, d) => {
      val n = nodesCached(s, d)
      val child = n.filter(size(col("path")) > 1).select(
        col("id"), col("value"),
        slice(col("path"), lit(1), size(col("path")) - 1).as("ppath"))
      val parent = n.select(col("path").as("ppath"), col("id").as("parent_id"),
        col("value").as("pvalue"))
      child.join(parent, "ppath")
        // `+ 0` normalizes IEEE -0.0 to 0.0 (a negative acctbal rounding to zero
        // hashes as "-0" in one engine and "0" in the other otherwise)
        .select(col("id"), col("parent_id"), (round(col("value") / col("pvalue"), 6) + lit(0.0)).as("frac"))
        .orderBy("id")
    }),

    // A8: ratio-of-total — value / root value (reference HD.py:340-359). The root
    // scalar is a broadcast one-row cross join, never a collect.
    "a08_ratio_total" -> ((s, d) => {
      val n = nodesCached(s, d)
      val total = n.filter(size(col("path")) === 1)
        .agg(round(sum("value"), 2).as("total"))
      n.crossJoin(broadcast(total))
        .select(col("id"), (round(col("value") / col("total"), 6) + lit(0.0)).as("ratio_total"))
        .orderBy("id")
    }),

    // A9: ratio-of-parent — value / parent value; depth-1 nodes ratio against the
    // implicit root (= grand total), mirroring the reference where every node's
    // walk-up terminates at the root row (HD.py:360-385).
    "a09_ratio_parent" -> ((s, d) => {
      val n = nodesCached(s, d)
      val total = n.filter(size(col("path")) === 1)
        .agg(round(sum("value"), 2).as("total"))
      val parent = n.select(col("path").as("ppath"), col("value").as("pvalue"))
      n.select(col("id"), col("value"),
          slice(col("path"), lit(1), size(col("path")) - 1).as("ppath"))
        .join(parent, Seq("ppath"), "left")
        .crossJoin(broadcast(total))
        .select(col("id"),
          (round(col("value") / coalesce(col("pvalue"), col("total")), 6) + lit(0.0)).as("ratio_parent"))
        .orderBy("id")
    }),

    // A11: callpath prefix filter (`at_paths`, reference HD.py:391-393) — keep rows
    // whose path starts with [10] (region 0's node).
    "a11_at_paths" -> ((s, d) =>
      nodesCached(s, d)
        .filter(slice(col("path"), 1, 1) === array(lit(10L)))
        .select(col("id"), pathStr.as("path_str"), col("value"))
        .orderBy("id")),

    // A12: depth filter (`at_depths`, reference HD.py:395-401).
    "a12_at_depths" -> ((s, d) =>
      nodesCached(s, d)
        .filter(size(col("path")).between(2, 3))
        .select(col("id"), size(col("path")).cast("long").as("depth"))
        .orderBy("id")),

    // A14: hot path — greedy argmax descent (reference HD.py:403-428) as ONE
    // declarative plan, the hierarchy-side port of hpct.Ops.hotPathOneShot's
    // rank-window + prefix-explode + count-matches shape (proven equal to the
    // per-depth argmax loop by ParitySpec on the hpct frames): a node is on the
    // hot path iff EVERY prefix of its path (itself included) is the rank-1 child
    // of its sibling group (max value, min id on ties). Zero driver iteration —
    // no per-depth collect jobs — so the same plan handles depth 25 as depth 3.
    "a14_hot_path" -> ((s, d) => {
      // the query's contract descends the 3-level hierarchy (region → nation →
      // customer), matching the oracle's three greedy CTE levels — the depth cap
      // the old driver loop carried implicitly. A no-op on this frame (max depth
      // IS 3) but pinned explicitly so a deeper nodes frame can't silently
      // diverge from the 3-level oracle; the uncapped formulation is
      // hpct.Ops.hotPathOneShot.
      val n = nodesCached(s, d).filter(size(col("path")) <= 3) // shared cache — NOT unpersisted here
      // rank-1 nodes per sibling group (depth-1 nodes all share the empty parent)
      val winners = n
        .withColumn("__parent",
          slice(col("path"), lit(1), greatest(size(col("path")) - 1, lit(0))))
        .withColumn("__rk", row_number().over(
          Window.partitionBy("__parent").orderBy(desc("value"), asc("id"))))
        .filter(col("__rk") === 1)
        .select(col("path").as("__winner"))
      // every node × its path prefixes (O(depth) rows per node)
      val prefixes = n
        .select(col("id").as("__nid"), col("path"))
        .withColumn("__k", explode(sequence(lit(1), size(col("path")))))
        .select(col("__nid"), size(col("path")).as("__depth"),
          slice(col("path"), lit(1), col("__k")).as("__winner"))
      // on the hot path iff ALL prefixes are winners
      val hotIds = prefixes.join(winners, "__winner")
        .groupBy("__nid", "__depth").agg(count(lit(1)).as("__hits"))
        .filter(col("__hits") === col("__depth"))
        .select(col("__nid").as("id"))
      n.join(hotIds, Seq("id"), "left_semi")
        .select(col("id"), pathStr.as("path_str"), col("value"),
          size(col("path")).cast("long").as("depth"))
        .orderBy("depth")
    }),

    // A15: flame-graph geometry (reference HD.py:430-540): first layer normalized to
    // 2π; deeper layers sibling-normalized within parent and offset by within-parent
    // cumulative sum + parent offset. Two window passes + one broadcast join.
    "a15_flame" -> ((s, d) => {
      val n = nodesCached(s, d)
      val twoPi = lit(2.0 * math.Pi)
      // constant-but-non-foldable partition key: Spark 4's EliminateWindowPartitions
      // folds a literal key away, leaving an unpartitioned WindowExec whose WARN
      // drowns real regressions. The input is one tree layer (5 region rows), so the
      // single partition IS the semantics — this just keeps the spec non-empty.
      val wAll = Window.partitionBy(col("id") * 0)
      val l1 = n.filter(size(col("path")) === 1).select(
        col("id"),
        (twoPi * col("value") / sum("value").over(wAll)).as("w"),
        (twoPi * coalesce(
          sum("value").over(wAll.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0.0)) / sum("value").over(wAll)).as("o"))
      val byParent = Window.partitionBy(col("pk"))
      val l2base = n.filter(size(col("path")) === 2).select(
        col("id"), col("value"), element_at(col("path"), 1).as("pk"))
      val l2 = l2base
        .join(broadcast(l1.select(col("id").as("pk"), col("w").as("pw"), col("o").as("po"))), "pk")
        .select(
          col("id"),
          (col("pw") * col("value") / sum("value").over(byParent)).as("w"),
          (col("po") + coalesce(
            sum("value").over(byParent.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0.0)) * col("pw") / sum("value").over(byParent)).as("o"))
      l1.select(col("id"), lit(1L).as("depth"), round(col("w"), 6).as("width"),
          round(col("o"), 6).as("x0"))
        .unionByName(l2.select(col("id"), lit(2L).as("depth"), round(col("w"), 6).as("width"),
          round(col("o"), 6).as("x0")))
        .orderBy("depth", "id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "b14_selfjoin_path" ->
      (NodesCte + " SELECT c.id AS id, p.id AS parent_id, round(c.value / p.value, 6) + 0 AS frac" +
        " FROM nodes c JOIN nodes p ON c.path[1:len(c.path)-1] = p.path" +
        " WHERE len(c.path) > 1 ORDER BY id"),
    "a08_ratio_total" ->
      (NodesCte + ", tot AS (SELECT round(sum(value), 2) AS total FROM nodes WHERE len(path) = 1)" +
        " SELECT id, round(value / total, 6) + 0 AS ratio_total FROM nodes, tot ORDER BY id"),
    "a09_ratio_parent" ->
      (NodesCte + ", tot AS (SELECT round(sum(value), 2) AS total FROM nodes WHERE len(path) = 1)" +
        " SELECT c.id, round(c.value / coalesce(p.value, tot.total), 6) + 0 AS ratio_parent" +
        " FROM nodes c LEFT JOIN nodes p ON c.path[1:len(c.path)-1] = p.path CROSS JOIN tot" +
        " ORDER BY c.id"),
    "a11_at_paths" ->
      (NodesCte + " SELECT id, array_to_string(path, ',') AS path_str, value FROM nodes" +
        " WHERE path[1:1] = [CAST(10 AS BIGINT)] ORDER BY id"),
    "a12_at_depths" ->
      (NodesCte + " SELECT id, CAST(len(path) AS BIGINT) AS depth FROM nodes" +
        " WHERE len(path) BETWEEN 2 AND 3 ORDER BY id"),
    "a14_hot_path" ->
      (NodesCte +
        ", l1 AS (SELECT * FROM nodes WHERE len(path) = 1 ORDER BY value DESC, id LIMIT 1)" +
        ", l2 AS (SELECT n.* FROM nodes n, l1 WHERE len(n.path) = 2 AND n.path[1:1] = l1.path" +
        "   ORDER BY n.value DESC, n.id LIMIT 1)" +
        ", l3 AS (SELECT n.* FROM nodes n, l2 WHERE len(n.path) = 3 AND n.path[1:2] = l2.path" +
        "   ORDER BY n.value DESC, n.id LIMIT 1)" +
        " SELECT id, array_to_string(path, ',') AS path_str, value, CAST(len(path) AS BIGINT) AS depth" +
        " FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3)" +
        " ORDER BY depth"),
    "a15_flame" ->
      (NodesCte +
        ", l1 AS (SELECT id, 2 * pi() * value / sum(value) OVER () AS w," +
        "   2 * pi() * coalesce(sum(value) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)" +
        "     / sum(value) OVER () AS o" +
        "   FROM nodes WHERE len(path) = 1)" +
        ", l2 AS (SELECT n.id, l1.w * n.value / sum(n.value) OVER (PARTITION BY n.path[1]) AS w," +
        "   l1.o + coalesce(sum(n.value) OVER (PARTITION BY n.path[1] ORDER BY n.id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)" +
        "     * l1.w / sum(n.value) OVER (PARTITION BY n.path[1]) AS o" +
        "   FROM nodes n JOIN l1 ON n.path[1] = l1.id WHERE len(n.path) = 2)" +
        " SELECT id, depth, round(w, 6) AS width, round(o, 6) AS x0 FROM (" +
        "   SELECT id, CAST(1 AS BIGINT) AS depth, w, o FROM l1" +
        "   UNION ALL SELECT id, CAST(2 AS BIGINT), w, o FROM l2)" +
        " ORDER BY depth, id"),
  )
}
