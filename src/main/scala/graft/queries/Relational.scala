package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.B generic relational surface, declared as named oracle-checked queries
  * over the driver's synthetic tables. Each query pins a TOTAL row order — the sort
  * keys must determine every projected column, because the driver compares rows
  * positionally. (l_orderkey, l_linenumber) is NOT a key of the synthetic lineitem
  * (~20% of rows share a pair at every sf — found by an sf1 oracle cross-check in
  * round 10, where a semi-join's reordering broke the stable-scan-order luck that
  * had let the two-column sort pass at sf0.01), so every lineitem projection
  * tiebreaks on its remaining projected columns; tied rows are then bytewise
  * identical and interchangeable. TotalOrderSpec re-derives this property for every
  * oracle from its ORDER BY clause. Computed columns alias identically on both
  * sides. Double-valued aggregates are rounded (2–6 dp) because Spark and DuckDB may
  * sum in different orders; per-row arithmetic is left exact (same IEEE ops on the
  * same inputs on both sides).
  *
  * Scale notes are per query; global rule: aggregations/joins shuffle on their keys,
  * dimension joins broadcast, and no query collects to the driver.
  */
object Relational {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // B1: column projection / subset (reference HD.py:355, 389).
    "b01_project" -> ((s, d) =>
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")),

    // B2: boolean-mask filter + conjunction (reference examples.ipynb cell 7).
    // Filters push to the parquet scan (PushedFilters in .explain).
    "b02_filter" -> ((s, d) =>
      customer(s, d)
        .filter(col("c_acctbal") > 5000 && col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")),

    // B3: row lookup by key (reference .loc[[k]], HD.py:357).
    "b03_key_lookup" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderkey") === 42)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")),

    // B4: scalar extraction (reference .item(), HD.py:358). min/max/count are
    // order-insensitive, so no rounding needed.
    "b04_scalar" -> ((s, d) =>
      orders(s, d).agg(
        max("o_totalprice").as("max_price"),
        min("o_totalprice").as("min_price"),
        count(lit(1)).as("n"))),

    // B5: argmax / top-1 (reference idxmax(), HD.py:422). Tie-break on key for
    // determinism, exactly like pandas idxmax picks the first index.
    "b05_argmax" -> ((s, d) =>
      orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(1)),

    // B6: membership / semi-join (reference isin, HD.py:428). LEFT SEMI keeps the
    // build side small; Spark broadcasts the filtered dim automatically under AQE.
    "b06_semijoin" -> ((s, d) => {
      val li = lineitem(s, d)
      val pk = part(s, d).filter(col("p_size") > 40)
      li.join(pk, li("l_partkey") === pk("p_partkey"), "left_semi")
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    }),

    // B7: row-wise UDF replaced by a native CASE expression (reference apply(axis=1),
    // HD.py:392) — stays inside whole-stage codegen, no UDF.
    "b07_case_expr" -> ((s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") < 0.03, "low")
            .when(col("l_discount") < 0.07, "mid")
            .otherwise("high").as("band"))
        .orderBy("l_orderkey", "l_linenumber", "band")),

    // B8: insert column at position (reference df.insert, HD.py:385) — withColumn +
    // explicit select ordering. The product stays UNROUNDED: both engines compute the
    // same IEEE multiply on the same inputs (bitwise-equal), whereas round(·, 2)
    // lands differently on .xx5 boundaries (116/60k rows at sf0.01).
    "b08_insert_column" -> ((s, d) =>
      lineitem(s, d)
        .withColumn("revenue", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "revenue", "l_discount")
        // (extendedprice, discount) determine revenue, so the four base columns
        // totally order the projection without sorting on the computed product
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")),

    // B9: cursor/iteration replaced by a lag window (reference iterrows, HD.py:359) —
    // partitioned by customer so no global single-partition window at scale.
    "b09_lag" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          (col("o_totalprice") - lag("o_totalprice", 1)
            .over(Window.partitionBy("o_custkey").orderBy("o_orderkey"))).as("delta"))
        .orderBy("o_custkey", "o_orderkey")),

    // B10: slicing / every-kth-row sampling (reference compact[::200]), scale-safe:
    // bucket the sort key DETERMINISTICALLY (128 equal-width slots over the key
    // domain — monotone in l_orderkey, so bucket-major + in-bucket (okey, ln)
    // order IS the global order; 4 waves on 32 cores absorbs bucket-size
    // imbalance), per-bucket row_number (keyed window — no
    // all-rows-in-one-partition exchange), then add cross-bucket offsets from the
    // 128-row per-bucket counts. Earlier rounds used repartitionByRange +
    // spark_partition_id, which cost three full range exchanges of the data (the
    // sampled exchange can't be plan-reused across the counts and window
    // branches) and silently relied on two independently-sampled partitionings
    // choosing identical boundaries. Equal-width bucketing assumes a roughly
    // uniform key domain (true for l_orderkey); a skewed domain would want the
    // range-exchange variant with a persisted keyed frame instead.
    "b10_slice" -> ((s, d) => {
      val base = lineitem(s, d).select("l_orderkey", "l_linenumber")
      def keyed = base
        .crossJoin(broadcast(base.agg(max("l_orderkey").as("__mx"))))
        .withColumn("__pid",
          ((col("l_orderkey") - 1) * 128 / col("__mx")).cast("int"))
        .drop("__mx")
      // running offsets in ONE pass over the 128-row counts: explode each bucket's
      // count to every higher bucket and sum — no counts self-join, so the base
      // table is scanned once here (and once more for the window branch), both
      // column-pruned, with map-side partial aggregation doing the heavy lifting
      val counts = keyed.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      val offsets = counts
        .filter(col("__pid") < 127)
        .select(explode(sequence(col("__pid") + 1, lit(127))).as("__pid_t"),
          col("__cnt"))
        .groupBy("__pid_t").agg(sum("__cnt").as("__off"))
      keyed
        .withColumn("__prn", row_number().over(
          Window.partitionBy("__pid").orderBy("l_orderkey", "l_linenumber")))
        .join(broadcast(offsets), col("__pid") === col("__pid_t"), "left")
        .withColumn("rn", (coalesce(col("__off"), lit(0L)) + col("__prn")).cast("long"))
        .filter(col("rn") % 200 === 1)
        .select("l_orderkey", "l_linenumber", "rn")
        .orderBy("rn")
    }),

    // B11: grouped aggregation (reference flame sibling sums, HD.py:495) — classic
    // partial-agg + shuffle-on-keys plan; map-side combine is automatic.
    "b11_groupby" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 6).as("avg_disc"))
        .orderBy("l_returnflag", "l_linestatus")),

    // B12: cumulative sum within partition (reference cumsum offsets, HD.py:499-508).
    "b12_cumsum" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(
            Window.partitionBy("o_custkey").orderBy("o_orderkey")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("cum"))
        .orderBy("o_custkey", "o_orderkey")),

    // B13: ranking window (reference hottest-child selection, HD.py:422).
    "b13_rank" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(
            Window.partitionBy("o_custkey")
              .orderBy(desc("o_totalprice"), asc("o_orderkey"))).cast("long").as("rk"))
        .filter(col("rk") <= 3)
        .orderBy("o_custkey", "rk")),

    // B15: broadcast dimension join (reference id->name resolution, HD.py:40-46).
    "b15_dimjoin" -> ((s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("acct"))
        .orderBy("n_name")),

    // B16: sort + limit (top-k): total order with unique tie-break.
    "b16_sort_limit" -> ((s, d) =>
      customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
        .limit(10)),

    // B17: unionByName with missing columns (reference multi-profile merge, SURVEY B17).
    "b17_union" -> ((s, d) => {
      val c = customer(s, d).select(
        col("c_name").as("name"), col("c_acctbal").as("acctbal"),
        col("c_mktsegment").as("segment"))
      val su = supplier(s, d).select(
        col("s_name").as("name"), col("s_acctbal").as("acctbal"))
      c.unionByName(su, allowMissingColumns = true).orderBy("name")
    }),

    // B18: array functions (reference callpath ops, HD.py:88-91, 283). The sorted
    // per-order line-number list is rebuilt from per-value COUNTS instead of
    // collect_list (r10): l_linenumber's domain is bounded (1..7, TPC-H line
    // numbers), so `flatten(zip_with(sequence, counts, array_repeat))` produces the
    // exact sorted multiset — duplicates included — from seven fixed-width native
    // sums. collect_list is a TypedImperativeAggregate: per-row object buffers +
    // per-group serialize outside Tungsten accounting, and at 600M rows on a
    // memory-dense executor (local[32] in 8g = 0.25 GB/core) it heap-OOMs at ANY
    // shuffle partition count — measured at sf100, 479 and 960 partitions both die,
    // while this formulation is one codegen'd HashAggregate with map-side combine
    // and spill-safe fixed-width rows. The bounded-domain assumption is guarded
    // loudly: assert_true on min/max fails the query rather than silently
    // truncating the array if the generator ever emits line numbers outside 1..7.
    // The array FUNCTIONS under demonstration (size / element_at / array_contains /
    // concat_ws) still run on the constructed array; sum_pk is a plain sum (its
    // array detour carried no information).
    "b18_arrays" -> ((s, d) => {
      val cnts = (1 to 7).map(n =>
        sum(when(col("l_linenumber") === n, 1).otherwise(0)).as(s"__c$n"))
      lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(cnts.head, cnts.tail ++ Seq(
          sum("l_partkey").as("sum_pk"),
          min("l_linenumber").as("__mn"), max("l_linenumber").as("__mx")): _*)
        .where(assert_true(coalesce(col("__mn") >= 1 && col("__mx") <= 7, lit(true)),
          lit("l_linenumber outside the bounded domain 1..7 b18 reconstructs from")).isNull)
        .withColumn("lns",
          flatten(zip_with(
            sequence(lit(1), lit(7)),
            array((1 to 7).map(n => col(s"__c$n")): _*),
            (n, c) => array_repeat(n, c.cast("int")))))
        .select(
          col("l_orderkey"),
          size(col("lns")).cast("long").as("n_items"),
          element_at(col("lns"), 1).as("first_ln"),
          array_contains(col("lns"), 3).as("has3"),
          col("sum_pk"),
          concat_ws(",", col("lns")).as("lns_str"))
        .orderBy("l_orderkey")
    }),

    // B19: string/regex functions (reference column-name pairing, HD.py:292-298).
    "b19_strings" -> ((s, d) =>
      part(s, d)
        .select(
          col("p_partkey"),
          upper(element_at(split(col("p_name"), " "), 1)).as("first_word"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy("p_partkey")),

    // B20: math scalar functions (reference formulas: / - sqrt pow, HD.py:63-76).
    "b20_math" -> ((s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          round(pow(lit(1) + col("l_discount"), 2), 6).as("pow_disc"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          abs(round(col("l_tax") - col("l_discount"), 2)).as("tdiff"))
        // rounded doubles sort bit-identically on both engines; rows still tied
        // after all six keys are bytewise identical, so the order is total
        .orderBy("l_orderkey", "l_linenumber", "sqrt_qty", "pow_disc", "ln_price", "tdiff")),

    // B21: timestamp functions (driver `events`/`orders` tables; SURVEY B21).
    "b21_time" -> ((s, d) =>
      orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("tot"))
        .orderBy("mon")),

    // B22: distinct (reference OrderedSet of prefixes, HD.py:315).
    "b22_distinct" -> ((s, d) =>
      orders(s, d)
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")),

    // B23: grouping sets (rollup): per-group, per-flag-subtotal, and grand-total rows
    // in ONE pass — at scale this replaces three separate scans+aggregations with one
    // expand + partial-agg plan. grouping_id disambiguates subtotal levels (packed
    // identically by Spark and DuckDB).
    "b23_rollup" -> ((s, d) =>
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .select("l_returnflag", "l_linestatus", "gid", "cnt", "sum_qty")
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),
  )

  val oracles: Map[String, String] = Map(
    "b01_project" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, l_extendedprice NULLS FIRST",
    "b02_filter" ->
      "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer WHERE c_acctbal > 5000 AND c_mktsegment = 'BUILDING' ORDER BY c_custkey",
    "b03_key_lookup" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey = 42",
    "b04_scalar" ->
      "SELECT max(o_totalprice) AS max_price, min(o_totalprice) AS min_price, count(*) AS n FROM orders",
    "b05_argmax" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 1",
    "b06_semijoin" ->
      "SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40) ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, l_partkey NULLS FIRST",
    "b07_case_expr" ->
      "SELECT l_orderkey, l_linenumber, CASE WHEN l_discount < 0.03 THEN 'low' WHEN l_discount < 0.07 THEN 'mid' ELSE 'high' END AS band FROM lineitem ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, band NULLS FIRST",
    "b08_insert_column" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice, l_extendedprice * (1 - l_discount) AS revenue, l_discount FROM lineitem ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, l_extendedprice NULLS FIRST, l_discount NULLS FIRST",
    "b09_lag" ->
      "SELECT o_custkey, o_orderkey, o_totalprice, o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS delta FROM orders ORDER BY o_custkey, o_orderkey",
    "b10_slice" ->
      "SELECT l_orderkey, l_linenumber, rn FROM (SELECT l_orderkey, l_linenumber, row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn FROM lineitem) WHERE rn % 200 = 1 ORDER BY rn",
    "b11_groupby" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty, round(sum(l_extendedprice), 2) AS sum_price, round(avg(l_discount), 6) AS avg_disc FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "b12_cumsum" ->
      "SELECT o_custkey, o_orderkey, round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum FROM orders ORDER BY o_custkey, o_orderkey",
    "b13_rank" ->
      "SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk",
    "b15_dimjoin" ->
      "SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS acct FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "b16_sort_limit" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10",
    "b17_union" ->
      "SELECT name, acctbal, segment FROM (SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment FROM customer UNION ALL SELECT s_name AS name, s_acctbal AS acctbal, NULL AS segment FROM supplier) ORDER BY name",
    "b18_arrays" ->
      "SELECT l_orderkey, len(lns) AS n_items, lns[1] AS first_ln, list_contains(lns, 3) AS has3, CAST(list_sum(pks) AS BIGINT) AS sum_pk, array_to_string(lns, ',') AS lns_str FROM (SELECT l_orderkey, list_sort(list(l_linenumber)) AS lns, list_sort(list(l_partkey)) AS pks FROM lineitem GROUP BY l_orderkey) ORDER BY l_orderkey",
    "b19_strings" ->
      "SELECT p_partkey, upper(split_part(p_name, ' ', 1)) AS first_word, regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num, length(p_name) AS name_len FROM part ORDER BY p_partkey",
    "b20_math" ->
      "SELECT l_orderkey, l_linenumber, round(sqrt(l_quantity), 6) AS sqrt_qty, round(pow(1 + l_discount, 2), 6) AS pow_disc, round(ln(l_extendedprice), 6) AS ln_price, abs(round(l_tax - l_discount, 2)) AS tdiff FROM lineitem ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, sqrt_qty NULLS FIRST, pow_disc NULLS FIRST, ln_price NULLS FIRST, tdiff NULLS FIRST",
    "b21_time" ->
      "SELECT strftime(o_orderdate, '%Y-%m') AS mon, count(*) AS n, round(sum(o_totalprice), 2) AS tot FROM orders GROUP BY strftime(o_orderdate, '%Y-%m') ORDER BY mon",
    "b22_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY o_orderstatus, o_orderpriority",
    "b23_rollup" ->
      ("SELECT l_returnflag, l_linestatus, CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid, " +
        "count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty FROM lineitem " +
        "GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
  )
}
