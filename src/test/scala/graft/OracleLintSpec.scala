package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lints every DuckDB oracle in [[SparkEntry.oracleSql]] for the determinism
  * footguns that have cost correctness rows in past rounds (r4's b18 array
  * ordering, r7's t10 HUGEINT). These are cross-engine hash-compare rules, not
  * style: the driver hashes Spark and DuckDB results cell-by-cell, so any
  * construct whose value or rendered type is engine-arbitrary fails the round
  * even when the answer is "right".
  *
  * Rules (each with the incident that minted it):
  *  1. Integer window sums must be CAST ... AS BIGINT — DuckDB's window
  *     sum(BIGINT) returns HUGEINT, which the driver's hasher renders
  *     differently from Spark's BIGINT even on equal values (t10, round 7).
  *  2. round() must never feed a comparison — a .xx5 boundary is an IEEE coin
  *     flip between engines; thresholds compare unrounded values (d09 rule).
  *  3. list()/array_agg() aggregates must be wrapped in list_sort()/array_sort()
  *     — aggregation order is engine- and partition-arbitrary (b18, round 4).
  *  4. last()/last_value()/first()/first_value() windows are banned outright in
  *     oracles — their pick needs a pinned total order; express the pick as
  *     row_number() = 1 over an explicit full ORDER BY instead (e08 rule).
  */
class OracleLintSpec extends AnyFunSuite {

  private val oracles: Map[String, String] = SparkEntry.oracleSql

  /** Sum arguments that are DOUBLE in the corpus schema — DuckDB keeps double
    * sums (window or grouped) as DOUBLE, so no HUGEINT hazard. */
  private val doubleArgs =
    Set("value", "n.value", "o_totalprice", "l_quantity", "l_extendedprice", "c_acctbal",
      // `ab` is Hierarchy's NodesCte alias for c_acctbal
      "ab")
  // `ns` is INTEGER, but e01/e04/e06 use `sum(ns) OVER ... AS sid` purely as a
  // grouping key that never reaches an output column, so its HUGEINT type is
  // invisible to the hasher. Pin that exemption by alias, not by blanket allow:
  private val groupKeyAliases = Set("sid")

  /** All `sum(<arg>)` / `list_sum(<arg>)` occurrences, window or grouped, with
    * (start index, arg, castWrapped, alias, feedsComparison). DuckDB's sum over
    * any integer type returns HUGEINT in BOTH forms (and list_sum likewise), so
    * the grouped form is exactly as hazardous as the window form round 7 paid
    * for — it was only linted later (round 9) because every grouped oracle
    * happened to cast already.
    */
  private def sums(sql: String): Seq[(Int, String, Boolean, String, Boolean)] = {
    // (?i) throughout: a lint that only catches lowercase SQL is a silent
    // false-negative — the one failure mode this spec cannot afford.
    // \b keeps `list_sum` from double-matching as bare `sum` (underscore is a
    // word char, so there is no boundary before its inner "sum").
    // The argument pattern tolerates TWO levels of paren nesting (e.g.
    // sum(coalesce(nullif(x,0),0))) — one level would silently skip such a
    // sum; the R1 self-test pins the two-level case so the gap stays visible.
    val inner = """[^()]*(?:\([^()]*\)[^()]*)*"""
    // two levels of paren nesting: `inner` wrapped one level deeper — the ONE
    // shared depth definition for the sum argument AND the OVER specs below
    val nested2 = s"""[^()]*(?:\\($inner\\)[^()]*)*"""
    val re = s"""(?i)\\b(?:list_)?sum\\(($nested2)\\)""".r
    re.findAllMatchIn(sql).map { m =>
      val after = sql.substring(m.end)
      val isWindow = after.matches("""(?is)\s+OVER\b.*""")
      val before = sql.substring(math.max(0, m.start - 6), m.start).toUpperCase
      // the OVER-spec patterns share `inner` with the sum-arg pattern, so a
      // future nesting-depth change applies once, not copy by copy (the r9
      // one-level gap was fixed in one copy and initially missed the others)
      val overSpec = s"""\\s+OVER\\s*\\($nested2\\)"""
      val castWrapped = before.endsWith("CAST(") ||
        // CAST(sum(...) OVER (...) AS BIGINT): CAST( may sit further left of
        // nested parens; accept if the text after the window spec is `AS BIGINT)`
        (isWindow && after.matches(s"""(?is)$overSpec\\s+AS\\s+BIGINT\\s*\\).*"""))
      // a sum whose value immediately feeds a comparison (e.g. t09's majority
      // vote `sum(...) >= 0`) never reaches an output column — HUGEINT compares
      // correctly, it only RENDERS differently
      val feedsComparison = !isWindow && after.matches("""(?s)\s*(>=|<=|<>|!=|=|<|>).*""")
      val alias = (if (isWindow)
        s"""(?i)^$overSpec\\s+AS\\s+(\\w+)""".r
      else """(?i)^\s+AS\s+(\w+)""".r)
        .findFirstMatchIn(after).map(_.group(1)).getOrElse("")
      (m.start, m.group(1).trim.toLowerCase, castWrapped, alias.toLowerCase, feedsComparison)
    }.toSeq
  }

  /** An argument that CASTs to double/float anywhere in its expression — e.g.
    * the vector-ops dot products `sum(cast(x as double) * cast(y as double))`
    * — produces a DOUBLE sum; no HUGEINT hazard. */
  private def argIsDouble(arg: String): Boolean =
    doubleArgs.contains(arg) || """(?i)\bas\s+(double|float|real)\b""".r.findFirstIn(arg).isDefined

  private def r1Violations(name: String, sql: String): Seq[String] =
    for {
      (pos, arg, cast, alias, cmp) <- sums(sql)
      if !cast && !cmp && !argIsDouble(arg) && !groupKeyAliases.contains(alias)
    } yield s"$name@$pos: sum($arg) AS $alias"

  test("R1: every integer sum — window OR grouped — is CAST ... AS BIGINT (DuckDB HUGEINT rule)") {
    val bad = oracles.toSeq.flatMap { case (name, sql) => r1Violations(name, sql) }
    assert(bad.isEmpty,
      s"uncast integer sums (DuckDB returns HUGEINT, Spark BIGINT — hash mismatch):\n  ${bad.mkString("\n  ")}")
  }

  test("R1 self-test: an uncast grouped integer sum IS flagged (rule can't rot silently)") {
    val scratch = "SELECT k, sum(l_linenumber) AS s FROM lineitem GROUP BY k"
    assert(r1Violations("scratch", scratch).nonEmpty, "grouped-sum lint lost its teeth")
    // two-level-nested argument: the regex must still see the whole sum
    val nested = "SELECT k, sum(coalesce(nullif(l_linenumber, 0), 0)) AS s FROM lineitem GROUP BY k"
    assert(r1Violations("nested", nested).nonEmpty, "two-level-nested sum slipped past the lint")
    // and the cast / double / comparison forms stay exempt
    assert(r1Violations("s2", "SELECT CAST(sum(l_linenumber) AS BIGINT) AS s FROM lineitem").isEmpty)
    assert(r1Violations("s3", "SELECT sum(value) AS s FROM events").isEmpty)
    assert(r1Violations("s4", "SELECT CASE WHEN sum(bit) >= 0 THEN 1 ELSE 0 END AS s FROM t").isEmpty)
  }

  test("R2: round() never feeds a comparison — thresholds compare unrounded") {
    val cmp = """(?i)round\([^()]*(?:\([^()]*\)[^()]*)*\)\s*(>=|<=|<>|!=|<|>)|(>=|<=|<>|!=|<|>)\s*round\(""".r
    val bad = oracles.toSeq.collect {
      case (name, sql) if cmp.findFirstIn(sql).isDefined => name
    }
    assert(bad.isEmpty, s"round() adjacent to a comparison operator in: ${bad.mkString(", ")}")
  }

  test("R3: list()/array_agg() aggregates are always sort-wrapped") {
    val agg = """(?i)(?<!_)(list|array_agg|collect_list)\(""".r
    // the argument span of the call starting at `open` (index of its '(')
    def argSpan(sql: String, open: Int): String = {
      var depth = 0; var i = open
      while (i < sql.length && (depth > 0 || i == open)) {
        if (sql(i) == '(') depth += 1 else if (sql(i) == ')') depth -= 1
        i += 1
      }
      sql.substring(open + 1, math.max(open + 1, i - 1))
    }
    val bad = for {
      (name, sql) <- oracles.toSeq
      m <- agg.findAllMatchIn(sql)
      // accept a sort wrapper outside, or an in-aggregate ORDER BY (DuckDB's
      // `list(x ORDER BY k)` is deterministic)
      prefix = sql.substring(math.max(0, m.start - 12), m.start).toLowerCase
      if !prefix.endsWith("list_sort(") && !prefix.endsWith("array_sort(") &&
        !argSpan(sql, m.end - 1).toUpperCase.contains(" ORDER BY ")
    } yield s"$name@${m.start}: ${m.group(1)}("
    assert(bad.isEmpty,
      s"unsorted list aggregates (aggregation order is engine-arbitrary):\n  ${bad.mkString("\n  ")}")
  }

  test("R4: no last()/first() window picks in oracles — use row_number over a full ORDER BY") {
    val pick = """(?i)\b(last|first|last_value|first_value|arg_max|arg_min|any_value)\s*\(""".r
    val bad = for {
      (name, sql) <- oracles.toSeq
      m <- pick.findAllMatchIn(sql)
    } yield s"$name@${m.start}: ${m.group(1)}("
    assert(bad.isEmpty,
      s"order-sensitive picks in oracles (engine-arbitrary without a pinned total order):\n  ${bad.mkString("\n  ")}")
  }

  test("the lint walks the full oracle surface") {
    // guards against the spec silently linting an empty map after a refactor
    assert(oracles.size >= 68, s"expected >= 68 oracles, found ${oracles.size}")
  }
}
