package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import SparkTestBase.spark

/** The driver compares query output to the DuckDB oracle POSITIONALLY, so every
  * oracle's final ORDER BY must be TOTAL: the sort keys must determine every
  * projected column, or two correct engines can emit tied rows in different
  * orders and hash-mismatch. That property is corpus-dependent — round 10's sf1
  * cross-check found five lineitem queries whose (l_orderkey, l_linenumber)
  * sort had been passing at sf0.01 purely on stable-scan-order luck, because
  * ~20% of synthetic lineitem rows share that pair (it is NOT a key of this
  * data, unlike real TPC-H) and a join's reordering broke the luck at sf1.
  *
  * This spec re-derives the property structurally for EVERY registered oracle:
  * it parses the final top-level ORDER BY out of the oracle SQL, resolves the
  * keys against the Spark result's schema, and asserts that grouping the
  * sf0.01 result by those keys leaves no group with two distinct full rows
  * (tied rows must be bytewise identical, hence interchangeable). Queries with
  * no final ORDER BY must be single-row. Complements OrderDeterminismSpec,
  * which perturbs the physical plan but cannot see tie-order luck that two
  * Spark runs share; this spec attacks the tie structure itself, so a new
  * query — or a driver testdata refresh that introduces duplicate keys — that
  * breaks totality fails here before it can flip a CORRECTNESS row.
  */
class TotalOrderSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  /** Final top-level ORDER BY keys of `sql`, or None when the query has none.
    * Handles a trailing LIMIT, direction/null-order suffixes, and
    * table-qualified names; any key this can't reduce to a plain identifier
    * fails the suite loudly (extend the parser, don't skip the query).
    */
  private def finalOrderKeys(name: String, sql: String): Option[Seq[String]] = {
    val noLimit = "(?is)\\s+LIMIT\\s+\\d+\\s*$".r.replaceAllIn(sql.trim, "")
    val idx = noLimit.toUpperCase.lastIndexOf("ORDER BY")
    if (idx < 0) return None
    // a FINAL ORDER BY reaches end-of-string without ever closing a paren it
    // didn't open; hitting an unbalanced `)` means the last ORDER BY lives in
    // a subquery/CTE (e.g. t06's top-64 CTE) and the outer query sorts nothing
    // — report None so the single-row check below applies instead
    val tail = noLimit.substring(idx + "ORDER BY".length)
    var depth = 0
    tail.foreach { c =>
      if (c == '(') depth += 1
      if (c == ')') depth -= 1
      if (depth < 0) return None
    }
    val keys = tail.split(",").map { raw =>
      var k = raw.trim
      var changed = true
      while (changed) {
        val k2 = "(?is)\\s+(ASC|DESC|NULLS\\s+FIRST|NULLS\\s+LAST)\\s*$".r
          .replaceAllIn(k, "").trim
        changed = k2 != k; k = k2
      }
      k.substring(k.lastIndexOf('.') + 1)
    }.toSeq
    keys.foreach { k =>
      assert(k.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"$name: ORDER BY key '$k' is not a plain column — extend TotalOrderSpec's parser")
    }
    Some(keys)
  }

  test("every oracle's final ORDER BY totally determines the projected row (sf0.01)") {
    val s = spark
    val failures = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      val df = SparkEntry.queries(name)(s, dir)
      finalOrderKeys(name, sql) match {
        case None =>
          // no positional contract to check beyond "there is only one row"
          val n = df.count()
          if (n > 1) Some(s"$name: no final ORDER BY but $n rows") else None
        case Some(keys) =>
          val cols = df.columns
          val resolved = keys.map { k =>
            cols.find(_.equalsIgnoreCase(k)).getOrElse {
              fail(s"$name: ORDER BY key '$k' not in output columns ${cols.mkString(",")}")
            }
          }
          // a group of tied sort keys holding >1 distinct full row = ambiguity
          val ambiguous = df
            .groupBy(resolved.map(col): _*)
            .agg(countDistinct(xxhash64(cols.map(col): _*)).as("__d"))
            .filter(col("__d") > 1)
            .count()
          if (ambiguous > 0)
            Some(s"$name: $ambiguous sort-key groups hold non-identical rows " +
              s"(keys: ${resolved.mkString(", ")})")
          else None
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
