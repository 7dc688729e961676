package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.SparkTestBase.spark

/** simhash64 must equal the aggregation formulation it replaced (explode tokens →
  * token_hash16(t, b) → 64 ±1 vote sums → sign bits), which is what the d06/d07
  * DuckDB oracles spell in SQL. Empty tokens from consecutive/trailing spaces are
  * part of the contract (split keeps them), so those are tested explicitly.
  */
class SimHash64Spec extends AnyFunSuite {
  import spark.implicits._

  private def viaAgg(texts: Seq[String]): Seq[(Long, Long, Long, Long)] = {
    TokenHash16.register(spark)
    val votes = for (b <- 0 to 3; j <- 0 to 15) yield
      sum(when(expr(s"shiftright(v$b, $j) & 1") === 1, 1).otherwise(-1)).as(s"vote_${b}_$j")
    val bandSigs = (0 to 3).map(b =>
      (0 to 15).map(j => when(col(s"vote_${b}_$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as(s"s$b"))
    texts.toDF("text").withColumn("r", monotonically_increasing_id())
      .select(col("r"), explode(split(lower(col("text")), " ")).as("t"))
      .select(col("r") +: (0 to 3).map(b => expr(s"token_hash16(t, $b)").as(s"v$b")): _*)
      .groupBy("r").agg(votes.head, votes.tail: _*)
      .select(col("r") +: bandSigs: _*)
      .orderBy("r")
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toSeq
  }

  private def viaNative(texts: Seq[String]): Seq[(Long, Long, Long, Long)] = {
    SimHash64.register(spark)
    texts.toDF("text")
      .select(monotonically_increasing_id().as("r"), expr("simhash64(lower(text))").as("x"))
      .orderBy("r")
      .collect().map(x => {
        val s = x.getStruct(1); (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
      }).toSeq
  }

  test("equals the vote-aggregation formulation, including empty-token edge cases") {
    val texts = Seq(
      "the quick brown fox", "single",
      "double  space", "trailing space ", " leading",
      "", "ünïcode tëxt 日本語",
      "a a a b") // repeated tokens: the vote is over the MULTISET
    assert(viaNative(texts) === viaAgg(texts))
  }

  test("property: agreement on random ascii strings") {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(Gen.listOfN(3, Gen.asciiPrintableStr)) { ts =>
        viaNative(ts) == viaAgg(ts)
      })
    assert(res.passed, res.status.toString)
  }
}
