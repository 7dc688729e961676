package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.SparkTestBase.spark

/** shingle_hashes must equal the SQL formulation it replaced in the restricted
  * Jaccard verify: distinct `xxhash64(concat_ws(' ', slice(split(text, ' '),
  * i, 3)))` over the word-3-gram positions. The SET must match exactly (the
  * verify's counts and intersection joins key on these values); order is the
  * kernel's own first-occurrence contract, so the compare sorts both sides.
  * Empty tokens from consecutive/trailing spaces are part of the contract
  * (split keeps them), as are repeated shingles (dedup) and < 3 tokens
  * (empty array, never null, matching the exploded form's zero rows).
  */
class ShingleHashesSpec extends AnyFunSuite {
  import spark.implicits._

  private def viaSql(texts: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("text").withColumn("r", monotonically_increasing_id())
      .select(col("r"), expr(
        "array_sort(array_distinct(transform(" +
          "CASE WHEN size(split(text, ' ')) >= 3 " +
          "THEN sequence(1, size(split(text, ' ')) - 2) " +
          "ELSE array() END, " +
          "i -> xxhash64(concat_ws(' ', slice(split(text, ' '), i, 3))))))").as("sh"))
      .orderBy("r")
      .collect().map(_.getSeq[Long](1)).toSeq

  private def viaNative(texts: Seq[String]): Seq[Seq[Long]] = {
    ShingleHashes.register(spark)
    texts.toDF("text").withColumn("r", monotonically_increasing_id())
      .select(col("r"), expr("array_sort(shingle_hashes(text))").as("sh"))
      .orderBy("r")
      .collect().map(_.getSeq[Long](1)).toSeq
  }

  test("equals the xxhash64-over-slices formulation, including edge cases") {
    val texts = Seq(
      "the quick brown fox jumps", "one two three",
      "double  space between tokens", "trailing space three tokens ",
      " leading space here", "", "one", "one two",
      "ünïcode tëxt 日本語 mixed ascii",
      "a b a b a b a b", // repeated shingles: dedup to 2 distinct
      "x x x x x x")     // one distinct shingle
    assert(viaNative(texts) === viaSql(texts))
  }

  test("property: agreement on random ascii strings") {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(Gen.listOfN(3, Gen.asciiPrintableStr)) { ts =>
        viaNative(ts) == viaSql(ts)
      })
    assert(res.passed, res.status.toString)
  }
}
