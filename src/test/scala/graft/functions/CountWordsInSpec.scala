package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.SparkTestBase.spark

/** count_words_in must equal the composed form it replaces —
  * `size(filter(split(lower(text), ' '), t -> t = w1 OR ...))` — on every
  * input: empty segments from consecutive/leading/trailing spaces never match,
  * matching is whole-token (no substrings), and lowercasing happens first.
  */
class CountWordsInSpec extends AnyFunSuite {
  import spark.implicits._

  private def both(texts: Seq[String], words: Seq[String]): Seq[(Long, Long)] = {
    CountWordsIn.register(spark)
    texts.toDF("text")
      .select(
        expr(s"count_words_in(text, '${words.mkString(",")}')").as("native"),
        size(filter(split(lower(col("text")), " "),
          t => words.map(w => t === w).reduce(_ || _))).cast("long").as("composed"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("equals the filter/split composition on hand-picked cases") {
    val texts = Seq(
      "", " ", "the", "THE", "the the the", "then the there", "a the a",
      " the  a ", "athe the-a thea", "The A tHe",
      "unicode thé the 中 a", "a" * 300 + " the")
    for ((n, c) <- both(texts, Seq("the", "a"))) assert(n === c)
    for ((n, c) <- both(texts, Seq("la", "el", "de"))) assert(n === c)
  }

  test("equals the composition on 200 random token streams") {
    val tok = Gen.frequency(3 -> Gen.oneOf("the", "a", "of", "and", "la", "el"),
      2 -> Gen.alphaNumStr.map(_.take(6)), 1 -> Gen.const(""), 1 -> Gen.const("THE"))
    val g = Gen.listOf(tok).map(_.mkString(" "))
    val texts = (1 to 200).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i)))
    for ((n, c) <- both(texts, Seq("the", "a"))) assert(n === c)
  }

  test("t01/t08 outputs unchanged by the kernel swap on the real corpus") {
    val d = "/root/testdata/sf0.001"
    CountWordsIn.register(spark)
    val docs = graft.queries.Tables.documents(spark, d)
    val diff = docs.select(
        expr("count_words_in(text, 'the,a')").as("native"),
        size(filter(split(lower(col("text")), " "),
          t => t === "the" || t === "a")).cast("long").as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(diff === 0L)
  }
}
