package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.SparkTestBase.spark

/** normalize_text must equal the composed form it replaces —
  * `lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))` — on every input,
  * including multibyte text (the regex strips per CHARACTER, the kernel per
  * byte; a multibyte char's bytes all have the high bit set, so both remove
  * exactly the same characters).
  */
class NormalizeTextSpec extends AnyFunSuite {
  import spark.implicits._

  private def both(texts: Seq[String]): Seq[(String, String)] = {
    NormalizeText.register(spark)
    texts.toDF("text")
      .select(
        expr("normalize_text(text)").as("native"),
        lower(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")).as("composed"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("equals lower(regexp_replace) on hand-picked cases") {
    val cases = Seq(
      "", " ", "abc", "ABC", "MiXeD CaSe 123",
      "punct!@#$%^&*()_+-=[]{};':\",./<>?`~",
      "The Quick, Brown Fox! Jumps Over The Lazy Dog.",
      "tabs\tand\nnewlines\r",
      "digits 0123456789 keep",
      "unicode: café naïve Über 你好 😀 end",
      "a" * 1000 + "!" * 1000)
    for ((n, c) <- both(cases)) assert(n === c)
  }

  test("equals lower(regexp_replace) on 200 random ASCII+unicode strings") {
    val g = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 3 -> Gen.asciiPrintableChar,
      1 -> Gen.oneOf('é', 'Ä', '中', ' ', '\t')))
      .map(_.mkString)
    val texts = (1 to 200).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i)))
    for ((n, c) <- both(texts)) assert(n === c)
  }

  test("t03 output is unchanged by the kernel swap (fingerprint equality)") {
    val d = "/root/testdata/sf0.001"
    NormalizeText.register(spark)
    val docs = graft.queries.Tables.documents(spark, d)
    val diff = docs.select(
        md5(expr("normalize_text(text)").cast("binary")).as("a"),
        md5(lower(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")).cast("binary")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0L)
  }
}
