package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.SparkTestBase.spark

/** token_counts must equal the composed form it replaces —
  * `size(split(text, ' '))` and
  * `size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))` —
  * on every input. Multibyte and supplementary-plane chars are the interesting
  * cases: java.util.regex classes match per code POINT, so the kernel steps
  * whole UTF-8 sequences.
  */
class TokenCountsSpec extends AnyFunSuite {
  import spark.implicits._

  private def both(texts: Seq[String]): Seq[((Long, Long), (Long, Long))] = {
    TokenCounts.register(spark)
    texts.toDF("text")
      .select(
        expr("token_counts(text)").as("tc"),
        size(split(col("text"), " ")).cast("long").as("ws"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("bpe"))
      .collect().map { r =>
        val s = r.getStruct(0)
        ((s.getLong(0), s.getLong(1)), (r.getLong(1), r.getLong(2)))
      }.toSeq
  }

  test("equals split/regexp_extract_all on hand-picked cases") {
    val cases = Seq(
      "", " ", "  ", "abc", "ABC def", "a1b2", "123 456",
      "runs:: of!! punct??", "trailing space ", " leading",
      "mixed 12ab34 runs-and-breaks.",
      "unicode café 你好 Σπ 😀😀 end", "😀a😀1😀",
      "tabs\tcount as\tsingles", "a" * 500 + " " + "9" * 500)
    for ((native, composed) <- both(cases)) assert(native === composed)
  }

  test("equals split/regexp_extract_all on 200 random strings") {
    // BMP chars only: a lone surrogate would be an invalid string, and emoji
    // (full surrogate pairs) are pinned by the hand-picked cases above
    val g = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 3 -> Gen.asciiPrintableChar,
      1 -> Gen.oneOf('é', 'Ä', '中', 'Σ', ' ')))
      .map(_.mkString)
    val texts = (1 to 200).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i)))
    for ((native, composed) <- both(texts)) assert(native === composed)
  }

  test("t04 output is unchanged by the kernel swap on the real corpus") {
    val d = "/root/testdata/sf0.001"
    TokenCounts.register(spark)
    val docs = graft.queries.Tables.documents(spark, d)
    val diff = docs.select(
        expr("token_counts(text)").as("tc"),
        size(split(col("text"), " ")).cast("long").as("ws"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("bpe"))
      .filter(col("tc.n_ws") =!= col("ws") || col("tc.n_bpe") =!= col("bpe"))
      .count()
    assert(diff === 0L)
  }
}
