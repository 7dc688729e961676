package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.SparkTestBase.spark

/** bigram_stats must equal the explode + (doc,bigram) count + window
  * formulation it replaces (TextOps.repetitionViaExplode) on every input —
  * including the cases where the two could plausibly diverge: count ties (the
  * lexicographic tie-break must use Spark's UTF8String binary order), empty
  * tokens from leading/trailing/consecutive spaces (split keeps them), docs
  * with < 2 tokens (no bigrams -> no output row), and multibyte text.
  */
class BigramStatsSpec extends AnyFunSuite {
  import spark.implicits._

  private def viaKernel(docs: DataFrame): DataFrame = {
    BigramStats.register(spark)
    docs
      .filter(col("text").contains(" ")) // mirror the t10 query's cheap pre-filter
      .select(col("doc_id"), expr("bigram_stats(text)").as("b"))
      .select(col("doc_id"), col("b.n_bigrams").as("n_bigrams"),
        col("b.top_bigram").as("top_bigram"), col("b.top_n").as("top_n"),
        (round(col("b.top_n").cast("double") / col("b.n_bigrams"), 6) + lit(0.0))
          .as("rep_ratio"))
      .orderBy("doc_id")
  }

  private def rows(df: DataFrame): Seq[(Long, Long, String, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4))).toSeq

  private def check(texts: Seq[String]): Unit = {
    val docs = spark.sparkContext
      .parallelize(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    assert(rows(viaKernel(docs)) === rows(graft.queries.TextOps.repetitionViaExplode(docs)))
  }

  test("equals the explode+window formulation on hand-picked cases") {
    check(Seq(
      "", " ", "  ", "one", "one two", "one two one two one",
      // tie between "a b" and "b a" (each twice): smallest bigram wins
      "a b a b a",
      // ties among equal counts across distinct bigrams
      "x y z x y z",
      // empty tokens: leading/trailing/consecutive spaces
      " lead", "trail ", "a  b", "  double  lead",
      // repetition-heavy (the signal t10 exists for)
      ("spam ham " * 50).trim,
      // multibyte: tie-break must follow UTF8String byte order, not UTF-16
      "né né 你好 你好 σ π", "😀 a 😀 a 😀",
      "punct, stays! in? tokens."))
  }

  test("equals the explode+window formulation on 150 random token streams") {
    val tok = Gen.frequency(
      6 -> Gen.oneOf("a", "b", "ab", "the", "x1"),
      2 -> Gen.oneOf("né", "你", "σπ", "😀"),
      1 -> Gen.const("")) // empty token = consecutive spaces in the joined text
    val g = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, tok)).map(_.mkString(" "))
    val texts = (1 to 150).flatMap(i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i)))
    check(texts)
  }

  test("t10 output is unchanged by the kernel swap on the real corpus") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    assert(rows(viaKernel(docs)) === rows(graft.queries.TextOps.repetitionViaExplode(docs)))
  }
}
