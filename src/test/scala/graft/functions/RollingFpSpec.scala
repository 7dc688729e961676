package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.SparkTestBase.spark

/** rolling_fp must equal the composed SQL formulation (the DuckDB oracle's
  * semantics): min and distinct count of md5(utf8(substr(text, i, 8))) over
  * i in 1..max(len-7, 1) — substr counts CHARACTERS, so multi-byte strings are the
  * interesting case.
  */
class RollingFpSpec extends AnyFunSuite {
  import spark.implicits._

  private def viaSql(texts: Seq[String]): Seq[(String, Long)] = {
    texts.toDF("text").withColumn("r", monotonically_increasing_id())
      .select(col("r"), col("text"),
        explode(when(length(col("text")) >= 8, sequence(lit(1), length(col("text")) - 7))
          .otherwise(array(lit(1)))).as("i"))
      .select(col("r"), md5(expr("substr(text, i, 8)").cast("binary")).as("w"))
      .groupBy("r")
      .agg(min("w").as("fp"), countDistinct("w").cast("long").as("n"))
      .orderBy("r")
      .collect().map(x => (x.getString(1), x.getLong(2))).toSeq
  }

  private def viaNative(texts: Seq[String]): Seq[(String, Long)] = {
    RollingFp.register(spark)
    texts.toDF("text")
      .select(monotonically_increasing_id().as("r"), expr("rolling_fp(text)").as("x"))
      .orderBy("r")
      .collect().map(x => {
        val s = x.getStruct(1); (s.getString(0), s.getLong(1))
      }).toSeq
  }

  test("a 100k-char text (forces the distinct-set to grow past its initial " +
      "capacity) still equals the composed SQL formulation") {
    // > 32,768 distinct windows exceeds the kernel's 2^16 initial table cap,
    // exercising the resize + rehash path the r9 allocation-free rewrite added
    val rnd = new scala.util.Random(42)
    val big = Seq.fill(100000)(('a' + rnd.nextInt(26)).toChar).mkString
    assert(viaNative(Seq(big)) === viaSql(Seq(big)))
  }

  test("equals the composed SQL formulation, including short and multi-byte texts") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", // repeated windows -> distinct < total
      "short", "", "exactly8",
      "ünïcode tëxt with ümlauts and 日本語の文字も含む windows")
    assert(viaNative(texts) === viaSql(texts))
  }

  test("property: agreement on random ascii strings") {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(Gen.listOfN(3, Gen.asciiPrintableStr)) { ts =>
        viaNative(ts) == viaSql(ts)
      })
    assert(res.passed, res.status.toString)
  }

  test("null propagates") {
    RollingFp.register(spark)
    val r = Seq[Option[String]](None).toDF("text").select(expr("rolling_fp(text)")).head()
    assert(r.isNullAt(0))
  }
}
