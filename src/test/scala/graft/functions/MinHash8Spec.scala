package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.SparkTestBase.spark

/** minhash8 must equal the aggregation formulation it replaced — min over shingle
  * rows of md5(j || '|' || shingle), shingle = three consecutive space-split tokens
  * joined by ' ' — and yield NULL exactly when the doc has < 3 tokens (no shingle
  * rows → no group).
  */
class MinHash8Spec extends AnyFunSuite {
  import spark.implicits._

  private def viaAgg(texts: Seq[String]): Map[Long, Seq[String]] = {
    val mins = (0 to 7).map(j =>
      min(md5(concat(lit(j.toString), lit("|"), col("shingle")).cast("binary"))).as(s"mh$j"))
    texts.toDF("text").withColumn("r", monotonically_increasing_id())
      .select(col("r"), split(col("text"), " ").as("tk"))
      .select(col("r"), col("tk"),
        explode(when(size(col("tk")) >= 3, sequence(lit(1), size(col("tk")) - 2))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("r"), concat_ws(" ", slice(col("tk"), col("i"), lit(3))).as("shingle"))
      .groupBy("r").agg(mins.head, mins.tail: _*)
      .collect().map(x => x.getLong(0) -> (1 to 8).map(x.getString).toSeq).toMap
  }

  private def viaNative(texts: Seq[String]): Map[Long, Seq[String]] = {
    MinHash8.register(spark)
    texts.toDF("text")
      .select(monotonically_increasing_id().as("r"), expr("minhash8(text)").as("m"))
      .filter(col("m").isNotNull)
      .collect().map(x => {
        val s = x.getStruct(1); x.getLong(0) -> (0 to 7).map(s.getString).toSeq
      }).toMap
  }

  test("equals the shingle-aggregation formulation; < 3 tokens -> NULL") {
    val texts = Seq(
      "the quick brown fox jumps", "a b c",
      "two tokens", "one", "", // < 3 tokens: absent from both
      "double  space here ok", // empty token participates in shingles
      "ünïcode tëxt with 日本語 chars")
    val native = viaNative(texts)
    val agg = viaAgg(texts)
    assert(native === agg)
    assert(!native.contains(2L) && !native.contains(3L) && !native.contains(4L))
  }

  test("property: agreement on random ascii strings") {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(Gen.listOfN(3, Gen.asciiPrintableStr)) { ts =>
        viaNative(ts) == viaAgg(ts)
      })
    assert(res.passed, res.status.toString)
  }
}
