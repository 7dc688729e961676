package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** The native expression must equal the portable hex-digit SQL formulation (which the
  * DuckDB oracles use) for any string, in both codegen and interpreted paths.
  */
class TokenHash16Spec extends AnyFunSuite {
  import spark.implicits._

  private def viaSql(tokens: Seq[String], band: Int = 0): Seq[Int] = {
    val o = 4 * band
    val df = tokens.toDF("t")
      .withColumn("h", md5(col("t").cast("binary")))
      .select(((expr(s"instr('0123456789abcdef', substr(h,${o + 1},1))") - 1) * 4096 +
        (expr(s"instr('0123456789abcdef', substr(h,${o + 2},1))") - 1) * 256 +
        (expr(s"instr('0123456789abcdef', substr(h,${o + 3},1))") - 1) * 16 +
        (expr(s"instr('0123456789abcdef', substr(h,${o + 4},1))") - 1)).cast("int"))
    df.collect().map(_.getInt(0)).toSeq
  }

  test("token_hash16 equals the hex-digit md5 arithmetic on sample strings") {
    TokenHash16.register(spark)
    val tokens = Seq("", "a", "hello", "ünïcode", "the quick brown fox", "123", "\t")
    val native = tokens.toDF("t").select(expr("token_hash16(t)")).collect().map(_.getInt(0)).toSeq
    assert(native === viaSql(tokens))
    assert(native.forall(v => v >= 0 && v < 65536))
  }

  test("token_hash16(t, band) covers all four 16-bit chunks of the 64-bit hash") {
    TokenHash16.register(spark)
    val tokens = Seq("", "a", "hello", "ünïcode", "the quick brown fox", "123", "\t")
    for (b <- 0 to 3) {
      val native = tokens.toDF("t").select(expr(s"token_hash16(t, $b)"))
        .collect().map(_.getInt(0)).toSeq
      assert(native === viaSql(tokens, b), s"band $b")
      assert(native.forall(v => v >= 0 && v < 65536))
    }
  }

  test("property: agreement on random strings (driver kernel vs SQL formulation)") {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30),
      Prop.forAll(Gen.listOfN(5, Gen.asciiPrintableStr)) { ts =>
        val kernel = ts.map(t => TokenHash.hash16(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)))
        kernel == viaSql(ts)
      })
    assert(res.passed, res.status.toString)
  }

  test("null propagates") {
    TokenHash16.register(spark)
    val r = Seq[Option[String]](None).toDF("t").select(expr("token_hash16(t)")).head()
    assert(r.isNullAt(0))
  }
}
