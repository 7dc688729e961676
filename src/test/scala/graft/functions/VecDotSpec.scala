package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** vec_dot's contract beyond the happy path the s01–s04 oracles cover: zip_with-style
  * null semantics (length mismatch or a null element yields NULL, never a partial
  * sum) and analysis-time rejection of wrong input types.
  */
class VecDotSpec extends AnyFunSuite {

  private def fa(xs: String*): String =
    xs.map(x => s"CAST($x AS FLOAT)").mkString("array(", ", ", ")")

  private def dotOf(a: String, b: String): Option[Double] = {
    VecDot.register(spark)
    val r = spark.sql(s"SELECT vec_dot($a, $b)").head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("computes the float dot product in double") {
    assert(dotOf(fa("1.0", "2.0", "3.0"), fa("4.0", "5.0", "6.0")) === Some(32.0))
  }

  test("length mismatch yields NULL, not a truncated sum") {
    assert(dotOf(fa("1.0", "2.0"), fa("1.0")) === None)
    assert(dotOf(fa("1.0"), fa("1.0", "2.0")) === None)
  }

  test("a null element yields NULL") {
    assert(dotOf(fa("1.0", "NULL"), fa("1.0", "2.0")) === None)
  }

  test("a null array yields NULL") {
    assert(dotOf(fa("1.0"), "CAST(NULL AS ARRAY<FLOAT>)") === None)
  }

  test("wrong input types fail at analysis time") {
    VecDot.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0D), array(2.0D))").head()
    }
    assert(e.getMessage.contains("vec_dot expects"), e.getMessage)
  }
}
