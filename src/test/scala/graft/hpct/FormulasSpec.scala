package graft.hpct

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** Unit + property tests for the formula-DSL compiler (reference HD.py:63-76: the
  * `$N`-arithmetic embedded in MetricFormula attributes). ScalaCheck is driven
  * directly (build.sbt has no scalatestplus bridge, offline resolution).
  */
class FormulasSpec extends AnyFunSuite {

  private def check(prop: Prop, minSuccessful: Int = 40): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }
  import Formulas._

  test("parses the fixture formulas into the expected ASTs") {
    // experiment1.xml:250
    assert(parse("$3 / $4") === Bin('/', Ref(3), Ref(4)))
    // experiment1.xml:260
    assert(parse("sqrt(($6 / $7) - pow($5 / $7, 2))") ===
      Call("sqrt", List(Bin('-',
        Bin('/', Ref(6), Ref(7)),
        Call("pow", List(Bin('/', Ref(5), Ref(7)), Num(2.0)))))))
    assert(parse("min($5, $6)") === Call("min", List(Ref(5), Ref(6))))
    assert(parse("-$3 + 2e-1") === Bin('+', Neg(Ref(3)), Num(0.2)))
  }

  test("rejects malformed formulas") {
    intercept[IllegalArgumentException](parse("$"))
    intercept[IllegalArgumentException](parse("sqrt"))
    intercept[IllegalArgumentException](parse("(1 + 2"))
    intercept[IllegalArgumentException](parse("1 ^ 2"))
  }

  test("canGoComplex only when sqrt is present") {
    assert(canGoComplex(parse("sqrt($6)")))
    assert(canGoComplex(parse("1 + sqrt($6) * 2")))
    assert(!canGoComplex(parse("$3 / $4")))
    assert(!canGoComplex(parse("pow($5, 2)")))
  }

  test("compiled columns match a direct evaluator on the fixture formulas") {
    val df = spark.createDataFrame(Seq((16.0, 4.0, 2.0))).toDF("m5", "m6", "m7")
    val ref: Int => org.apache.spark.sql.Column =
      n => col(s"m$n")
    val cx = compile(parse("sqrt(($6 / $7) - pow($5 / $7, 2))"), ref)
    val row = df.select(cx.re.as("re"), cx.im.getOrElse(lit(0.0)).as("im")).head()
    // (4/2) - (16/2)^2 = 2 - 64 = -62 -> sqrt(-62) = 0 + 7.874...i
    assert(row.getDouble(0) === 0.0)
    assert(math.abs(row.getDouble(1) - math.sqrt(62.0)) < 1e-12)
  }

  test("complex sqrt keeps nulls null (absent metrics stay absent)") {
    val df = spark.createDataFrame(Seq((Some(4.0), 1), (None: Option[Double], 2)))
      .toDF("m1", "k")
    val cx = compile(parse("sqrt($1)"), _ => col("m1"))
    val rows = df.select(col("k"), cx.re.as("re")).orderBy("k").collect()
    assert(rows(0).getDouble(1) === 2.0)
    assert(rows(1).isNullAt(1))
  }

  /** Property: on positive inputs (no complex branch), the compiled Column agrees
    * with a driver-side reference evaluator for randomly generated ASTs.
    */
  test("property: compiled plan equals direct evaluation on random real formulas") {
    val leaf: Gen[Expr] = Gen.oneOf(
      Gen.choose(1, 3).map(Ref),
      Gen.choose(0.5, 9.5).map(Num))
    def expr(depth: Int): Gen[Expr] =
      if (depth == 0) leaf
      else Gen.frequency(
        3 -> leaf,
        2 -> (for { op <- Gen.oneOf('+', '-', '*', '/'); l <- expr(depth - 1); r <- expr(depth - 1) } yield Bin(op, l, r)),
        1 -> (for { l <- expr(depth - 1); r <- expr(depth - 1) } yield Call("max", List(l, r))))

    // Mirrors the engine's documented zero-divisor policy: x / 0 is NULL (None), and
    // NULL propagates through every operation — see Formulas.safeDiv.
    def eval(e: Expr, m: Map[Int, Double]): Option[Double] = e match {
      case Num(v) => Some(v)
      case Ref(n) => Some(m(n))
      case Neg(x) => eval(x, m).map(-_)
      case Bin('+', l, r) => for (a <- eval(l, m); b <- eval(r, m)) yield a + b
      case Bin('-', l, r) => for (a <- eval(l, m); b <- eval(r, m)) yield a - b
      case Bin('*', l, r) => for (a <- eval(l, m); b <- eval(r, m)) yield a * b
      case Bin('/', l, r) =>
        for (a <- eval(l, m); b <- eval(r, m); if b != 0.0) yield a / b
      case Call("max", List(l, r)) =>
        for (a <- eval(l, m); b <- eval(r, m)) yield math.max(a, b)
      case other => fail(s"unexpected $other")
    }

    val metrics = Map(1 -> 3.5, 2 -> 0.25, 3 -> 11.0)
    val df = spark.createDataFrame(Seq((3.5, 0.25, 11.0))).toDF("m1", "m2", "m3")
    check(Prop.forAll(expr(3)) { e =>
      val cx = compile(e, n => col(s"m$n"))
      val row = df.select(cx.re.cast("double")).head()
      val got = if (row.isNullAt(0)) None else Some(row.getDouble(0))
      val want = eval(e, metrics)
      (got, want) match {
        case (None, None) => true
        case (Some(g), Some(w)) =>
          (g.isNaN && w.isNaN) || g.isInfinite == w.isInfinite &&
            (g == w || math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w)))
        case _ => false
      }
    })
  }
}
