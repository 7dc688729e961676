package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Shared kernel: sequential multiply-add over two float arrays, each element cast to
  * double BEFORE the multiply — bit-identical to the declarative
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)), 0.0, _ + _)`
  * it replaces, and to the DuckDB oracles' positional `unnest` + `sum` (DuckDB sums
  * the flat per-row products in list order). Keeping the fold order identical is what
  * lets the oracle hash-compare stay exact.
  */
object VecDotKernel {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** Native Catalyst expression (with codegen) for the float-array dot product — the
  * hot kernel of every cosine in VectorOps (s01/s02/s03/d08). The declarative
  * `zip_with` + `aggregate` formulation it replaces runs as interpreted higher-order
  * lambdas OUTSIDE whole-stage codegen (the round-3 bench's s01 cost); this stays
  * inside the stage: one virtual call into a tight primitive loop, no per-element
  * closure invocation, no intermediate zipped array.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDotKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDotKernel.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Idempotently register `vec_dot(array<float>, array<float>)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot takes two arguments")
        VecDot(args.head, args(1))
      })
}
