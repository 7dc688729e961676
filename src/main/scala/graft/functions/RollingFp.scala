package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[RollingFp]]: one pass over the text computing, for every 8-CHARACTER
  * sliding window, md5 of the window's UTF-8 bytes — value-identical to the SQL
  * `md5(cast(substr(text, i, 8) as binary))` for i in 1..max(len-7, 1) (substr
  * counts characters, so a char→byte offset table is built once instead of
  * re-scanning per window) — and returning (min hex, distinct count).
  */
object RollingFpKernel {
  private val hexChars = "0123456789abcdef".toCharArray

  def eval(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    // char -> byte offset table (UTF-8 aware; one scan)
    val nBytes = bytes.length
    var nChars = 0
    var off = 0
    val offsets = new Array[Int](nBytes + 1)
    while (off < nBytes) {
      offsets(nChars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    offsets(nChars) = nBytes
    val wins = math.max(nChars - 7, 1)
    val md = TokenHash.digest()
    var minHex: String = null
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < wins) {
      val from = offsets(math.min(i, nChars))
      val to = offsets(math.min(i + 8, nChars))
      md.reset()
      md.update(bytes, from, to - from)
      val d = md.digest()
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = hexChars((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = hexChars(d(j) & 0xf)
        j += 1
      }
      val h = new String(hex)
      if (minHex == null || h.compareTo(minHex) < 0) minHex = h
      seen.add(h)
      i += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(minHex), seen.size.toLong))
  }
}

/** `rolling_fp(text)` → struct(fp string, n_windows bigint): the winnowing-family
  * rolling fingerprint as ONE codegen'd scan-local expression. The composed
  * formulations both lose: explode + groupBy shuffles ~corpus-bytes of window
  * hashes through a hash aggregation, and transform + array_min/array_distinct
  * stays shuffle-free but pays an interpreted lambda call and a materialized
  * 32-byte-hex array element per window. This is a tight per-row loop — no
  * shuffle, no lambdas, no intermediate array.
  */
case class RollingFp(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_fp expects string, got ${child.dataType.sql}")
  override def dataType: DataType = StructType(Seq(
    StructField("fp", StringType, nullable = false),
    StructField("n_windows", LongType, nullable = false)))
  override def prettyName: String = "rolling_fp"

  override def nullSafeEval(input: Any): Any =
    RollingFpKernel.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingFpKernel.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(child = newChild)
}

object RollingFp {
  /** Idempotently register `rolling_fp(text)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("rolling_fp"),
      new ExpressionInfo(classOf[RollingFp].getName, "rolling_fp"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "rolling_fp takes one argument")
        RollingFp(args.head)
      })
}
