package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object TokenHash {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** The first 16 bits of md5(utf8(s)) — EXACTLY the value the portable SQL spells as
    * `(strpos(hex,1)-1)*4096 + ... + (strpos(hex,4)-1)` over `md5(s)`'s hex string
    * (first four hex digits = first two digest bytes), so DuckDB oracles reproduce it
    * verbatim while the JVM side skips the hex-string round trip entirely.
    */
  def hash16(s: UTF8String): Int = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff)
  }
}

/** Native Catalyst expression (with codegen) for the SimHash token hash — the brief's
  * preferred extension point: a codegen'd `Expression` stays inside whole-stage
  * codegen where a Scala UDF would break the stage and pay serialization per row.
  * Registered as the SQL function `token_hash16` via [[TokenHash16.register]].
  */
case class TokenHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_hash16"

  override def nullSafeEval(input: Any): Any =
    TokenHash.hash16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHash.hash16($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHash16 =
    copy(child = newChild)
}

object TokenHash16 {
  /** Idempotently register `token_hash16(str)` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("token_hash16"),
      new ExpressionInfo(classOf[TokenHash16].getName, "token_hash16"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "token_hash16 takes one argument")
        TokenHash16(args.head)
      })
}
