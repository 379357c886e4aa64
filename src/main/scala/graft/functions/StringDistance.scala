package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for positional Hamming distance between
  * two strings (the SimHash bit-string verify loop).
  *
  * The composable form — `size(filter(sequence(1, n), j ->
  * substr(a, j, 1) <> substr(b, j, 1)))` — is correct but evaluates a
  * higher-order lambda per position with per-step substring
  * allocation, and Spark's array HOFs are interpreted (CodegenFallback),
  * so the verify loop drops out of whole-stage codegen exactly where
  * the candidate volume concentrates. This expression generates a
  * tight byte-compare loop instead (preference order (b) of the build
  * brief). Positions beyond the shorter input count as differing, so
  * unequal lengths degrade monotonically rather than erroring.
  *
  * Byte-wise compare equals character-wise compare for the ASCII
  * '0'/'1' signatures it serves; for general UTF-8 it is a byte
  * Hamming distance (documented, not a codepoint distance).
  */
case class HammingDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = math.min(x.numBytes(), y.numBytes())
    var d = math.abs(x.numBytes() - y.numBytes())
    var i = 0
    while (i < n) {
      if (x.getByte(i) != y.getByte(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numBytes(), $b.numBytes());
         |int $d = java.lang.Math.abs($a.numBytes() - $b.numBytes());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getByte($i) != $b.getByte($i)) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringDistance {
  val fnName = "graft_hamming"

  /** Idempotently register with the session's function registry (same
    * mechanism — and same re-registration WARN guard — as
    * [[VectorFunctions.register]]). */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        fnName, exprs => HammingDist(exprs(0), exprs(1)), "scala_udf")

  /** Byte-positional Hamming distance of two string columns. Call
    * [[register]] on the session first. */
  def hamming(a: Column, b: Column): Column = call_function(fnName, a, b)
}
