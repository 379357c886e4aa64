package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the similarity-search hot loop.
  *
  * `zip_with` + `aggregate` express a dot product correctly but
  * allocate an intermediate array and evaluate a lambda per element;
  * this expression generates a tight primitive loop instead
  * (preference order (b) from the build brief: custom `Expression`
  * over UDF). Falls back to an interpreted path when codegen is off.
  *
  * Inputs must be `array<double>` (cast at the call site); element
  * nulls are not expected in embedding data and read as 0-filled
  * primitive slots, matching `ArrayData.toDoubleArray` semantics.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  val fnName = "graft_vec_dot"

  /** Idempotently register the expression with the session's function
    * registry (the supported way to reach a custom Expression from the
    * public Column API in Spark 4). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => VecDot(exprs(0), exprs(1)), "scala_udf")

  /** Dot product of two array<double> columns via the native expression.
    * Call [[register]] on the session first. */
  def vecDot(a: Column, b: Column): Column = call_function(fnName, a, b)
}
