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

/** Squared L2 norm — the single-traversal form of `VecDot(x, x)`.
  * Exists because codegen evaluates each child of a BinaryExpression
  * independently: `vec_dot(x, x)` materializes/loads the array twice,
  * while this reads it once. Produced by [[SelfDotToNorm]]. */
case class VecNorm2(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Optimizer rule: `vec_dot(x, x)` → `vec_norm2(x)` when both sides
  * are semantically the same expression — halves array evaluation in
  * every norm computation (used by all cosine queries). Injectable via
  * [[GraftExtensions]] at session build, or added to an existing
  * session through `experimental.extraOptimizations` (what
  * [[VectorFunctions.register]] does, since the driver owns session
  * construction). */
object SelfDotToNorm
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.transformAllExpressions {
      case VecDot(a, b) if a.semanticEquals(b) => VecNorm2(a)
    }
}

/** SparkSessionExtensions entry point for sessions the caller builds:
  * `SparkSession.builder().withExtensions(new GraftExtensions)...`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(VectorFunctions.fnName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VecDot].getName, VectorFunctions.fnName),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(StringDistance.fnName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HammingDist].getName, StringDistance.fnName),
      (exprs: Seq[Expression]) => HammingDist(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => SelfDotToNorm)
  }
}

object VectorFunctions {
  val fnName = "graft_vec_dot"

  /** Idempotently register the expression with the session's function
    * registry (the supported way to reach a custom Expression from the
    * public Column API in Spark 4) and hook [[SelfDotToNorm]] into the
    * session's optimizer. Skips when already registered — re-running
    * createOrReplaceTempFunction is harmless but logs a
    * "replaced a previously registered function" WARN per call, which
    * drowned the round-2 bench tail. */
  def register(spark: SparkSession): Unit = {
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        fnName, exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
    if (!spark.experimental.extraOptimizations.contains(SelfDotToNorm))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SelfDotToNorm
  }

  /** Dot product of two array<double> columns via the native expression.
    * Call [[register]] on the session first. */
  def vecDot(a: Column, b: Column): Column = call_function(fnName, a, b)
}
