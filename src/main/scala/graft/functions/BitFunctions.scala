package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Morton (z-order) interleave of the low `bits` bits of two long
  * coordinates: left's bit i lands at position 2i+1, right's at 2i —
  * the multi-dimensional clustering key behind OPTIMIZE ZORDER.
  *
  * The `aggregate(sequence(0, bits-1), ...)` higher-order-function
  * formulation is correct but materializes an index array and invokes
  * a lambda per bit; this expression generates one tight primitive
  * loop (build-brief preference (b): custom codegen'd `Expression`
  * over UDF) — it runs per ROW of a 100 TB layout pass, which is what
  * justifies a native form. Interpreted fallback matches codegen
  * bit-for-bit (`BitFunctionsSpec`).
  */
case class MortonInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 32, s"bits must be in [1, 32], got $bits")
  override def dataType: DataType = LongType

  // Number, not Long: SQL integer literals reach the interpreted path
  // (constant folding) as java.lang.Integer — codegen promotes int
  // seamlessly, and the two paths must agree (registration also casts
  // children to LongType, making this a second line of defense)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Number].longValue
    val y = b.asInstanceOf[Number].longValue
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i + 1)
      z |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val z = ctx.freshName("z")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i + 1);
         |  $z |= (($b >> $i) & 1L) << (2 * $i);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitFunctions {
  val mortonName = "graft_morton"

  /** Build [[MortonInterleave]] from SQL-call arguments with REAL
    * argument validation (round-9 ADVICE): a wrong arity, a
    * non-constant `bits`, or an out-of-range value fails at analysis
    * time with a usage message instead of a bare ClassCastException /
    * IndexOutOfBounds. Any FOLDABLE integral expression is accepted —
    * `8`, `CAST(8 AS BIGINT)`, `4 + 4` all work (the builder runs
    * before constant folding, so it folds the argument itself rather
    * than demanding a bare `Literal`). */
  private[graft] def mortonBuilder(exprs: Seq[Expression]): Expression = {
    def fail(detail: String): Nothing = throw new IllegalArgumentException(
      s"$mortonName(x BIGINT, y BIGINT, bits INTEGER_LITERAL in [1, 32]): $detail")
    if (exprs.length != 3)
      fail(s"expected 3 arguments, got ${exprs.length}")
    val e = exprs(2)
    // foldable first: dataType on an unresolved attribute would throw
    val bits =
      if (e.foldable &&
          Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType))
        e.eval(null) match {
          // range-check the LONG value: intValue() would truncate an
          // out-of-range BIGINT (2^32+8 -> 8) into silent acceptance
          case n: Number => n.longValue()
          case _ => fail("the bits argument evaluated to NULL")
        }
      else fail(s"the bits argument must be an integer constant, got $e")
    if (bits < 1L || bits > 32L) fail(s"bits must be in [1, 32], got $bits")
    MortonInterleave(Cast(exprs(0), LongType), Cast(exprs(1), LongType),
      bits.toInt)
  }

  /** Idempotently register [[MortonInterleave]] with the session
    * function registry (same scheme + WARN-avoidance rationale as
    * [[VectorFunctions.register]]). */
  def register(spark: SparkSession): Unit = {
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(mortonName)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        mortonName, mortonBuilder, "scala_udf")
  }

  /** Morton-interleave two long columns' low `bits` bits. Call
    * [[register]] on the session first. */
  def morton(a: Column, b: Column, bits: Int): Column =
    call_function(mortonName, a, b, lit(bits))
}
