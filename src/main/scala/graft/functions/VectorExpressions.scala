package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression tier (task brief preference order (b)):
  * `array<float>` dot product with whole-stage codegen.
  *
  * The `functions.aggregate(zip_with(...))` formulation used elsewhere is a
  * higher-order function — Catalyst evaluates HOF lambdas interpreted
  * (CodegenFallback-like), ~20µs per evaluation at dim=64. This expression
  * generates a tight primitive loop over the two `ArrayData` buffers inside
  * WholeStageCodegen instead. Math is bit-identical to the HOF version:
  * left-to-right double accumulation of `(double)a[i] * (double)b[i]`.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckSuccess
      case _ => TypeCheckFailure(
        s"vec_dot expects two array<float> args, got ${left.dataType} / ${right.dataType}")
    }
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column builder for the native dot product. */
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Register `vec_dot` for SQL use in a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs.head, exprs(1)), "built-in")
}
