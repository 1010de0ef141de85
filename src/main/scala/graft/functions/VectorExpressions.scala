package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression tier (task brief preference order (b)):
  * vector dot product with whole-stage codegen.
  *
  * The `functions.aggregate(zip_with(...))` formulation this replaces is a
  * higher-order function — Catalyst evaluates HOF lambdas interpreted
  * (CodegenFallback-like), ~20µs per evaluation at dim=64. This expression
  * generates a tight primitive loop over the two `ArrayData` buffers inside
  * WholeStageCodegen instead.
  *
  * Exact semantics (deliberate, and slightly different from the HOF chain —
  * see VectorExprSpec):
  *  - elements are read as float or double per the child array type and
  *    multiplied in DOUBLE, accumulated left-to-right in double (the HOF
  *    version multiplies float×float in float first — strictly less precise);
  *  - length mismatch → dot product over the common prefix (the HOF `zip_with`
  *    would null-pad; callers here always pass equal-dim vectors, and prefix
  *    semantics avoid a per-row length branch);
  *  - a null array OR a null element (when the array type allows them)
  *    → null result, matching SQL null propagation.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckSuccess
    else TypeCheckFailure(
      s"vec_dot expects two array<float|double> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkX = elemNullable(left); val checkY = elemNullable(right)
    val xd = isDouble(left); val yd = isDouble(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if ((checkX && x.isNullAt(i)) || (checkY && y.isNullAt(i))) return null
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getX = if (isDouble(left)) s"$x.getDouble($i)" else s"(double) $x.getFloat($i)"
      val getY = if (isDouble(right)) s"$y.getDouble($i)" else s"(double) $y.getFloat($i)"
      // per-element null checks only when the array type admits null slots
      // (nullable is then true, so ev.isNull is a real variable)
      val nullCheck = (elemNullable(left), elemNullable(right)) match {
        case (true, true)   => s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        case (true, false)  => s"if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }"
        case (false, true)  => s"if ($y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        case (false, false) => ""
      }
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $getX * $getY;
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
      "vec_dot",
      exprs => {
        // surface wrong arity as a proper analysis error, not an
        // IndexOutOfBoundsException from the builder
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map("functionName" -> "`vec_dot`",
              "expectedNum" -> "2", "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        FloatVecDot(exprs.head, exprs(1))
      },
      "built-in")
}
