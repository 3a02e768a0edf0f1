package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd float-vector kernels for the similarity/dedup hot
  * paths (SURVEY §4: custom `Expression` only where built-ins can't
  * express the op efficiently — `zip_with`+`aggregate` higher-order
  * functions are interpreted per element, ~20× slower than this tight
  * whole-stage-codegen loop at 64 dims × millions of candidate pairs).
  *
  * Semantics: sequential left-to-right IEEE double accumulation over
  * `array<float>` inputs — bit-identical to the double-fold
  * `aggregate(zip_with(...))` formulation these kernels replace, so
  * they are drop-in for PREFILTER passes. Final reported scores keep
  * the exact decimal path ([[graft.operators.Dedup.decimalDot]]) which
  * is partitioning- and fold-order-independent.
  */
object VecExpressions {

  /** dot(a, b) over array<float> as double (prefilter precision). */
  def floatDot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** sum of squares of an array<float> as double. */
  def floatNormSq(a: Column): Column =
    ColumnBridge.column(FloatNormSq(ColumnBridge.expression(a)))

  /** Expose the kernels as SQL functions on an existing session
    * (`float_dot`, `float_norm_sq`); new sessions get the same via
    * `spark.sql.extensions=graft.functions.GraftExtensions`.
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    ColumnBridge.registerTempFunction(spark, "float_dot",
      exprs => FloatDot(exprs(0), exprs(1)))
    ColumnBridge.registerTempFunction(spark, "float_norm_sq",
      exprs => FloatNormSq(exprs.head))
  }
}

case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // poison, like zip_with+sum
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot = copy(newLeft, newRight)
}

case class FloatNormSq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_norm_sq"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatNormSq =
    copy(newChild)
}
