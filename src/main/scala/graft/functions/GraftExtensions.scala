package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point (SURVEY §2.4 "UDF surface" / the
  * sanctioned extension mechanism): activating with
  *
  * {{{
  * spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * registers graft's native codegen kernels as SQL functions
  * (`float_dot`, `float_norm_sq`) in every session built with the
  * config — the same builders [[VecExpressions.registerSql]] installs
  * on an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      exprs => FloatDot(exprs(0), exprs(1))),
    (FunctionIdentifier("float_norm_sq"),
      new ExpressionInfo(classOf[FloatNormSq].getName, "float_norm_sq"),
      exprs => FloatNormSq(exprs.head)),
    (FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      exprs => {
        val kv = intLiteral(exprs(1), "kmv_sketch(hash, k): k")
        KmvSketchAgg(exprs(0), kv)
      }),
    (FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      exprs => {
        val kv = intLiteral(exprs(1), "misra_gries(key, k): k")
        MisraGriesAgg(exprs(0), kv)
      }),
    (FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[BloomFilterBuildAgg].getName, "bloom_build"),
      exprs => {
        val items = intLiteral(exprs(1), "bloom_build(key, expectedItems, fpp): expectedItems")
        val fpp = exprs(2)
        val fv = if (fpp.foldable) fpp.eval() else null
        val fd = fv match {
          case null => throw new IllegalArgumentException(
            "bloom_build(key, expectedItems, fpp): fpp must be a non-null numeric literal")
          case d: org.apache.spark.sql.types.Decimal => d.toDouble // SQL decimal literal
          case n: Number => n.doubleValue
        }
        BloomFilterBuildAgg(exprs(0), items.toLong, fd)
      }))

  /** Evaluate a required foldable integer argument, failing with the
    * function's contract instead of a Catalyst internal error.
    */
  private def intLiteral(e: Expression, what: String): Int = {
    val v = if (e.foldable) e.eval() else null
    if (v == null)
      throw new IllegalArgumentException(s"$what must be a non-null integer literal")
    v.asInstanceOf[Number].intValue
  }
}
