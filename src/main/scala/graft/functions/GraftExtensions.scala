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
        val k = exprs(1)
        val kv = if (k.foldable) k.eval() else null
        if (kv == null) // non-literal or NULL k: fail with the contract, not a Catalyst internal error
          throw new IllegalArgumentException(
            "kmv_sketch(hash, k): k must be a non-null integer literal")
        KmvSketchAgg(exprs(0), kv.asInstanceOf[Number].intValue)
      }))
}
