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
  * registers graft's full native SQL surface — the codegen kernels
  * `float_dot` / `float_norm_sq` (also installable on a running
  * session via [[VecExpressions.registerSql]]) plus the sketch
  * aggregates `kmv_sketch`, `misra_gries`, and `bloom_build` — and
  * injects the whole-operator top-k planner strategy, in every
  * session built with the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite.rule)
    // SQL UPDATE/MERGE on icelite catalog tables → the engine's
    // row-level APIs (no-op on every other plan)
    ext.injectPostHocResolutionRule(session => graft.sql.IceliteDmlRule(session))
    // persistent SQL views on icelite catalogs: parse-time DDL routing
    // (ResolveSessionCatalog hard-rejects view DDL on non-session
    // catalogs before any injected rule runs) + read inlining
    ext.injectParser((session, delegate) => new graft.sql.IceliteViewParser(session, delegate))
    ext.injectResolutionRule(session => graft.sql.IceliteViewRule(session))
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
        requireArity(exprs, 2, "kmv_sketch(hash, k)")
        KmvSketchAgg(exprs(0), intLiteral(exprs(1), "kmv_sketch(hash, k): k"))
      }),
    (FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      exprs => {
        requireArity(exprs, 2, "misra_gries(key, k)")
        MisraGriesAgg(exprs(0), intLiteral(exprs(1), "misra_gries(key, k): k"))
      }),
    (FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[BloomFilterBuildAgg].getName, "bloom_build"),
      exprs => {
        requireArity(exprs, 3, "bloom_build(key, expectedItems, fpp)")
        val items = numericLiteral(exprs(1),
          "bloom_build(key, expectedItems, fpp): expectedItems").toLong
        val fpp = numericLiteral(exprs(2), "bloom_build(key, expectedItems, fpp): fpp")
        BloomFilterBuildAgg(exprs(0), items, fpp)
      }))

  private def requireArity(exprs: Seq[Expression], n: Int, what: String): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$what takes $n arguments, got ${exprs.length}")

  /** Evaluate a required foldable numeric argument to a double, failing
    * with the function's contract instead of a Catalyst internal error
    * (SQL integer literals eval as Int/Long, fractional as Decimal).
    */
  private def numericLiteral(e: Expression, what: String): Double = {
    val v = if (e.foldable) e.eval() else null
    v match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue
      case _ => throw new IllegalArgumentException(
        s"$what must be a non-null numeric literal")
    }
  }

  /** [[numericLiteral]] narrowed to a bounds-checked Int. */
  private def intLiteral(e: Expression, what: String): Int = {
    val d = numericLiteral(e, what)
    if (d < 1 || d > Int.MaxValue)
      throw new IllegalArgumentException(s"$what must be in [1, ${Int.MaxValue}], got $d")
    d.toInt
  }
}
