package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, BoundReference, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Transparent materialized-view query rewrite — the optimizer-rule
  * counterpart of the hand-routed `rollup_serving` query: a user
  * aggregate written against the FACT frame is answered from a
  * registered rollup whenever the rollup subsumes it (the user's
  * groups are a subset of the MV's groups and every aggregate is
  * derivable from the stored partials: SUM → SUM of partial sums,
  * COUNT(*) → SUM of partial counts, MIN/MAX → MIN/MAX of partials).
  * Registered as a `Rule[LogicalPlan]` (`SparkSessionExtensions.
  * injectOptimizerRule` via [[graft.functions.GraftExtensions]], or
  * [[MvRewrite.ensureInstalled]] on a live session) — the §2
  * preference-order (c) surface, this time on the OPTIMIZER side
  * where [[TopKPerGroup]] covers the planner side.
  *
  * Matching is canonical-form equality anchored at the fact RELATION:
  * the aggregate's child must be the registered relation (modulo one
  * collapsed Project — exactly what column pruning leaves), and every
  * group/aggregate argument is inlined through that projection into
  * relation space, bound to output ordinals, and compared
  * canonicalized. Types must match exactly; anything unmatched leaves
  * the plan untouched (the rewrite can decline, never corrupt).
  * Output `ExprId`s are preserved through aliases so parent operators
  * (sorts, projections, filters above the aggregate) resolve
  * unchanged.
  *
  * At 100 TB the rewritten plan scans the rollup (thousands of rows)
  * instead of the fact table — the same economics as
  * `rollup_serving`, but the QUERY does not know the rollup exists;
  * ANALYZE-driven join planning, file skipping, and this rule are the
  * three legs of the snapshot-metadata-as-planner-input story.
  *
  * Scope (documented, checked, declined otherwise): single-relation
  * aggregates, non-distinct unfiltered SUM/COUNT(*)/MIN/MAX, one MV
  * use per query plan. A filtered or distinct aggregate, a join
  * below the aggregate, or an expression the partials cannot derive
  * all fall through to the fact scan.
  */
object MvRewrite {

  private final case class PartialDef(
      kind: String, argCanon: Option[Expression], mvCol: String)

  private final case class MvDef(
      name: String,
      relCanon: LogicalPlan,
      groupCanon: Seq[Expression],
      partials: Seq[PartialDef],
      mvPlan: LogicalPlan,
      mvGroupAttrs: Seq[Attribute])

  /** Per-session registry (session identity → name → def). */
  private val defs = new ConcurrentHashMap[String, Map[String, MvDef]]()

  private def sessionKey(spark: SparkSession): String =
    java.lang.System.identityHashCode(spark).toString

  /** Install [[rule]] on a live session's optimizer (idempotent). The
    * config-time path is `spark.sql.extensions=graft.functions.
    * GraftExtensions`, which injects the same object.
    */
  def ensureInstalled(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq rule))
      spark.experimental.extraOptimizations = cur :+ rule
  }

  /** Register a materialized view: `mv` stores `aggs` partials of
    * `base` grouped by `groupCols`, with MV column names equal to the
    * partials' aliases and the group column names. Matching metadata
    * is derived from the ANALYZED + OPTIMIZED probe aggregate so it
    * lives in the same canonical space the rule sees at rewrite time.
    */
  def register(
      spark: SparkSession,
      name: String,
      base: DataFrame,
      groupCols: Seq[String],
      aggs: Seq[Column],
      mv: DataFrame): Unit = {
    ensureInstalled(spark)
    val probe = base.groupBy(groupCols.map(org.apache.spark.sql.functions.col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .queryExecution.optimizedPlan
    val agg = probe.collectFirst { case a: Aggregate => a }.getOrElse(
      throw new IllegalArgumentException(
        s"mv '$name': probe did not optimize to an Aggregate:\n$probe"))
    val (rel, inline) = stripProject(agg.child).getOrElse(
      throw new IllegalArgumentException(
        s"mv '$name': base must be a relation or one projection over it:\n${agg.child}"))
    def canon(e: Expression) = bindCanon(inlineExpr(e, inline), rel.output)
    val groupCanon = agg.groupingExpressions.map(canon)
    val partials = agg.aggregateExpressions.flatMap {
      case al @ Alias(ae: AggregateExpression, _) =>
        val kind = ae.aggregateFunction match {
          case Sum(x, _) => Some("sum" -> Some(canon(x)))
          case Count(args) if args.forall(_.isInstanceOf[Literal]) => Some("count" -> None)
          case Min(x) => Some("min" -> Some(canon(x)))
          case Max(x) => Some("max" -> Some(canon(x)))
          case _ => None
        }
        kind match {
          case Some((k, arg)) if !ae.isDistinct && ae.filter.isEmpty =>
            Some(PartialDef(k, arg, al.name))
          case _ => throw new IllegalArgumentException(
            s"mv '$name': unsupported partial ${al.name} (${ae.sql}) — " +
              "register non-distinct unfiltered sum/count/min/max only")
        }
      case _ => None // grouping passthrough columns
    }
    // the OPTIMIZED plan, not the analyzed one: the rewrite grafts this
    // subtree into a plan the main optimizer batches have already
    // finished with, so it must carry no constructs they are required
    // to eliminate (e.g. the ResolvedHint a MoR read's broadcast hint
    // leaves, which the planner rejects if it survives)
    val mvPlan = mv.queryExecution.optimizedPlan
    def mvAttr(n: String): Attribute = mvPlan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"mv '$name': MV is missing column '$n' (has ${mvPlan.output.map(_.name)})"))
    partials.foreach(p => mvAttr(p.mvCol))
    val d = MvDef(name, rel.canonicalized, groupCanon, partials, mvPlan,
      groupCols.map(mvAttr))
    defs.merge(sessionKey(spark), Map(name -> d), (a, b) => a ++ b)
  }

  /** Drop a registered view (tests / re-registration hygiene). */
  def unregister(spark: SparkSession, name: String): Unit =
    defs.computeIfPresent(sessionKey(spark), (_, m) => m - name)

  /** The aggregate's child in (relation, projection-inline) form:
    * either the relation itself or exactly one Project of
    * aliases/attributes over it — the shape column pruning leaves
    * after adjacent projects collapse.
    */
  private def stripProject(
      p: LogicalPlan): Option[(LogicalPlan, Map[Long, Expression])] = p match {
    case Project(list, rel) if rel.children.isEmpty &&
        list.forall(ne => ne.isInstanceOf[Alias] || ne.isInstanceOf[AttributeReference]) =>
      Some((rel, list.map {
        case a: Alias => a.exprId.id -> a.child
        case a: AttributeReference => a.exprId.id -> (a: Expression)
      }.toMap))
    case rel if rel.children.isEmpty => Some((rel, Map.empty))
    case _ => None
  }

  /** Inline projection aliases: expression over the project's output →
    * expression over the relation's output.
    */
  private def inlineExpr(e: Expression, inline: Map[Long, Expression]): Expression =
    e.transformUp {
      case a: AttributeReference if inline.contains(a.exprId.id) => inline(a.exprId.id)
    }

  /** Bind relation attributes to output ordinals, then canonicalize —
    * the exprId-free comparison key (two reads of the same parquet get
    * different ids; ordinals + canonical form are stable).
    */
  private def bindCanon(e: Expression, out: Seq[Attribute]): Expression = {
    val idx = out.map(_.exprId.id).zipWithIndex.toMap
    e.transformUp {
      case a: AttributeReference if idx.contains(a.exprId.id) =>
        BoundReference(idx(a.exprId.id), a.dataType, a.nullable)
    }.canonicalized
  }

  /** The injected optimizer rule. Runs in the user-provided batch
    * (after the main optimizations, so column pruning has already
    * collapsed the fact projection) and rewrites bottom-up; a
    * rewritten aggregate's child is the MV relation, which no longer
    * matches any registered base — idempotent by construction.
    */
  object rule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val views = SparkSession.getActiveSession
        .flatMap(s => Option(defs.get(sessionKey(s)))).getOrElse(Map.empty)
      if (views.isEmpty) plan
      else plan.transformUp {
        case agg: Aggregate =>
          views.values.view.flatMap(tryRewrite(_, agg)).headOption.getOrElse(agg)
      }
    }
  }

  private def tryRewrite(d: MvDef, agg: Aggregate): Option[Aggregate] = {
    if (agg.aggregateExpressions.exists(_.exists {
      case ae: AggregateExpression => ae.isDistinct || ae.filter.nonEmpty
      case _ => false
    })) return None
    val (rel, inline) = stripProject(agg.child).getOrElse(return None)
    if (rel.canonicalized != d.relCanon) return None
    def canon(e: Expression) = bindCanon(inlineExpr(e, inline), rel.output)
    // every user group must be one of the MV's groups
    val gIdx = agg.groupingExpressions.map { g =>
      val i = d.groupCanon.indexOf(canon(g))
      if (i < 0) return None
      i
    }
    def partialFor(kind: String, arg: Option[Expression]): Option[Attribute] =
      d.partials.find(p => p.kind == kind && p.argCanon == arg)
        .map(p => d.mvPlan.output.find(_.name == p.mvCol).get)
    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      val rewritten = ae.aggregateFunction match {
        case Sum(x, _) => partialFor("sum", Some(canon(x))).map(a => ae.copy(Sum(a)))
        case Count(args) if args.forall(_.isInstanceOf[Literal]) =>
          partialFor("count", None).map(a =>
            Coalesce(Seq(ae.copy(Sum(a)), Literal(0L))))
        case Min(x) => partialFor("min", Some(canon(x))).map(a => ae.copy(Min(a)))
        case Max(x) => partialFor("max", Some(canon(x))).map(a => ae.copy(Max(a)))
        case _ => None
      }
      rewritten.filter(_.dataType == ae.dataType) // decline on any type drift
    }
    def mapGroupRef(e: Expression): Option[Attribute] = {
      val i = d.groupCanon.indexOf(canon(e))
      if (i >= 0) Some(d.mvGroupAttrs(i)) else None
    }
    val newAx: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case al @ Alias(ae: AggregateExpression, name) =>
        Alias(mapAgg(ae).getOrElse(return None), name)(exprId = al.exprId)
      case al @ Alias(e, name) =>
        Alias(mapGroupRef(e).getOrElse(return None), name)(exprId = al.exprId)
      case a: AttributeReference =>
        Alias(mapGroupRef(a).getOrElse(return None), a.name)(exprId = a.exprId)
      case _ => return None
    }
    Some(Aggregate(gIdx.map(d.mvGroupAttrs(_)), newAx, d.mvPlan))
  }
}
