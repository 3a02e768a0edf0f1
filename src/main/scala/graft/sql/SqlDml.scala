package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, AttributeSet, EqualTo, Exists, Expression, GetStructField, InSubquery, ListQuery, NamedExpression, Not, OuterReference, ScalarSubquery, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.table.IceliteTable

/** SQL row-level DML on icelite catalog tables — `spark.sql("UPDATE
  * icelite.ns.t SET … WHERE …")` and `spark.sql("MERGE INTO … USING …
  * ON … WHEN …")` — the statements a SQL user types right after
  * DELETE FROM (which rides DSv2's [[org.apache.spark.sql.connector
  * .catalog.SupportsDelete]]; Spark has no equivalent lightweight
  * hook for UPDATE/MERGE short of the full group/delta row-level
  * write machinery).
  *
  * Shape: an analyzer rule (injected via
  * [[graft.functions.GraftExtensions]] — the sanctioned
  * `SparkSessionExtensions` surface) recognizes a RESOLVED
  * [[UpdateTable]]/[[MergeIntoTable]] whose target is an
  * [[IceliteSparkTable]] relation and rewrites it into an eagerly-run
  * command that routes onto the ALREADY-BUILT and oracle-gated
  * engine paths: [[IceliteTable.updateWhere]] (one MoR commit —
  * position-deletes the old images, appends the mutated ones) and
  * [[IceliteTable.merge]] (key-pruned classify-then-commit; dup-key
  * sources rejected). No second DML engine: SQL and Scala run the
  * same code, so every merge/update invariant (ambiguity guard, key
  * stat pruning, changelog pre/post pairs) holds for SQL callers too.
  *
  * Refusal discipline (same as SQL DELETE's translator gate): shapes
  * the routing cannot express EXACTLY refuse loudly rather than
  * half-apply — subqueries beyond a single uncorrelated `[NOT] key IN
  * (subquery)` conjunct (which routes as a semi/anti-join landed by
  * row coordinates — [[IceliteSubqueryDmlCommand]]), non-equi or
  * cross-named merge keys, and computed INSERT values for KEY columns
  * (the classify join runs on raw source keys). Struct-field
  * assignment (`SET s.f = …`) routes in UPDATE and both MERGE update
  * families: the assigned fields fold into one withField chain over
  * the base column's pre-image, untouched fields preserved. `WHEN NOT
  * MATCHED BY SOURCE` routes (target-only
  * conditions/SET; the engine classifies source-absent target rows
  * over the full MoR scan — the clause's inherent cost, since an
  * unmatched row can live in any file); computed non-key INSERT
  * values route as column-level insert overrides; `WITH SCHEMA
  * EVOLUTION` routes via the analyzer's own alterTable pass (see
  * [[translateMerge]]).
  *
  * Scale: identical to the Scala paths — the UPDATE scans the MoR
  * view once and writes only matching images; the MERGE prunes the
  * target scan to key-range-intersecting files, so a small-batch
  * MERGE against a 100 TB table touches only the files that can
  * match.
  */
object SqlDml {

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"icelite SQL DML: $what — use the IceliteTable Scala API for this shape")

  private def noSubquery(e: Expression, where: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      refuse(s"subquery in $where is not routed")

  /** Rewrite every [[AttributeReference]] to an unresolved name so the
    * expression re-resolves against the command's own frames (the
    * analyzed exprIds belong to this statement's relation instance,
    * not the one the engine path builds). Qualifier per side for the
    * two-relation MERGE case; bare for single-relation UPDATE.
    */
  private def requalify(
      e: Expression,
      target: AttributeSet, source: AttributeSet): Column = {
    val out = e.transform {
      case a: AttributeReference if target.contains(a) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if source.contains(a) =>
        UnresolvedAttribute(Seq("s", a.name))
      case a: AttributeReference =>
        refuse(s"reference ${a.name} is bound to neither MERGE side")
    }
    ColumnBridge.column(out)
  }

  private def unqualify(e: Expression): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** Decompose an assignment key (or identity-check a value) into its
    * base column + struct-field path: `s` → (s, []); `s.a.b` → (s,
    * [a, b]). None for anything that isn't a field chain over one
    * column (array indexing, map access).
    */
  private def fieldPath(e: Expression): Option[(AttributeReference, Seq[String])] = e match {
    case ar: AttributeReference => Some((ar, Nil))
    case gs: GetStructField =>
      fieldPath(gs.child).map { case (base, p) => (base, p :+ gs.extractFieldName) }
    case _ => None
  }

  private def quotedPath(path: Seq[String]): String =
    path.map(seg => "`" + seg.replace("`", "``") + "`").mkString(".")

  private[sql] def unwrapTable(p: LogicalPlan): Option[IceliteTable] = p match {
    case SubqueryAlias(_, child) => unwrapTable(child)
    case r: DataSourceV2Relation => r.table match {
      case t: IceliteSparkTable => Some(t.underlying)
      case _ => None
    }
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  // --------------------------------------------------------------- UPDATE

  /** Shared UPDATE-SET builder (plain UPDATE and the subquery→merge
    * route differ only in how values and base columns qualify):
    * identity assignments drop, struct-field assignments fold into one
    * withField chain over the base column's pre-image.
    */
  private def buildUpdateSet(
      assignments: Seq[Assignment],
      qualV: Expression => Column,
      baseCol: String => Column): Map[String, Column] = {
    val parsed = assignments.map { a =>
      noSubquery(a.value, "UPDATE SET")
      fieldPath(a.key) match {
        case Some((base, path)) => (base.name, path, a.value)
        case None => refuse(s"assignment to unsupported field ${a.key.sql}")
      }
    }
    parsed.groupBy(_._1).toSeq.flatMap { case (name, grp) =>
      val (whole0, nested) = grp.partition(_._2.isEmpty)
      // identity padding from assignment alignment (SET a = a): no-op
      val whole = whole0.filterNot {
        case (n, _, v: AttributeReference) => v.name == n
        case _ => false
      }
      if (whole.nonEmpty && nested.nonEmpty)
        refuse(s"both whole-column and struct-field assignment to $name")
      if (nested.isEmpty) whole match {
        case Seq() => None
        case Seq((_, _, v)) => Some(name -> qualV(v))
        case _ => refuse(s"multiple assignments to $name")
      } else {
        // struct-field assignment (`SET s.f = …`): fold the assigned
        // fields into ONE withField chain over the base column — the
        // struct is rewritten with untouched fields preserved, and
        // every expression reads the PRE-update row (standard UPDATE
        // semantics, since withField's base is the pre-image column)
        val real = nested.filterNot { case (n, p, v) =>
          fieldPath(v).exists { case (b, bp) => b.name == n && bp == p }
        }
        if (real.isEmpty) None
        else Some(name -> real.foldLeft(baseCol(name)) {
          case (acc, (_, p, v)) => acc.withField(quotedPath(p), qualV(v))
        })
      }
    }.toMap
  }

  /** Recognize `[NOT] key IN (subquery)` (single, uncorrelated,
    * single-column) among the WHERE conjuncts: the one subquery shape
    * the merge engine can serve exactly — the subquery's DISTINCT key
    * set becomes the merge source, `rest` are the local conjuncts.
    */
  private def splitInSubquery(cond: Expression)
      : Option[(String, LogicalPlan, Boolean, Seq[Expression])] = {
    val cs = conjuncts(cond)
    val (subs, rest) = cs.partition(_.exists(_.isInstanceOf[SubqueryExpression]))
    subs match {
      case Seq(one) =>
        val (negated, in) = one match {
          case Not(i: InSubquery) => (true, i)
          case i: InSubquery => (false, i)
          case _ => return None
        }
        in match {
          case InSubquery(Seq(a: AttributeReference), lq: ListQuery)
              if lq.plan.output.size == 1 && lq.outerAttrs.isEmpty =>
            val src: LogicalPlan =
              Distinct(Project(Seq(Alias(lq.plan.output.head, a.name)()), lq.plan))
            Some((a.name, src, negated, rest))
          case _ => None
        }
      case _ => None
    }
  }

  /** The `[NOT] IN (subquery)` route for UPDATE and DELETE: a
    * semi/anti-join of the visible MoR view against the subquery's
    * distinct key set, landed by physical row coordinates
    * ([[IceliteTable.updateMatching]]/[[IceliteTable.deleteMatching]]
    * — the same position-delete commit shape as plain predicate
    * UPDATE/DELETE, so duplicate probed values, NULL keys, and SET of
    * the probed column itself all work row-exactly; no key-uniqueness
    * discipline borrowed from merge).
    */
  private def translateSubqueryDml(
      t: IceliteTable, cond: Expression,
      set: Map[String, Column], isDelete: Boolean): Option[LogicalPlan] =
    splitInSubquery(cond).map { case (key, src, negated, rest) =>
      rest.foreach(noSubquery(_, if (isDelete) "DELETE WHERE" else "UPDATE WHERE"))
      val local = rest.map(unqualify).reduceOption(_ && _).getOrElse(lit(true))
      IceliteSubqueryDmlCommand(t, src, key, negated, local, set, isDelete)
        : LogicalPlan
    }.orElse(translateCorrelatedDml(t, cond, set, isDelete))

  private def containsOuter(e: Expression): Boolean =
    e.exists(_.isInstanceOf[OuterReference])

  private def planHasOuter(p: LogicalPlan): Boolean =
    p.exists(node => node.expressions.exists(containsOuter) ||
      node.expressions.exists(_.exists {
        case s: SubqueryExpression => s.isCorrelated
        case _ => false
      }))

  /** Pull equality correlation out of one [[Filter]]: every correlated
    * conjunct must be `OuterReference(targetCol) = innerExpr` (either
    * side); anything else refuses. Returns (pairs, filter-with-the-
    * local-conjuncts-only).
    */
  private def extractCorrelation(cond: Expression, child: LogicalPlan)
      : (Seq[(AttributeReference, Expression)], LogicalPlan) = {
    if (planHasOuter(child))
      refuse("correlation below the subquery's top WHERE is not routed")
    val (corr, rest) = conjuncts(cond).partition(containsOuter)
    val pairs = corr.map {
      case EqualTo(OuterReference(a: AttributeReference), inner) if !containsOuter(inner) =>
        (a, inner)
      case EqualTo(inner, OuterReference(a: AttributeReference)) if !containsOuter(inner) =>
        (a, inner)
      case other => refuse(
        s"correlated predicate ${other.sql} is not a simple outer-column equality")
    }
    (pairs, rest.reduceOption(And).map(Filter(_, child)).getOrElse(child))
  }

  /** Existence-preserving strip for EXISTS decorrelation: projections,
    * DISTINCT, and aliases above the correlated Filter do not change
    * whether a row exists. Anything that CAN change existence
    * (aggregate without grouping always yields a row, LIMIT can drop
    * all rows, …) stays and forces the uncorrelated path or a loud
    * refusal.
    */
  private def stripExistence(p: LogicalPlan): LogicalPlan = p match {
    case Project(_, child) => stripExistence(child)
    case Distinct(child) => stripExistence(child)
    case SubqueryAlias(_, child) => stripExistence(child)
    case other => other
  }

  private[sql] def corrName(i: Int) = s"__corr_$i"
  private[sql] val CorrVal = "__corr_val"

  /** `[NOT] EXISTS (subquery)` and correlated `key IN (subquery)` for
    * UPDATE/DELETE, on the same coordinate engine as the uncorrelated
    * IN route: the correlated equalities become semi/anti-join keys
    * against the DECORRELATED subquery (its correlated WHERE conjuncts
    * removed, the join columns projected out), so the visible MoR view
    * is classified in ONE distributed join — no per-row re-execution.
    *
    * Semantics notes: EXISTS is purely existential, so plain equality
    * join keys give exact results for NULLs on either side (`t.k =
    * s.x` is UNKNOWN for a NULL key → EXISTS false → NOT EXISTS true,
    * which is precisely left-semi/left-anti behavior). Correlated
    * `IN` routes as the semi-join of (probe, correlation keys) —
    * UNKNOWN rows are excluded exactly as WHERE treats them.
    * Correlated `NOT IN` routes as the TWO-pass plan (per-group
    * null/emptiness probe + value anti join,
    * [[IceliteNotInDmlCommand]]) — its per-outer-row three-valued set
    * semantics have no single-join form, but two joins express them
    * exactly (NULL values poison their group, NULL probes qualify
    * only against empty groups, empty groups qualify everything).
    */
  private def translateCorrelatedDml(
      t: IceliteTable, cond: Expression,
      set: Map[String, Column], isDelete: Boolean): Option[LogicalPlan] = {
    val (subs, rest) = conjuncts(cond).partition(_.exists(_.isInstanceOf[SubqueryExpression]))
    val one = subs match {
      case Seq(s) => s
      case _ => return None
    }
    rest.foreach(noSubquery(_, if (isDelete) "DELETE WHERE" else "UPDATE WHERE"))
    val local = rest.map(unqualify).reduceOption(_ && _).getOrElse(lit(true))

    def existsRoute(e: Exists, anti: Boolean): LogicalPlan = {
      if (!planHasOuter(e.plan)) {
        // uncorrelated EXISTS: one global existence probe at run time
        return IceliteCorrelatedDmlCommand(t, e.plan, Nil, anti, local, set, isDelete,
          constantExistence = true)
      }
      stripExistence(e.plan) match {
        case Filter(c, child) =>
          val (pairs, cleaned) = extractCorrelation(c, child)
          if (pairs.isEmpty) refuse(
            "EXISTS correlation is not a top-level WHERE conjunct of the subquery")
          val proj = pairs.zipWithIndex.map { case ((_, inner), i) =>
            Alias(inner, corrName(i))() : NamedExpression
          }
          IceliteCorrelatedDmlCommand(t, Project(proj, cleaned),
            pairs.zipWithIndex.map { case ((a, _), i) => (a.name, corrName(i)) },
            anti, local, set, isDelete)
        case _ => refuse(
          "correlated EXISTS must be a SELECT whose correlation sits in its top WHERE " +
            "(aggregates/limits above the correlation change existence and are not routed)")
      }
    }

    one match {
      case e: Exists => Some(existsRoute(e, anti = false))
      case Not(e: Exists) => Some(existsRoute(e, anti = true))
      case InSubquery(Seq(probe: AttributeReference), lq: ListQuery)
          if lq.outerAttrs.nonEmpty && lq.plan.output.size == 1 =>
        lq.plan match {
          case Project(Seq(value), f @ Filter(_, _)) =>
            val (pairs, cleaned) = extractCorrelation(f.condition, f.child)
            if (value.exists(containsOuter)) refuse(
              "correlated IN: the subquery's SELECT expression may not reference the outer row")
            val proj = (Alias(value, CorrVal)() : NamedExpression) +:
              pairs.zipWithIndex.map { case ((_, inner), i) =>
                Alias(inner, corrName(i))() : NamedExpression
              }
            Some(IceliteCorrelatedDmlCommand(t, Project(proj, cleaned),
              (probe.name, CorrVal) +:
                pairs.zipWithIndex.map { case ((a, _), i) => (a.name, corrName(i)) },
              anti = false, local, set, isDelete))
          case _ => refuse(
            "correlated IN-subquery must be a single-column SELECT with its correlation " +
              "in the top WHERE")
        }
      case Not(InSubquery(Seq(probe: AttributeReference), lq: ListQuery))
          if lq.outerAttrs.nonEmpty && lq.plan.output.size == 1 =>
        // correlated NOT IN: per-outer-row three-valued SET semantics
        // have no single-join form — routed as the TWO-pass plan
        // (per-group null/emptiness probe + value anti join), see
        // IceliteNotInDmlCommand
        lq.plan match {
          case Project(Seq(value), f @ Filter(_, _)) =>
            val (pairs, cleaned) = extractCorrelation(f.condition, f.child)
            if (value.exists(containsOuter)) refuse(
              "correlated NOT IN: the subquery's SELECT expression may not reference the outer row")
            val proj = (Alias(value, CorrVal)() : NamedExpression) +:
              pairs.zipWithIndex.map { case ((_, inner), i) =>
                Alias(inner, corrName(i))() : NamedExpression
              }
            Some(IceliteNotInDmlCommand(t, Project(proj, cleaned), probe.name,
              pairs.zipWithIndex.map { case ((a, _), i) => (a.name, corrName(i)) },
              local, set, isDelete))
          case _ => refuse(
            "correlated NOT IN subquery must be a single-column SELECT with its " +
              "correlation in the top WHERE")
        }
      case _ => None
    }
  }

  // ------------------------------------------ scalar subqueries in SET

  private[sql] def scalarName(i: Int) = s"__scalar_$i"
  private[sql] def scKeyName(i: Int, j: Int) = s"__sc${i}_k$j"
  private[sql] def scCntName(i: Int) = s"__sc${i}_cnt"
  private[sql] def scMarkName(i: Int) = s"__sc${i}_m"

  /** One routed scalar subquery inside an UPDATE SET expression. */
  private[sql] sealed trait ScalarSetSpec { def idx: Int }

  /** Uncorrelated: one global probe at run time (NULL when empty,
    * loud error past one row — SQL scalar cardinality).
    */
  private[sql] case class UncorrScalar(
      idx: Int, plan: LogicalPlan,
      dt: org.apache.spark.sql.types.DataType) extends ScalarSetSpec

  /** Correlated global aggregate: the decorrelated frame groups by the
    * correlation keys (exactly one row per key by construction).
    * `emptyEval` is the SAME aggregate over an empty relation — its
    * runtime value is what the per-row subquery yields for an outer
    * row with NO matching inner rows (NULL for sum/max/min/avg, 0 for
    * count, whatever the expression computes in general — evaluated,
    * never guessed, so the classic decorrelation count bug cannot
    * happen), substituted wherever the outer join found no group.
    */
  private[sql] case class CorrAggScalar(
      idx: Int, frame: LogicalPlan, joinKeys: Seq[(String, String)],
      emptyEval: LogicalPlan) extends ScalarSetSpec

  /** Correlated row SELECT (optionally DISTINCT): the frame carries
    * one row per inner row; the command groups per key and REFUSES at
    * run time when any UPDATED row sees more than one — the SQL
    * "scalar subquery returned more than one row" error, checked only
    * for rows the statement actually touches. No-match rows read NULL
    * through the outer join, which IS the empty-subquery value here.
    */
  private[sql] case class CorrRowScalar(
      idx: Int, frame: LogicalPlan,
      joinKeys: Seq[(String, String)]) extends ScalarSetSpec

  private def reAlias(v: NamedExpression, name: String): NamedExpression = v match {
    case Alias(c, _) => Alias(c, name)()
    case other => Alias(other, name)()
  }

  private def buildScalarSpec(s: ScalarSubquery, idx: Int): ScalarSetSpec = {
    if (s.outerAttrs.isEmpty) return UncorrScalar(idx, s.plan, s.dataType)
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, child) => strip(child)
      case other => other
    }
    def keyed(pairs: Seq[(AttributeReference, Expression)]): Seq[NamedExpression] =
      pairs.zipWithIndex.map { case ((_, inner), j) =>
        Alias(inner, scKeyName(idx, j))() : NamedExpression
      }
    def keys(pairs: Seq[(AttributeReference, Expression)]): Seq[(String, String)] =
      pairs.zipWithIndex.map { case ((a, _), j) => (a.name, scKeyName(idx, j)) }
    strip(s.plan) match {
      case Aggregate(Nil, Seq(v), f @ Filter(_, _), _) =>
        if (v.exists(containsOuter)) refuse(
          "the scalar subquery's aggregate expression may not reference the outer row")
        val (pairs, cleaned) = extractCorrelation(f.condition, f.child)
        if (pairs.isEmpty) refuse(
          "scalar-subquery correlation is not a top-level WHERE conjunct of the subquery")
        CorrAggScalar(idx,
          Aggregate(pairs.map(_._2), keyed(pairs) :+ reAlias(v, scalarName(idx)), cleaned, None),
          keys(pairs),
          Aggregate(Nil, Seq(reAlias(v, scalarName(idx))),
            LocalRelation(cleaned.output), None))
      case Aggregate(g, _, _, _) if g.nonEmpty => refuse(
        "GROUP BY inside a scalar SET subquery is not routed (one global aggregate only)")
      case other =>
        val (isDistinct, body) = other match {
          case Distinct(child) => (true, strip(child))
          case p => (false, p)
        }
        body match {
          case Project(Seq(v), f @ Filter(_, _)) =>
            if (v.exists(containsOuter)) refuse(
              "the scalar subquery's SELECT expression may not reference the outer row")
            val (pairs, cleaned) = extractCorrelation(f.condition, f.child)
            if (pairs.isEmpty) refuse(
              "scalar-subquery correlation is not a top-level WHERE conjunct of the subquery")
            val proj = Project(keyed(pairs) :+ reAlias(v, scalarName(idx)), cleaned)
            CorrRowScalar(idx, if (isDistinct) Distinct(proj) else proj, keys(pairs))
          case _ => refuse(
            "a correlated scalar SET subquery must be a global aggregate or a " +
              "single-column SELECT [DISTINCT] with its correlation in the top WHERE")
        }
    }
  }

  /** `UPDATE … SET col = (SELECT …) …`: every scalar subquery in a SET
    * expression becomes a synthetic column of the classified view —
    * uncorrelated ones as one runtime probe, correlated ones
    * decorrelated onto per-key frames joined in ONE distributed outer
    * join each — and the assignment expression evaluates over those
    * columns with full pre-update-row semantics. The WHERE must be
    * subquery-free (combine shapes refuse loudly rather than
    * half-route).
    */
  private def translateScalarSetUpdate(
      t: IceliteTable, assignments: Seq[Assignment],
      cond: Option[Expression]): LogicalPlan = {
    cond.foreach { c =>
      if (c.exists(_.isInstanceOf[SubqueryExpression])) refuse(
        "scalar-subquery SET combined with a subquery WHERE is not routed")
    }
    val (scalarAssigns, plainAssigns) =
      assignments.partition(_.value.exists(_.isInstanceOf[ScalarSubquery]))
    val plainSet = buildUpdateSet(plainAssigns, unqualify,
      n => ColumnBridge.column(UnresolvedAttribute.quoted(n)))
    var specs = Vector.empty[ScalarSetSpec]
    val scalarSet = scalarAssigns.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => refuse(
          s"a scalar-subquery assignment must target a whole column (got ${other.sql})")
      }
      val replaced = a.value.transform {
        case s: ScalarSubquery =>
          val spec = buildScalarSpec(s, specs.size)
          specs = specs :+ spec
          UnresolvedAttribute.quoted(scalarName(spec.idx))
      }
      if (replaced.exists(_.isInstanceOf[SubqueryExpression])) refuse(
        "only scalar subqueries are routed inside UPDATE SET expressions")
      name -> ColumnBridge.column(replaced.transform {
        case ar: AttributeReference => UnresolvedAttribute.quoted(ar.name)
      })
    }
    val dups = (scalarSet.map(_._1) ++ plainSet.keys)
      .groupBy(identity).filter(_._2.size > 1).keys
    if (dups.nonEmpty) refuse(s"multiple assignments to ${dups.mkString(", ")}")
    IceliteScalarSetUpdateCommand(t, specs,
      cond.map(unqualify).getOrElse(lit(true)), plainSet ++ scalarSet)
  }

  private[sql] def translateUpdate(
      t: IceliteTable, assignments: Seq[Assignment],
      cond: Option[Expression]): LogicalPlan = {
    if (assignments.exists(_.value.exists(_.isInstanceOf[ScalarSubquery])))
      return translateScalarSetUpdate(t, assignments, cond)
    val set = buildUpdateSet(assignments, unqualify,
      n => ColumnBridge.column(UnresolvedAttribute.quoted(n)))
    cond match {
      case Some(c) if c.exists(_.isInstanceOf[SubqueryExpression]) =>
        translateSubqueryDml(t, c, set, isDelete = false).getOrElse(
          refuse("subquery in UPDATE WHERE is not routed (a single [NOT] col IN " +
            "(subquery), [NOT] EXISTS, or correlated IN conjunct)"))
      case _ =>
        IceliteUpdateCommand(t, cond.map(unqualify).getOrElse(lit(true)), set)
    }
  }

  private[sql] def translateSubqueryDelete(
      t: IceliteTable, cond: Expression): LogicalPlan =
    translateSubqueryDml(t, cond, Map.empty, isDelete = true).getOrElse(
      refuse("subquery in DELETE WHERE is not routed (a single [NOT] col IN " +
        "(subquery), [NOT] EXISTS, or correlated IN conjunct)"))

  // ---------------------------------------------------------------- MERGE

  private[sql] def translateMerge(m: MergeIntoTable, t: IceliteTable): LogicalPlan = {
    // WITH SCHEMA EVOLUTION needs no routing of its own: the catalog
    // advertises AUTOMATIC_SCHEMA_EVOLUTION, so the analyzer's
    // ResolveMergeIntoSchemaEvolution has ALREADY diffed source vs
    // target, committed the AddColumn evolution through alterTable,
    // and reloaded the relation `t` unwraps — by post-hoc time this
    // is an ordinary merge against the evolved schema
    val target = m.targetTable.outputSet
    val source = m.sourceTable.outputSet

    // ON must be a conjunction of same-named target/source column
    // equalities — IceliteTable.merge joins on shared key names
    val keyCols = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val (tAttr, sAttr) =
          if (target.contains(a) && source.contains(b)) (a, b)
          else if (target.contains(b) && source.contains(a)) (b, a)
          else refuse(s"ON conjunct ${a.name} = ${b.name} does not pair target with source")
        if (!tAttr.name.equalsIgnoreCase(sAttr.name))
          refuse(s"ON pairs differently-named columns ${tAttr.name} and ${sAttr.name}")
        tAttr.name
      case other => refuse(s"non-equality ON conjunct ${other.sql}")
    }

    def qual(e: Expression): Column = { noSubquery(e, "MERGE"); requalify(e, target, source) }

    // Scalar subqueries in WHEN MATCHED UPDATE SET values — the
    // [[ScalarSetSpec]] machinery reused on the merge route. The
    // decorrelated frames join onto the SOURCE side before the merge
    // classify (the command augments `src` with one synthetic column
    // per subquery), which is sound because a matched update only
    // ever evaluates where `t.key = s.key` holds: correlation on a
    // source column joins directly, and correlation on a TARGET key
    // column is provably equal to the same-named source column there.
    // Correlation on a non-key target column has no source-side image
    // and refuses loudly.
    var mergeSpecs = Vector.empty[ScalarSetSpec]
    def replaceScalars(e: Expression): Expression = {
      val replaced = e.transform {
        case s: ScalarSubquery =>
          s.outerAttrs.foreach {
            case a: AttributeReference
              if source.contains(a) ||
                (target.contains(a) && keyCols.exists(_.equalsIgnoreCase(a.name))) => ()
            case a: AttributeReference => refuse(
              s"MERGE UPDATE SET scalar subquery correlates on target column ${a.name}: " +
                "only source columns and merge key columns are routed (no source-side " +
                "image exists for other target columns)")
            case other => refuse(
              s"unsupported outer reference ${other.sql} in a MERGE SET scalar subquery")
          }
          val spec = buildScalarSpec(s, mergeSpecs.size)
          mergeSpecs = mergeSpecs :+ spec
          UnresolvedAttribute(Seq("s", scalarName(spec.idx)))
      }
      if (replaced.exists(_.isInstanceOf[SubqueryExpression])) refuse(
        "only scalar subqueries are routed inside MERGE UPDATE SET expressions")
      replaced
    }

    // SQL first-matching-clause-wins over the ordered WHEN MATCHED
    // list, encoded as disjoint effective conditions
    var prior: Column = lit(false)
    var matchedUpdate: Option[Column] = None
    var matchedDelete: Option[Column] = None
    var updateSet: Map[String, Column] = Map.empty
    var wholeRowUpdate = false
    m.matchedActions.foreach { act =>
      val own: Column = act.condition.map(qual).getOrElse(lit(true))
      val eff = own && !prior
      act match {
        case UpdateAction(_, as, _) =>
          if (matchedUpdate.isDefined) refuse("multiple WHEN MATCHED UPDATE clauses")
          matchedUpdate = Some(eff)
          val parsed = as.map { a =>
            fieldPath(a.key) match {
              case Some((base, path)) => (base.name, path, a.value)
              case None => refuse(s"assignment to unsupported field ${a.key.sql}")
            }
          }
          updateSet = parsed.groupBy(_._1).toSeq.flatMap { case (name, grp) =>
            val (whole0, nested) = grp.partition(_._2.isEmpty)
            // target-side identity padding is droppable only when a
            // struct-field assignment needs the base column to itself
            val whole = if (nested.isEmpty) whole0 else whole0.filterNot {
              case (n, _, v: AttributeReference) =>
                v.name.equalsIgnoreCase(n) && target.contains(v)
              case _ => false
            }
            if (whole.nonEmpty && nested.nonEmpty)
              refuse(s"both whole-column and struct-field assignment to $name")
            // same refusal discipline as plain UPDATE's buildUpdateSet:
            // a duplicate assignment is a user error, never last-wins
            if (whole.size > 1) refuse(s"multiple assignments to $name")
            if (nested.isEmpty) whole.flatMap { case (n, _, value) =>
              value match {
                // key column assigned its own value — from either side:
                // ON t.k = s.k makes s.k ≡ t.k on matched rows, and SET *
                // expands to exactly this shape — provably identity, drop
                // (merge refuses explicit key assignment by contract)
                case v: AttributeReference if keyCols.contains(n) &&
                  v.name.equalsIgnoreCase(n) &&
                  (target.contains(v) || source.contains(v)) => None
                case v => Some(n -> qual(replaceScalars(v)))
              }
            } else {
              if (keyCols.exists(_.equalsIgnoreCase(name)))
                refuse(s"struct-field assignment to key column $name")
              // `SET t.col.f = …`: fold assigned fields into ONE
              // withField chain over the TARGET base column (pre-image)
              val real = nested.filterNot { case (n, p, v) =>
                fieldPath(v).exists { case (b, bp) =>
                  b.name == n && bp == p && target.contains(b) }
              }
              if (real.isEmpty) None
              else Some(name -> real.foldLeft(
                  ColumnBridge.column(UnresolvedAttribute(Seq("t", name)))) {
                case (acc, (_, p, v)) => acc.withField(quotedPath(p), qual(v))
              })
            }
          }.toMap
          if (updateSet.isEmpty)
            // SET only touched key columns identically: a no-op update
            matchedUpdate = Some(lit(false))
        case _: UpdateStarAction =>
          if (matchedUpdate.isDefined) refuse("multiple WHEN MATCHED UPDATE clauses")
          matchedUpdate = Some(eff)
          wholeRowUpdate = true // merge's whole-row mode: replace with source row
        case DeleteAction(_) =>
          if (matchedDelete.isDefined) refuse("multiple WHEN MATCHED DELETE clauses")
          matchedDelete = Some(eff)
        case other => refuse(s"WHEN MATCHED action ${other.getClass.getSimpleName}")
      }
      prior = prior || own
    }
    if (wholeRowUpdate && updateSet.nonEmpty)
      refuse("mixed whole-row and column-level updates")

    // INSERT values may reference the SOURCE side only — there is no
    // target row for a not-matched source row
    def qualSourceOnly(e: Expression, where: String): Column = {
      noSubquery(e, "MERGE")
      ColumnBridge.column(e.transform {
        case a: AttributeReference if source.contains(a) =>
          UnresolvedAttribute(Seq("s", a.name))
        case a: AttributeReference if target.contains(a) =>
          refuse(s"$where references target column ${a.name} " +
            "(no target row exists for these source rows)")
        case a: AttributeReference =>
          refuse(s"reference ${a.name} is bound to neither MERGE side")
      })
    }
    var notMatchedInsert: Option[Column] = None
    var insertSet: Map[String, Column] = Map.empty
    var insPrior: Column = lit(false)
    m.notMatchedActions.foreach { act =>
      val own: Column = act.condition.map(qual).getOrElse(lit(true))
      act match {
        case InsertAction(_, as) =>
          if (notMatchedInsert.isDefined) refuse("multiple WHEN NOT MATCHED INSERT clauses")
          // pass-through columns (the same-named source column) ride
          // merge()'s insert-by-name; anything else — computed
          // expressions, literals — becomes a column-level insert
          // override, and unassigned columns pad with NULL (standard
          // SQL MERGE INSERT column-list semantics). Keys must stay
          // pass-through: the engine classifies on raw source keys.
          val assigned = as.map { a =>
            val name = a.key match {
              case ar: AttributeReference => ar.name
              case other => refuse(s"assignment to non-top-level field ${other.sql}")
            }
            a.value match {
              case v: AttributeReference if source.contains(v) && v.name.equalsIgnoreCase(name) =>
                name -> None
              case v =>
                if (keyCols.exists(_.equalsIgnoreCase(name)))
                  refuse(s"INSERT value for key column $name must be the same-named " +
                    "source column (the ON clause classifies on raw source keys)")
                name -> Some(qualSourceOnly(v, s"INSERT value for $name"))
            }
          }
          val assignedNames = assigned.map(_._1.toLowerCase(java.util.Locale.ROOT)).toSet
          keyCols.foreach { k =>
            if (!assignedNames(k.toLowerCase(java.util.Locale.ROOT)))
              refuse(s"INSERT must assign key column $k")
          }
          // omitted columns take their DECLARED default when one
          // exists (matching INSERT INTO's analyzer fill), else NULL
          val padded = t.schema.fieldNames.toSeq
            .filterNot(f => assignedNames(f.toLowerCase(java.util.Locale.ROOT)))
            .map(f => f -> Some(t.declaredDefault(f).getOrElse(lit(null))))
          insertSet = (assigned ++ padded)
            .collect { case (n, Some(c)) => n -> c }.toMap
          notMatchedInsert = Some(own && !insPrior)
        case other => refuse(s"WHEN NOT MATCHED action ${other.getClass.getSimpleName}")
      }
      insPrior = insPrior || own
    }

    // WHEN NOT MATCHED BY SOURCE (target rows no source row matched):
    // conditions and SET values may reference the TARGET side only —
    // there is no source row to read from
    def qualTargetOnly(e: Expression): Column = {
      noSubquery(e, "MERGE")
      ColumnBridge.column(e.transform {
        case a: AttributeReference if target.contains(a) =>
          UnresolvedAttribute(Seq("t", a.name))
        case a: AttributeReference if source.contains(a) =>
          refuse(s"NOT MATCHED BY SOURCE references source column ${a.name} " +
            "(no source row exists for these target rows)")
        case a: AttributeReference =>
          refuse(s"reference ${a.name} is bound to neither MERGE side")
      })
    }
    var bsUpdate: Option[Column] = None
    var bsDelete: Option[Column] = None
    var bsSet: Map[String, Column] = Map.empty
    var bsPrior: Column = lit(false)
    var bsUpdateSeen = false
    m.notMatchedBySourceActions.foreach { act =>
      val own: Column = act.condition.map(qualTargetOnly).getOrElse(lit(true))
      val eff = own && !bsPrior
      act match {
        case UpdateAction(_, as, _) =>
          if (bsUpdateSeen) refuse("multiple WHEN NOT MATCHED BY SOURCE UPDATE clauses")
          bsUpdateSeen = true
          bsUpdate = Some(eff)
          val bsParsed = as.map { a =>
            fieldPath(a.key) match {
              case Some((base, path)) => (base.name, path, a.value)
              case None => refuse(s"assignment to unsupported field ${a.key.sql}")
            }
          }
          bsSet = bsParsed.groupBy(_._1).toSeq.flatMap { case (name, grp) =>
            val (whole0, nested) = grp.partition(_._2.isEmpty)
            // identity padding from assignment alignment (SET a = a)
            val whole = whole0.filterNot {
              case (n, _, v: AttributeReference) =>
                target.contains(v) && v.name.equalsIgnoreCase(n)
              case _ => false
            }
            if (whole.nonEmpty && nested.nonEmpty)
              refuse(s"both whole-column and struct-field assignment to $name")
            if (nested.isEmpty) whole match {
              case Seq() => None
              case Seq((n, _, v)) => Some(n -> qualTargetOnly(v))
              case _ => refuse(s"multiple assignments to $name")
            } else {
              if (keyCols.exists(_.equalsIgnoreCase(name)))
                refuse(s"struct-field assignment to key column $name")
              val real = nested.filterNot { case (n, p, v) =>
                fieldPath(v).exists { case (b, bp) =>
                  b.name == n && bp == p && target.contains(b) }
              }
              if (real.isEmpty) None
              else Some(name -> real.foldLeft(
                  ColumnBridge.column(UnresolvedAttribute(Seq("t", name)))) {
                case (acc, (_, p, v)) => acc.withField(quotedPath(p), qualTargetOnly(v))
              })
            }
          }.toMap
          // all-identity SET: a no-op clause — drop it entirely
          // (Some(lit(false)) with an empty set would trip merge's
          // explicit-update-set requirement); bsPrior still consumes
          // the clause's rows so later BY SOURCE clauses keep SQL order
          if (bsSet.isEmpty) bsUpdate = None
        case DeleteAction(_) =>
          if (bsDelete.isDefined) refuse("multiple WHEN NOT MATCHED BY SOURCE DELETE clauses")
          bsDelete = Some(eff)
        case other => refuse(s"WHEN NOT MATCHED BY SOURCE action ${other.getClass.getSimpleName}")
      }
      bsPrior = bsPrior || own
    }

    IceliteMergeCommand(t, m.sourceTable, keyCols,
      Some(matchedUpdate.getOrElse(lit(false))),
      matchedDelete, notMatchedInsert, updateSet,
      bsUpdate, bsDelete, bsSet, insertSet, mergeSpecs)
  }
}

/** Analyzer rule (post-hoc resolution): resolved UPDATE/MERGE on an
  * icelite DSv2 relation → the matching engine command. Leaves every
  * other plan untouched.
  */
case class IceliteDmlRule(session: SparkSession) extends Rule[LogicalPlan] {
  import SqlDml._

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(table, assignments, cond) if u.resolved =>
      SqlDml.unwrapTable(table)
        .map(t => translateUpdate(t, assignments, cond)).getOrElse(u)
    case m: MergeIntoTable if m.resolved =>
      SqlDml.unwrapTable(m.targetTable).map(t => translateMerge(m, t)).getOrElse(m)
    // DELETE with a subquery predicate: the DSv2 SupportsDelete path
    // only carries translatable filters, so Spark would otherwise fail
    // at planning — route `[NOT] key IN (subquery)` onto the merge
    // classify instead (plain DELETEs keep the SupportsDelete path)
    case d: DeleteFromTable
        if d.resolved && d.condition.exists(_.isInstanceOf[SubqueryExpression]) =>
      SqlDml.unwrapTable(d.table)
        .map(t => translateSubqueryDelete(t, d.condition)).getOrElse(d)
    // dynamic `INSERT OVERWRITE` (partitionOverwriteMode=dynamic): Spark
    // plans a pure-v2 write the V1 fallback cannot serve — route it onto
    // the engine's partition overwrite, touched set derived from the
    // batch (the idempotent-reload shape backfill jobs are built on)
    case o: OverwritePartitionsDynamic if o.query.resolved =>
      SqlDml.unwrapTable(o.table)
        .map(t => IceliteDynamicOverwriteCommand(t, o.query): LogicalPlan).getOrElse(o)
    case other => other
  }
}

/** Dynamic `INSERT OVERWRITE <cat>.<ns>.<t> …` → one
  * [[IceliteTable.overwritePartitions]] commit: every partition value
  * present in the batch is replaced, the rest untouched.
  */
case class IceliteDynamicOverwriteCommand(
    table: IceliteTable, sourcePlan: LogicalPlan)
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    table.overwritePartitions(ColumnBridge.ofRows(sparkSession, sourcePlan))
    Seq.empty
  }
}

/** `UPDATE/DELETE … WHERE [NOT] key IN (subquery)` → ONE
  * coordinate-based commit: the visible MoR view semi/anti-joins the
  * subquery's distinct key set and the matching rows land through
  * [[IceliteTable.updateMatching]]/[[IceliteTable.deleteMatching]] —
  * the same position-delete shape as plain predicate UPDATE/DELETE,
  * so duplicate probed values, NULL keys, and assigning the probed
  * column itself all work row-exactly (no key-uniqueness discipline).
  *
  * SQL three-valued IN is preserved: a NULL among the subquery values
  * makes NOT IN never-true (probed once on the cached distinct set); a
  * NULL target key matches nothing under IN and is UNKNOWN under NOT
  * IN against a non-empty set — but `x NOT IN (empty set)` is TRUE
  * for every row INCLUDING null keys (IN over nothing is plain FALSE),
  * so the null-key exclusion only applies when the set is non-empty.
  * An all-identity SET is a no-op command.
  */
case class IceliteSubqueryDmlCommand(
    table: IceliteTable, sourcePlan: LogicalPlan, key: String,
    negated: Boolean, cond: Column, set: Map[String, Column], isDelete: Boolean)
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    if (!isDelete && set.isEmpty) return Seq.empty // all-identity SET
    val keysAll = ColumnBridge.ofRows(sparkSession, sourcePlan).cache()
    try {
      if (negated && !keysAll.filter(col(key).isNull).isEmpty)
        return Seq.empty // NOT IN over a set containing NULL: never true
      val keys = keysAll.filter(col(key).isNotNull)
      val keysEmpty = negated && keys.isEmpty
      val probe = "__sq_probe_key"
      def classify(visible: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        require(!visible.columns.contains(probe), s"table may not carry $probe")
        val kf = keys.toDF(probe)
        val joined =
          if (!negated) visible.join(kf, col(key) === col(probe), "left_semi")
          else {
            val anti = visible.join(kf, col(key) === col(probe), "left_anti")
            // null keys qualify ONLY against the empty set (see scaladoc)
            if (keysEmpty) anti else anti.filter(col(key).isNotNull)
          }
        joined.filter(cond)
      }
      if (isDelete) table.deleteMatching(classify)
      else table.updateMatching(classify, set)
    } finally keysAll.unpersist()
    Seq.empty
  }
}

/** `UPDATE/DELETE … WHERE [NOT] EXISTS (subquery)` or correlated
  * `key IN (subquery)` → ONE coordinate-based commit: the
  * decorrelated subquery ([[SqlDml]] pulled its correlated equality
  * conjuncts out as join keys) semi/anti-joins the visible MoR view,
  * matching rows land by physical coordinates. `joinKeys` pairs
  * (visible column, source synthetic column); `constantExistence`
  * marks the uncorrelated-EXISTS degenerate case (one global probe:
  * every row qualifies or none do).
  *
  * Scale: the classify is one distributed join of the MoR scan
  * against the (distinct-projected) subquery — small subquery sides
  * broadcast under AQE exactly as in a hand-written semi-join; no
  * per-row subquery re-execution ever happens.
  */
case class IceliteCorrelatedDmlCommand(
    table: IceliteTable, sourcePlan: LogicalPlan,
    joinKeys: Seq[(String, String)], anti: Boolean, cond: Column,
    set: Map[String, Column], isDelete: Boolean,
    constantExistence: Boolean = false)
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    if (!isDelete && set.isEmpty) return Seq.empty // all-identity SET
    val src = ColumnBridge.ofRows(sparkSession, sourcePlan)
    def classify(visible: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      if (constantExistence) {
        val exists = !src.isEmpty
        return if (exists != anti) visible.filter(cond) else visible.limit(0)
      }
      joinKeys.foreach { case (_, s) =>
        require(!visible.columns.contains(s), s"table may not carry $s") }
      val keys = src.distinct()
      val on = joinKeys.map { case (v, s) => visible(v) === keys(s) }.reduce(_ && _)
      visible.join(keys, on, if (anti) "left_anti" else "left_semi").filter(cond)
    }
    if (isDelete) table.deleteMatching(classify)
    else table.updateMatching(classify, set)
    Seq.empty
  }
}

/** Correlated `[probe] NOT IN (SELECT v FROM … WHERE corr = outer)`
  * DML — exact per-outer-row three-valued SET semantics in TWO
  * distributed joins (there is no single-join form):
  *
  *  1. per-correlation-group probe: one hash-agg of the decorrelated
  *     frame marks groups containing a NULL value;
  *  2. qualification: LEFT-OUTER join the groups — a row with NO
  *     group qualifies (NOT IN over the empty set is TRUE, even for a
  *     NULL probe); a row whose group contains a NULL never qualifies
  *     (every comparison is at best UNKNOWN); a NULL probe against a
  *     non-empty null-free group never qualifies (UNKNOWN); then one
  *     ANTI join on (correlation keys, probe = value) removes rows
  *     whose probe matches a group value.
  *
  * SQL-exact including the edge cases the single-join rewrite gets
  * wrong (NULL values in the set, NULL probes, empty groups). One
  * coordinate MoR commit like every other DML route.
  */
case class IceliteNotInDmlCommand(
    table: IceliteTable, framePlan: LogicalPlan, probeCol: String,
    joinKeys: Seq[(String, String)], cond: Column,
    set: Map[String, Column], isDelete: Boolean)
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit, max, when}
    if (!isDelete && set.isEmpty) return Seq.empty
    val f = ColumnBridge.ofRows(sparkSession, framePlan)
    def classify(visible: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val hasNull = "__corr_hasnull"
      (joinKeys.map(_._2) :+ hasNull :+ SqlDml.CorrVal).foreach { s =>
        require(!visible.columns.contains(s), s"table may not carry $s") }
      val stats = f.groupBy(joinKeys.map(k => col(k._2)): _*)
        .agg(max(when(col(SqlDml.CorrVal).isNull, 1).otherwise(0)).as(hasNull))
      val onStats = joinKeys.map { case (v, s) => visible(v) === stats(s) }.reduce(_ && _)
      val qualified = visible.join(stats, onStats, "left_outer")
        .filter(col(hasNull).isNull ||
          (col(hasNull) === 0 && visible(probeCol).isNotNull))
        .drop(hasNull).drop(joinKeys.map(_._2): _*)
      val values = f.filter(col(SqlDml.CorrVal).isNotNull)
      val onVals = joinKeys.map { case (v, s) => qualified(v) === values(s) }
        .reduce(_ && _) && (qualified(probeCol) === values(SqlDml.CorrVal))
      qualified.join(values, onVals, "left_anti").filter(cond)
    }
    if (isDelete) table.deleteMatching(classify)
    else table.updateMatching(classify, set)
    Seq.empty
  }
}

/** `UPDATE … SET col = (SELECT …) [WHERE local]` → ONE coordinate-based
  * MoR commit. Each scalar subquery lands as a synthetic column of the
  * classified view: uncorrelated = one runtime probe (NULL when empty,
  * loud error past one row); correlated aggregate = the decorrelated
  * per-key frame LEFT-OUTER-joined on the correlation keys, with the
  * aggregate's own empty-input value (EVALUATED over an empty
  * relation at run time — 0 for count, NULL for sum/max, whatever the
  * expression computes — never pattern-guessed, so the classic
  * decorrelation count bug cannot happen) substituted where no group
  * matched; correlated row SELECT = the same join plus a runtime
  * cardinality check scoped to rows the statement ACTUALLY updates.
  * The SET expressions then evaluate over the enriched pre-update row
  * inside [[IceliteTable.updateMatching]]'s single simultaneous
  * projection.
  *
  * Scale: one distributed outer join per distinct scalar subquery
  * (small per-key frames broadcast under AQE), one MoR commit — no
  * per-row subquery re-execution at any size.
  */
case class IceliteScalarSetUpdateCommand(
    table: IceliteTable, specs: Seq[SqlDml.ScalarSetSpec],
    cond: Column, set: Map[String, Column])
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, count, first, lit, when}
    import SqlDml.{scalarName, scCntName, scMarkName}
    def classify(visible: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val synthetic = specs.flatMap {
        case SqlDml.UncorrScalar(i, _, _) => Seq(scalarName(i))
        case SqlDml.CorrAggScalar(i, _, ks, _) =>
          scalarName(i) +: scMarkName(i) +: ks.map(_._2)
        case SqlDml.CorrRowScalar(i, _, ks) =>
          scalarName(i) +: scCntName(i) +: ks.map(_._2)
      }
      synthetic.foreach { s =>
        require(!visible.columns.contains(s), s"table may not carry $s") }
      var df = visible.filter(cond)
      specs.foreach {
        case SqlDml.UncorrScalar(i, plan, dt) =>
          val rows = ColumnBridge.ofRows(sparkSession, plan).limit(2).collect()
          if (rows.length > 1) throw new IllegalStateException(
            "scalar subquery in SET returned more than one row")
          val v = rows.headOption.map(_.get(0)).orNull
          df = df.withColumn(scalarName(i), lit(v).cast(dt))
        case SqlDml.CorrAggScalar(i, frame, ks, emptyEval) =>
          val f = ColumnBridge.ofRows(sparkSession, frame)
            .withColumn(scMarkName(i), lit(true))
          val dt = f.schema(scalarName(i)).dataType
          val fbRow = ColumnBridge.ofRows(sparkSession, emptyEval).collect()(0)
          val fb = if (fbRow.isNullAt(0)) lit(null).cast(dt)
            else lit(fbRow.get(0)).cast(dt)
          val on = ks.map { case (v, s) => df(v) === f(s) }.reduce(_ && _)
          df = df.join(f, on, "left_outer")
            .withColumn(scalarName(i),
              when(col(scMarkName(i)).isNull, fb).otherwise(col(scalarName(i))))
            .drop(scMarkName(i)).drop(ks.map(_._2): _*)
        case SqlDml.CorrRowScalar(i, frame, ks) =>
          val f = ColumnBridge.ofRows(sparkSession, frame)
            .groupBy(ks.map(k => col(k._2)): _*)
            .agg(first(col(scalarName(i))).as(scalarName(i)),
              count(lit(1)).as(scCntName(i)))
          val on = ks.map { case (v, s) => df(v) === f(s) }.reduce(_ && _)
          df = df.join(f, on, "left_outer").drop(ks.map(_._2): _*)
      }
      val cnts = specs.collect { case r: SqlDml.CorrRowScalar => scCntName(r.idx) }
      if (cnts.nonEmpty) {
        if (!df.filter(cnts.map(c => col(c) > 1).reduce(_ || _)).isEmpty)
          throw new IllegalStateException(
            "scalar subquery in SET returned more than one row for an updated row")
        df = df.drop(cnts: _*)
      }
      df
    }
    table.updateMatching(classify, set)
    Seq.empty
  }
}

/** `UPDATE <cat>.<ns>.<t> SET … [WHERE …]` → one
  * [[IceliteTable.updateWhere]] MoR commit.
  */
case class IceliteUpdateCommand(
    table: IceliteTable, cond: Column, set: Map[String, Column])
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    table.updateWhere(cond, set)
    Seq.empty
  }
}

/** `MERGE INTO <cat>.<ns>.<t> USING … ON … WHEN …` → one
  * [[IceliteTable.merge]] commit (classify + delete/data file pair).
  */
case class IceliteMergeCommand(
    table: IceliteTable, sourcePlan: LogicalPlan, keyCols: Seq[String],
    matchedUpdate: Option[Column], matchedDelete: Option[Column],
    notMatchedInsert: Option[Column], matchedUpdateSet: Map[String, Column],
    notMatchedBySourceUpdate: Option[Column] = None,
    notMatchedBySourceDelete: Option[Column] = None,
    notMatchedBySourceUpdateSet: Map[String, Column] = Map.empty,
    notMatchedInsertSet: Map[String, Column] = Map.empty,
    scalarSpecs: Seq[SqlDml.ScalarSetSpec] = Nil)
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, count, first, lit, when}
    import SqlDml.{scalarName, scCntName, scMarkName}
    var src = ColumnBridge.ofRows(sparkSession, sourcePlan)
    // WHEN MATCHED UPDATE SET scalar subqueries: decorrelated frames
    // join onto the source ONCE here, before the classify — the set
    // expressions then read the synthetic `s.__scalar_i` columns
    // (correlation keys are source columns by construction, see
    // translateMerge; target-key correlation rides the same-named
    // source column, equal wherever a matched update evaluates)
    scalarSpecs.foreach { spec =>
      val s = scalarName(spec.idx)
      require(!src.columns.contains(s), s"merge source may not carry $s")
      spec match {
        case SqlDml.UncorrScalar(i, plan, dt) =>
          val rows = ColumnBridge.ofRows(sparkSession, plan).limit(2).collect()
          if (rows.length > 1) throw new IllegalStateException(
            "scalar subquery in MERGE SET returned more than one row")
          src = src.withColumn(scalarName(i), lit(rows.headOption.map(_.get(0)).orNull).cast(dt))
        case SqlDml.CorrAggScalar(i, frame, ks, emptyEval) =>
          val f = ColumnBridge.ofRows(sparkSession, frame)
            .withColumn(scMarkName(i), lit(true))
          val dt = f.schema(scalarName(i)).dataType
          val fbRow = ColumnBridge.ofRows(sparkSession, emptyEval).collect()(0)
          val fb = if (fbRow.isNullAt(0)) lit(null).cast(dt)
            else lit(fbRow.get(0)).cast(dt)
          val on = ks.map { case (v, sc) => src(v) === f(sc) }.reduce(_ && _)
          src = src.join(f, on, "left_outer")
            .withColumn(scalarName(i),
              when(col(scMarkName(i)).isNull, fb).otherwise(col(scalarName(i))))
            .drop(scMarkName(i)).drop(ks.map(_._2): _*)
        case SqlDml.CorrRowScalar(i, frame, ks) =>
          val f = ColumnBridge.ofRows(sparkSession, frame)
            .groupBy(ks.map(k => col(k._2)): _*)
            .agg(first(col(scalarName(i))).as(scalarName(i)),
              count(lit(1)).as(scCntName(i)))
          val on = ks.map { case (v, sc) => src(v) === f(sc) }.reduce(_ && _)
          src = src.join(f, on, "left_outer").drop(ks.map(_._2): _*)
      }
    }
    val cnts = scalarSpecs.collect { case r: SqlDml.CorrRowScalar => scCntName(r.idx) }
    if (cnts.nonEmpty) {
      // SQL scalar cardinality error, scoped to source rows that MATCH
      // a target row (the rows a matched update can touch) — an
      // over-cardinality subquery on a never-matched source row is
      // never evaluated and must not fail the statement
      val matched = src.join(
        table.read().select(keyCols.map(col): _*), keyCols, "left_semi")
      if (!matched.filter(cnts.map(c => col(c) > 1).reduce(_ || _)).isEmpty)
        throw new IllegalStateException(
          "scalar subquery in MERGE SET returned more than one row for a matched row")
      src = src.drop(cnts: _*)
    }
    table.merge(src, keyCols, matchedUpdate, matchedDelete,
      notMatchedInsert, matchedUpdateSet,
      notMatchedBySourceUpdate, notMatchedBySourceDelete, notMatchedBySourceUpdateSet,
      notMatchedInsertSet)
    Seq.empty
  }
}
