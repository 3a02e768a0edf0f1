package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{AliasIdentifier, FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, UpCast}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** Persistent SQL views on icelite catalogs. Spark 4.1 ships the DSv2
  * [[org.apache.spark.sql.connector.catalog.ViewCatalog]] interface
  * but NO analyzer or execution path for it: `ResolveSessionCatalog`
  * routes view DDL to the session catalog and throws
  * `MISSING_CATALOG_ABILITY` for every other catalog UNCONDITIONALLY
  * (it never loads the view ability), and injected resolution rules
  * run after it — too late. So the SQL surface lands in two pieces,
  * both injected via [[graft.functions.GraftExtensions]]:
  *
  *  - [[IceliteViewParser]] (a delegating `injectParser` wrapper)
  *    rewrites freshly-parsed view DDL whose target resolves to an
  *    icelite catalog — `CREATE [OR REPLACE] VIEW [IF NOT EXISTS]`,
  *    `DROP VIEW [IF EXISTS]`, `SHOW VIEWS`, `ALTER VIEW …
  *    SET/UNSET TBLPROPERTIES`, `ALTER VIEW … AS`, `ALTER VIEW …
  *    RENAME TO` — into graft statements BEFORE the analyzer can
  *    reject them. Temp-view names keep shadowing (a 1-part DROP
  *    VIEW of an existing temp view stays Spark's), and every other
  *    statement passes through untouched.
  *  - [[IceliteViewRule]] (a resolution rule) finishes the job: it
  *    converts the statements to runnable commands once their query
  *    child is analyzed (the analyzed output IS the view's stored
  *    schema contract), and it INLINES reads — an
  *    [[UnresolvedRelation]] naming a stored view becomes its parsed
  *    definition, with CREATE-time catalog/namespace completing any
  *    name the view text left unqualified (views capture their
  *    creation context), nested views expanded recursively with
  *    cycle detection, and the stored output contract pinned on top
  *    (by-name projection + [[UpCast]]) so underlying-table
  *    evolution that would silently reshape or narrow the view
  *    fails loudly instead.
  *
  * All mutations route through the [[IceliteCatalog]] ViewCatalog
  * API ([[ViewStore]] JSON under `<ns>/_views/`) — one write path
  * for SQL and programmatic callers.
  *
  * Governance: view reads re-resolve every referenced table through
  * the catalog DURING analysis, so a governed catalog's row-filter/
  * column-mask policies apply under the view — there is no stored
  * plan to launder ungoverned data through. View DDL on a governed
  * catalog refuses (read-only role, same as every other write).
  *
  * Scale: a view is analysis-time metadata only — one small JSON
  * read, then the inlined plan plans exactly like the hand-written
  * query (pushdown, pruning, join strategy unchanged at any size).
  *
  * Refusal discipline: INSERT/UPDATE/DELETE/MERGE targeting a view,
  * streaming reads of a view, definitions referencing temp views,
  * duplicate output names, and non-COMPENSATION schema modes all
  * refuse loudly rather than half-work.
  */
object IceliteViews {

  def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(s"icelite views: $what")

  def viewKey(catName: String, ident: Identifier): String =
    (Seq(catName) ++ ident.namespace().toSeq :+ ident.name()).mkString(".")

  private def iceliteCatalog(session: SparkSession, name: String)
      : Option[(String, IceliteCatalog)] = {
    val cm = session.sessionState.catalogManager
    if (!cm.isCatalogRegistered(name)) None
    else cm.catalog(name) match {
      case c: IceliteCatalog => Some((name, c))
      case _ => None
    }
  }

  /** Complete a possibly-partial name against the session's CURRENT
    * catalog/namespace, keeping only icelite-catalog results.
    */
  def resolveParts(session: SparkSession, parts: Seq[String])
      : Option[(String, IceliteCatalog, Identifier)] = {
    val cm = session.sessionState.catalogManager
    parts match {
      case Seq(cat, ns, v) =>
        iceliteCatalog(session, cat).map { case (n, c) => (n, c, Identifier.of(Array(ns), v)) }
      case Seq(ns, v) => cm.currentCatalog match {
        case c: IceliteCatalog => Some((c.name(), c, Identifier.of(Array(ns), v)))
        case _ => None
      }
      case Seq(v) => cm.currentCatalog match {
        case c: IceliteCatalog if cm.currentNamespace.length == 1 =>
          Some((c.name(), c, Identifier.of(cm.currentNamespace, v)))
        case _ => None
      }
      case _ => None
    }
  }

  /** Like [[resolveParts]] but only when the view exists. */
  def storedView(session: SparkSession, parts: Seq[String])
      : Option[(String, IceliteCatalog, Identifier, IceliteViewMeta)] =
    resolveParts(session, parts).flatMap { case (n, c, id) =>
      c.viewMeta(id).map((n, c, id, _))
    }

  /** Build the ViewCatalog create payload from an ANALYZED query. */
  def viewInfo(ident: Identifier, sql: String,
      userCols: Seq[(String, Option[String])], comment: Option[String],
      properties: Map[String, String], query: LogicalPlan,
      currentCatalog: String, currentNamespace: Seq[String]): ViewInfo = {
    val qcn = query.output.map(_.name)
    val dups = qcn.groupBy(_.toLowerCase(java.util.Locale.ROOT)).filter(_._2.size > 1).keys
    if (dups.nonEmpty) refuse(
      s"query output has duplicate column names (${dups.mkString(", ")}) — alias them uniquely")
    // the user alias list IS the pinned output contract when present —
    // the same duplicate check applies (CREATE VIEW v (a, a) AS …
    // would otherwise store an ambiguous contract that only fails at
    // read time; Spark's own CreateView validation is bypassed here
    // because the parser rewrite replaces the node pre-analysis)
    val aliasDups = userCols.map(_._1)
      .groupBy(_.toLowerCase(java.util.Locale.ROOT)).filter(_._2.size > 1).keys
    if (aliasDups.nonEmpty) refuse(
      s"view column list has duplicate names (${aliasDups.mkString(", ")})")
    if (userCols.nonEmpty && userCols.size != qcn.size)
      throw new IllegalArgumentException(
        s"view column list has ${userCols.size} names but the query produces ${qcn.size} columns")
    val aliases = userCols.map(_._1)
    val outNames = if (aliases.nonEmpty) aliases else qcn
    val schema = StructType(query.schema.fields.zip(outNames).map {
      case (f, n) => f.copy(name = n)
    })
    val props = properties ++ comment.map(
      org.apache.spark.sql.connector.catalog.ViewCatalog.PROP_COMMENT -> _)
    import scala.jdk.CollectionConverters._
    new ViewInfo(ident, sql, currentCatalog, currentNamespace.toArray, schema,
      qcn.toArray, aliases.toArray,
      userCols.map(_._2.orNull).toArray, props.asJava)
  }

  /** A persistent view must not capture session-temporary state: the
    * definition is replayed in later sessions where the temp view no
    * longer exists (or worse, means something else).
    */
  def requireNoTempViews(query: LogicalPlan, what: String): Unit =
    query.collectFirst {
      case v: View if v.isTempView => v.desc.identifier.table
    }.foreach(n => refuse(
      s"$what references temporary view '$n' — persistent views may only reference catalog objects"))
}

/** Parse-time rewrite of view DDL targeting icelite catalogs (see
  * [[IceliteViews]] scaladoc for why this cannot be a resolution
  * rule). Every other statement — and every view statement whose
  * target is NOT an icelite catalog or is shadowed by a temp view —
  * delegates untouched.
  */
class IceliteViewParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import IceliteViews._

  private def isTempShadowed(parts: Seq[String]): Boolean =
    parts.length <= 2 && session.sessionState.catalog.isTempView(parts)

  private def ctx: (String, Seq[String]) = {
    val cm = session.sessionState.catalogManager
    (cm.currentCatalog.name(), cm.currentNamespace.toSeq)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan transformDown {
    case c @ CreateView(UnresolvedIdentifier(parts, _), userCols, comment,
        collation, props, originalText, query, allowExisting, replace, schemaMode) =>
      resolveParts(session, parts).map { case (catName, _, ident) =>
        val mode = schemaMode.toString
        if (mode != "COMPENSATION" && mode != "BINDING")
          refuse(s"view schema mode $mode is not supported (COMPENSATION/BINDING only)")
        if (collation.isDefined) refuse("DEFAULT COLLATION on views is not supported")
        val sql = originalText.getOrElse(refuse("CREATE VIEW without original SQL text"))
        val (curCat, curNs) = ctx
        IceliteCreateViewStatement(catName, ident, sql, userCols, comment,
          props, query, allowExisting, replace, curCat, curNs): LogicalPlan
      }.getOrElse(c)

    case d @ DropView(UnresolvedIdentifier(parts, _), ifExists)
        if !isTempShadowed(parts) =>
      resolveParts(session, parts).map { case (_, cat, ident) =>
        IceliteDropViewCommand(cat, ident, ifExists): LogicalPlan
      }.getOrElse(d)

    case s @ ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
      (parts match {
        case Seq(cat, ns) => resolveParts(session, Seq(cat, ns, "?")).map(t => (t._2, ns))
        case Seq(ns) => resolveParts(session, Seq(ns, "?")).map(t => (t._2, ns))
        case Seq() =>
          val cm = session.sessionState.catalogManager
          cm.currentCatalog match {
            case c: IceliteCatalog if cm.currentNamespace.length == 1 =>
              Some((c, cm.currentNamespace.head))
            case _ => None
          }
        case _ => None
      }).map { case (cat, ns) =>
        IceliteShowViewsCommand(cat, Seq(ns), pattern, output): LogicalPlan
      }.getOrElse(s)

    case s @ SetViewProperties(UnresolvedView(parts, _, _, _), props)
        if !isTempShadowed(parts) =>
      resolveParts(session, parts).map { case (_, cat, ident) =>
        IceliteAlterViewPropsCommand(cat, ident,
          props.map { case (k, v) => ViewChange.setProperty(k, v) }.toSeq,
          Nil, unsetIfExists = true): LogicalPlan
      }.getOrElse(s)

    case s @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, ifExists)
        if !isTempShadowed(parts) =>
      resolveParts(session, parts).map { case (_, cat, ident) =>
        IceliteAlterViewPropsCommand(cat, ident, Nil, keys,
          unsetIfExists = ifExists): LogicalPlan
      }.getOrElse(s)

    case a @ AlterViewAs(UnresolvedView(parts, _, _, _), originalText, query)
        if !isTempShadowed(parts) =>
      resolveParts(session, parts).map { case (catName, _, ident) =>
        val (curCat, curNs) = ctx
        IceliteAlterViewAsStatement(catName, ident, originalText, query,
          curCat, curNs): LogicalPlan
      }.getOrElse(a)

    case d @ DescribeRelation(UnresolvedTableOrView(parts, _, _), partitionSpec,
        isExtended, output) if !isTempShadowed(parts) =>
      storedView(session, parts).map { case (catName, _, ident, meta) =>
        if (partitionSpec.nonEmpty) refuse("DESCRIBE ... PARTITION targets a view")
        IceliteDescribeViewCommand(catName, ident, meta, isExtended, output): LogicalPlan
      }.getOrElse(d)

    case s @ ShowCreateTable(UnresolvedTableOrView(parts, _, _), _, output)
        if !isTempShadowed(parts) =>
      storedView(session, parts).map { case (catName, _, ident, meta) =>
        IceliteShowCreateViewCommand(catName, ident, meta, output): LogicalPlan
      }.getOrElse(s)

    // SET NOT NULL (and nothing else) on an icelite table: Spark's
    // analyzer refuses nullability tightening for v2 tables outright,
    // so route it to the catalog at parse time; the engine supplies
    // the one-scan proof (see IceliteSetNotNullCommand). Statements
    // mixing other column changes delegate untouched.
    case ac @ AlterColumns(org.apache.spark.sql.catalyst.analysis.UnresolvedTable(parts, _, _), specs)
        if specs.nonEmpty && specs.forall(s =>
          s.newNullability.contains(false) && s.newDataType.isEmpty &&
            s.newComment.isEmpty && s.newPosition.isEmpty &&
            s.newDefaultExpression.isEmpty && !s.dropDefault &&
            s.column.name.length == 1) && !isTempShadowed(parts) =>
      resolveParts(session, parts).map { case (catName, _, ident) =>
        IceliteSetNotNullCommand(catName, ident, specs.map(_.column.name.head)): LogicalPlan
      }.getOrElse(ac)

    case r @ RenameTable(UnresolvedTableOrView(parts, _, _), newName, true)
        if !isTempShadowed(parts) =>
      resolveParts(session, parts).map { case (catName, cat, ident) =>
        if (!cat.viewExists(ident)) {
          if (cat.tableExists(ident))
            refuse(s"${ident.toString} is a table, not a view — use ALTER TABLE RENAME")
          throw new NoSuchViewException(ident)
        }
        val to = newName match {
          case Seq(c2, ns2, v2) =>
            if (c2 != catName) refuse(
              s"ALTER VIEW RENAME across catalogs ($catName -> $c2) is not supported")
            Identifier.of(Array(ns2), v2)
          case Seq(ns2, v2) => Identifier.of(Array(ns2), v2)
          case Seq(v2) => Identifier.of(ident.namespace(), v2)
          case other => refuse(s"bad rename target ${other.mkString(".")}")
        }
        IceliteRenameViewCommand(cat, ident, to): LogicalPlan
      }.getOrElse(r)
  }

  override def parsePlan(sqlText: String): LogicalPlan = rewrite(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Parsed-but-not-yet-analyzed CREATE VIEW: the query child rides the
  * normal analyzer fixpoint (so views-over-views and icelite relations
  * inside it resolve), then [[IceliteViewRule]] converts to the
  * runnable command.
  */
case class IceliteCreateViewStatement(
    catName: String, ident: Identifier, sql: String,
    userCols: Seq[(String, Option[String])], comment: Option[String],
    properties: Map[String, String], query: LogicalPlan,
    allowExisting: Boolean, replace: Boolean,
    currentCatalog: String, currentNamespace: Seq[String])
  extends UnaryCommand {
  override def child: LogicalPlan = query
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(query = newChild)
}

/** Parsed-but-not-yet-analyzed ALTER VIEW … AS (same shape). */
case class IceliteAlterViewAsStatement(
    catName: String, ident: Identifier, sql: String, query: LogicalPlan,
    currentCatalog: String, currentNamespace: Seq[String])
  extends UnaryCommand {
  override def child: LogicalPlan = query
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(query = newChild)
}

/** Resolution rule: finalize view statements once analyzed, inline
  * view reads, refuse writes through views (see [[IceliteViews]]).
  */
case class IceliteViewRule(session: SparkSession) extends Rule[LogicalPlan] {

  import IceliteViews._

  private def cat(name: String): IceliteCatalog =
    session.sessionState.catalogManager.catalog(name).asInstanceOf[IceliteCatalog]

  private def unresolvedParts(p: LogicalPlan): Option[Seq[String]] = p match {
    case u: UnresolvedRelation => Some(u.multipartIdentifier)
    case SubqueryAlias(_, child) => unresolvedParts(child)
    case _ => None
  }

  private def isStoredView(p: LogicalPlan): Boolean =
    unresolvedParts(p).exists(parts => storedView(session, parts).isDefined)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val afterDdl = plan match {
      case s: IceliteCreateViewStatement if s.query.resolved =>
        requireNoTempViews(s.query, s"CREATE VIEW ${s.ident.toString}")
        IceliteCreateViewCommand(cat(s.catName), s.ident, s.sql, s.userCols,
          s.comment, s.properties, s.query, s.allowExisting, s.replace,
          s.currentCatalog, s.currentNamespace)
      case s: IceliteAlterViewAsStatement if s.query.resolved =>
        requireNoTempViews(s.query, s"ALTER VIEW ${s.ident.toString} AS")
        IceliteAlterViewAsCommand(cat(s.catName), s.ident, s.sql, s.query,
          s.currentCatalog, s.currentNamespace)
      case other => other
    }

    afterDdl.resolveOperatorsDown {
      case i: InsertIntoStatement if isStoredView(i.table) =>
        refuse(s"cannot INSERT into a view (${unresolvedParts(i.table).get.mkString(".")})")
      case u: UpdateTable if isStoredView(u.table) =>
        refuse("views are not updatable (UPDATE targets a view)")
      case d: DeleteFromTable if isStoredView(d.table) =>
        refuse("views are not updatable (DELETE targets a view)")
      case m: MergeIntoTable if isStoredView(m.targetTable) =>
        refuse("views are not updatable (MERGE targets a view)")
      case u: UnresolvedRelation =>
        storedView(session, u.multipartIdentifier) match {
          case Some((catName, _, ident, meta)) =>
            if (u.isStreaming) refuse(
              s"streaming read of a view (${ident.toString}) — read the underlying table's changelog")
            expand(catName, ident, meta, Set(viewKey(catName, ident)))
          case None => u
        }
    }
  }

  /** Inline one stored view: parse, complete unqualified names with
    * the CREATE-time context, eagerly expand nested icelite views
    * (cycle-checked), pin the stored output contract.
    */
  private def expand(catName: String, ident: Identifier, meta: IceliteViewMeta,
      visited: Set[String]): LogicalPlan = {
    val rawParsed =
      try session.sessionState.sqlParser.parsePlan(meta.sql)
      catch {
        case e: Exception => throw new IllegalStateException(
          s"stored SQL of view ${ident.toString} no longer parses: ${e.getMessage}", e)
      }
    // the analyzer's Substitution batch (where CTESubstitution lives)
    // ran BEFORE this inlining — apply it to the freshly-parsed tree
    // ourselves, so `WITH w AS (…) SELECT … FROM w` resolves `w` as
    // the CTE (and any remaining UnresolvedRelation is a real table,
    // safe to qualify below)
    val parsed = org.apache.spark.sql.catalyst.analysis.CTESubstitution(rawParsed)
    val qualified = parsed.transformDownWithSubqueries {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 1 =>
        u.copy(multipartIdentifier =
          meta.currentCatalog +: meta.currentNamespace :+ u.multipartIdentifier.head)
      case u: UnresolvedRelation if u.multipartIdentifier.length == 2 =>
        u.copy(multipartIdentifier = meta.currentCatalog +: u.multipartIdentifier)
    }
    val inner = qualified.transformDownWithSubqueries {
      case u: UnresolvedRelation if !u.isStreaming =>
        storedView(session, u.multipartIdentifier) match {
          case Some((cn, _, id, m)) =>
            val key = viewKey(cn, id)
            if (visited(key)) refuse(
              s"cyclic view reference: ${visited.toSeq.sorted.mkString(" -> ")} -> $key")
            expand(cn, id, m, visited + key)
          case None => u
        }
    }
    // pin the stored contract: by-name projection + UpCast, so a
    // dropped/renamed source column or a narrowed type fails loudly
    val projectList = meta.queryColumnNames.zip(meta.outputNames)
      .zip(meta.schema.fields).map { case ((qcn, out), f) =>
        Alias(UpCast(UnresolvedAttribute.quoted(qcn), f.dataType), out)()
      }
    SubqueryAlias(
      AliasIdentifier(ident.name(), Seq(catName) ++ ident.namespace().toSeq),
      Project(projectList, inner))
  }
}

/** `CREATE [OR REPLACE] VIEW [IF NOT EXISTS]` → ViewCatalog. */
case class IceliteCreateViewCommand(
    catalog: IceliteCatalog, ident: Identifier, sql: String,
    userCols: Seq[(String, Option[String])], comment: Option[String],
    properties: Map[String, String], query: LogicalPlan,
    allowExisting: Boolean, replace: Boolean,
    currentCatalog: String, currentNamespace: Seq[String])
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val info = IceliteViews.viewInfo(ident, sql, userCols, comment,
      properties, query, currentCatalog, currentNamespace)
    if (replace) catalog.replaceView(info, true)
    else if (allowExisting && catalog.viewExists(ident)) ()
    else catalog.createView(info)
    Seq.empty
  }
}

/** `ALTER VIEW … AS <query>`: new definition, properties preserved,
  * explicit column list cleared (the new query names win).
  */
case class IceliteAlterViewAsCommand(
    catalog: IceliteCatalog, ident: Identifier, sql: String,
    query: LogicalPlan, currentCatalog: String, currentNamespace: Seq[String])
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val existing = catalog.viewMeta(ident).getOrElse(throw new NoSuchViewException(ident))
    val info = IceliteViews.viewInfo(ident, sql, Nil, None,
      existing.properties, query, currentCatalog, currentNamespace)
    catalog.replaceView(info, false)
    Seq.empty
  }
}

case class IceliteDropViewCommand(
    catalog: IceliteCatalog, ident: Identifier, ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    if (!catalog.viewExists(ident)) {
      if (!ifExists) throw new NoSuchViewException(ident)
    } else catalog.dropView(ident)
    Seq.empty
  }
}

case class IceliteRenameViewCommand(
    catalog: IceliteCatalog, from: Identifier, to: Identifier)
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    catalog.renameView(from, to)
    Seq.empty
  }
}

/** ALTER VIEW SET/UNSET TBLPROPERTIES → `alterView` property changes. */
case class IceliteAlterViewPropsCommand(
    catalog: IceliteCatalog, ident: Identifier,
    sets: Seq[ViewChange], unsetKeys: Seq[String], unsetIfExists: Boolean)
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val meta = catalog.viewMeta(ident).getOrElse(throw new NoSuchViewException(ident))
    if (!unsetIfExists) {
      val missing = unsetKeys.filterNot(meta.properties.contains)
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"view ${ident.toString} has no propert${if (missing.size == 1) "y" else "ies"} " +
          s"${missing.mkString(", ")} (use IF EXISTS)")
    }
    val changes = sets ++ unsetKeys.map(ViewChange.removeProperty)
    catalog.alterView(ident, changes: _*)
    Seq.empty
  }
}

/** `DESCRIBE [EXTENDED] <view>` — the stored output contract (the
  * pinned names/types every read is projected to), plus the view
  * metadata block under EXTENDED, mirroring the session catalog's
  * describe-view shape.
  */
case class IceliteDescribeViewCommand(
    catName: String, ident: Identifier, meta: IceliteViewMeta,
    isExtended: Boolean, override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val cols = meta.schema.fields.zip(meta.outputNames)
      .zip(meta.columnComments.padTo(meta.schema.fields.length, None))
      .map { case ((f, n), c) => Row(n, f.dataType.simpleString, c.orNull) }
    val extended = if (!isExtended) Nil else Seq(
      Row("", "", ""),
      Row("# Detailed View Information", "", ""),
      Row("Catalog", catName, ""),
      Row("Namespace", ident.namespace().mkString("."), ""),
      Row("View Name", ident.name(), ""),
      Row("View Text", meta.sql, ""),
      Row("View Creation Context",
        (meta.currentCatalog +: meta.currentNamespace).mkString("."), "")) ++
      meta.properties.toSeq.sortBy(_._1).map { case (k, v) => Row(s"View Property: $k", v, "") }
    (cols ++ extended).toSeq
  }
}

/** `SHOW CREATE TABLE <view>` — replayable DDL from the stored
  * definition (alias list included when the view pinned one).
  */
case class IceliteShowCreateViewCommand(
    catName: String, ident: Identifier, meta: IceliteViewMeta,
    override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val name = (Seq(catName) ++ ident.namespace().toSeq :+ ident.name())
      .map(p => s"`${p.replace("`", "``")}`").mkString(".")
    val aliases = if (meta.columnAliases.nonEmpty)
      meta.columnAliases.map(a => s"`${a.replace("`", "``")}`")
        .mkString(" (", ", ", ")")
    else ""
    Seq(Row(s"CREATE VIEW $name$aliases AS\n${meta.sql}\n"))
  }
}

case class IceliteShowViewsCommand(
    catalog: IceliteCatalog, namespace: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val names = catalog.listViews(namespace: _*).map(_.name()).toSeq
    val filtered = pattern.fold(names)(p =>
      org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(names, p))
    filtered.sorted.map(n => Row(namespace.mkString("."), n, false))
  }
}
