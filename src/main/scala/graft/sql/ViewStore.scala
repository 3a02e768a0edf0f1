package graft.sql

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, ViewAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}

/** Persisted definition of one SQL view: everything needed to replay
  * `CREATE VIEW … AS <sql>` in a LATER session — the query text plus
  * the name-resolution context it was written under (views capture
  * their creation context per the SQL standard; a 1-part table name
  * inside the view must keep meaning the table it meant at CREATE
  * time, not whatever the reader's `USE` points at), plus the
  * analyzed output contract (names + types) so the view's schema is
  * stable and drift in the underlying tables surfaces as a loud
  * analysis error instead of silently reshaping downstream queries.
  */
final case class IceliteViewMeta(
    sql: String,
    currentCatalog: String,
    currentNamespace: Seq[String],
    schema: StructType,
    queryColumnNames: Seq[String],
    columnAliases: Seq[String],
    columnComments: Seq[Option[String]],
    properties: Map[String, String]) {

  /** Output column names: the user's alias list when given
    * (`CREATE VIEW v(x, y) AS …`), else the query's own names.
    */
  def outputNames: Seq[String] =
    if (columnAliases.nonEmpty) columnAliases else queryColumnNames
}

/** Warehouse-backed view metadata store. One JSON file per view at
  * `<warehouse>/<ns>/_views/<name>.json` — invisible to table listing
  * (tables are directories with a `metadata/` child) and swept away
  * with the namespace. Writes land as temp-file + rename; the
  * exclusive-create relies on Hadoop `rename` refusing an existing
  * destination, the same single-writer discipline as the rest of the
  * warehouse metadata (views are low-write-rate DDL, not a data
  * path). Scale: views are pure metadata — a view over a 100 TB
  * table costs one small JSON read at ANALYSIS time, nothing at scan
  * time (the inlined plan optimizes exactly as the hand-written
  * query would, pushdown and pruning included).
  */
final class ViewStore(spark: SparkSession, warehouse: String) {

  private val mapper = new ObjectMapper()

  private def fs: FileSystem = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def viewsDir(ns: String) = new Path(s"$warehouse/$ns/_views")
  private def file(ns: String, name: String) = new Path(viewsDir(ns), s"$name.json")

  def exists(ns: String, name: String): Boolean = fs.exists(file(ns, name))

  def list(ns: String): Seq[String] = {
    val d = viewsDir(ns)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted
  }

  def load(ns: String, name: String): Option[IceliteViewMeta] = {
    val p = file(ns, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      val root = mapper.readTree(bytes)
      def strs(field: String): Seq[String] =
        root.get(field).elements().asScala.map(_.asText()).toSeq
      Some(IceliteViewMeta(
        sql = root.get("sql").asText(),
        currentCatalog = root.get("currentCatalog").asText(),
        currentNamespace = strs("currentNamespace"),
        schema = DataType.fromJson(root.get("schema").asText()).asInstanceOf[StructType],
        queryColumnNames = strs("queryColumnNames"),
        columnAliases = strs("columnAliases"),
        columnComments = root.get("columnComments").elements().asScala
          .map(n => if (n.isNull) None else Some(n.asText())).toSeq,
        properties = root.get("properties").properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap))
    }
  }

  private def render(m: IceliteViewMeta): Array[Byte] = {
    val o = mapper.createObjectNode()
    o.put("sql", m.sql)
    o.put("currentCatalog", m.currentCatalog)
    val cns = o.putArray("currentNamespace"); m.currentNamespace.foreach(cns.add)
    o.put("schema", m.schema.json)
    val qcn = o.putArray("queryColumnNames"); m.queryColumnNames.foreach(qcn.add)
    val ca = o.putArray("columnAliases"); m.columnAliases.foreach(ca.add)
    val cc = o.putArray("columnComments")
    m.columnComments.foreach { c => c.fold { cc.addNull(); () } { v => cc.add(v); () } }
    val props = o.putObject("properties")
    m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    o.toString.getBytes("UTF-8")
  }

  private def writeTemp(ns: String, name: String, m: IceliteViewMeta): Path = {
    val tmp = new Path(viewsDir(ns),
      s".$name.json.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    fs.mkdirs(viewsDir(ns))
    val out = fs.create(tmp, true)
    try out.write(render(m)) finally out.close()
    tmp
  }

  /** Exclusive create. The explicit existence check carries the
    * semantics: Hadoop's RawLocalFileSystem rename is File.renameTo,
    * which on Linux silently REPLACES an existing destination and
    * returns true — relying on rename-refuses-existing alone would
    * turn CREATE into CREATE OR REPLACE on a plain local fs (HDFS and
    * Hive's ProxyLocalFileSystem do refuse; the rename-failure path
    * stays as the race backstop for those).
    */
  def create(ident: Identifier, m: IceliteViewMeta): Unit = {
    val (ns, name) = split(ident)
    if (exists(ns, name)) throw new ViewAlreadyExistsException(ident)
    val tmp = writeTemp(ns, name, m)
    if (!fs.rename(tmp, file(ns, name))) {
      fs.delete(tmp, false)
      throw new ViewAlreadyExistsException(ident)
    }
  }

  /** Replace: delete-then-rename (views are single-writer DDL; the
    * window is a missing view, never a torn one — JSON lands whole
    * via the temp file).
    */
  def replace(ident: Identifier, m: IceliteViewMeta): Unit = {
    val (ns, name) = split(ident)
    val tmp = writeTemp(ns, name, m)
    fs.delete(file(ns, name), false)
    if (!fs.rename(tmp, file(ns, name))) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"concurrent view DDL on ${ident.toString}: replace lost the rename race")
    }
  }

  def drop(ident: Identifier): Boolean = ident.namespace() match {
    // lenient on drop: a multi-level name cannot name a stored view,
    // so DROP VIEW IF EXISTS of one is a no-op "not found", not an
    // unsupported-namespace error (the create/replace/rename paths
    // ARE strict — see split)
    case Array(ns) => fs.delete(file(ns, ident.name()), false)
    case _ => false
  }

  def rename(from: Identifier, to: Identifier): Unit = {
    val (fns, fname) = split(from)
    val (tns, tname) = split(to)
    if (!exists(fns, fname)) throw new NoSuchViewException(from)
    // the explicit check is the semantics on RawLocalFileSystem (see
    // create: local rename silently replaces); the rename-failure
    // path backstops the race on filesystems that do refuse
    if (exists(tns, tname)) throw new ViewAlreadyExistsException(to)
    fs.mkdirs(viewsDir(tns))
    if (!fs.rename(file(fns, fname), file(tns, tname)))
      throw new IllegalStateException(
        s"concurrent view DDL: rename ${from.toString} -> ${to.toString} lost the race")
  }

  private def split(ident: Identifier): (String, String) = ident.namespace() match {
    case Array(ns) => (ns, ident.name())
    case Array() => throw new NoSuchViewException(ident)
    case other => throw new UnsupportedOperationException(
      s"icelite views live in a single-level namespace: got " +
        s"'${other.mkString(".")}.${ident.name()}' (${other.length} levels)")
  }
}

/** [[View]] handed back through the ViewCatalog API. */
final class IceliteView(ident: Identifier, meta: IceliteViewMeta) extends View {
  override def name(): String = ident.toString
  override def query(): String = meta.sql
  override def currentCatalog(): String = meta.currentCatalog
  override def currentNamespace(): Array[String] = meta.currentNamespace.toArray
  override def schema(): StructType = meta.schema
  override def queryColumnNames(): Array[String] = meta.queryColumnNames.toArray
  override def columnAliases(): Array[String] = meta.columnAliases.toArray
  override def columnComments(): Array[String] = meta.columnComments.map(_.orNull).toArray
  override def properties(): java.util.Map[String, String] = meta.properties.asJava
}

object IceliteViewMeta {
  /** [[ViewInfo]] (the ViewCatalog create payload) → persisted meta. */
  def fromInfo(info: ViewInfo): IceliteViewMeta = IceliteViewMeta(
    sql = info.sql,
    currentCatalog = info.currentCatalog,
    currentNamespace = info.currentNamespace.toSeq,
    schema = info.schema,
    queryColumnNames = info.queryColumnNames.toSeq,
    columnAliases = info.columnAliases.toSeq,
    columnComments = info.columnComments.toSeq.map(Option(_)),
    properties = info.properties.asScala.toMap)
}
