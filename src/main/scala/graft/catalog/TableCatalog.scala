package graft.catalog

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.config.CatalogConfig

/** Catalog seam (reference `IcebergConfig.java:22-35`: a factory over
  * catalog type local|s3tables|rest): maps table identifiers to
  * metadata locations and announces new tables. The engine's tables
  * are path-addressed ([[graft.table.IceliteTable]] commits its own
  * metadata under `location/metadata`), so the catalog's job is the
  * Iceberg-REST one — hold the `identifier → metadata-location`
  * pointer — not to mediate every commit.
  */
trait TableCatalog {

  /** Storage root new tables are created under. */
  def warehouse: String

  /** Namespaces known to the catalog. */
  def listNamespaces(): Seq[String]

  /** Table names registered under `namespace`. */
  def listTables(namespace: String): Seq[String]

  /** Publish (or move) the location pointer for a table. */
  def register(namespace: String, table: String, location: String): Unit

  /** The registered location for a table, if any. */
  def locationOf(namespace: String, table: String): Option[String]
}

/** Filesystem-is-the-catalog: the warehouse directory tree IS the
  * identifier→location mapping (`warehouse/namespace/table`), so
  * listing is a directory scan and registration is a no-op for tables
  * already rooted there.
  */
final class LocalCatalog(spark: SparkSession, val warehouse: String)
    extends TableCatalog {

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirs(p: Path): Seq[String] = {
    val f = fs
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  override def listNamespaces(): Seq[String] =
    // "_"-prefixed roots are engine bookkeeping (sync checkpoints,
    // stream checkpoints), not user namespaces
    dirs(new Path(warehouse)).filterNot(_.startsWith("_")).sorted

  override def listTables(namespace: String): Seq[String] =
    if (namespace.startsWith("_")) Nil
    else dirs(new Path(s"$warehouse/$namespace"))
      .filter(t => fs.exists(new Path(s"$warehouse/$namespace/$t/metadata"))).sorted

  override def register(namespace: String, table: String, location: String): Unit = {
    val expected = s"$warehouse/$namespace/$table"
    require(new Path(location).toUri.getPath == new Path(expected).toUri.getPath ||
        location == expected,
      s"local catalog: table location must be its warehouse path ($expected), got $location")
  }

  override def locationOf(namespace: String, table: String): Option[String] = {
    val loc = s"$warehouse/$namespace/$table"
    if (fs.exists(new Path(s"$loc/metadata"))) Some(loc) else None
  }
}

/** Iceberg-REST-shaped catalog client over `java.net.http` — the
  * subset of the public REST catalog protocol the pointer model needs
  * (namespace/table listing, table registration by metadata location,
  * table load returning the location). Paths follow the Iceberg REST
  * OpenAPI shape (`/v1/namespaces`, `/v1/namespaces/{ns}/tables`,
  * `/v1/namespaces/{ns}/register`) so the client would talk to any
  * spec-shaped server; tests run it against an in-process HTTP stub
  * (the sandbox has no external endpoint — SURVEY §7.0).
  */
final class RestCatalog(baseUri: String, val warehouse: String)
    extends TableCatalog {

  private val mapper = new ObjectMapper
  private val http = java.net.http.HttpClient.newHttpClient()
  private val base = baseUri.stripSuffix("/")

  /** Percent-encode one URI path segment (config only requires names
    * to be non-empty, so spaces / '#' / '?' must not break the path).
    */
  private def seg(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  private def send(req: java.net.http.HttpRequest): String = {
    val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"REST catalog ${req.method()} ${req.uri()} → HTTP ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  private def get(path: String): String =
    send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base$path")).GET().build())

  override def listNamespaces(): Seq[String] = {
    val root = mapper.readTree(get("/v1/namespaces"))
    val arr = root.get("namespaces")
    (0 until arr.size()).map(i => arr.get(i).get(0).asText()).sorted
  }

  override def listTables(namespace: String): Seq[String] = {
    val root = mapper.readTree(get(s"/v1/namespaces/${seg(namespace)}/tables"))
    val arr = root.get("identifiers")
    (0 until arr.size()).map(i => arr.get(i).get("name").asText()).sorted
  }

  override def register(namespace: String, table: String, location: String): Unit = {
    val body = mapper.createObjectNode()
    body.put("name", table)
    body.put("metadata-location", location)
    send(java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(s"$base/v1/namespaces/${seg(namespace)}/register"))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
      .build())
    ()
  }

  override def locationOf(namespace: String, table: String): Option[String] = {
    val resp = http.send(
      java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"$base/v1/namespaces/${seg(namespace)}/tables/${seg(table)}"))
        .GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 404) None
    else if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"REST catalog load $namespace.$table → HTTP ${resp.statusCode()}: ${resp.body()}")
    else Option(mapper.readTree(resp.body()).get("metadata-location")).map(_.asText())
  }
}

/** Catalog factory over the validated config (reference
  * `IcebergConfig.java` factory switch). `s3tables` has no reachable
  * endpoint in this environment, so it collapses to the local
  * warehouse with the collapse DOCUMENTED here rather than silently
  * (SURVEY §7.0); `rest` is fully functional against any
  * Iceberg-REST-shaped URI.
  */
object CatalogFactory {

  def from(spark: SparkSession, cfg: CatalogConfig,
      fallbackWarehouse: => String): TableCatalog = cfg.`type` match {
    case "local" =>
      new LocalCatalog(spark, cfg.warehouse.getOrElse(fallbackWarehouse))
    case "rest" =>
      new RestCatalog(cfg.uri.get, cfg.warehouse.getOrElse(fallbackWarehouse))
    case "s3tables" =>
      // sandbox collapse: no S3/ARN endpoint exists here; table data
      // and the directory catalog land in the local warehouse
      new LocalCatalog(spark, cfg.warehouse.getOrElse(fallbackWarehouse))
  }
}
