package graft.catalog

import java.net.InetSocketAddress
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.config.CatalogConfig
import graft.table.IceliteTable

/** The catalog factory seam, proven behavioral: a `rest`-type config
  * talks real HTTP to an Iceberg-REST-shaped server (in-process stub —
  * the sandbox has no external endpoint) and round-trips table
  * metadata: create a table, register its location, list it back,
  * load it by the returned pointer from a fresh handle, and see the
  * same snapshots/refs. `local` and `s3tables` resolve to the
  * directory catalog.
  */
class RestCatalogSpec extends AnyFunSuite with SparkFixture with BeforeAndAfterAll {

  private val mapper = new ObjectMapper

  // ---------------- in-process Iceberg-REST-shaped stub server ----------------
  // state: namespace → (table → metadata-location)
  private val state =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentHashMap[String, String]]()
  private var server: HttpServer = _
  private var port: Int = _

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    x.getResponseHeaders.add("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length)
    x.getResponseBody.write(bytes)
    x.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/", (x: HttpExchange) => {
      try {
        val path = x.getRequestURI.getPath.stripPrefix("/v1/").split("/").toSeq
        (x.getRequestMethod, path) match {
          case ("GET", Seq("namespaces")) =>
            val arr = mapper.createArrayNode()
            state.keySet().forEach { ns => arr.add(mapper.createArrayNode().add(ns)) }
            val root = mapper.createObjectNode(); root.set("namespaces", arr)
            respond(x, 200, mapper.writeValueAsString(root))
          case ("GET", Seq("namespaces", ns, "tables")) =>
            val arr = mapper.createArrayNode()
            Option(state.get(ns)).foreach(_.keySet().forEach { t =>
              val id = mapper.createObjectNode()
              id.set("namespace", mapper.createArrayNode().add(ns))
              id.put("name", t)
              arr.add(id)
            })
            val root = mapper.createObjectNode(); root.set("identifiers", arr)
            respond(x, 200, mapper.writeValueAsString(root))
          case ("POST", Seq("namespaces", ns, "register")) =>
            val body = mapper.readTree(x.getRequestBody)
            state.computeIfAbsent(ns, _ => new java.util.concurrent.ConcurrentHashMap())
              .put(body.get("name").asText(), body.get("metadata-location").asText())
            respond(x, 200, "{}")
          case ("GET", Seq("namespaces", ns, "tables", t)) =>
            Option(state.get(ns)).flatMap(m => Option(m.get(t))) match {
              case Some(loc) =>
                val root = mapper.createObjectNode(); root.put("metadata-location", loc)
                respond(x, 200, mapper.writeValueAsString(root))
              case None => respond(x, 404, """{"error":"no such table"}""")
            }
          case _ => respond(x, 400, """{"error":"unsupported"}""")
        }
      } catch { case e: Exception => respond(x, 500, s"""{"error":"$e"}""") }
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def rows(data: (Long, String)*): DataFrame = {
    import spark.implicits._
    data.toDF("id", "v")
  }

  test("factory resolves catalog types; rest requires its uri at the seam") {
    val wh = Files.createTempDirectory("cat-wh").toString
    assert(CatalogFactory.from(spark, CatalogConfig("local", warehouse = Some(wh)), wh)
      .isInstanceOf[LocalCatalog])
    assert(CatalogFactory.from(spark, CatalogConfig("s3tables", arn = Some("arn:x")), wh)
      .isInstanceOf[LocalCatalog]) // documented sandbox collapse
    assert(CatalogFactory.from(spark,
      CatalogConfig("rest", uri = Some(s"http://127.0.0.1:$port")), wh)
      .isInstanceOf[RestCatalog])
  }

  test("rest catalog round-trips table metadata over real HTTP") {
    val wh = Files.createTempDirectory("cat-wh").toString
    val cat = new RestCatalog(s"http://127.0.0.1:$port", wh)

    // create a real table, advance it, tag it — then publish the pointer
    val t = IceliteTable.create(spark, wh, "cat_ns", "events", rows().schema)
    t.upsert(rows((1L, "a"), (2L, "b")), Seq("id"))
    t.upsert(rows((2L, "b2"), (3L, "c")), Seq("id"))
    t.createTag("v1", t.meta.lastSeq)
    cat.register("cat_ns", "events", s"$wh/cat_ns/events")

    assert(cat.listNamespaces().contains("cat_ns"))
    assert(cat.listTables("cat_ns") == Seq("events"))
    assert(cat.locationOf("cat_ns", "missing").isEmpty)

    // load from the catalog's pointer with a FRESH handle: same state
    val loc = cat.locationOf("cat_ns", "events").get
    val relative = loc.stripPrefix(s"$wh/").split("/")
    val reloaded = IceliteTable.load(spark, wh, relative(0), relative(1))
    assert(reloaded.read().count() == 3)
    assert(reloaded.refs == Map("v1" -> ("tag", t.meta.lastSeq)))
    assert(reloaded.meta.snapshots.map(_.seq) == t.meta.snapshots.map(_.seq))
  }

  test("rest-type YAML config syncs and registers its tables with the catalog server") {
    val root = Files.createTempDirectory("rest-fix")
    val wh = Files.createTempDirectory("rest-wh").toString
    val dir = root.resolve("shop")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("orders.jsonl"),
      (1 to 3).map(i =>
        s"""{"_id":{"$$oid":"65f1a2b3c4d5e6f7a8b9c00$i"},"total":{"$$numberDouble":"$i.5"}}""")
        .mkString("", "\n", "\n"))
    val yaml =
      s"""mongodb:
         |  uri: "$root"
         |  database: shop
         |iceberg:
         |  catalog:
         |    type: rest
         |    uri: "http://127.0.0.1:$port"
         |    warehouse: "$wh"
         |sync:
         |  collections:
         |    - source:
         |        collection: orders
         |      target:
         |        namespace: rest_analytics
         |        table: orders
         |""".stripMargin
    val cfgFile = root.resolve("sync.yaml")
    Files.writeString(cfgFile, yaml)
    val tables = graft.SyncMain.run(spark, cfgFile.toString)
    assert(tables("rest_analytics.orders").read().count() == 3)
    // the sync published its pointer to the REST catalog over HTTP
    val cat = new RestCatalog(s"http://127.0.0.1:$port", wh)
    assert(cat.listTables("rest_analytics") == Seq("orders"))
    assert(cat.locationOf("rest_analytics", "orders")
      .contains(s"$wh/rest_analytics/orders"))
  }

  test("local catalog lists the warehouse tree and rejects foreign locations") {
    val wh = Files.createTempDirectory("cat-wh").toString
    IceliteTable.create(spark, wh, "ns_a", "t1", rows().schema)
    IceliteTable.create(spark, wh, "ns_b", "t2", rows().schema)
    val cat = new LocalCatalog(spark, wh)
    assert(cat.listNamespaces() == Seq("ns_a", "ns_b"))
    assert(cat.listTables("ns_a") == Seq("t1"))
    assert(cat.locationOf("ns_b", "t2").exists(_.endsWith("ns_b/t2")))
    assert(cat.locationOf("ns_a", "nope").isEmpty)
    intercept[IllegalArgumentException](cat.register("ns_a", "t1", "/elsewhere/t1"))
  }
}
