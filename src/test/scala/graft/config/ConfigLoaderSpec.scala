package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's config tests (ConfigLoaderTest.java: valid
  * load / missing-required / defaults / env substitution) plus engine
  * additions (bucket transform parsing, duplicate targets).
  */
class ConfigLoaderSpec extends AnyFunSuite {

  private val validYaml =
    """mongodb: { uri: "mongodb://localhost:27017", database: "mydb" }
      |iceberg:
      |  catalog: { type: "local", warehouse: "/tmp/warehouse" }
      |  properties: { client.region: "us-east-1" }
      |sync:
      |  collections:
      |    - source: { collection: "orders" }
      |      target: { namespace: "analytics", table: "orders" }
      |      mapping:
      |        mode: "explicit"
      |        fields:
      |          - { source: "_id",           target: "id",            type: "string" }
      |          - { source: "customer.name", target: "customer_name", type: "string" }
      |          - { source: "total",         target: "total",         type: "decimal" }
      |      partitioning: [ { field: "order_date", transform: "month" } ]
      |      batch: { maxRecords: 1000, maxBytes: 1048576, flushIntervalSeconds: 5 }
      |""".stripMargin

  test("valid config loads with every section bound") {
    val cfg = ConfigLoader.loadString(validYaml, Map.empty)
    assert(cfg.mongodb.uri == "mongodb://localhost:27017")
    assert(cfg.mongodb.database == "mydb")
    assert(cfg.iceberg.catalog.`type` == "local")
    assert(cfg.iceberg.catalog.warehouse.contains("/tmp/warehouse"))
    assert(cfg.iceberg.properties == Map("client.region" -> "us-east-1"))
    val c = cfg.sync.collections.head
    assert(c.source.collection == "orders")
    assert(c.target.qualifiedName == "analytics.orders")
    assert(c.mapping.mode == "explicit")
    assert(c.mapping.fields.map(_.target) == Seq("id", "customer_name", "total"))
    assert(c.mapping.fields(1).source == "customer.name")
    assert(c.partitioning == Seq(PartitionConfig("order_date", "month")))
    assert(c.batch == BatchConfig(1000, 1048576, 5))
  }

  test("missing required field fails with the exact path") {
    val yaml = validYaml.replace("""database: "mydb"""", "").replace("mongodb: { uri", "mongodb: { uri")
    val e = intercept[ConfigError](ConfigLoader.loadString(
      validYaml.replace(""", database: "mydb"""", ""), Map.empty))
    assert(e.getMessage.contains("mongodb.database"))
  }

  test("missing sync.collections fails") {
    val yaml =
      """mongodb: { uri: "u", database: "d" }
        |iceberg: { catalog: { type: "local", warehouse: "/w" } }
        |sync: { }
        |""".stripMargin
    val e = intercept[ConfigError](ConfigLoader.loadString(yaml, Map.empty))
    assert(e.getMessage.contains("sync.collections"))
  }

  test("defaults applied: mapping auto, no partitioning, batch 50k/128MB/60s") {
    val yaml =
      """mongodb: { uri: "u", database: "d" }
        |iceberg: { catalog: { type: "local", warehouse: "/w" } }
        |sync:
        |  collections:
        |    - source: { collection: "c" }
        |      target: { namespace: "ns", table: "t" }
        |""".stripMargin
    val c = ConfigLoader.loadString(yaml, Map.empty).sync.collections.head
    assert(c.mapping == MappingConfig.Auto)
    assert(c.partitioning.isEmpty)
    assert(c.batch == BatchConfig(50000L, 134217728L, 60L))
  }

  test("env var substitution, recursive through nested objects and arrays") {
    val yaml =
      """mongodb: { uri: "${MONGO_URI}", database: "${DB_NAME}" }
        |iceberg:
        |  catalog: { type: "local", warehouse: "${WH}/lake" }
        |sync:
        |  collections:
        |    - source: { collection: "${COLL}" }
        |      target: { namespace: "ns", table: "${COLL}" }
        |""".stripMargin
    val env = Map("MONGO_URI" -> "mongodb://h:1", "DB_NAME" -> "db",
      "WH" -> "/data", "COLL" -> "orders")
    val cfg = ConfigLoader.loadString(yaml, env)
    assert(cfg.mongodb.uri == "mongodb://h:1")
    assert(cfg.iceberg.catalog.warehouse.contains("/data/lake"))
    assert(cfg.sync.collections.head.source.collection == "orders")
    assert(cfg.sync.collections.head.target.table == "orders")
  }

  test("missing env var is an error naming the variable") {
    val yaml = validYaml.replace("mongodb://localhost:27017", "${NOT_SET_VAR}")
    val e = intercept[ConfigError](ConfigLoader.loadString(yaml, Map.empty))
    assert(e.getMessage.contains("NOT_SET_VAR"))
  }

  test("invalid catalog type / missing per-type key") {
    val bad = validYaml.replace("\"local\"", "\"ftp\"")
    val e = intercept[ConfigError](ConfigLoader.loadString(bad, Map.empty))
    assert(e.getMessage.contains("iceberg.catalog.type"))

    val noWh = validYaml.replace(", warehouse: \"/tmp/warehouse\"", "")
    val e2 = intercept[ConfigError](ConfigLoader.loadString(noWh, Map.empty))
    assert(e2.getMessage.contains("warehouse"))
  }

  test("explicit mapping without fields fails; invalid mode fails") {
    val yaml =
      """mongodb: { uri: "u", database: "d" }
        |iceberg: { catalog: { type: "local", warehouse: "/w" } }
        |sync:
        |  collections:
        |    - source: { collection: "c" }
        |      target: { namespace: "ns", table: "t" }
        |      mapping: { mode: "explicit" }
        |""".stripMargin
    val e = intercept[ConfigError](ConfigLoader.loadString(yaml, Map.empty))
    assert(e.getMessage.contains("mapping.fields"))

    val e2 = intercept[ConfigError](ConfigLoader.loadString(
      yaml.replace("\"explicit\"", "\"magic\""), Map.empty))
    assert(e2.getMessage.contains("mapping.mode"))
  }

  test("partition transforms: bucket[N] parses, bucket[0] and junk rejected") {
    assert(PartitionConfig("k", "bucket[16]").bucketCount.contains(16))
    assert(PartitionConfig.isValidTransform("identity"))
    assert(PartitionConfig.isValidTransform("hour"))
    assert(!PartitionConfig.isValidTransform("bucket[0]"))
    assert(!PartitionConfig.isValidTransform("bucket[]"))
    assert(!PartitionConfig.isValidTransform("weekly"))
  }

  test("duplicate target tables rejected") {
    val dup =
      """mongodb: { uri: "u", database: "d" }
        |iceberg: { catalog: { type: "local", warehouse: "/w" } }
        |sync:
        |  collections:
        |    - source: { collection: "a" }
        |      target: { namespace: "ns", table: "t" }
        |    - source: { collection: "b" }
        |      target: { namespace: "ns", table: "t" }
        |""".stripMargin
    val e = intercept[ConfigError](ConfigLoader.loadString(dup, Map.empty))
    assert(e.getMessage.contains("duplicate"))
  }
}
