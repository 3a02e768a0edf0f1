package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The daemon entry point end to end: YAML config → validated →
  * orchestrated sync of every configured collection.
  */
class SyncMainSpec extends AnyFunSuite with SparkFixture {

  test("run() syncs every configured collection from a YAML config file") {
    val root = Files.createTempDirectory("main-fix")
    val wh = Files.createTempDirectory("main-wh").toString
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
         |    type: local
         |    warehouse: "$wh"
         |sync:
         |  collections:
         |    - source:
         |        collection: orders
         |      target:
         |        namespace: analytics
         |        table: orders
         |""".stripMargin
    val cfgFile = root.resolve("sync.yaml")
    Files.writeString(cfgFile, yaml)
    val tables = SyncMain.run(spark, cfgFile.toString)
    assert(tables.keySet == Set("analytics.orders"))
    assert(tables("analytics.orders").read().count() == 3)
  }

  test("config errors surface as ConfigError (exit-1 path)") {
    val bad = Files.createTempDirectory("main-bad").resolve("bad.yaml")
    Files.writeString(bad, "mongodb:\n  uri: \"x\"\n") // missing database + sections
    intercept[graft.config.ConfigError] {
      SyncMain.run(spark, bad.toString)
    }
  }
}
