package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.config.{ConfigError, ConfigLoader}
import graft.sync.SyncOrchestrator
import graft.table.IceliteTable

/** Daemon entry point (reference `SyncDaemon.java:34-60`): load + validate
  * the YAML config, then run every configured collection through the sync
  * lifecycle — initial sync, change-log drain, rebuild on invalidate,
  * post-drain maintenance. Batch-drain semantics here (AvailableNow — the
  * fixture world's steady state); a long-running deployment swaps the
  * drain trigger for `Trigger.ProcessingTime(flushIntervalSeconds)`.
  *
  * Exit codes mirror the reference: 1 for a config error (message on
  * stderr), 0 on success.
  */
object SyncMain {

  /** Testable core: returns the synced tables keyed by qualified name.
    * The catalog factory resolves the configured type (reference
    * `IcebergConfig.java` switch): data lands under the catalog's
    * warehouse, and every synced table's location is REGISTERED with
    * the catalog afterwards — a no-op for the filesystem catalog, a
    * real pointer publish for a REST catalog.
    */
  def run(spark: SparkSession, configPath: String): Map[String, IceliteTable] = {
    val config = ConfigLoader.load(Paths.get(configPath))
    val catalog = graft.catalog.CatalogFactory.from(spark, config.iceberg.catalog,
      Files.createTempDirectory("graft-warehouse").toString)
    val warehouse = catalog.warehouse
    val orchestrator = new SyncOrchestrator(spark, config, warehouse)
    val tables = orchestrator.syncAll(s"$warehouse/_stream_checkpoints")
    // namespace/table come from the config, never re-parsed out of the
    // qualified name (a namespace may itself contain a dot)
    config.sync.collections.foreach { c =>
      if (tables.contains(c.target.qualifiedName))
        catalog.register(c.target.namespace, c.target.table,
          s"$warehouse/${c.target.namespace}/${c.target.table}")
    }
    tables
  }

  def main(args: Array[String]): Unit = {
    if (args.length != 1) {
      System.err.println("usage: graft.SyncMain <config.yaml>")
      sys.exit(1)
    }
    try {
      val spark = SparkSession.builder()
        .appName("graft-sync")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      val tables = run(spark, args(0))
      tables.foreach { case (name, table) =>
        println(s"$name: ${table.read().count()} rows at seq ${table.meta.lastSeq}")
      }
    } catch {
      case e: ConfigError =>
        System.err.println(s"configuration error: ${e.getMessage}")
        sys.exit(1)
    }
  }
}
