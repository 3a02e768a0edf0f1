package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.{CollectionSyncConfig, SyncConfig}
import graft.schema.DocumentSource
import graft.table.IceliteTable

/** Multi-collection sync driver (reference SyncDaemon + SyncManager):
  * for each configured collection, run the state machine — initial sync
  * (resumable) then the change stream — against fixture-backed sources.
  *
  * Source layout under `mongodb.uri` (fixture root, §7.0 — no live
  * MongoDB in this environment): `<root>/<database>/<collection>.jsonl`
  * for the collection content and `<root>/<database>/<collection>.changes/`
  * for the ordered change-event log.
  */
final class SyncOrchestrator(spark: SparkSession, config: SyncConfig, warehouse: String) {

  val checkpoints = new CheckpointStore(spark, warehouse)

  private def fixtureRoot: String = config.mongodb.uri.stripPrefix("file://")

  def collectionPath(c: CollectionSyncConfig): String =
    s"$fixtureRoot/${config.mongodb.database}/${c.source.collection}.jsonl"

  def changeLogPath(c: CollectionSyncConfig): String =
    s"$fixtureRoot/${config.mongodb.database}/${c.source.collection}.changes"

  /** Run one collection's full lifecycle in batch mode: initial sync if
    * the decision table says so, then drain the change log (AvailableNow
    * semantics). Returns the target table.
    */
  def syncCollection(c: CollectionSyncConfig, streamCheckpointDir: String): IceliteTable = {
    val source = readSource(c)
    val table = InitialSync.ensureTable(spark, warehouse, c, source)
    val syncId = c.target.qualifiedName

    SyncStateMachine.decideStart(checkpoints.read(syncId)) match {
      case SyncStateMachine.InitialSyncPhase =>
        SyncStateMachine.withRetry(maxAttempts = 3, sleep = _ => ()) {
          new InitialSync(spark, c, table, checkpoints, config.mongodb.database)
            .run(DocumentSource.applyMapping(source, c.mapping))
        }
      case _ => () // already past initial sync
    }

    val changes = new ChangeStreamSync(spark, c, table, checkpoints, config.mongodb.database)
    val fs = new org.apache.hadoop.fs.Path(changeLogPath(c))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(changeLogPath(c)))) {
      val q = changes.start(changeLogPath(c), streamCheckpointDir, availableNow = true)
      q.awaitTermination()
      if (changes.invalidated) {
        // R7: control event ⇒ re-initial-sync from scratch
        val fresh = readSource(c)
        new InitialSync(spark, c, table, checkpoints, config.mongodb.database)
          .run(DocumentSource.applyMapping(fresh, c.mapping))
      }
    }
    table
  }

  def syncAll(streamCheckpointRoot: String): Map[String, IceliteTable] =
    config.sync.collections.map { c =>
      c.target.qualifiedName ->
        syncCollection(c, s"$streamCheckpointRoot/${c.target.qualifiedName}")
    }.toMap

  private def readSource(c: CollectionSyncConfig): DataFrame =
    DocumentSource.readJsonl(spark, collectionPath(c))
}
