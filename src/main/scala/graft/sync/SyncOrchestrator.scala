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
final class SyncOrchestrator(
    spark: SparkSession, config: SyncConfig, warehouse: String,
    metrics: SyncMetrics = SyncMetrics.global) {

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
        metrics.setState(syncId, SyncState.InitialSync)
        SyncStateMachine.withRetry(maxAttempts = 3, sleep = _ => (),
          onError = _ => metrics.recordError(syncId)) {
          new InitialSync(spark, c, table, checkpoints, config.mongodb.database, metrics)
            .run(DocumentSource.applyMapping(source, c.mapping))
        }
      case _ => () // already past initial sync
    }
    metrics.setState(syncId, SyncState.SteadyState)

    val changes = new ChangeStreamSync(spark, c, table, checkpoints, config.mongodb.database, metrics)
    val fs = new org.apache.hadoop.fs.Path(changeLogPath(c))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(changeLogPath(c)))) {
      // Drain the log; on a control event do a FULL rebuild (reference:
      // drop/rename/invalidate ⇒ re-initial-sync). The stream handler
      // already checkpointed the rebuild obligation atomically
      // (state=INITIAL_SYNC, no hwm ⇒ truncate-and-resync, resumeToken
      // past the control event), so this loop just executes it: re-read
      // the source, run initial sync (which truncates), then replay the
      // log tail with a fresh stream checkpoint. Crash-safe at every
      // point — the obligation survives in the checkpoint row.
      var round = 0
      var drained = false
      while (!drained) {
        // the stream-checkpoint dir is keyed by the engine resume token:
        // after a rebuild (token moved past the control event) the drain
        // re-reads the whole log under a fresh dir — the seq filter
        // retires everything already applied, so replay is idempotent,
        // and post-drop events that shared a micro-batch with the
        // control event are never lost to a consumed stream offset
        val tok = checkpoints.read(syncId).flatMap(_.resumeToken).getOrElse(-1L)
        // a fresh dir restarts micro-batch numbering at 0, so the
        // batch-id idempotence guard must be reset per drain lineage —
        // otherwise a prior drain's lastBatchId swallows the renumbered
        // batches that now carry NEW events. Cross-lineage idempotence
        // comes from the resume-token seq filter, not batch ids.
        checkpoints.read(syncId).filter(_.lastBatchId >= 0).foreach { cp =>
          checkpoints.write(cp.copy(lastBatchId = -1L))
        }
        val q = changes.start(changeLogPath(c), s"$streamCheckpointDir/t${tok}r$round", availableNow = true)
        q.awaitTermination()
        if (changes.invalidated) {
          if (round >= MaxRebuilds)
            throw new IllegalStateException(s"$syncId: >$MaxRebuilds rebuilds in one drain")
          metrics.setState(syncId, SyncState.InitialSync)
          val fresh = readSource(c)
          new InitialSync(spark, c, table, checkpoints, config.mongodb.database, metrics)
            .run(DocumentSource.applyMapping(fresh, c.mapping))
          metrics.setState(syncId, SyncState.SteadyState)
          changes.resetInvalidated()
          round += 1
        } else drained = true
      }
    }
    maybeCompact(table)
    table
  }

  /** Post-drain maintenance (reference S8's scheduled compaction): fold
    * accumulated per-batch files and MoR deletes into right-sized data
    * files and expire dead snapshots once the table has visibly
    * fragmented. In a long-running daemon this hangs off the compaction
    * scheduler; in batch drains the end of a drain is the schedule
    * point.
    */
  private def maybeCompact(table: IceliteTable): Unit = {
    val m = table.meta
    if (m.liveDeleteFiles.nonEmpty || m.liveDataFiles.size > CompactFileThreshold) {
      table.compact()
      table.expireSnapshots()
    }
  }

  private val MaxRebuilds = 100
  private val CompactFileThreshold = 16

  def syncAll(streamCheckpointRoot: String): Map[String, IceliteTable] =
    config.sync.collections.map { c =>
      c.target.qualifiedName ->
        syncCollection(c, s"$streamCheckpointRoot/${c.target.qualifiedName}")
    }.toMap

  private def readSource(c: CollectionSyncConfig): DataFrame =
    DocumentSource.readJsonl(spark, collectionPath(c))
}
