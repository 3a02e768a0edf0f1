package graft.sync

import java.util.concurrent.{Callable, ExecutionException, Executors, TimeUnit}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, min}

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
  *
  * Error handling follows the reference daemon: transient failures in
  * either phase retry FOREVER with 1 s → 60 s exponential backoff
  * (`SyncStateMachine.withRetry`); config/validation errors are fatal.
  * `retrySleep`/`retryMaxAttempts` are injectable so tests can observe
  * the backoff curve without wall-clock sleeps.
  */
class SyncOrchestrator(
    spark: SparkSession, config: SyncConfig, warehouse: String,
    metrics: SyncMetrics = SyncMetrics.global,
    retrySleep: Long => Unit = Thread.sleep,
    retryMaxAttempts: Int = Int.MaxValue) {

  import SyncOrchestrator._

  val checkpoints = new CheckpointStore(spark, warehouse)

  private def fixtureRoot: String = config.mongodb.uri.stripPrefix("file://")

  def collectionPath(c: CollectionSyncConfig): String =
    s"$fixtureRoot/${config.mongodb.database}/${c.source.collection}.jsonl"

  def changeLogPath(c: CollectionSyncConfig): String =
    s"$fixtureRoot/${config.mongodb.database}/${c.source.collection}.changes"

  /** Factory seam for fault-injection tests (override to install a
    * failing batch hook); production uses the default wiring.
    */
  protected def newChangeStream(c: CollectionSyncConfig, table: IceliteTable): ChangeStreamSync =
    new ChangeStreamSync(spark, c, table, checkpoints, config.mongodb.database, metrics)

  /** Earliest change-event seq still retained by the log, if any — the
    * engine's analog of the oldest oplog entry. At scale this is a
    * head-file metadata lookup, not a full scan; the fixture log is
    * small enough to min() directly.
    */
  private def earliestRetainedSeq(c: CollectionSyncConfig): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(changeLogPath(c))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val r = spark.read.schema(ChangeStreamSync.EventSchema).json(changeLogPath(c))
      .agg(min(col("seq"))).collect().head
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** Reference decision table: "resume token expired → fall back to
    * full initial sync". If the checkpointed token points below the
    * retained head of the change log, events were lost — tailing from
    * the token would silently drop them. Record the rebuild obligation
    * (state=INITIAL_SYNC, no hwm ⇒ truncate-and-resync) BEFORE any
    * phase runs; the token itself is kept so the post-rebuild drain
    * replays only the retained tail (idempotent LWW — the fresh
    * snapshot already reflects every lost event).
    */
  private def maybeExpireToken(c: CollectionSyncConfig): Unit = {
    val syncId = c.target.qualifiedName
    checkpoints.read(syncId).foreach { cp =>
      if (SyncStateMachine.tokenExpired(cp.resumeToken, earliestRetainedSeq(c))) {
        checkpoints.write(cp.copy(
          state = SyncState.InitialSync,
          highWaterMarkId = None,
          lastBatchId = -1L,
          updatedAtMs = System.currentTimeMillis()))
        metrics.setState(syncId, SyncState.InitialSync)
      }
    }
  }

  private def retrying[A](syncId: String)(body: => A): A =
    SyncStateMachine.withRetry(
      maxAttempts = retryMaxAttempts,
      sleep = retrySleep,
      onError = _ => metrics.recordError(syncId))(body)

  /** Run one collection's full lifecycle in batch mode: initial sync if
    * the decision table says so, then drain the change log (AvailableNow
    * semantics). Returns the target table.
    */
  def syncCollection(c: CollectionSyncConfig, streamCheckpointDir: String): IceliteTable = {
    val source = readSource(c)
    val table = InitialSync.ensureTable(spark, warehouse, c, source)
    val syncId = c.target.qualifiedName

    maybeExpireToken(c)

    SyncStateMachine.decideStart(checkpoints.read(syncId)) match {
      case SyncStateMachine.InitialSyncPhase =>
        metrics.setState(syncId, SyncState.InitialSync)
        retrying(syncId) {
          new InitialSync(spark, c, table, checkpoints, config.mongodb.database, metrics)
            .run(DocumentSource.applyMapping(source, c.mapping))
        }
      case _ => () // already past initial sync
    }
    metrics.setState(syncId, SyncState.SteadyState)

    val changes = newChangeStream(c, table)
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
        // a transient stream failure retries under the SAME checkpoint
        // dir: committed micro-batches are skipped by the batch-id
        // guard, the failed one re-runs — at-least-once replay is
        // already neutralized on the apply path
        retrying(syncId) {
          val q = changes.start(changeLogPath(c), s"$streamCheckpointDir/t${tok}r$round", availableNow = true)
          q.awaitTermination()
        }
        if (changes.invalidated) {
          if (round >= MaxRebuilds)
            throw new IllegalStateException(s"$syncId: >$MaxRebuilds rebuilds in one drain")
          metrics.setState(syncId, SyncState.InitialSync)
          val fresh = readSource(c)
          retrying(syncId) {
            new InitialSync(spark, c, table, checkpoints, config.mongodb.database, metrics)
              .run(DocumentSource.applyMapping(fresh, c.mapping))
          }
          metrics.setState(syncId, SyncState.SteadyState)
          changes.resetInvalidated()
          round += 1
        } else drained = true
      }
    }
    maybeCompact(table)
    table
  }

  /** Daemon-mode steady state (reference: long-running ProcessingTime
    * loop, transient failures restart the stream from the persisted
    * token with backoff). Supervises the stream until `stopWhen` is
    * satisfied; a production daemon passes `() => false` and runs until
    * the process is killed.
    *
    *  - transient failure → restart under the SAME stream checkpoint
    *    (committed batches never re-apply) with exponential backoff;
    *    the attempt counter RESETS once a restart stays healthy for
    *    [[SyncOrchestrator.HealthyAfterMs]], so isolated blips spread
    *    over a long lifetime don't ratchet every recovery to the cap;
    *  - fatal failure (cause-chain classified) propagates immediately;
    *  - control event (drop/rename/invalidate) → full rebuild inline,
    *    then a fresh token-keyed stream checkpoint, exactly like the
    *    batch drain path — a daemon that kept polling a stalled,
    *    invalidated stream would look healthy while applying nothing;
    *  - every `maintenanceIntervalMs`, COLD compaction + snapshot
    *    expiry run on the supervisor thread while the stream keeps
    *    committing (the reference's scheduled RewriteDataFilesAction
    *    "filter to cold partitions only"): only snapshots behind the
    *    hot ingest tail are rewritten, so maintenance cost tracks the
    *    cold backlog, never the table size, and the claim-file commit
    *    protocol arbitrates the concurrent committers. A maintenance
    *    failure (e.g. a raced rewrite) skips the cycle and counts an
    *    error — it never takes the stream down.
    */
  def superviseSteadyState(
      c: CollectionSyncConfig,
      table: IceliteTable,
      streamCheckpointDir: String,
      stopWhen: () => Boolean,
      pollMs: Long = 25L,
      maintenanceIntervalMs: Long = Long.MaxValue): Unit = {
    val syncId = c.target.qualifiedName
    val changes = newChangeStream(c, table)
    metrics.setState(syncId, SyncState.SteadyState)
    var done = false
    var attempt = 0
    var rebuilds = 0
    var nextMaintenance =
      if (maintenanceIntervalMs == Long.MaxValue) Long.MaxValue
      else System.currentTimeMillis() + maintenanceIntervalMs
    def maybeMaintain(): Unit =
      if (System.currentTimeMillis() >= nextMaintenance) {
        // ANY maintenance failure (raced rewrite, IO error, Spark job
        // failure) skips the cycle — it must never restart or kill the
        // healthy stream this loop supervises
        try {
          table.compactCold()
          table.expireSnapshots()
        } catch {
          case scala.util.control.NonFatal(_) => metrics.recordError(syncId)
        }
        nextMaintenance = System.currentTimeMillis() + maintenanceIntervalMs
      }
    while (!done) {
      val tok = checkpoints.read(syncId).flatMap(_.resumeToken).getOrElse(-1L)
      val startedAt = System.currentTimeMillis()
      val q = changes.start(changeLogPath(c), s"$streamCheckpointDir/t$tok", availableNow = false)
      try {
        while (q.isActive && !stopWhen() && !changes.invalidated) {
          Thread.sleep(pollMs)
          maybeMaintain()
        }
        if (changes.invalidated) {
          q.stop()
          if (rebuilds >= MaxRebuilds)
            throw new IllegalStateException(s"$syncId: >$MaxRebuilds rebuilds in daemon mode")
          metrics.setState(syncId, SyncState.InitialSync)
          retrying(syncId) {
            new InitialSync(spark, c, table, checkpoints, config.mongodb.database, metrics)
              .run(DocumentSource.applyMapping(readSource(c), c.mapping))
          }
          metrics.setState(syncId, SyncState.SteadyState)
          changes.resetInvalidated()
          rebuilds += 1 // loop continues under a fresh token-keyed dir
        } else if (q.isActive) { // clean external stop
          q.stop()
          done = true
        } else q.awaitTermination() // surface the failure below
      } catch {
        case e: Throwable if SyncStateMachine.isTransient(e) =>
          metrics.recordError(syncId)
          if (attempt >= retryMaxAttempts - 1) throw e
          if (System.currentTimeMillis() - startedAt >= HealthyAfterMs)
            attempt = 0 // the previous restart ran healthy — new incident
          retrySleep(SyncStateMachine.backoffMs(attempt))
          attempt += 1
      } finally if (q.isActive) q.stop()
    }
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

  /** Sync every configured collection, up to [[MaxConcurrentCollections]]
    * at a time (reference lifecycle pool: ≤8 collections in parallel).
    * Each worker drives an independent table + checkpoint row; the
    * shared checkpoint store is safe under concurrent committers (claim
    * -file commit protocol). Spark schedules jobs from multiple threads
    * natively, so per-collection work interleaves on the cluster.
    */
  def syncAll(
      streamCheckpointRoot: String,
      parallelism: Int = MaxConcurrentCollections): Map[String, IceliteTable] = {
    val cols = config.sync.collections
    val par = math.max(1, math.min(parallelism, math.min(MaxConcurrentCollections, cols.size)))
    if (par <= 1)
      cols.map { c =>
        c.target.qualifiedName ->
          syncCollection(c, s"$streamCheckpointRoot/${c.target.qualifiedName}")
      }.toMap
    else {
      val pool = Executors.newFixedThreadPool(par)
      try {
        val futures = cols.map { c =>
          pool.submit(new Callable[(String, IceliteTable)] {
            def call(): (String, IceliteTable) =
              c.target.qualifiedName ->
                syncCollection(c, s"$streamCheckpointRoot/${c.target.qualifiedName}")
          })
        }
        futures.map { f =>
          try f.get()
          catch { case e: ExecutionException => throw e.getCause }
        }.toMap
      } finally {
        // on the failure path sibling workers may be mid-retry-backoff:
        // interrupt them rather than leaving zombies committing in the
        // background after syncAll has already thrown (on success this
        // is a no-op — every task already completed)
        pool.shutdownNow()
        if (!pool.awaitTermination(1, TimeUnit.MINUTES))
          throw new IllegalStateException(
            "syncAll worker threads did not terminate within 60s of shutdown")
      }
    }
  }

  private def readSource(c: CollectionSyncConfig): DataFrame =
    DocumentSource.readJsonl(spark, collectionPath(c))
}

object SyncOrchestrator {
  /** Reference lifecycle thread pool bound (docs/design.md §483). */
  val MaxConcurrentCollections = 8

  /** A daemon restart that stays up this long closes the incident —
    * the next failure backs off from attempt 0, not from wherever the
    * counter ratcheted to over the process lifetime.
    */
  val HealthyAfterMs: Long = 60000L

  private val MaxRebuilds = 100
  private val CompactFileThreshold = 16
}
