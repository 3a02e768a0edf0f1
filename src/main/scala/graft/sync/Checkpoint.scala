package graft.sync

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.table.IceliteTable

/** One checkpoint row per sync (reference design checkpoint-table schema,
  * FIXTURES.md §4: `_sync._sync_checkpoints`, upserted atomically with
  * data commits; sync_id = "namespace.table").
  */
final case class CheckpointRecord(
    syncId: String,
    state: String, // INITIAL_SYNC | STEADY_STATE
    sourceDatabase: String,
    sourceCollection: String,
    resumeToken: Option[Long], // last applied change seq (≈ resume token)
    highWaterMarkId: Option[String], // last fully synced _id during initial scan
    documentsProcessed: Long,
    lastSnapshotId: Long, // icelite seq of the last data commit
    lastBatchId: Long, // streaming micro-batch idempotence (R4/R6)
    updatedAtMs: Long)

object SyncState {
  val InitialSync = "INITIAL_SYNC"
  val SteadyState = "STEADY_STATE"
}

/** Checkpoint store on an icelite table — the same commit mechanism as
  * data tables (reference S9: checkpoint rows in an Iceberg table,
  * upsert = equality-delete + append).
  */
final class CheckpointStore(spark: SparkSession, warehouse: String) {
  import CheckpointStore._

  private val table: IceliteTable =
    IceliteTable.createOrLoad(spark, warehouse, "_sync", "_sync_checkpoints", Schema)

  // Write-through cache: each sync has exactly one writer (reference
  // thread model: one writer per table), so the last record THIS store
  // wrote is the table's row for that sync — serving reads from it
  // turns the per-batch read-modify-write from a MoR scan + collect
  // into a map lookup. A fresh store (process restart) starts cold and
  // reads the committed table.
  private val lastWritten =
    scala.collection.concurrent.TrieMap.empty[String, CheckpointRecord]

  def read(syncId: String): Option[CheckpointRecord] =
    lastWritten.get(syncId).orElse {
      table.refresh()
      val committed = table.read()
        .filter(org.apache.spark.sql.functions.col("sync_id") === syncId)
        .collect().headOption.map(fromRow)
      committed.foreach(lastWritten.update(syncId, _))
      committed
    }

  def write(rec: CheckpointRecord): Unit = {
    val df = spark.createDataFrame(
      java.util.List.of(toRow(rec)), Schema)
    // single row per sync_id by construction → skip the dedup shuffle
    table.upsertPrepared(df, Seq("sync_id"))
    lastWritten.update(rec.syncId, rec)
  }

  /** Remove a sync's checkpoint row entirely (invalidate handling: the
    * rebuild must start from a clean slate — a stale high-water mark
    * would silently skip documents with `_id` ≤ hwm, ADVICE r1).
    */
  def delete(syncId: String): Unit = {
    val keys = spark.createDataFrame(
      java.util.List.of(Row(syncId)),
      StructType(Seq(StructField("sync_id", StringType, nullable = false))))
    table.delete(keys, Seq("sync_id"))
    lastWritten.remove(syncId)
  }

  /** Fold accumulated per-batch commits into one compacted snapshot and
    * expire old metadata/files — keeps a long-lived stream's checkpoint
    * table bounded (every checkpoint write is a full icelite commit).
    */
  def maintain(): Unit = {
    table.compact()
    table.expireSnapshots()
  }

  /** All checkpoints as a queryable DataFrame (ops surface). */
  def all(): org.apache.spark.sql.DataFrame = { table.refresh(); table.read() }
}

object CheckpointStore {
  val Schema: StructType = StructType(Seq(
    StructField("sync_id", StringType, nullable = false),
    StructField("state", StringType),
    StructField("source_database", StringType),
    StructField("source_collection", StringType),
    StructField("resume_token", LongType),
    StructField("high_water_mark_id", StringType),
    StructField("documents_processed", LongType),
    StructField("last_snapshot_id", LongType),
    StructField("last_batch_id", LongType),
    StructField("updated_at", TimestampType)))

  def toRow(r: CheckpointRecord): Row = Row(
    r.syncId, r.state, r.sourceDatabase, r.sourceCollection,
    r.resumeToken.map(Long.box).orNull, r.highWaterMarkId.orNull,
    r.documentsProcessed, r.lastSnapshotId, r.lastBatchId,
    java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(r.updatedAtMs)))

  def fromRow(row: Row): CheckpointRecord = CheckpointRecord(
    syncId = row.getString(0),
    state = row.getString(1),
    sourceDatabase = row.getString(2),
    sourceCollection = row.getString(3),
    resumeToken = if (row.isNullAt(4)) None else Some(row.getLong(4)),
    highWaterMarkId = Option(row.getString(5)),
    documentsProcessed = row.getLong(6),
    lastSnapshotId = row.getLong(7),
    lastBatchId = row.getLong(8),
    updatedAtMs = row.getTimestamp(9).getTime)
}
