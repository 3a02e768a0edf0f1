package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.CollectionSyncConfig
import graft.schema.{DocumentSource, SchemaInfer}
import graft.table.IceliteTable

/** Initial collection scan (reference S1/T5/R9): `_id`-ordered resumable
  * copy of the source collection into the target table, checkpointing a
  * high-water-mark `_id` after each committed chunk so a crash resumes
  * with a pushed-down `_id > hwm` range scan instead of restarting.
  *
  * Scale shape: chunk boundaries are computed in ONE distributed pass
  * (row_number over the `_id` order, keep every maxRecords-th id — the
  * boundary list is count/maxRecords values, the only thing collected);
  * each chunk is then an independent pushed-down range scan + append.
  * No driver-side row iteration, no O(n²) re-sorting. At 100 TB you set
  * maxRecords high enough that a chunk ≈ one healthy write job.
  */
final class InitialSync(
    spark: SparkSession,
    cfg: CollectionSyncConfig,
    table: IceliteTable,
    checkpoints: CheckpointStore,
    sourceDatabase: String) {

  private val syncId = cfg.target.qualifiedName

  /** Run (or resume) the initial sync. Returns documents copied. */
  def run(source: DataFrame, idCol: String = "_id"): Long = {
    val prior = checkpoints.read(syncId)
    val hwm = prior.flatMap(_.highWaterMarkId)
    var processed = prior.map(_.documentsProcessed).getOrElse(0L)

    val remaining = hwm match {
      case Some(mark) => source.filter(col(idCol) > lit(mark)) // pushed-down resume (T5)
      case None => source
    }

    val boundaries = chunkBoundaries(remaining, idCol, cfg.batch.maxRecords)
    var lower: Option[String] = None
    for (upper <- boundaries) {
      val chunk = remaining
        .filter(lower.map(lo => col(idCol) > lit(lo)).getOrElse(lit(true)))
        .filter(col(idCol) <= lit(upper))
      val snapshotSeq = table.append(chunk)
      val n = table.meta.snapshots.last.recordCount
      processed += n
      checkpoints.write(CheckpointRecord(
        syncId = syncId,
        state = SyncState.InitialSync,
        sourceDatabase = sourceDatabase,
        sourceCollection = cfg.source.collection,
        resumeToken = prior.flatMap(_.resumeToken),
        highWaterMarkId = Some(upper),
        documentsProcessed = processed,
        lastSnapshotId = snapshotSeq,
        lastBatchId = prior.map(_.lastBatchId).getOrElse(-1L),
        updatedAtMs = System.currentTimeMillis()))
      lower = Some(upper)
    }

    // complete → STEADY_STATE (reference: initial sync done, hand off)
    checkpoints.write(CheckpointRecord(
      syncId, SyncState.SteadyState, sourceDatabase, cfg.source.collection,
      resumeToken = prior.flatMap(_.resumeToken),
      highWaterMarkId = lower.orElse(hwm),
      documentsProcessed = processed,
      lastSnapshotId = table.meta.lastSeq,
      lastBatchId = prior.map(_.lastBatchId).getOrElse(-1L),
      updatedAtMs = System.currentTimeMillis()))
    processed
  }

  /** Upper-bound `_id` per chunk: range-partition the id column into
    * ceil(count/maxRecords) ranges (distributed, sampled — no global
    * sort, no single-partition window) and take each range's max. Only
    * the boundary list (count/maxRecords strings) reaches the driver.
    */
  private def chunkBoundaries(df: DataFrame, idCol: String, maxRecords: Long): Seq[String] = {
    import spark.implicits._
    val n = df.count()
    if (n == 0) return Nil
    val chunks = math.max(1, math.ceil(n.toDouble / maxRecords).toInt)
    if (chunks == 1)
      return Seq(df.agg(max(col(idCol))).collect().head.getString(0))
    df.select(col(idCol).cast("string"))
      .repartitionByRange(chunks, col(idCol))
      .mapPartitions { it =>
        var maxId: String = null
        it.foreach { r => val v = r.getString(0); if (maxId == null || v > maxId) maxId = v }
        if (maxId == null) Iterator.empty else Iterator(maxId)
      }
      .collect().toSeq.sorted
  }
}

object InitialSync {

  /** Create the target table on first batch if absent (reference S7):
    * auto mode infers the union schema from a sample; explicit mode
    * builds it from the mapping config.
    */
  def ensureTable(
      spark: SparkSession,
      warehouse: String,
      cfg: CollectionSyncConfig,
      source: DataFrame): IceliteTable =
    IceliteTable.createOrLoad(spark, warehouse, cfg.target.namespace, cfg.target.table,
      schema = DocumentSource.applyMapping(source, cfg.mapping).schema,
      partitioning = cfg.partitioning)
}
