package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.CollectionSyncConfig
import graft.schema.{DocumentSource, SchemaInfer}
import graft.table.IceliteTable

/** Initial collection scan (reference S1/T5/R9): `_id`-ordered resumable
  * copy of the source collection into the target table. Each chunk
  * commit carries its high-water-mark `_id` IN THE SNAPSHOT SUMMARY —
  * progress publishes atomically with the data, so a crash resumes
  * with a pushed-down `_id > hwm` range scan that is exactly-once (the
  * reference's separate checkpoint write opens an at-least-once window
  * between data commit and checkpoint, docs/design.md:339-348, and
  * doubles commit traffic; riding the marker on the commit closes
  * both).
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
    sourceDatabase: String,
    metrics: SyncMetrics = SyncMetrics.global) {

  private val syncId = cfg.target.qualifiedName

  /** Run (or resume) the initial sync. Returns documents copied.
    *
    * Boundary and resume arithmetic stays in the id column's NATIVE
    * type end-to-end: boundaries are collected untyped (`Row.get`) and
    * pushed back as typed literals, and the checkpointed high-water
    * mark (stored as a string for the fixed checkpoint schema) is cast
    * back to the id type before comparing — so numeric/timestamp ids
    * never go through lexicographic string order (ADVICE r1: a string
    * sort of numeric ids disagrees with the numeric range filters and
    * can skip or duplicate chunks).
    */
  def run(source: DataFrame, idCol: String = "_id"): Long = {
    val runT0 = System.currentTimeMillis()
    val idType = source.schema(idCol).dataType
    val prior = checkpoints.read(syncId)
    val ckptHwm = prior.flatMap(_.highWaterMarkId)

    // No checkpointed high-water mark means this is a from-scratch sync
    // (first run or a post-invalidate rebuild): the target must start
    // empty, or stale pre-drop rows survive next to the fresh copy.
    // Truncate is idempotent and resets any stale progress markers of
    // a previous epoch — which is why the gate also fires on a marker
    // with NO live files (an emptied-then-compacted table still carries
    // the old epoch's marker forward; trusting it would resume the
    // rebuild from a dead epoch's hwm and copy nothing).
    val staleMarker = table.meta.snapshots
      .exists(_.summary.contains(InitialSync.SyncIdKey))
    if (ckptHwm.isEmpty && (table.meta.liveDataFiles.nonEmpty || staleMarker))
      table.truncate()

    // Resume point: each chunk commit carries its high-water mark in
    // the SNAPSHOT SUMMARY, atomically with the data, so a marker is
    // never ahead of or behind its chunk — resume is exactly-once, not
    // at-least-once. The checkpoint row (written once at first chunk,
    // once at completion) pins the no-truncate decision above; the
    // snapshot marker — always ≥ the checkpointed one — refines it.
    val tagged = table.meta.snapshots.reverse
      .find(_.summary.get(InitialSync.SyncIdKey).contains(syncId))
    val hwm = tagged.flatMap(_.summary.get(InitialSync.HwmKey)).orElse(ckptHwm)
    var processed = tagged.flatMap(_.summary.get(InitialSync.DocsKey))
      .map(_.toLong)
      .orElse(prior.map(_.documentsProcessed))
      .getOrElse(0L)

    val remaining = hwm match {
      case Some(mark) => // pushed-down resume (T5), hwm parsed back to the native id type
        source.filter(col(idCol) > hwmLiteral(mark, idType))
      case None => source
    }

    val boundaries = chunkBoundaries(remaining, idCol, effectiveMaxRecords(remaining))
    // STAGE the remaining source once: range-partitioned on the id and
    // sorted within partitions, disk-backed cache. Before this, every
    // chunk's append re-filtered the raw source — a range predicate
    // over an unsorted scan reads ~everything, so an N-chunk sync paid
    // N source scans (the sf1 probe's O(N²/chunk) term: 50k → 21k
    // docs/s at 10× data). Staged, each chunk's range filter prunes
    // cached batches by their id min/max (in-memory batch pruning over
    // the sorted layout), so the loop reads each row ~once. This is
    // the classic sort-stage of a bulk loader: ONE extra materialized
    // copy, spilled to executor disks at scale, dropped at the end.
    val staged =
      if (boundaries.size >= InitialSync.StageMinChunks)
        remaining.repartitionByRange(boundaries.size, col(idCol))
          .sortWithinPartitions(idCol).persist()
      else remaining
    var lower: Option[Any] = None
    var checkpointed = ckptHwm.isDefined
    for (upper <- boundaries) {
      val chunk = staged
        .filter(lower.map(lo => col(idCol) > typedLit(lo, idType)).getOrElse(lit(true)))
        .filter(col(idCol) <= typedLit(upper, idType))
      val t0 = System.currentTimeMillis()
      val before = processed
      val snapshotSeq = table.append(chunk, n => Map(
        InitialSync.SyncIdKey -> syncId,
        InitialSync.HwmKey -> renderId(upper),
        // cumulative count rides with the chunk too, so resume never
        // needs to sum (or even see) earlier snapshots — and it
        // survives compaction folding them away
        InitialSync.DocsKey -> (before + n).toString))
      val n = table.meta.snapshots.last.recordCount
      processed += n
      metrics.recordCommit(syncId, System.currentTimeMillis() - t0)
      metrics.recordInitialDocs(syncId, n)
      if (!checkpointed) {
        // ONE durable checkpoint row per initial sync marks "progress
        // exists — do not truncate on resume"; every later chunk's
        // progress travels in its own commit.
        checkpoints.write(CheckpointRecord(
          syncId = syncId,
          state = SyncState.InitialSync,
          sourceDatabase = sourceDatabase,
          sourceCollection = cfg.source.collection,
          resumeToken = prior.flatMap(_.resumeToken),
          highWaterMarkId = Some(renderId(upper)),
          documentsProcessed = processed,
          lastSnapshotId = snapshotSeq,
          lastBatchId = prior.map(_.lastBatchId).getOrElse(-1L),
          updatedAtMs = System.currentTimeMillis()))
        checkpointed = true
      }
      lower = Some(upper)
    }

    if (staged ne remaining) staged.unpersist(false)

    // complete → STEADY_STATE (reference: initial sync done, hand off)
    checkpoints.write(CheckpointRecord(
      syncId, SyncState.SteadyState, sourceDatabase, cfg.source.collection,
      resumeToken = prior.flatMap(_.resumeToken),
      highWaterMarkId = lower.map(renderId).orElse(hwm),
      documentsProcessed = processed,
      lastSnapshotId = table.meta.lastSeq,
      lastBatchId = prior.map(_.lastBatchId).getOrElse(-1L),
      updatedAtMs = System.currentTimeMillis()))
    metrics.recordInitialSyncMs(syncId, System.currentTimeMillis() - runT0)
    processed
  }

  /** Literal of a collected boundary value, normalized through the id
    * column's own type so the range filters compare natively.
    */
  private def typedLit(v: Any, idType: org.apache.spark.sql.types.DataType) =
    lit(v).cast(idType)

  /** Checkpoint-safe string rendering of an id value: timestamps go
    * through ISO-8601 INSTANT (timezone-independent — a bare
    * Timestamp.toString renders JVM-local wall clock and re-parses in
    * the session zone, shifting the resume point by the offset);
    * binary ids have no faithful string form and are rejected rather
    * than silently corrupted.
    */
  private def renderId(v: Any): String = v match {
    case t: java.sql.Timestamp =>
      java.time.format.DateTimeFormatter.ISO_INSTANT.format(t.toInstant)
    case _: Array[Byte] =>
      throw new IllegalArgumentException(
        "binary _id columns are not supported for high-water-mark checkpointing")
    case x => x.toString
  }

  /** Inverse of [[renderId]] as a typed literal. */
  private def hwmLiteral(mark: String, idType: org.apache.spark.sql.types.DataType) =
    idType match {
      case org.apache.spark.sql.types.TimestampType =>
        val ts = scala.util.Try(java.sql.Timestamp.from(java.time.Instant.parse(mark)))
          .getOrElse(java.sql.Timestamp.valueOf(mark)) // legacy rendering fallback
        lit(ts)
      case other => lit(mark).cast(other)
    }

  /** Records per chunk honoring BOTH size thresholds (reference R5:
    * `batch.maxRecords` AND `batch.maxBytes` are each hard flush
    * triggers; the reference estimates batch bytes as average document
    * size × records): the average serialized document size is measured
    * once from a bounded sample (JSON rendering — same order of
    * magnitude as the wire documents the reference estimates from),
    * and the chunk size becomes min(maxRecords, maxBytes / avgBytes).
    * A collection of 10 KB documents therefore flushes by BYTES well
    * before the record cap — data files stay near the configured size
    * instead of scaling with document width.
    */
  private def effectiveMaxRecords(df: DataFrame): Long = {
    val sampled = df.limit(InitialSync.BytesSampleDocs)
      .select(length(to_json(struct(df.columns.map(col).toSeq: _*))).cast("double").as("sz"))
      .agg(avg(col("sz"))).collect().head
    val avgBytes = if (sampled.isNullAt(0)) 0.0 else sampled.getDouble(0)
    if (avgBytes <= 0) cfg.batch.maxRecords
    else math.max(1L,
      math.min(cfg.batch.maxRecords, (cfg.batch.maxBytes / avgBytes).toLong))
  }

  /** Upper-bound `_id` per chunk: range-partition the NATIVE id column
    * into ceil(count/maxRecords) ranges (distributed, sampled — no
    * global sort, no single-partition window), then take each range's
    * max keyed by partition index. repartitionByRange assigns ranges in
    * ascending partition order, so ordering by the index returns the
    * boundaries already sorted in the id type's own order — no string
    * casts anywhere. Only the boundary list reaches the driver.
    */
  private def chunkBoundaries(df: DataFrame, idCol: String, maxRecords: Long): Seq[Any] = {
    val n = df.count()
    if (n == 0) return Nil
    val chunks = math.max(1, math.ceil(n.toDouble / maxRecords).toInt)
    if (chunks == 1)
      return Seq(df.agg(max(col(idCol))).collect().head.get(0))
    df.select(col(idCol))
      .repartitionByRange(chunks, col(idCol))
      .select(spark_partition_id().as("_pid"), col(idCol))
      .groupBy(col("_pid")).agg(max(col(idCol)).as("m"))
      .orderBy(col("_pid"))
      .collect().map(_.get(1)).toSeq
  }
}

object InitialSync {

  /** Snapshot-summary keys for the atomic per-chunk progress marker
    * (prefix must match [[graft.table.IceliteTable.SyncProgressPrefix]]
    * so compaction rewrites carry it forward).
    */
  val SyncIdKey = "graft.sync.id"
  val HwmKey = "graft.sync.hwm"
  val DocsKey = "graft.sync.docs"

  /** Sample size for the average-document-size estimate backing the
    * `batch.maxBytes` flush threshold.
    */
  val BytesSampleDocs = 1000

  /** Minimum chunk count before the sort-stage pays for itself (a 1-3
    * chunk sync scans the source about once either way).
    */
  val StageMinChunks = 4

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
