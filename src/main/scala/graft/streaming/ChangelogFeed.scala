package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.table.IceliteTable

/** Streaming CDC CONSUMER feed over an icelite table's changelog — the
  * consumer half of the reference's CDC design (its producer half is
  * the change-stream tail, docs/design.md "Change Streams": capture →
  * apply → commit; this closes the loop commit → export → readStream).
  *
  * Shape: a PRODUCER side ([[exportAvailable]]) incrementally
  * materializes each newly committed snapshot's changelog rows
  * ([[IceliteTable.readChanges]] over exactly that seq) as parquet
  * files in `feedDir`; CONSUMERS are plain Spark file-stream readers
  * ([[readStream]]) — Spark's own source checkpoint gives every
  * consumer independent exactly-once resume, watermarks, and stateful
  * ops downstream, with no custom Source implementation to maintain.
  *
  * Crash safety without a write-ahead pending state: every artifact is
  * deterministic and individually atomic, so ANY interleaving of crash
  * and retry converges —
  *  - a seq's rows are split into `n = ceil(commit bytes / bucketBytes)`
  *    buckets by a row-content hash; `n` derives from the snapshot's
  *    [[graft.table.Snapshot.fileMetrics]] (table METADATA, identical
  *    on every retry), never from a runtime estimate that could
  *    re-shuffle rows across names on redo;
  *  - each bucket publishes by atomic rename to its deterministic name
  *    `seq-<seq>-b<i>.parquet`; an existing name is SKIPPED on redo, so
  *    a consumer that already read a file never has it change or
  *    vanish underneath its checkpoint;
  *  - the `_feed_state.json` marker (underscore prefix: invisible to
  *    the file source) only records the fully-exported floor; it
  *    advances AFTER a seq's buckets all exist, and a crash before the
  *    advance just redoes exists-checks.
  *
  * At 100 TB: steady-state CDC commits are micro-batches (R5 bounds
  * them by records/bytes), so `n` is almost always 1 and the whole
  * pending backlog exports as ONE small job (the metadata-gated fast
  * path in [[exportAvailable]] — seq-partitioned write, renamed to
  * the same deterministic bucket names); a bulk commit falls back to
  * `n` bounded single-bucket jobs per seq rather than one job with a
  * nondeterministic layout — the price of redo-stable file names.
  *
  * Maintenance snapshots (rewrite/truncate/rollback) are not derivable
  * as changes; [[exportAvailable]] propagates [[IceliteTable]]'s
  * explicit error and the feed must be rebuilt from a fresh dir plus a
  * full resync — the same contract as every changelog reader here.
  */
final class ChangelogFeed(
    val table: IceliteTable,
    val feedDir: String,
    bucketBytes: Long = 64L << 20) {

  private def spark = table.spark
  private def fs: FileSystem =
    new Path(feedDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def markerPath = new Path(s"$feedDir/_feed_state.json")

  /** Feed row schema: the table schema + change metadata columns. */
  def schema: StructType = table.schema
    .add(IceliteTable.ChangeTypeCol, "string")
    .add(IceliteTable.CommitSeqCol, "long")

  /** The streaming consumer view. Each caller passes its own
    * checkpointLocation to its writeStream — that, not the feed,
    * holds per-consumer progress.
    */
  def readStream: DataFrame =
    spark.readStream.schema(schema).parquet(feedDir)

  /** Exported-through floor (0 before the first export). */
  def exportedThrough: Long = readThrough()

  /** Drain everything currently exported into `replica` — CDC
    * replication as a consumer: one AvailableNow pass whose every
    * micro-batch applies the LATEST event per key (postimages/inserts
    * upserted, deletes deleted, preimages dropped — keyed on
    * `keyCols`, ordered by `_commit_seq`), so the replica converges to
    * the source state through the changelog alone, never a source
    * re-read. `checkpointDir` is this consumer's resume state: a later
    * call applies only commits exported since. Per-key latest makes
    * the apply insensitive to file ordering inside a batch; ACROSS
    * batches the file source replays in discovery order, with each
    * batch a bounded MERGE — the standard CDC-mirror loop.
    */
  def replicateOnce(
      replica: IceliteTable, keyCols: Seq[String], checkpointDir: String): Unit =
    ChangelogFeed.replicateStream(
      readStream, table.schema.fieldNames.toSeq, replica, keyCols, checkpointDir)

  /** Apply one changelog micro-batch to `replica`: latest event per
    * key wins WITHIN the batch (preimages dropped), and two stored
    * guard columns enforce LWW ACROSS batches — every event (deletes
    * included, as `_cdc_deleted` TOMBSTONE rows) upserts a row carrying
    * its `_commit_seq`, and a matched row only updates when the event's
    * seq is at or above the stored one. So even if one drain spans
    * several micro-batches and file discovery interleaves commit seqs,
    * a later batch can neither roll a key back to an older image NOR
    * resurrect a key a newer-seq delete removed (the tombstone out-seqs
    * the stale insert). Committed as ONE merge snapshot; older events
    * classify as skip and write nothing. IDEMPOTENT by construction:
    * re-applying the same batch re-matches at equal seq (the guard is
    * `>=`) and rewrites the same images, so foreachBatch's
    * at-least-once replay window (crash between the commit and the
    * consumer checkpoint advancing) cannot diverge the replica —
    * [[ChangelogFeedSpec]] proves re-apply is a state no-op and that
    * out-of-order older batches are rejected. Consumers read the live
    * state through [[ChangelogFeed.replicaState]] (tombstones and
    * guard columns filtered); tombstones of long-dead keys compact
    * away under the table's normal maintenance (`deleteWhere` on aged
    * tombstones), the standard CDC-mirror retention knob.
    */
  private[streaming] def applyBatch(
      batch: DataFrame, replica: IceliteTable, keyCols: Seq[String]): Unit =
    ChangelogFeed.applyChangeBatch(batch, table.schema.fieldNames.toSeq, replica, keyCols)

  /** Export every committed-but-unexported snapshot's changelog rows;
    * returns the `(from, to]` range exported (empty range if already
    * current). Idempotent: redo after any crash point re-derives the
    * same bucket files and skips the ones that already published.
    */
  def exportAvailable(): (Long, Long) = {
    table.refresh()
    val head = table.meta.lastSeq
    val from = readThrough()
    if (from >= head) return (from, head)
    val pending = ((from + 1) to head).toSeq
    // metadata-gated single-job path: when every pending commit is
    // single-bucket AND the whole backlog fits one bucket's byte
    // budget (both facts from snapshot fileMetrics — pure metadata),
    // ONE write job exports every seq at once, partitioned by seq and
    // renamed to the same deterministic bucket names. Steady-state CDC
    // commits are micro-batches, so the common case is one small job
    // per BACKLOG rather than one per commit; bulk commits keep the
    // per-seq fan-out below.
    if (pending.forall(bucketsFor(_) == 1) &&
        pending.map(seqBytes).sum <= bucketBytes &&
        exportRangeFast(from, head, pending)) {
      writeThrough(head)
      return (from, head)
    }
    // general path: ONE changelog read spans every pending seq (cached,
    // filtered per seq — per-seq bucket determinism is a property of
    // the rows, not of how many seqs one job read). A maintenance
    // snapshot anywhere in the range fails the whole-range read; fall
    // back to the per-seq loop so everything before the maintenance
    // seq still exports before the loud failure (same partial-export
    // contract as always).
    val whole =
      try Some(table.readChanges(from, head).cache())
      catch { case _: IllegalStateException => None }
    try {
      var cur = from
      while (cur < head) {
        val seq = cur + 1
        exportSeq(seq,
          whole.map(_.filter(col(IceliteTable.CommitSeqCol) === seq)))
        writeThrough(seq)
        cur = seq
      }
    } finally whole.foreach(_.unpersist())
    (from, head)
  }

  /** One-job whole-backlog export (every pending seq single-bucket):
    * writes the `(from, head]` changelog once partitioned by seq, then
    * publishes each seq's file under its deterministic bucket name.
    * Redo-safe the same way as the per-seq path — existing names are
    * skipped, the marker only advances (in the caller) after every
    * bucket exists. Returns false when the range cannot be read as
    * changes (maintenance snapshot inside it); the caller falls back
    * to the per-seq loop and its partial-export contract.
    */
  private def exportRangeFast(from: Long, head: Long, pending: Seq[Long]): Boolean = {
    val missing = pending.filter(s => !fs.exists(bucketPath(s, 0)))
    if (missing.isEmpty) return true
    val changes =
      try table.readChanges(from, head)
      catch { case _: IllegalStateException => return false }
    val tmp = new Path(s"$feedDir/.tmp-range-${from + 1}-$head")
    fs.delete(tmp, true)
    // the partition column is a COPY of the seq column so the data
    // files still carry _commit_seq (partitionBy strips its column,
    // and the published flat files lose the directory encoding)
    changes.withColumn("_seq_part", col(IceliteTable.CommitSeqCol))
      .coalesce(1).write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .partitionBy("_seq_part").parquet(tmp.toString)
    missing.foreach { s =>
      val dir = new Path(tmp, s"_seq_part=$s")
      val part =
        if (fs.exists(dir))
          fs.listStatus(dir).map(_.getPath).find(_.getName.endsWith(".parquet"))
        else None
      part match {
        case Some(p) =>
          if (!fs.rename(p, bucketPath(s, 0)) && !fs.exists(bucketPath(s, 0)))
            throw new IllegalStateException(s"failed to publish ${bucketPath(s, 0)}")
        case None => exportSeq(s) // empty commit: no partition dir written
      }
    }
    fs.delete(tmp, true)
    true
  }

  private def exportSeq(seq: Long, pre: Option[DataFrame] = None): Unit = {
    val n = bucketsFor(seq)
    val missing = (0 until n).filter(b => !fs.exists(bucketPath(seq, b)))
    if (missing.isEmpty) return
    val changes = pre.getOrElse(table.readChanges(seq - 1, seq))
    val cols = schema.fieldNames.toSeq
    // row-content bucket id: deterministic across retries (unlike a
    // repartition, whose task layout is free to differ per run)
    val bucketed =
      if (n == 1) changes.withColumn("_b", lit(0))
      else changes.withColumn("_b", pmod(xxhash64(cols.map(col): _*), lit(n.toLong)))
    missing.foreach { b =>
      val tmp = new Path(s"$feedDir/.tmp-seq-$seq-b$b")
      fs.delete(tmp, true)
      bucketed.filter(col("_b") === b).drop("_b").coalesce(1)
        .write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no parquet written under $tmp"))
      if (!fs.rename(part, bucketPath(seq, b)) && !fs.exists(bucketPath(seq, b)))
        throw new IllegalStateException(s"failed to publish ${bucketPath(seq, b)}")
      fs.delete(tmp, true)
    }
  }

  /** Bucket count for a seq, from the snapshot's commit-time file
    * metrics — pure metadata, so every retry computes the same split.
    * Metrics-less legacy snapshots and empty commits export 1 bucket.
    */
  private def seqBytes(seq: Long): Long =
    table.meta.snapshots.find(_.seq == seq)
      .map(s => s.fileMetrics.values.map(_._2).sum).getOrElse(0L)

  private def bucketsFor(seq: Long): Int =
    math.max(1, math.ceil(seqBytes(seq).toDouble / bucketBytes).toInt)

  private def bucketPath(seq: Long, b: Int): Path =
    new Path(s"$feedDir/seq-$seq-b$b.parquet")

  private def readThrough(): Long =
    if (!fs.exists(markerPath)) 0L
    else new ObjectMapper().readTree(readString(markerPath)).get("throughSeq").asLong()

  private def writeThrough(seq: Long): Unit = {
    val root = new ObjectMapper().createObjectNode()
    root.put("throughSeq", seq)
    val tmp = new Path(s"$feedDir/._feed_state.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(root.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(markerPath, false)
    if (!fs.rename(tmp, markerPath))
      throw new IllegalStateException(s"failed to publish feed marker $markerPath")
  }

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }
}

object ChangelogFeed {

  /** Apply one changelog micro-batch to `replica`: latest event per
    * key wins WITHIN the batch (preimages dropped), and two stored
    * guard columns enforce LWW ACROSS batches — every event (deletes
    * included, as [[DeletedCol]] TOMBSTONE rows) upserts a row carrying
    * its `_commit_seq`, and a matched row only updates when the event's
    * seq is at or above the stored one. So even if one drain spans
    * several micro-batches and discovery interleaves commit seqs, a
    * later batch can neither roll a key back to an older image NOR
    * resurrect a key a newer-seq delete removed. Committed as ONE merge
    * snapshot; older events classify as skip and write nothing.
    * IDEMPOTENT by construction: re-applying the same batch re-matches
    * at equal seq (the guard is `>=`) and rewrites the same images, so
    * foreachBatch's at-least-once replay window cannot diverge the
    * replica — [[ChangelogFeedSpec]] proves re-apply is a state no-op.
    * Shared by the feed-dir consumer ([[ChangelogFeed.replicateOnce]])
    * and the native source ([[graft.sql.IceliteChangelogSourceProvider]])
    * — the apply semantics are a property of the change rows, not of
    * how they were transported.
    *
    * @param dataCols the SOURCE data schema's field names (the change
    *                 rows carry them plus the two change-meta columns)
    */
  def applyChangeBatch(
      batch: DataFrame, dataCols: Seq[String],
      replica: IceliteTable, keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.expressions.Window
    val seqCol = IceliteTable.CommitSeqCol
    val typeCol = IceliteTable.ChangeTypeCol
    // first apply evolves the replica to carry the guard columns
    if (!replica.schema.fieldNames.contains(seqCol) ||
        !replica.schema.fieldNames.contains(DeletedCol))
      replica.addColumns(StructType(Seq(
        org.apache.spark.sql.types.StructField(
          seqCol, org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(
          DeletedCol, org.apache.spark.sql.types.BooleanType))))
    // persisted: merge reads the batch for its key-range bounds, the
    // join, and the commit files — one window materialization, not one
    // per consumer. An explicit emptiness pre-check is redundant (and
    // was one more job): an empty batch classifies to zero merge
    // actions and commits nothing.
    val latest = batch
      // AQE is disabled inside streaming micro-batches, so without
      // this the window + join stages fan out to the session's full
      // shuffle-partition count for a batch R5 bounds to ~128 MB.
      // Hash-partitioning by key here satisfies the window's and the
      // merge join's clustered distribution (no further exchange) at
      // a partition count sized for a bounded batch.
      .repartition(BatchParts, keyCols.map(col): _*)
      .filter(col(typeCol) =!= "update_preimage")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(seqCol).desc)))
      .filter(col("__rn") === 1)
      .withColumn(DeletedCol, col(typeCol) === "delete")
      .select((dataCols :+ seqCol :+ DeletedCol).map(col): _*)
      .persist()
    try {
      // null stored seq (pre-guard rows) counts as older than any event
      val newer = col(s"s.$seqCol") >= coalesce(col(s"t.$seqCol"), lit(Long.MinValue))
      replica.merge(latest, keyCols,
        matchedUpdate = Some(newer),
        notMatchedInsert = Some(lit(true)))
      ()
    } finally latest.unpersist()
  }

  /** Drain a changelog STREAM into `replica` with one AvailableNow
    * pass — [[replicateOnce]]'s body, lifted so the native
    * icelite-changelog source and the feed-dir file stream share it.
    */
  def replicateStream(
      stream: DataFrame, dataCols: Seq[String], replica: IceliteTable,
      keyCols: Seq[String], checkpointDir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        applyChangeBatch(batch.toDF(), dataCols, replica, keyCols)
      }
      .start()
    q.awaitTermination()
  }

  /** Tombstone marker column a [[ChangelogFeed.replicateOnce]] replica
    * carries: deletes upsert a `true` row instead of removing the key,
    * so a stale out-of-order insert can never resurrect a deleted key
    * (the tombstone's `_commit_seq` out-ranks it).
    */
  val DeletedCol = "_cdc_deleted"

  /** Shuffle width for one replicated micro-batch: R5 bounds a CDC
    * batch to maxBytes (128 MB default), so ~16 MB per partition —
    * the non-AQE streaming context would otherwise run every batch
    * stage at the session's full shuffle-partition count.
    */
  val BatchParts = 8

  /** The schema a [[ChangelogFeed.replicateOnce]] replica converges to:
    * the source data schema plus the two LWW guard columns. Creating
    * the replica with this schema up front skips the first-apply
    * schema-evolution commit (applyBatch still evolves a bare replica
    * lazily for callers that didn't).
    */
  def replicaSchema(dataSchema: StructType): StructType = dataSchema
    .add(IceliteTable.CommitSeqCol, org.apache.spark.sql.types.LongType)
    .add(DeletedCol, org.apache.spark.sql.types.BooleanType)

  /** The LIVE state of a replica maintained by [[ChangelogFeed
    * .replicateOnce]]: tombstoned keys filtered out, guard columns
    * dropped — what a downstream reader of the mirror consumes.
    */
  def replicaState(replica: IceliteTable): DataFrame = {
    val r = replica.read()
    if (!r.columns.contains(DeletedCol)) r
    else r.filter(!coalesce(col(DeletedCol), lit(false)))
      .drop(DeletedCol, IceliteTable.CommitSeqCol)
  }
}
