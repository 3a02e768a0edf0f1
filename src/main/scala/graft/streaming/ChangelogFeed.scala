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
  * them by records/bytes), so `n` is almost always 1 and an export is
  * one small job per commit; a bulk commit fans out to `n` bounded
  * single-bucket jobs rather than one job with a nondeterministic
  * layout — the price of redo-stable file names.
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
      replica: IceliteTable, keyCols: Seq[String], checkpointDir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = readStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        applyBatch(batch.toDF(), replica, keyCols)
      }
      .start()
    q.awaitTermination()
  }

  /** Apply one changelog micro-batch to `replica`: latest event per
    * key wins (postimages/inserts upserted, deletes deleted, preimages
    * dropped), committed as ONE snapshot (the S5 apply shape, same as
    * the change-stream sink) — the equality-delete covers EVERY touched
    * key, clearing each key's prior version, while this commit's own
    * upsert rows survive it by seq LWW. IDEMPOTENT by construction:
    * re-applying the same batch recomputes the same final per-key
    * images, so foreachBatch's at-least-once replay window (crash
    * between the commit and the consumer checkpoint advancing) cannot
    * diverge the replica — [[ChangelogFeedSpec]] proves re-apply is a
    * state no-op.
    */
  private[streaming] def applyBatch(
      batch: DataFrame, replica: IceliteTable, keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.expressions.Window
    val dataCols = table.schema.fieldNames.toSeq
    val latest = batch
      .filter(col(IceliteTable.ChangeTypeCol) =!= "update_preimage")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(IceliteTable.CommitSeqCol).desc)))
      .filter(col("__rn") === 1)
    val touched = latest.select(keyCols.map(col): _*)
    val ups = latest.filter(col(IceliteTable.ChangeTypeCol) =!= "delete")
      .select(dataCols.map(col): _*)
    if (!touched.isEmpty)
      replica.applyChanges(ups, touched, keyCols)
    ()
  }

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
    // fast path: ONE changelog read spans every pending seq (cached,
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
  private def bucketsFor(seq: Long): Int = {
    val bytes = table.meta.snapshots.find(_.seq == seq)
      .map(s => s.fileMetrics.values.map(_._2).sum).getOrElse(0L)
    math.max(1, math.ceil(bytes.toDouble / bucketBytes).toInt)
  }

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
