package graft.sql

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.table.IceliteTable

/** Native streaming SOURCE over an icelite table's own commit log —
  * `spark.readStream.format("icelite-changelog")` — replacing the
  * parquet-export hop of [[graft.streaming.ChangelogFeed]] for
  * consumers that want the table itself as the stream (Iceberg's
  * streaming read / Delta's `readChangeFeed` shape; reference
  * `docs/design.md` "Change Streams": capture → apply → commit, this
  * is the read side of the loop with zero extra copies).
  *
  * Offsets ARE commit seqs: `getOffset` probes the table head (the
  * one-file fast probe [[IceliteTable.load]] rides), and a micro-batch
  * (from, to] materializes as [[IceliteTable.readChanges]] — the
  * stat-pruned, semi-join-bounded changelog derivation — so a 100 TB
  * table streams its per-commit deltas without ever re-exporting or
  * re-scanning full state. Spark's own checkpoint persists the seq
  * watermark; resume is exactly-once relative to commits, and
  * maintenance snapshots in range (rewrite/truncate/rollback) surface
  * [[IceliteTable.readChanges]]'s explicit resync error rather than a
  * silent gap.
  *
  * Options: `warehouse`, `namespace`, `table` (required);
  * `startSeq` (default 0 = full history replay: the initial-load +
  * tail pattern in one stream); `maxSeqsPerBatch` (default unlimited)
  * — BACKPRESSURE: cap each micro-batch at N commits, so a consumer
  * restarting against a deep backlog (or replaying full history at
  * 100 TB) drains in bounded, checkpointed steps instead of one giant
  * batch sized by the outage. `Trigger.AvailableNow` still terminates:
  * each bounded batch advances toward the head frozen at query start.
  */
final class IceliteChangelogSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "icelite-changelog"

  private def load(params: Map[String, String]): IceliteTable = {
    def req(k: String) = params.getOrElse(k,
      throw new IllegalArgumentException(s"icelite-changelog needs option '$k'"))
    IceliteTable.load(SparkSession.active, req("warehouse"), req("namespace"), req("table"))
  }

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), IceliteChangelogSource.changeSchema(load(parameters)))

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val t = load(parameters)
    val maxSeqs = parameters.get("maxSeqsPerBatch").map(_.toLong).getOrElse(Long.MaxValue)
    require(maxSeqs > 0, s"maxSeqsPerBatch must be > 0, got $maxSeqs")
    new IceliteChangelogSource(
      parameters("warehouse"), parameters("namespace"), parameters("table"),
      parameters.get("startSeq").map(_.toLong).getOrElse(0L),
      IceliteChangelogSource.changeSchema(t), maxSeqs)
  }
}

final class IceliteChangelogSource(
    warehouse: String, namespace: String, tableName: String,
    startSeq: Long, override val schema: StructType,
    maxSeqsPerBatch: Long = Long.MaxValue) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  // reload the head on every probe — commits from other writers (or
  // this session) must become visible without a new Source instance
  private def table: IceliteTable =
    IceliteTable.load(SparkSession.active, warehouse, namespace, tableName)

  // a checkpoint restart hands back a SerializedOffset; LongOffset's
  // json is the bare number either way
  private def seqOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json().trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val last = table.meta.lastSeq
    if (last <= startSeq) None else Some(LongOffset(last))
  }

  // ---- Trigger.AvailableNow: freeze the head seq at query start so
  // the run drains exactly the commits that existed then (commits
  // landing mid-run wait for the next trigger) — no single-batch
  // fallback wrapper, proper per-commit admission control.

  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(table.meta.lastSeq)

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset = {
    val from = Option(start) match {
      case Some(o: Offset) => seqOf(o)
      case Some(other) => other.json().trim.toLong
      case None => startSeq
    }
    val head = availableNowCap.getOrElse(table.meta.lastSeq)
    // backpressure: never admit more than maxSeqsPerBatch commits into
    // one micro-batch (saturating add — Long.MaxValue means unlimited)
    val capped = math.min(head,
      if (from > Long.MaxValue - maxSeqsPerBatch) Long.MaxValue else from + maxSeqsPerBatch)
    if (capped <= from) null else LongOffset(capped)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(seqOf).getOrElse(startSeq)
    val to = seqOf(end)
    val df = table.readChanges(from, to)
      .select(schema.fieldNames.toIndexedSeq.map(col): _*)
    // a v1 Source's batch must carry isStreaming=true; compile the
    // changelog plan to its internal-row RDD and re-wrap (the
    // FileStreamSource pattern, via the one private[sql] bridge)
    org.apache.spark.sql.graftbridge.StreamingFrame.create(df, schema)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object IceliteChangelogSource {
  /** Change rows = table schema + (_change_type, _commit_seq). */
  def changeSchema(t: IceliteTable): StructType = t.schema
    .add(IceliteTable.ChangeTypeCol, "string")
    .add(IceliteTable.CommitSeqCol, "long")
}
