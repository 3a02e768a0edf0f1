package graft.sync

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicReference, LongAdder}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The reference's six declared sync metrics (docs/design.md:469-476 —
  * Micrometer names `sync.initial.documents.processed`,
  * `sync.changestream.events.processed`, `sync.iceberg.commits`,
  * `sync.iceberg.commit.latency`, `sync.errors`, `sync.state`),
  * re-expressed as a driver-side registry keyed by sync id.
  *
  * Counters are `LongAdder`s (the write path touches them from commit
  * completions on the driver; contention-free), latency keeps
  * sum/count/max so mean and worst-case are both derivable, and the
  * whole registry is exportable as a DataFrame for the same
  * "checkpoints + metrics are queryable tables" ops surface the
  * checkpoint store provides.
  */
final class SyncMetrics {

  final class PerSync {
    val initialDocs = new LongAdder
    val changeEvents = new LongAdder
    val commits = new LongAdder
    val commitLatencyMsSum = new LongAdder
    val commitLatencyMsMax = new AtomicLong(0L)
    val errors = new LongAdder
    val quarantined = new LongAdder
    val state = new AtomicReference[String]("INITIALIZING")
    // per-PHASE wall time, so initial-sync and change-apply throughput
    // are each derived from their own window (dividing both by one
    // end-to-end wall time understates the first and entangles the two)
    val initialSyncMs = new LongAdder
    val changeApplyMs = new LongAdder
  }

  private val syncs = new ConcurrentHashMap[String, PerSync]()

  def of(syncId: String): PerSync =
    syncs.computeIfAbsent(syncId, _ => new PerSync)

  def recordInitialDocs(syncId: String, n: Long): Unit = of(syncId).initialDocs.add(n)
  def recordChangeEvents(syncId: String, n: Long): Unit = of(syncId).changeEvents.add(n)
  def recordCommit(syncId: String, latencyMs: Long): Unit = {
    val m = of(syncId)
    m.commits.increment()
    m.commitLatencyMsSum.add(latencyMs)
    m.commitLatencyMsMax.accumulateAndGet(latencyMs, math.max)
  }
  def recordError(syncId: String): Unit = of(syncId).errors.increment()
  def recordQuarantined(syncId: String, n: Long): Unit = of(syncId).quarantined.add(n)
  def setState(syncId: String, state: String): Unit = of(syncId).state.set(state)
  def recordInitialSyncMs(syncId: String, ms: Long): Unit = of(syncId).initialSyncMs.add(ms)
  def recordChangeApplyMs(syncId: String, ms: Long): Unit = of(syncId).changeApplyMs.add(ms)

  /** Snapshot of all metrics as a queryable DataFrame. */
  def asDataFrame(spark: SparkSession): DataFrame = {
    val rows = syncs.asScala.toSeq.sortBy(_._1).map { case (id, m) =>
      Row(id, m.state.get(), m.initialDocs.sum(), m.changeEvents.sum(),
        m.commits.sum(), m.commitLatencyMsSum.sum(), m.commitLatencyMsMax.get(),
        m.errors.sum(), m.quarantined.sum(),
        m.initialSyncMs.sum(), m.changeApplyMs.sum())
    }
    spark.createDataFrame(rows.asJava, SyncMetrics.Schema)
  }
}

object SyncMetrics {
  val Schema: StructType = StructType(Seq(
    StructField("sync_id", StringType, nullable = false),
    StructField("state", StringType),
    StructField("initial_documents_processed", LongType),
    StructField("changestream_events_processed", LongType),
    StructField("commits", LongType),
    StructField("commit_latency_ms_sum", LongType),
    StructField("commit_latency_ms_max", LongType),
    StructField("errors", LongType),
    StructField("documents_quarantined", LongType),
    StructField("initial_sync_ms", LongType),
    StructField("change_apply_ms", LongType)))

  /** Process-wide default registry (the reference has one Micrometer
    * registry per daemon).
    */
  val global = new SyncMetrics
}
