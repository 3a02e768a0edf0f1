package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.GraftQuery
import graft.operators.Relational.dsum

/** Structured Streaming surface over the `events` table (SURVEY §2.4
  * streaming rows; reference S2/R5 change-stream family): event-time
  * tumbling-window aggregation with a watermark, and gap-based
  * sessionization — the stateful-processing shapes a training-data
  * pipeline needs beyond the CDC sync itself.
  *
  * The `events.parquet` fixture stands in for the event stream the
  * same way the change-log fixtures stand in for MongoDB change
  * streams (SURVEY §7.0): `readStream` consumes it through the file
  * source with `Trigger.AvailableNow`, so the plan/state machinery is
  * the real streaming path, deterministically drained for the oracle.
  */
object EventStreams {

  /** 30-minute inactivity gap closes a session (microseconds). */
  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  private val memCounter = new AtomicInteger()

  /** Events with `ts` decoded from parquet nanos (see
    * [[graft.Tables.events]]) as a STREAMING DataFrame.
    */
  def readEventStream(
      spark: SparkSession, dir: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema // ts arrives as long nanos
    // the streaming file source requires a DIRECTORY base path; when
    // events.parquet is a single file (the driver fixture layout),
    // stream its parent dir scoped down with a glob filter
    val isFile = java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(path))
    val (base, globFilter) = if (isFile) (dir, "events.parquet") else (path, "*.parquet")
    val reader = spark.readStream.schema(schema).option("pathGlobFilter", globFilter)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(base)
    // both testdata flavors (see Tables.events): long nanos → µs with
    // integer division; µs TIMESTAMP_NTZ → session-zone cast (UTC)
    schema("ts").dataType.typeName match {
      case "long" => stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => stream.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Tumbling 1-hour event-time windows per event_type, with a 1-hour
    * watermark bounding state (reference R5's flush-interval analog in
    * event time). Runs the real streaming plan (AvailableNow into a
    * file sink) and returns the drained result.
    *
    * Scale: streaming hash-agg keyed by (window, event_type) —
    * partial aggregation per micro-batch, state bounded by live
    * windows via the watermark, not by stream length. The drain writes
    * executor-side parquet (no driver collect); a deployment writes
    * the same plan append-mode into a table as windows finalize.
    */
  def windowCounts(spark: SparkSession, dir: String): DataFrame = {
    val agg = readEventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("sum_value"))
    drainToParquet(spark, agg, OutputMode.Complete(), s"window_counts:$dir")
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  /** Run a streaming DataFrame to completion (AvailableNow) through a
    * FILE sink and return a reader over the result. The output never
    * flows through driver memory — at 100× a stream-stream join's
    * output is far bigger than any driver heap, so a memory-sink drain
    * is not a viable harness path either.
    *
    *  - Append mode → the parquet streaming sink directly (exactly the
    *    deployment shape: executors write files, the sink commits them
    *    via its metadata log);
    *  - Complete mode → the file sink is append-only, so each trigger
    *    REPLACES the output dir from the executors via `foreachBatch`
    *    (the "complete-mode table" pattern); the last trigger's state
    *    is the drained result. A complete-mode aggregate is bounded by
    *    live groups, not stream length, so the per-trigger rewrite is
    *    the aggregate's size, not the stream's.
    *
    * Stateful shuffle width: each stateful partition is a state store
    * with per-batch checkpoint IO, so the stream runs with a narrower
    * `spark.sql.shuffle.partitions` than the batch default — the
    * standard per-stream tuning for stateful queries (state parallelism
    * should track state volume, not CPU count). Restored afterwards.
    */
  /** Drain output dirs (parquet result + stream checkpoint) created
    * this session; reclaimed in one sweep at JVM exit — the returned
    * DataFrames read their files lazily, so per-drain eager deletion
    * would break re-reads within the session.
    */
  private val drainDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      drainDirs.forEach { d =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(d.toPath).iterator().asScala.toSeq
            .sortBy(-_.getNameCount).foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Exception => () }
      }
    }, "graft-drain-cleanup"))
  }

  /** Sink/checkpoint dirs keyed by (query, input dir): a repeat call
    * RESTARTS the stream on its existing checkpoint instead of
    * replaying from scratch — the deployment lifecycle (a streaming
    * job resumes where it left off; readers read the sink). With no
    * new source files the restarted query processes zero batches and
    * the sink already holds the answer, so a re-run costs a restart,
    * not a full source replay.
    */
  private val drainBases =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def drainToParquet(
      spark: SparkSession, streaming: DataFrame, mode: OutputMode,
      key: String): DataFrame = {
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val base = drainBases.getOrElseUpdate(key, {
        val d = java.nio.file.Files
          .createTempDirectory(s"graft_drain_${memCounter.incrementAndGet()}_").toString
        drainDirs.add(new java.io.File(d))
        d
      })
      val out = s"$base/out"
      val ck = s"$base/ck"
      val writer = streaming.writeStream
        .outputMode(mode)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
      val q =
        if (mode == OutputMode.Append())
          writer.format("parquet").option("path", out).start()
        else
          writer.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
            batch.write.mode("overwrite").parquet(out)
          }.start()
      q.awaitTermination()
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(out)))
        spark.read.schema(streaming.schema).parquet(out)
      else // zero triggers produced output (empty stream)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], streaming.schema)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  private val windowCountsOracle =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
      |  event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ------------------------------------------------------ sessionization

  case class SessionEvent(user_id: Long, event_id: Long, tsUs: Long)

  /** One closed session (times in epoch micros; converted to
    * timestamps only at the DataFrame boundary so no precision is
    * lost round-tripping through java.sql.Timestamp).
    */
  case class Session(
      user_id: Long, session_id: Int, startUs: Long, endUs: Long, n_events: Long)

  /** Pure sessionizer: split a user's events on > gap inactivity.
    * Shared by the batch query and the streaming state handler.
    */
  private[streaming] def toSessions(
      userId: Long, events: Iterator[SessionEvent], firstId: Int = 1): Seq[Session] = {
    val sorted = events.toIndexedSeq.sortBy(e => (e.tsUs, e.event_id))
    if (sorted.isEmpty) Seq.empty
    else {
      val out = Seq.newBuilder[Session]
      var sid = firstId
      var start = sorted.head.tsUs
      var end = start
      var n = 0L
      sorted.foreach { e =>
        if (e.tsUs - end > SessionGapUs) {
          out += Session(userId, sid, start, end, n)
          sid += 1; start = e.tsUs; n = 0L
        }
        end = e.tsUs; n += 1
      }
      out += Session(userId, sid, start, end, n)
      out.result()
    }
  }

  /** Gap-based sessionization per user via the typed
    * `KeyValueGroupedDataset` API (`groupByKey` + `flatMapGroups`) —
    * the batch twin of [[sessionizeStream]], oracle-checkable as a
    * gaps-and-islands SQL. One shuffle on user_id; per-group work is
    * bounded by a user's event count, never the stream length.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsUs"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroups((uid: Long, it: Iterator[SessionEvent]) => toSessions(uid, it).iterator)
      .toDF()
      .select(col("user_id"), col("session_id"),
        timestamp_micros(col("startUs")).as("session_start"),
        timestamp_micros(col("endUs")).as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_id")
  }

  private val sessionizeOracle =
    """WITH o AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT user_id, CAST(sid AS INTEGER) AS session_id,
      |  CAST(min(ts) AS TIMESTAMP) AS session_start,
      |  CAST(max(ts) AS TIMESTAMP) AS session_end,
      |  count(*) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_id""".stripMargin

  // ------------------------------------------- streaming sessionization

  /** Streaming per-user state: events of still-open sessions plus how
    * many sessions this user has already emitted (so session numbering
    * stays stable across micro-batches).
    */
  case class StreamState(pending: List[SessionEvent], emitted: Int)

  /** True streaming sessionization: `flatMapGroupsWithState` with an
    * event-time timeout — the reference's "custom state" row (SURVEY
    * §2.4). On every invocation (new data OR timeout) the handler
    * sessionizes its buffered events, emits every session closed by
    * the current watermark, keeps open sessions in state, and arms a
    * timeout at last-event + gap. State per user is bounded by the
    * open session's events. Exercised by the streaming spec rather
    * than the oracle gate: emission timing depends on micro-batch
    * watermark advancement (the drained-log equivalent with identical
    * session math is [[sessionize]]).
    */
  def sessionizeStream(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): Dataset[Session] = {
    import spark.implicits._
    implicit val stateEnc: Encoder[StreamState] = Encoders.kryo[StreamState]
    readEventStream(spark, dir, maxFilesPerTrigger)
      .withWatermark("ts", "1 hour")
      // keep the watermarked `ts` column projected through to the
      // stateful operator — dropping it severs the watermark and
      // event-time timeouts are rejected
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsUs"), col("ts"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[StreamState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[SessionEvent], state: GroupState[StreamState]) =>
          val prior = state.getOption.getOrElse(StreamState(Nil, 0))
          val buffered = prior.pending ++ rows
          if (buffered.isEmpty) { state.remove(); Iterator.empty }
          else {
            val wmUs = state.getCurrentWatermarkMs() * 1000
            val sessions = toSessions(uid, buffered.iterator, firstId = prior.emitted + 1)
            val (closed, open) = sessions.partition(_.endUs + SessionGapUs < wmUs)
            val keep = buffered.filter(e => open.exists(s => e.tsUs >= s.startUs && e.tsUs <= s.endUs))
            if (keep.isEmpty) state.remove()
            else {
              state.update(StreamState(keep, prior.emitted + closed.size))
              // fire when the EARLIEST open session can close (its end +
              // gap passes the watermark) — arming at the latest event
              // would sit on closable sessions until new data arrives
              val timeoutMs = (open.map(_.endUs).min + SessionGapUs) / 1000
              state.setTimeoutTimestamp(math.max(timeoutMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  // ---------------------------------------------------- streaming dedup

  /** Streaming deduplication with a watermark-bounded state store —
    * the ingest-side operator that collapses repeated events (retries,
    * at-least-once sources) before they reach storage. Keys on
    * (user_id, event_type, minute) via `dropDuplicatesWithinWatermark`:
    * that variant evicts state once the watermark passes a key's event
    * time, so state is bounded by the watermark horizon, not stream
    * length (plain `dropDuplicates` on a derived column would keep
    * every key forever — the event-time metadata is lost by
    * `date_trunc`, so nothing would ever age out). Output is exactly
    * the distinct key set, so the batch DISTINCT is the oracle.
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val deduped = readEventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_type"),
        date_trunc("minute", col("ts")).as("minute"), col("ts"))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")
    drainToParquet(spark, deduped, OutputMode.Append(), s"stream_dedup:$dir")
      .select(col("user_id"), col("event_type"), col("minute"))
      .orderBy("user_id", "event_type", "minute")
  }

  private val streamDedupOracle =
    """SELECT DISTINCT user_id, event_type,
      |  CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute
      |FROM events ORDER BY user_id, event_type, minute""".stripMargin

  // ------------------------------------------------- stream-stream join

  /** Stream-stream inner join (the remaining Structured Streaming
    * shape): purchases joined to the same user's views within the 10
    * minutes before the purchase, both sides watermarked so join state
    * is bounded by the time-range condition — the planner derives the
    * state retention from the range predicate, which is what makes
    * this viable on an unbounded stream. Drained with AvailableNow
    * (single batch per side ⇒ no late-data drops ⇒ the batch range
    * join is the exact oracle).
    */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = readEventStream(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 10 minutes"))
    drainToParquet(spark, joined, OutputMode.Append(), s"stream_stream_join:$dir")
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        unix_micros(col("p_ts")).minus(unix_micros(col("v_ts"))).as("gap_us"))
      .orderBy("user_id", "purchase_id", "view_id")
  }

  private val outerDirs =
    new scala.collection.concurrent.TrieMap[String, String]()

  /** Fixture for [[streamOuterJoin]]: the full event feed as batch 0,
    * then two SENTINEL batches (a matched view+purchase pair per
    * batch, far past the real range) whose only job is to ADVANCE the
    * watermark past every real event so unmatched purchases are
    * evicted and their null rows actually EMIT. Without them, an
    * AvailableNow drain ends with the tail still in state and the
    * outer join silently degenerates to the inner join — the sentinel
    * batches are the deployment's "stream keeps flowing" stand-in.
    */
  private def outerSplitDir(spark: SparkSession, dir: String): String =
    outerDirs.getOrElseUpdate(dir, {
      val base = java.nio.file.Files.createTempDirectory("graft_outer_").toString
      drainDirs.add(new java.io.File(base))
      val tgt = java.nio.file.Paths.get(s"$base/in/events.parquet")
      java.nio.file.Files.createDirectories(tgt)
      val ev = graft.Tables.events(spark, dir)
      val mx = ev.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
      def sentinels(user: Long, vId: Long, pId: Long, tsUs: Long): DataFrame = {
        import spark.implicits._
        Seq((vId, user, "view", tsUs), (pId, user, "purchase", tsUs))
          .toDF("event_id", "user_id", "event_type", "us")
          .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
            col("user_id"), col("event_type"),
            lit(0.0).as("value"), lit("{}").as("props"))
          .select(ev.schema.fieldNames.map(n =>
            col(n).cast(ev.schema(n).dataType).as(n)).toSeq: _*)
      }
      val files = Seq(
        ev,
        sentinels(-1L, -1L, -2L, mx + 2L * 3600 * 1000000),
        sentinels(-2L, -3L, -4L, mx + 6L * 3600 * 1000000))
      files.zipWithIndex.foreach { case (df, i) =>
        val tmp = s"$base/tmp$i"
        df.coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = tgt.resolve(f"part-$i%05d.parquet")
        java.nio.file.Files.copy(part.toPath, dst)
        dst.toFile.setLastModified(1000000L + i * 10000L)
      }
      s"$base/in"
    })

  /** LEFT OUTER stream-stream join — purchases that found NO view in
    * their 10-minute lookback must still emit, with a null view side.
    * The semantics the inner join cannot give: an outer row may only
    * emit once the WATERMARK proves no matching view can still
    * arrive, so emission is tied to watermark progress, not row
    * arrival — matched rows emit at match time, unmatched purchases
    * emit when evicted. The fixture's two sentinel batches push the
    * final watermark past every real event, so the drained result is
    * EXACTLY the relational LEFT JOIN (sentinel pairs included,
    * matching each other) — no boundary approximation in the oracle.
    *
    * Scale: same co-partitioned symmetric-hash state as the inner
    * join; watermark bounds state on both sides (evicted views free
    * memory, evicted purchases emit their verdict). The oracle being
    * a plain LEFT JOIN is the point: streaming + watermarks re-derive
    * batch outer-join semantics exactly.
    */
  def streamOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = readEventStream(spark, outerSplitDir(spark, dir), maxFilesPerTrigger = Some(1))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 10 minutes"),
      "leftOuter")
    drainToParquet(spark, joined, OutputMode.Append(), s"stream_outer_join:$dir")
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
      .orderBy("user_id", "purchase_id", "view_id")
  }

  private val streamOuterJoinOracle =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |mx AS (SELECT max(us) AS m FROM e),
      |sent AS (
      |  SELECT -1 AS event_id, -1 AS user_id, 'view' AS event_type, m + 7200000000 AS us FROM mx
      |  UNION ALL SELECT -2, -1, 'purchase', m + 7200000000 FROM mx
      |  UNION ALL SELECT -3, -2, 'view', m + 21600000000 FROM mx
      |  UNION ALL SELECT -4, -2, 'purchase', m + 21600000000 FROM mx),
      |a AS (SELECT * FROM e UNION ALL SELECT * FROM sent),
      |v AS (SELECT user_id, event_id, us FROM a WHERE event_type = 'view'),
      |p AS (SELECT user_id, event_id, us FROM a WHERE event_type = 'purchase')
      |SELECT p.user_id AS user_id, p.event_id AS purchase_id,
      |  v.event_id AS view_id, p.us - v.us AS gap_us
      |FROM p LEFT JOIN v
      |  ON p.user_id = v.user_id AND v.us <= p.us AND v.us >= p.us - 600000000
      |ORDER BY user_id, purchase_id, view_id""".stripMargin

  private val streamStreamJoinOracle =
    """SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
      |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id
      |  AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL '10 minutes'
      |ORDER BY p.user_id, purchase_id, view_id""".stripMargin

  // ------------------------------------------------ streaming sketches

  /** The native KMV sketch aggregate ([[graft.functions.KmvSketchAgg]])
    * running INSIDE a streaming aggregation: per event_type, the
    * distinct-user estimate maintained incrementally across
    * micro-batches (the sketch buffer IS the stream state — ≤ k longs
    * per group in the state store, regardless of stream length). A KMV
    * sketch keeps the k smallest distinct hashes, an order-independent
    * reduction — so the drained result is bit-identical to the batch
    * sketch over the same data no matter how the stream was
    * micro-batched, which is what makes an exact oracle possible for a
    * streaming approximate aggregate.
    *
    * Scale: this is the deployment shape for "live distinct users per
    * segment" — state per group is k longs (not a distinct-set), the
    * per-batch update is partial-aggregated before the shuffle, and
    * the complete-mode output is |groups| rows per trigger.
    */
  def streamKmvUsers(spark: SparkSession, dir: String): DataFrame = {
    val agg = readEventStream(spark, dir)
      .groupBy(col("event_type"))
      .agg(graft.functions.KmvSketchAgg.kmvSketch(
        graft.operators.Dedup.phash(col("user_id").cast("string")),
        graft.operators.Relational.KmvK).as("kmv"))
    drainToParquet(spark, agg, OutputMode.Complete(), s"kmv_users:$dir")
      .select(col("event_type"),
        col("kmv.distinct_estimate").as("distinct_users_est"),
        col("kmv.sketch_size").as("sketch_size"))
      .orderBy("event_type")
  }

  private val streamKmvUsersOracle = {
    val k = graft.operators.Relational.KmvK
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    ${graft.operators.Dedup.phashSql("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events),
       |r AS (
       |  SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h),
       |k AS (
       |  SELECT event_type, count(*) AS n, max(h) AS hk
       |  FROM r WHERE rn <= $k GROUP BY 1)
       |SELECT event_type,
       |  CAST(CASE WHEN n < $k THEN n
       |       ELSE ${(graft.operators.Relational.KmvK - 1).toLong * 4294967296L} // hk END AS BIGINT)
       |    AS distinct_users_est,
       |  CAST(n AS BIGINT) AS sketch_size
       |FROM k ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------ late-data accounting

  private val WinUs: Long = 3600L * 1000000

  /** Split event dirs keyed by input dir (built once per session, like
    * [[drainBases]]): two on-time files (event_id % 4 != 0, split at
    * the 3/4 point of the time range) followed by a LATE file
    * (% 4 == 0, spanning the full range), mtimes pinned 10 s apart so
    * the file source's modification-time ordering IS the batch order
    * under maxFilesPerTrigger=1. THREE data batches are the minimum
    * that exercises the drop path: since Spark 3.4 late events filter
    * against the PREVIOUS micro-batch's watermark
    * (`watermarkForLateEvents` lags `watermarkForEviction` by one
    * batch — SPARK-42376), so the late file's effective cut is the
    * watermark earned by batch 1, max(first on-time file) − 1 h.
    */
  private val lateDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def lateSplitDir(spark: SparkSession, dir: String): String =
    lateDirs.getOrElseUpdate(dir, {
      val base = java.nio.file.Files.createTempDirectory("graft_late_").toString
      drainDirs.add(new java.io.File(base))
      val tgt = java.nio.file.Paths.get(s"$base/in/events.parquet")
      java.nio.file.Files.createDirectories(tgt)
      val ev = graft.Tables.events(spark, dir)
      val b = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).collect()(0)
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val t75 = mn + (mx - mn) * 3 / 4
      val conds = Seq(
        s"pmod(event_id, 4) != 0 AND unix_micros(ts) < ${t75}L",
        s"pmod(event_id, 4) != 0 AND unix_micros(ts) >= ${t75}L",
        "pmod(event_id, 4) = 0")
      conds.zipWithIndex.foreach { case (cond, i) =>
        val tmp = s"$base/tmp$i"
        ev.filter(expr(cond)).coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = tgt.resolve(f"part-$i%05d.parquet")
        java.nio.file.Files.copy(part.toPath, dst)
        dst.toFile.setLastModified(1000000L + i * 10000L)
      }
      s"$base/in"
    })

  /** Watermark late-data accounting — the correctness contract of
    * every streaming aggregation: the event fixture replays as THREE
    * micro-batches — early on-time, recent on-time, then a
    * deliberately disordered late feed spanning the full range — so
    * the late batch's rows into windows already sealed by the
    * previous batch's watermark (max of the FIRST file − 1 h, see
    * [[lateSplitDir]] on the one-batch lag) are DROPPED, while append
    * mode emits only windows the final watermark has sealed. The
    * oracle recomputes both watermarks and applies the same two cuts
    * relationally — the gate certifies the drop/emit boundary, not
    * just the happy path.
    *
    * Scale: identical plan to [[windowCounts]] (streaming hash-agg,
    * state bounded by live windows); the split dir is a fixture
    * artifact, not a deployment step.
    */
  def lateEvents(spark: SparkSession, dir: String): DataFrame = {
    val agg = readEventStream(spark, lateSplitDir(spark, dir), maxFilesPerTrigger = Some(1))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    drainToParquet(spark, agg, OutputMode.Append(), s"late_events:$dir")
      .select(col("win.start").as("window_start"), col("event_type"), col("n_events"))
      .orderBy("window_start", "event_type")
  }

  private val lateEventsOracle =
    s"""WITH e AS (
       |  SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
       |  FROM events),
       |bounds AS (
       |  SELECT min(us) AS mn, max(us) AS mx,
       |    min(us) + (max(us) - min(us)) * 3 // 4 AS t75
       |  FROM e),
       |a AS (SELECT e.* FROM e WHERE event_id % 4 <> 0),
       |b AS (SELECT e.* FROM e WHERE event_id % 4 = 0),
       |wmdrop AS (
       |  SELECT max(us) - $WinUs AS w FROM a, bounds WHERE us < t75),
       |wmf AS (SELECT max(us) - $WinUs AS w FROM e),
       |surv AS (
       |  SELECT event_type, us FROM a
       |  UNION ALL
       |  SELECT b.event_type, b.us FROM b, wmdrop
       |  WHERE (b.us // $WinUs + 1) * $WinUs > wmdrop.w),
       |fin AS (
       |  SELECT us // $WinUs AS win, event_type, count(*) AS n_events
       |  FROM surv GROUP BY 1, 2)
       |SELECT make_timestamp(win * $WinUs) AS window_start, event_type, n_events
       |FROM fin, wmf
       |WHERE (win + 1) * $WinUs <= wmf.w
       |ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------- registry

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("stream_late_events", lateEvents _, Some(lateEventsOracle),
      "watermark late-data accounting: disordered two-batch replay, drop + emit boundaries gated"),
    GraftQuery("stream_window_counts", windowCounts _, Some(windowCountsOracle),
      "streaming tumbling 1h window agg with watermark (AvailableNow drain)"),
    GraftQuery("stream_kmv_users", streamKmvUsers _, Some(streamKmvUsersOracle),
      "native KMV sketch as streaming state: per-type distinct-user estimate, batch-identical"),
    GraftQuery("sessionize_events", sessionize _, Some(sessionizeOracle),
      "gap-based sessionization via typed groupByKey/flatMapGroups"),
    GraftQuery("stream_outer_join", streamOuterJoin _, Some(streamOuterJoinOracle),
      "left-outer stream-stream join: watermark-gated null emission == the relational LEFT JOIN"),
    GraftQuery("stream_stream_join", streamStreamJoin _, Some(streamStreamJoinOracle),
      "watermarked stream-stream inner join with time-range state bound"),
    GraftQuery("stream_dedup", streamDedup _, Some(streamDedupOracle),
      "streaming dropDuplicates with watermark-bounded state (ingest dedup)"))
}
