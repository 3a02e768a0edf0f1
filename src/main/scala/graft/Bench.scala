package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Accumulates executor task shuffle metrics across all jobs — the
  * numeric plan-shape guard: a future regression that un-pushes a
  * filter or turns a broadcast join into a shuffle join shows up as a
  * per-query shuffle-byte jump in BENCH_DETAIL.json, without anyone
  * eyeballing `.explain` output.
  */
private final class ShuffleTally extends SparkListener {
  val written = new java.util.concurrent.atomic.AtomicLong
  val read = new java.util.concurrent.atomic.AtomicLong
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
    }
  }
}

object Bench {
  /** Run-environment fingerprint for the sidecar: CPU model, core
    * count, and a 1-second single-thread integer calibration loop
    * (fixed xorshift work, reported as iterations/ms). Cross-boot CPU
    * variance moved identical-code sf1 numbers by ~5× in r16→r17
    * (BASELINE §sf1) — with the fingerprint in the sidecar, a swing
    * on identical code is attributable from the file alone.
    */
  private def envFingerprint(): String = {
    val cpu = try {
      val src = scala.io.Source.fromFile("/proc/cpuinfo")
      try src.getLines()
        .collectFirst { case l if l.startsWith("model name") => l.split(":", 2)(1).trim }
        .getOrElse("unknown")
      finally src.close()
    } catch { case _: Exception => "unknown" }
    val cores = Runtime.getRuntime.availableProcessors()
    var x = 0x9E3779B97F4A7C15L
    var iters = 0L
    val end = System.nanoTime() + 1000000000L
    while (System.nanoTime() < end) {
      var i = 0
      while (i < 100000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      iters += 100000
    }
    val kitersPerMs = iters / 1000000 // k-iterations per ms over ~1000 ms
    s""""env":{"cpu":"${cpu.replace("\"", "'")}","cores":$cores,""" +
      s""""calib_xorshift_kiters_ms":$kitersPerMs,"calib_sink":${x & 1}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val envJson = envFingerprint() // before any Spark work: idle-box calibration
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // NIO local fs: without libhadoop, Hadoop's local fs forks
      // chmod/ls/readlink per metadata op (graft.util.NioLocalFs —
      // measured 4.2k forks in a 120 s JFR window of table queries)
      .config("spark.hadoop.fs.file.impl", "graft.util.NioLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl", "graft.util.NioLocalFs")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-footer paths so the first timed query
    // doesn't absorb several seconds of one-time session cost; a missing
    // table degrades that query to -1 below instead of aborting the run
    Tables.names.foreach(n =>
      try Tables.t(spark, sfDir, n).count() catch { case _: Throwable => () })
    // ... and one real query untimed: shuffle setup, whole-stage codegen
    // compilation and broadcast machinery cost ~1.5 s once per session,
    // which otherwise lands entirely on the alphabetically-first entry
    try SparkEntry.queries.get("agg_pricing_summary").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    // ingest step: build the persisted indexes (the
    // build-once-at-ingest lifecycle — dedup/decontam/ANN/LM/pHash/
    // sketch/line/wgram/graph queries READ them; a per-query rebuild
    // is not an index). Untimed as queries but reported below so the cost is
    // never hidden. A FAILED build is recorded (stderr + the
    // ingest_failed sidecar list), not silently swallowed — otherwise
    // the first query to touch the missing index absorbs a full
    // corpus-scan build under its timed run with no signal why.
    // focused-probe knobs (BOTH unset in driver runs — full suite):
    // SPARK_GRAFT_ONLY=prefix1,prefix2 times only matching queries;
    // SPARK_GRAFT_SKIP_INGEST=1 skips the index builds (only safe when
    // the filtered queries read no persisted index, e.g. sync_/table_)
    val onlyPrefixes = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').toSeq.filter(_.nonEmpty))
    val skipIngest = sys.env.get("SPARK_GRAFT_SKIP_INGEST").contains("1")
    val ingestFailed = scala.collection.mutable.Set.empty[String]
    def ingest(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try { if (!skipIngest) body } catch {
        case e: Throwable =>
          ingestFailed += name
          System.err.println(s"ingest $name FAILED: $e")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val ingestSec = ingest("shingle_index") {
      graft.operators.ShingleIndex.ensureBuilt(spark, sfDir); ()
    }
    // same lifecycle for the embedding side: cluster assignments + IVF
    // cells are computed when embeddings land, persisted as icelite
    // tables, and the semantic dedup / kmeans / ANN queries READ them
    val clusterIngestSec = ingest("cluster_index") {
      graft.operators.ClusterIndex.ensureBuilt(spark, sfDir); ()
    }
    // ... and the LM count tables (same ingest lifecycle)
    val lmIngestSec = ingest("lm_index") {
      graft.operators.LmIndex.ensureBuilt(spark, sfDir); ()
    }
    // ... and the media pHash signature table (same ingest lifecycle:
    // decode every payload once when it lands, never per query)
    val phashIngestSec = ingest("phash_index") {
      graft.operators.PhashIndex.ensureBuilt(spark, sfDir); ()
    }
    // ... and the per-source vocabulary KMV sketch table (same
    // lifecycle: sketches build when data lands; the sketch-algebra
    // query only MERGES them)
    val sketchIngestSec = ingest("sketch_index") {
      graft.operators.SketchIndex.ensureBuilt(spark, sfDir); ()
    }
    // ... and the line-level df table (same lifecycle: the corpus is
    // segmented once when docs land; line dedup reads the df index)
    val lineIngestSec = ingest("line_index") {
      graft.operators.LineIndex.ensureBuilt(spark, sfDir); ()
    }
    // ... and the substring W-gram posting/metadata tables (same
    // lifecycle: the substring GATE is per-doc logic over per-gram
    // metadata once the index exists)
    val wgramIngestSec = ingest("wgram_index") {
      graft.operators.WgramIndex.ensureBuilt(spark, sfDir); ()
    }
    // ... and the co-purchase edge table (same lifecycle: the graph
    // builds when orders land; every graph query slices the index)
    val edgeIngestSec = ingest("edge_index") {
      graft.operators.EdgeIndex.ensureBuilt(spark, sfDir); ()
    }
    // ... and the incremental curation state (same lifecycle one level
    // up: per-doc verdicts build on the base split and fold the late
    // batch through the dirty-doc append; corpus_incremental READS it)
    val curationIngestSec = ingest("curation_state") {
      graft.operators.CurationState.ensureBuilt(spark, sfDir); ()
    }
    val failed = scala.collection.mutable.Set.empty[String]
    // noise control: TWO full passes over the suite, report the min per
    // query (BASELINE.md §methodology) — one-time costs (codegen
    // compile, shuffle-service setup, first-touch page cache) land on
    // pass 1 and the min reflects steady-state engine time; consecutive
    // runs of the reported numbers agree within ~10%
    // a failed attempt's fail-fast wall time must not win the min — it
    // measures the error path, not the query; a query is FAILED only
    // when no pass succeeded (a transient pass-1 flake with a clean
    // pass-2 run publishes the clean time and stays out of `failed`)
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    def drainTally(): Unit =
      try org.apache.spark.graft.ListenerFlush.flush(spark.sparkContext)
      catch { case _: Throwable => () }
    def pass(): Seq[(String, Double, Boolean, Long)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => onlyPrefixes.forall(_.exists(n.startsWith)) }
        .map { case (name, fn) =>
        System.gc() // don't bill one query for its predecessors' garbage
        drainTally()
        val w0 = tally.written.get()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val sec = (System.nanoTime() - t0) / 1e9
        drainTally()
        (name, sec, ok, tally.written.get() - w0)
      }
    val p1 = pass().map { case (n, s, ok, _) => n -> (s, ok) }.toMap
    // sync counters accumulate in the global registry across BOTH
    // passes (sync_pipeline runs twice) — snapshot after pass 1 so the
    // published absolute numbers are one run's, not doubled
    val m1 = graft.sync.SyncMetrics.global.of("analytics.orders_sync")
    val base = Map(
      "initialDocs" -> m1.initialDocs.sum, "changeEvents" -> m1.changeEvents.sum,
      "initialSyncMs" -> m1.initialSyncMs.sum, "changeApplyMs" -> m1.changeApplyMs.sum,
      "commits" -> m1.commits.sum, "commitLatencyMsSum" -> m1.commitLatencyMsSum.sum)
    val pass2 = pass()
    // shuffle bytes are a property of the PLAN, not the run — pass 2's
    // delta is the steady-state number (pass 1 additionally absorbs
    // first-touch index builds and broadcast warmups)
    val shuffleBytes = pass2.map { case (n, _, _, b) => n -> b }
    val results = pass2.map { case (n, s, ok, _) =>
      val (s1, ok1) = p1.getOrElse(n, (s, ok))
      if (!ok && !ok1) failed += n // no pass succeeded
      n -> ((ok, ok1) match {
        case (true, true) => math.min(s, s1)
        case (false, true) => s1 // pass 2 failed: pass 1's real run
        case _ => s // pass 1 failed (or missing): this attempt's time
      })
    }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // sync throughput (the reference's planned perf metrics,
    // docs/plan.md:242-247): sync_pipeline runs the full chunked CDC
    // sync eagerly, so its wall time over the recorded document/event
    // counters yields docs/sec + events/sec; commit latency comes from
    // the same registry. A FAILED sync run publishes no rates — a
    // partial run's counters over its wall time are not a throughput.
    val m = graft.sync.SyncMetrics.global.of("analytics.orders_sync")
    val ok = !failed("sync_pipeline") &&
      results.exists { case (n, _) => n == "sync_pipeline" }
    // pass-2 DELTAS: the published numbers are one run's, not both
    // passes' accumulation (max latency stays a cross-pass max — same
    // workload, and a max can't be delta'd)
    def d(key: String, now: Long): Long = now - base.getOrElse(key, 0L)
    val (nDocs, nEvents) = (d("initialDocs", m.initialDocs.sum), d("changeEvents", m.changeEvents.sum))
    val (isMs, caMs) = (d("initialSyncMs", m.initialSyncMs.sum), d("changeApplyMs", m.changeApplyMs.sum))
    val (nCommits, latSum) = (d("commits", m.commits.sum), d("commitLatencyMsSum", m.commitLatencyMsSum.sum))
    // per-PHASE rates from SyncMetrics' own wall-time windows (the old
    // derivation divided both counters by the whole query's wall time,
    // understating initial sync and entangling the two rates)
    def rate(n: Long, ms: Long): Double = if (ok && ms > 0) n * 1000.0 / ms else 0.0
    val sync = Map(
      "initial_docs" -> nDocs.toDouble,
      "change_events" -> nEvents.toDouble,
      "initial_sync_sec" -> isMs / 1000.0,
      "change_apply_sec" -> caMs / 1000.0,
      "docs_per_sec" -> rate(nDocs, isMs),
      "events_per_sec" -> rate(nEvents, caMs),
      "commit_latency_ms_mean" ->
        (if (nCommits > 0) latSum.toDouble / nCommits else 0.0),
      "commit_latency_ms_max" -> m.commitLatencyMsMax.get.toDouble)
    // full-precision sidecar (per-query seconds + sync throughput) —
    // the driver captures only the last 2000 stdout chars, so the
    // stdout line below is kept compact enough to survive intact:
    // per-query integer milliseconds ("qunit") and a basename sf
    val detail = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val shufJson = shuffleBytes.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val syncJson = sync.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${math.round(v * 1000) / 1000.0}""" }
      .mkString("{", ",", "}")
    // probe-knob echo: a sidecar written under SPARK_GRAFT_ONLY /
    // SPARK_GRAFT_SKIP_INGEST is a partial probe, not a full-suite
    // result — stamp the active knobs so the file is self-describing
    // (otherwise a probe is distinguishable only by inspecting the
    // per-query list)
    val knobs = (onlyPrefixes.map(ps =>
        s""""probe_only":${ps.map("\"" + _ + "\"").mkString("[", ",", "]")},""").toSeq ++
      (if (skipIngest) Seq(""""skip_ingest":true,""") else Nil)).mkString
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec",$envJson,$knobs"ingest_shingle_index_sec":$ingestSec,"ingest_cluster_index_sec":$clusterIngestSec,"ingest_lm_index_sec":$lmIngestSec,"ingest_phash_index_sec":$phashIngestSec,"ingest_sketch_index_sec":$sketchIngestSec,"ingest_line_index_sec":$lineIngestSec,"ingest_wgram_index_sec":$wgramIngestSec,"ingest_edge_index_sec":$edgeIngestSec,"ingest_curation_state_sec":$curationIngestSec,"ingest_failed":${ingestFailed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},"queries":$detail,"shuffle_bytes":$shufJson,"sync":$syncJson,"failed":${failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},"sf":"$sfDir"}"""
    val qs = results.map { case (k, v) => s""""$k":${math.round(v * 1000)}""" }
      .mkString("{", ",", "}")
    val totalR = math.round(total * 1000) / 1000.0
    val sfName = new java.io.File(sfDir).getName
    // stdout line FIRST — it is the one output the driver depends on;
    // the full-precision sidecar is best-effort (cwd may not be writable)
    // `total_sec` is duplicated at the END of the line: the driver's
    // sidecar keeps only the trailing 2000 stdout chars, which cuts
    // the leading "value" once the per-query dict outgrows the window —
    // a trailing copy keeps the suite total recoverable from the tail
    println(s"""{"metric":"total","value":$totalR,"unit":"sec","qunit":"ms","queries":$qs,"sf":"$sfName","total_sec":$totalR}""")
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: java.io.IOException => () }
    spark.stop()
  }
}
