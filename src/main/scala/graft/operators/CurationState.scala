package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.table.IceliteTable

/** INCREMENTAL corpus curation — the flagship lifecycle a 100 TB
  * pipeline actually runs: you never re-curate the corpus from scratch
  * when a 1% batch lands. The per-document curation verdicts behind
  * [[Pipeline.corpusFinal]]'s manifest (quality points, line-cleaned
  * token mass, substring-run flag, n-gram decontamination flag,
  * semantic decontamination flag, LSH signatures and verified near-dup
  * pairs) are PERSISTED as icelite tables, and folding a new batch in
  * re-evaluates ONLY the batch plus the base documents whose verdicts
  * the batch can actually change — the "dirty" set, discovered from
  * per-gram metadata deltas, never by re-scanning the corpus.
  *
  * Dirt is a property of GRAMS, found at O(batch) cost:
  *  - a 5-shingle crossing [[Dedup.MaxShingleDf]] changes the capped
  *    shingle sets — and therefore the MinHash signatures and verified
  *    Jaccard — of every base doc carrying it;
  *  - a 5-shingle whose (df ≤ cap ∧ eval-df ≥ 1) contamination status
  *    flips changes the n-gram decontamination flag of its carriers
  *    (the batch can contain NEW eval-suite docs: doc_id ≡ 0 mod
  *    [[Hygiene.BenchMod]] intersects the batch residue);
  *  - a substring W-gram crossing the cap or receiving a lower
  *    `min_doc` changes the substring-run flag of its carriers (the
  *    flag is exactly "∃ capped W-gram with min_doc < doc_id", so it
  *    needs no pair join at all);
  *  - a line hash crossing [[Dedup.LineMaxDocDf]] changes the cleaned
  *    token mass of every base doc containing that line.
  * Carriers of a dirty gram are looked up in the PERSISTED posting
  * tables (the inverted indexes), so the re-evaluated subset is
  * proportional to the flip fan-out, not the corpus. Semantic
  * decontamination is per-vector against a FIXED eval set, so it has
  * no dirty set at all. After the fold, every table equals a full
  * rebuild over old ∪ new — the append ≡ rebuild contract every index
  * lifecycle here carries, proven cross-engine by the
  * `corpus_incremental` query: its oracle is `corpus_final`'s FULL
  * recompute, so a hash match certifies incremental ≡ from-scratch.
  *
  * Layout (warehouse `cur` namespace, alongside split-built
  * [[ShingleIndex]] (`idx`), [[LineIndex]] (`lidx`) and
  * [[WgramIndex]] (`widx`) instances — the SAME serving-index classes
  * the standalone queries read, so their posting/metadata tables are
  * never duplicated here):
  *  - `state(doc_id, source, nt, pts, text_len, ntc, substr_bad,
  *    ngram_bad, sem_bad)` — the per-doc verdicts;
  *  - `bdf(s, bdf)` — eval-suite document frequency per 5-shingle;
  *  - `bands(doc_id, band, sig)` — LSH band rows;
  *  - `vpairs(x, y)` — verified near-dup pairs;
  *  - `eval_emb(vec_id, embedding)` — the frozen semantic eval set.
  *
  * Scale shape: build is the ingest cost (one corpus scan per gram
  * family). Append touches the batch, the per-gram delta frames
  * (O(batch grams)), the posting rows of flipped grams, and the band
  * join of dirty signatures against the band table — no full-corpus
  * scan, shuffle, or re-segmentation anywhere. The manifest read is
  * one state-table scan plus connected components over the tiny
  * verified-pair table, feeding [[Pipeline.manifestFromFlags]] —
  * the IDENTICAL manifest stage `corpus_final` runs.
  */
object CurationState {

  private val Ns = "cur"

  /** Per-family dirty-doc counts of the LAST [[append]] call (batch
    * docs excluded) — visible for the spec that proves only the dirty
    * subset was re-evaluated.
    */
  @volatile private[graft] var lastAppendDirty: Map[String, Long] = Map.empty

  private val built = scala.collection.mutable.Map.empty[String, String]

  // ------------------------------------------------------------ build

  /** Build the full curation state from a base corpus (ingest-time
    * job). `emb` is the base embeddings frame and must contain the
    * eval vectors (`vec_id` < [[Similarity.NumQueries]]) — the
    * semantic eval set is frozen at build time.
    */
  def build(spark: SparkSession, warehouse: String,
      docs: DataFrame, emb: DataFrame): Unit = {
    ShingleIndex.build(spark, warehouse, docs)
    LineIndex.build(spark, warehouse, docs)
    WgramIndex.build(spark, warehouse, docs)

    val bdf = ShingleIndex.readPostings(spark, warehouse)
      .filter(col("doc_id") % Hygiene.BenchMod === 0)
      .groupBy(col("s")).agg(count(lit(1)).as("bdf"))
    IceliteTable.create(spark, warehouse, Ns, "bdf", bdf.schema).append(bdf)

    val evalEmb = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id"), col("embedding"))
    IceliteTable.create(spark, warehouse, Ns, "eval_emb", evalEmb.schema)
      .append(evalEmb)

    val e = ShingleIndex.readIndex(spark, warehouse)
    val bands = Dedup.bandsFrom(Dedup.sigsFrom(e))
    val bTbl = IceliteTable.create(spark, warehouse, Ns, "bands", bands.schema)
    bTbl.append(bands)
    val stored = bTbl.read()
    val candidates = stored.as("a").join(stored.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .distinct()
    val vpairs = Dedup.verifyPairs(e, candidates).select(col("x"), col("y"))
    IceliteTable.create(spark, warehouse, Ns, "vpairs", vpairs.schema).append(vpairs)

    val state = stateRows(spark, warehouse, docs, emb)
    IceliteTable.create(spark, warehouse, Ns, "state", state.schema).append(state)
  }

  // ----------------------------------------------------------- append

  /** Fold a NEW document batch (and its embeddings) into the curation
    * state: detect dirty grams from pre-append metadata, fold the
    * batch into every gram table, then re-evaluate the batch plus
    * only the dirty carriers. After this, every table equals a full
    * rebuild over old ∪ new.
    */
  def append(spark: SparkSession, warehouse: String,
      batch: DataFrame, batchEmb: DataFrame): Unit = {
    val cap = Dedup.MaxShingleDf

    // ---- phase A: dirty detection against PRE-append state. Every
    // frame that reads a table is eagerly materialized (localCheckpoint)
    // before phase B mutates the tables underneath it.
    val d5 = Dedup.shingleStream(batch)
      .groupBy(col("s")).agg(count(lit(1)).as("ddf"),
        sum(when(col("doc_id") % Hygiene.BenchMod === 0, 1L).otherwise(0L)).as("dbdf"))
      .localCheckpoint(true)
    val old5 = ShingleIndex.readDfTable(spark, warehouse)
      .withColumnRenamed("df", "df_old")
      .join(d5.select(col("s")), Seq("s"), "left_semi")
    val oldB = readTbl(spark, warehouse, "bdf").withColumnRenamed("bdf", "bdf_old")
      .join(d5.select(col("s")), Seq("s"), "left_semi")
    val meta5 = d5.join(old5, Seq("s"), "left").join(oldB, Seq("s"), "left")
      .select(col("s"), coalesce(col("df_old"), lit(0L)).as("df_old"),
        coalesce(col("bdf_old"), lit(0L)).as("bdf_old"), col("ddf"), col("dbdf"))
      .withColumn("df_new", col("df_old") + col("ddf"))
      .withColumn("bdf_new", col("bdf_old") + col("dbdf"))
      .filter(col("df_old") >= 1) // only grams base docs carry can dirty base docs
      .localCheckpoint(true)
    val capFlip5 = meta5.filter(col("df_old") <= cap && col("df_new") > cap).select(col("s"))
    val contribFlip5 = meta5.filter(
        (col("df_old") <= cap && col("bdf_old") >= 1) =!=
          (col("df_new") <= cap && col("bdf_new") >= 1))
      .select(col("s"))
    val post5 = ShingleIndex.readPostings(spark, warehouse)
    val dirtySig = post5.join(capFlip5, Seq("s"), "left_semi")
      .select(col("doc_id")).distinct().localCheckpoint(true)
    val dirtyNgram = post5.join(contribFlip5, Seq("s"), "left_semi")
      .filter(col("doc_id") % Hygiene.BenchMod =!= 0)
      .select(col("doc_id")).distinct().localCheckpoint(true)

    val dw = Dedup.wordNgramStream(batch, Dedup.SubstringWidth)
      .select(col("doc_id"), Dedup.phash60(col("s")).as("hs"))
      .dropDuplicates("doc_id", "hs")
      .groupBy(col("hs"))
      .agg(count(lit(1)).as("ddf"), min(col("doc_id")).as("min_b"))
      .localCheckpoint(true)
    val oldW = WgramIndex.readMeta(spark, warehouse)
      .withColumnRenamed("df", "df_old").withColumnRenamed("min_doc", "min_old")
      .join(dw.select(col("hs")), Seq("hs"), "left_semi")
    val dirtyWGrams = dw.join(oldW, Seq("hs"))
      .filter((col("df_old") <= cap && col("df_old") + col("ddf") > cap) ||
        col("min_b") < col("min_old"))
      .select(col("hs"))
    val dirtySubstr = WgramIndex.readPost(spark, warehouse)
      .join(dirtyWGrams, Seq("hs"), "left_semi")
      .select(col("doc_id")).distinct().localCheckpoint(true)

    val dl = Dedup.lineHashStream(batch)
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("ddf"))
      .localCheckpoint(true)
    val oldL = LineIndex.readDf(spark, warehouse).withColumnRenamed("df", "df_old")
      .join(dl.select(col("h")), Seq("h"), "left_semi")
    val flippedLines = dl.join(oldL, Seq("h"))
      .filter(col("df_old") <= Dedup.LineMaxDocDf &&
        col("df_old") + col("ddf") > Dedup.LineMaxDocDf)
      .select(col("h"))
    val dirtyLine = LineIndex.readPost(spark, warehouse)
      .join(flippedLines, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct().localCheckpoint(true)

    lastAppendDirty = Map(
      "sig" -> dirtySig.count(), "ngram" -> dirtyNgram.count(),
      "substr" -> dirtySubstr.count(), "line" -> dirtyLine.count())

    // ---- phase B: fold the batch into every gram table
    ShingleIndex.append(spark, warehouse, batch)
    LineIndex.append(spark, warehouse, batch)
    WgramIndex.append(spark, warehouse, batch)
    val bdfDelta = d5.filter(col("dbdf") >= 1)
      .select(col("s"), col("dbdf").as("bdf"))
    if (!bdfDelta.isEmpty)
      loadTbl(spark, warehouse, "bdf").merge(bdfDelta, Seq("s"),
        matchedUpdate = Some(lit(true)), notMatchedInsert = Some(lit(true)),
        matchedUpdateSet = Map("bdf" -> (col("t.bdf") + col("s.bdf"))))

    // ---- phase C: re-evaluate the batch + the dirty carriers against
    // the MERGED tables
    val batchIds = batch.select(col("doc_id")).localCheckpoint(true)
    val e = ShingleIndex.readIndex(spark, warehouse)

    // signatures, bands, pairs
    val dirtyAll = dirtySig.unionByName(batchIds).distinct().localCheckpoint(true)
    val newBands = Dedup.bandsFrom(Dedup.sigsFrom(
        e.join(dirtyAll, Seq("doc_id"), "left_semi")))
      .localCheckpoint(true)
    val bTbl = loadTbl(spark, warehouse, "bands")
    bTbl.delete(dirtyAll, Seq("doc_id"))
    bTbl.append(newBands)
    val vTbl = loadTbl(spark, warehouse, "vpairs")
    val stale = vTbl.read()
      .join(dirtyAll.select(col("doc_id")), col("x") === col("doc_id") ||
        col("y") === col("doc_id"), "left_semi")
    if (!stale.isEmpty) vTbl.delete(stale, Seq("x", "y"))
    val allBands = bTbl.read()
    val cand = newBands.as("a").join(allBands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("x"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("y"))
      .distinct()
    val newPairs = Dedup.verifyPairs(e, cand).select(col("x"), col("y"))
    if (!newPairs.isEmpty) vTbl.append(newPairs)

    // batch verdicts (full computation over merged tables), then the
    // three per-family dirty re-evaluations as column-level merges
    val sTbl = loadTbl(spark, warehouse, "state")
    sTbl.append(stateRows(spark, warehouse, batch, batchEmb))

    if (!dirtyNgram.isEmpty) {
      val flagged = e.join(dirtyNgram, Seq("doc_id"), "left_semi")
        .join(readTbl(spark, warehouse, "bdf"), Seq("s"), "left_semi")
        .select(col("doc_id")).distinct().withColumn("f", lit(true))
      val upd = dirtyNgram.join(flagged, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("f"), lit(false)).as("ngram_bad"))
      sTbl.merge(upd, Seq("doc_id"), matchedUpdate = Some(lit(true)),
        notMatchedInsert = None,
        matchedUpdateSet = Map("ngram_bad" -> col("s.ngram_bad")))
    }
    if (!dirtySubstr.isEmpty) {
      val upd = substrFlags(spark, warehouse, dirtySubstr)
      sTbl.merge(upd, Seq("doc_id"), matchedUpdate = Some(lit(true)),
        notMatchedInsert = None,
        matchedUpdateSet = Map("substr_bad" -> col("s.substr_bad")))
    }
    if (!dirtyLine.isEmpty) {
      val upd = ntcFor(spark, warehouse, dirtyLine)
      sTbl.merge(upd, Seq("doc_id"), matchedUpdate = Some(lit(true)),
        notMatchedInsert = None,
        matchedUpdateSet = Map("ntc" -> col("s.ntc")))
    }
  }

  // ------------------------------------------------------- manifest read

  /** The curated-corpus manifest from the persisted state — the
    * IDENTICAL output [[Pipeline.corpusFinal]] computes from scratch:
    * connected components over the verified-pair table give the
    * clusters, the shared survivor ranking picks keepers, and
    * [[Pipeline.manifestFromFlags]] runs the split/mixture/aggregation
    * stage on the same code path.
    */
  def manifest(spark: SparkSession, warehouse: String,
      temperature: Boolean = false): DataFrame =
    Pipeline.manifestFromFlags(stateFlags(spark, warehouse), temperature)

  /** The per-doc flags frame assembled from the verdict store — the
    * state-served twin of [[Pipeline.corpusFinalFlags]], feeding the
    * same downstream code paths (manifest aggregation AND the ordered
    * curated corpus).
    */
  private[operators] def stateFlags(spark: SparkSession, warehouse: String): DataFrame = {
    val st = readTbl(spark, warehouse, "state")
    val pairs = readTbl(spark, warehouse, "vpairs").select(col("x"), col("y"))
    val clusters = Dedup.clustersFromPairs(spark, pairs)
      .select(col("doc_id"), col("cluster_id"))
    val scored = st.select(col("doc_id"), col("pts").as("quality"), col("text_len"))
    val survivors = clusters.join(scored, "doc_id")
      .withColumn("keep", Dedup.survivorRank("text_len", "doc_id") === 1)
      .select(col("doc_id"), col("cluster_id"), col("keep").as("dedup_keep"))
    st.filter(col("doc_id") % Hygiene.BenchMod =!= 0)
      .join(survivors, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("nt"), col("pts"), col("ntc"),
        coalesce(col("dedup_keep"), lit(true)).as("dedup_keep"),
        col("substr_bad"), col("ngram_bad"), col("sem_bad"),
        coalesce(col("cluster_id"), col("doc_id")).as("group_id"))
  }

  /** The ordered curated corpus SERVED FROM THE VERDICT STORE — the
    * deployment path: the training schedule derives from persisted
    * per-doc decisions, never a corpus re-scan. Identical to the
    * full-recompute derivation (state ≡ recompute is what
    * `corpus_incremental`'s gate certifies), which is also what the
    * driver's full-recompute oracle checks against this output.
    */
  def orderedCorpus(spark: SparkSession, dir: String): DataFrame =
    Pipeline.orderedFromFlags(stateFlags(spark, ensureBuilt(spark, dir)))

  // -------------------------------------------------- verdict assembly

  private def loadTbl(spark: SparkSession, wh: String, name: String): IceliteTable =
    IceliteTable.load(spark, wh, Ns, name)

  private def readTbl(spark: SparkSession, wh: String, name: String): DataFrame =
    loadTbl(spark, wh, name).read()

  /** Substring-run flags for a given doc-id set, from the merged
    * W-gram tables: flagged iff ∃ capped gram with min_doc < doc_id.
    */
  private def substrFlags(spark: SparkSession, wh: String, ids: DataFrame): DataFrame = {
    val hit = WgramIndex.readPost(spark, wh).join(ids, Seq("doc_id"), "left_semi")
      .join(WgramIndex.readMeta(spark, wh), Seq("hs"))
      .filter(col("df") <= Dedup.MaxShingleDf && col("min_doc") < col("doc_id"))
      .select(col("doc_id")).distinct().withColumn("f", lit(true))
    ids.join(hit, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("f"), lit(false)).as("substr_bad"))
  }

  /** Line-cleaned token mass for a given doc-id set, from the merged
    * line tables.
    */
  private def ntcFor(spark: SparkSession, wh: String, ids: DataFrame): DataFrame = {
    val boiler = LineIndex.readDf(spark, wh)
      .filter(col("df") > Dedup.LineMaxDocDf)
      .select(col("h"), lit(true).as("_b"))
    LineIndex.readPost(spark, wh).join(ids, Seq("doc_id"), "left_semi")
      .join(boiler, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("_b").isNull, col("ntk")).otherwise(0L)).as("ntc"))
  }

  /** Full per-doc verdict rows for a docs subset, reading the MERGED
    * tables — used for the base build (all docs) and for each landing
    * batch (batch docs only).
    */
  private def stateRows(spark: SparkSession, wh: String,
      docs: DataFrame, emb: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id"))
    val base = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("nt"),
      TextAnalysis.qualityPoints(col("text")).as("pts"),
      length(col("text")).cast("long").as("text_len"))
    val ntc = ntcFor(spark, wh, ids)
    val substr = substrFlags(spark, wh, ids)
      .withColumnRenamed("substr_bad", "sb")
    val ngram = ShingleIndex.readIndex(spark, wh)
      .join(ids, Seq("doc_id"), "left_semi")
      .join(readTbl(spark, wh, "bdf"), Seq("s"), "left_semi")
      .filter(col("doc_id") % Hygiene.BenchMod =!= 0)
      .select(col("doc_id")).distinct().withColumn("ng", lit(true))
    val evalEmb = readTbl(spark, wh, "eval_emb")
      .select(col("vec_id"), col("embedding"),
        Dedup.decimalNormSq(col("embedding")).as("nsq"))
    val corpusEmb = emb.filter(col("vec_id") >= Similarity.NumQueries)
      .select(col("vec_id"), col("embedding"),
        Dedup.decimalNormSq(col("embedding")).as("nsq"))
    val sem = Hygiene.decontamSemanticOn(corpusEmb, evalEmb)
      .select(col("vec_id").as("doc_id")).distinct().withColumn("sm", lit(true))
    base
      .join(ntc, Seq("doc_id"), "left")
      .join(substr, Seq("doc_id"), "left")
      .join(ngram, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("nt"), col("pts"), col("text_len"),
        coalesce(col("ntc"), lit(0L)).as("ntc"),
        coalesce(col("sb"), lit(false)).as("substr_bad"),
        coalesce(col("ng"), lit(false)).as("ngram_bad"),
        coalesce(col("sm"), lit(false)).as("sem_bad"))
  }

  // ---------------------------------------------------------- registry

  /** The late-landing residues [[ensureBuilt]] streams in: two
    * separate micro-batch folds, so the driver gate exercises
    * MULTI-append accumulation (df sums, min_doc lowering and eval-df
    * arrival across successive folds), not just one append.
    */
  private[operators] val LateResidues = Seq(7L, 9L)

  /** Ensure the incremental state for dataset `dir` exists: build on
    * the base split (doc_id % [[IndexIncremental.BatchMod]] outside
    * [[LateResidues]]), then fold the late batches through a REAL
    * Structured Streaming pipeline — each residue lands as one file in
    * a landing directory, a file-source stream admits one file per
    * micro-batch, and `foreachBatch` calls [[append]] — the deployment
    * shape of continuous curation: documents stream in, the state
    * folds them as they land, and every manifest read reflects
    * everything landed so far. Memoized per dataset.
    */
  def ensureBuilt(spark: SparkSession, dir: String): String = built.synchronized {
    built.getOrElseUpdate(dir, {
      val wh = graft.util.Scratch.dir("curation-state")
      val docs = Tables.t(spark, dir, "documents")
      val emb = Tables.t(spark, dir, "embeddings")
      val m = IndexIncremental.BatchMod
      val isLate = LateResidues.map(r => col("doc_id") % m === r).reduce(_ || _)
      val isLateVec = LateResidues.map(r => col("vec_id") % m === r).reduce(_ || _)
      build(spark, wh, docs.filter(!isLate), emb.filter(!isLateVec))
      val landing = graft.util.Scratch.dir("curation-landing")
      LateResidues.foreach { r =>
        docs.filter(col("doc_id") % m === r)
          .coalesce(1).write.mode("append").parquet(landing)
      }
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(landing)
        .writeStream
        .option("checkpointLocation", graft.util.Scratch.dir("curation-ckpt"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          val batch = b.localCheckpoint(true)
          append(spark, wh, batch,
            emb.join(batch.select(col("doc_id").as("vec_id")),
              Seq("vec_id"), "left_semi"))
        }
        .start().awaitTermination()
      wh
    })
  }

  /** The driver-gated query: manifest from the incrementally
    * maintained state; the oracle is `corpus_final`'s full-recompute
    * SQL, so a hash match proves incremental ≡ from-scratch
    * cross-engine on real data.
    */
  def corpusIncremental(spark: SparkSession, dir: String): DataFrame =
    manifest(spark, ensureBuilt(spark, dir))

  /** The temperature-mixture manifest from the SAME persisted state —
    * one verdict store serves every mixture policy; only the
    * K-row threshold derivation differs.
    */
  def corpusIncrementalTemperature(spark: SparkSession, dir: String): DataFrame =
    manifest(spark, ensureBuilt(spark, dir), temperature = true)

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("corpus_incremental", corpusIncremental _,
      Some(Pipeline.corpusFinalOracleFor(temperature = false)),
      "corpus_final's manifest from INCREMENTALLY maintained curation state: build on a 90% base, fold the batch re-evaluating only dirty docs, oracle = full recompute"),
    GraftQuery("corpus_incremental_temperature", corpusIncrementalTemperature _,
      Some(Pipeline.corpusFinalOracleFor(temperature = true)),
      "temperature-mixture manifest read from the same incremental state (one verdict store, every mixture policy)"))
}
