package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables.t

/** Multimodal-column plumbing (driver-mandated EXT surface): treat
  * media payloads as opaque `binary` columns with typed metadata, and
  * run decode / feature-extraction as an executor-side BATCH operation
  * over partitions — the exact shape a real image/audio pipeline needs
  * at 100 TB (payload bytes never visit the driver; per-partition
  * batches amortize decoder setup; metadata stays columnar for
  * pruning).
  *
  * The decode step itself is a STUB by design (no media libraries ship
  * in this environment, and none may be added): [[StubDecoder]] derives
  * deterministic "dimensions" from an md5 of the payload. Swapping it
  * for a real JNI/FFmpeg/ImageIO decoder changes ONE function — the
  * partition batching, binary schema, typed output and oracle plumbing
  * around it are real and tested.
  */
object Multimodal {

  /** Decoded media metadata (what a real decoder would surface). */
  case class MediaMeta(
      doc_id: Long, byte_len: Long, format: String,
      width: Int, height: Int, n_frames: Int)

  /** Deterministic stand-in for a media decoder: dimensions derived
    * from the payload's md5 (so the DuckDB oracle can replicate them
    * arithmetically). A production build replaces `decode` with the
    * real library call — signature and batch shape stay identical.
    */
  /** Frame-count modulus: n_frames ∈ [1, FrameMod]. ONE definition,
    * interpolated into both oracles and used by both decoder paths.
    */
  val FrameMod = 240

  object StubDecoder {
    /** First 32 bits of the payload md5 as an unsigned value — the
      * seed every derived "decoded" quantity is computed from.
      */
    def hash32(payload: Array[Byte]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(payload).take(4).map(b => f"$b%02x").mkString, 16)
    }

    /** Frame count of a payload's "video" — shared by [[decode]],
      * [[sampleFrames]], and (via [[FrameMod]]) the oracles.
      */
    def nFrames(h: Long): Int = (1 + h % FrameMod).toInt

    def decode(payload: Array[Byte], format: String): (Int, Int, Int) = {
      val h = hash32(payload)
      val width = (160 + h % 1760).toInt
      val height = (120 + (h / 1760) % 960).toInt
      (width, height, nFrames(h))
    }

    /** Frame iterator at a fixed sampling stride — the shape a real
      * video decoder exposes (imperative per-frame yield; a frame's
      * "brightness" stands in for any per-frame feature). Lazy: a real
      * decoder seeks keyframes instead of decoding everything.
      */
    def sampleFrames(payload: Array[Byte], stride: Int): Iterator[(Int, Int)] = {
      val h = hash32(payload)
      Iterator.range(0, nFrames(h), stride)
        .map(idx => (idx, ((h * (idx + 7)) % 256).toInt))
    }
  }

  /** Documents as a multimodal table: payload = utf-8 bytes of `text`
    * standing in for media bytes, `source` as the container format tag.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source").as("format"))

  /** Single-byte payload guard for the BYTE-oriented stub pipelines
    * (audio PCM frames, pHash windows): the engine walks payload
    * BYTES while the DuckDB oracle indexes text by CHARACTER, and the
    * two only coincide when every character is one byte. Enforced as
    * an explicit filter on BOTH sides (`octet_length(encode(text)) =
    * len(text)` in the oracle) rather than assumed of the fixtures —
    * a non-ASCII document is simply outside these stubs' domain, the
    * way a real pipeline routes non-PCM payloads away from a PCM
    * analyzer.
    */
  private def singleByteDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(length(encode(col("text"), "UTF-8")) === length(col("text")))

  /** Oracle-side rendering of the [[singleByteDocs]] guard. */
  private val singleByteSql = "octet_length(encode(text)) = len(text)"

  /** Executor-side batch decode: one decoder instantiation per
    * partition, streaming over the partition's rows — never a
    * per-row UDF re-setup, never a driver collect.
    */
  def decodeMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"), col("format"))
      .mapPartitions { rows =>
        // per-partition decoder setup happens here (real decoders are
        // expensive to construct; the stub needs none)
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val format = r.getString(2)
          val (w, h, f) = StubDecoder.decode(payload, format)
          MediaMeta(id, payload.length.toLong, format, w, h, f)
        }
      }
  }

  /** Oracle-gated query: per-format size/dimension statistics over the
    * decoded metadata. Exercises binary encode → partition-batched
    * decode → typed Dataset → relational agg end to end.
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(spark, dir).toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("byte_len")).as("total_bytes"),
        max(col("width")).as("max_width"),
        min(col("height")).as("min_height"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy("format")

  private val mediaStatsOracle =
    s"""WITH meta AS (
      |  SELECT doc_id, source AS format,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |    CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS h
      |  FROM documents)
      |SELECT format, count(*) AS n_docs,
      |  CAST(sum(byte_len) AS BIGINT) AS total_bytes,
      |  CAST(max(160 + h % 1760) AS INTEGER) AS max_width,
      |  CAST(min(120 + (h // 1760) % 960) AS INTEGER) AS min_height,
      |  CAST(sum(1 + h % $FrameMod) AS BIGINT) AS total_frames
      |FROM meta GROUP BY format ORDER BY format""".stripMargin

  // ------------------------------------------------- frame sampling

  /** One sampled frame with its extracted feature. */
  case class FrameSample(doc_id: Long, frame_idx: Int, brightness: Int)

  /** Every [[FrameStride]]-th frame is decoded; the rest are skipped
    * (a real pipeline seeks, it does not decode 100% of a video to
    * keep 3%).
    */
  val FrameStride = 30

  /** Strided frame sampling: each payload fans out into its sampled
    * frames inside the SAME partition-batched decode pass (decoder
    * built once per partition, frames yielded lazily — the fan-out
    * never materializes per-document frame lists). The per-frame rows
    * then flow into ordinary relational ops; at 100 TB the output is
    * the (much smaller) frame-feature table a vision pipeline trains
    * on.
    */
  def frameSamples(spark: SparkSession, dir: String): DataFrame =
    framesOf(spark, dir).orderBy("doc_id", "frame_idx")

  /** Unordered sampled-frame stream (decode fan-out only) — shared by
    * [[frameSamples]] and [[sceneDetect]].
    */
  private def framesOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          StubDecoder.sampleFrames(r.getAs[Array[Byte]](1), FrameStride)
            .map { case (idx, b) => FrameSample(id, idx, b) }
        }
      }
      .toDF()
  }

  /** Brightness jump (stub per-frame feature) that counts as a scene
    * cut in [[sceneDetect]].
    */
  val SceneCutDelta = 64

  /** Video scene detection over the sampled frame stream — the
    * shot-boundary pass a video curation pipeline runs after frame
    * sampling: a cut is a jump of more than [[SceneCutDelta]] in the
    * per-frame feature between CONSECUTIVE sampled frames; scenes are
    * the runs between cuts (classic threshold shot detection, with the
    * stub brightness standing in for a real frame-difference metric).
    * Emits per video: sampled frames, scene count, longest/shortest
    * scene in frames.
    *
    * Declared as windows, not decoder-side state: lag → cut flag →
    * running-sum scene id → two nested aggregations, all partitioned
    * by doc_id, so Catalyst plans ONE doc_id exchange for the whole
    * chain. Frame volume is bounded by the sampling stride (≤
    * [[FrameMod]]/[[FrameStride]] rows per video), so the shuffle
    * moves sampled features, never payload bytes.
    */
  def sceneDetect(spark: SparkSession, dir: String): DataFrame =
    sceneDetectOn(framesOf(spark, dir))

  /** Per-video scene lengths (doc_id, scene_id, scene_frames) — the
    * shared lag → cut → running-sum → agg chain under ONE doc_id
    * exchange, feeding both [[sceneDetect]] and [[sceneDedup]].
    */
  private def sceneLengthsOn(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("prev_b", lag(col("brightness"), 1).over(w))
      .withColumn("cut",
        when(col("prev_b").isNotNull &&
          abs(col("brightness") - col("prev_b")) > SceneCutDelta, 1).otherwise(0))
      .withColumn("scene_id",
        sum(col("cut")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(count(lit(1)).as("scene_frames"))
  }

  private[operators] def sceneDetectOn(frames: DataFrame): DataFrame = {
    sceneLengthsOn(frames)
      .groupBy(col("doc_id"))
      .agg(sum(col("scene_frames")).as("n_frames"),
        count(lit(1)).as("n_scenes"),
        max(col("scene_frames")).as("longest_scene"),
        min(col("scene_frames")).as("shortest_scene"))
      .orderBy("doc_id")
  }

  /** Shared oracle CTE chain ending at `sl(doc_id, scene_id,
    * scene_frames)` — the SQL twin of [[sceneLengthsOn]].
    */
  private val sceneSlSql =
    s"""WITH meta AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS h
       |  FROM documents),
       |fr AS (
       |  SELECT doc_id, h,
       |    unnest(generate_series(0, CAST(1 + h % $FrameMod AS INTEGER) - 1, $FrameStride))
       |      AS frame_idx
       |  FROM meta),
       |b AS (
       |  SELECT doc_id, frame_idx,
       |    CAST((h * (frame_idx + 7)) % 256 AS INTEGER) AS brightness
       |  FROM fr),
       |lagged AS (
       |  SELECT *, lag(brightness) OVER
       |    (PARTITION BY doc_id ORDER BY frame_idx) AS prev_b
       |  FROM b),
       |cuts AS (
       |  SELECT *, CASE WHEN prev_b IS NOT NULL
       |      AND abs(brightness - prev_b) > $SceneCutDelta
       |    THEN 1 ELSE 0 END AS cut
       |  FROM lagged),
       |scenes AS (
       |  SELECT *, sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
       |    ROWS UNBOUNDED PRECEDING) AS scene_id
       |  FROM cuts),
       |sl AS (
       |  SELECT doc_id, scene_id, count(*) AS scene_frames
       |  FROM scenes GROUP BY 1, 2)""".stripMargin

  private val sceneDetectOracle =
    s"""$sceneSlSql
       |SELECT doc_id,
       |  CAST(sum(scene_frames) AS BIGINT) AS n_frames,
       |  count(*) AS n_scenes,
       |  CAST(max(scene_frames) AS BIGINT) AS longest_scene,
       |  CAST(min(scene_frames) AS BIGINT) AS shortest_scene
       |FROM sl GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Video near-dup by TEMPORAL STRUCTURE: two videos whose ordered
    * scene-length sequences are identical share an edit lineage even
    * when per-frame bytes differ (re-encode, resize, watermark) — the
    * cut pattern is the signature, the temporal sibling of the pHash
    * image path. Signature = md5 of the scene-ordered length sequence
    * (one hash per video, exact group-by dedup — no pair space at
    * all); survivor = min doc_id per signature group, like
    * [[Dedup.exact]]. At 100 TB the signature table is one row per
    * video and the dedup one vocabulary-sized hash-agg — candidate
    * pairs never exist.
    */
  def sceneDedup(spark: SparkSession, dir: String): DataFrame = {
    val sig = sceneLengthsOn(framesOf(spark, dir))
      .groupBy(col("doc_id"))
      .agg(md5(concat_ws("_",
        transform(array_sort(collect_list(struct(col("scene_id"), col("scene_frames")))),
          s => s.getField("scene_frames").cast("string")))).as("scene_sig"))
    val grp = sig.groupBy(col("scene_sig")).agg(min(col("doc_id")).as("survivor"))
    sig.join(grp, "scene_sig")
      .select(col("doc_id"), col("scene_sig"), col("survivor"),
        when(col("doc_id") =!= col("survivor"), 1L).otherwise(0L).as("is_dup"))
      .orderBy("doc_id")
  }

  private val sceneDedupOracle =
    s"""$sceneSlSql,
       |sig AS (
       |  SELECT doc_id,
       |    md5(string_agg(CAST(scene_frames AS VARCHAR), '_' ORDER BY scene_id))
       |      AS scene_sig
       |  FROM sl GROUP BY doc_id),
       |grp AS (SELECT scene_sig, min(doc_id) AS survivor FROM sig GROUP BY scene_sig)
       |SELECT s.doc_id, s.scene_sig, g.survivor,
       |  CAST(CASE WHEN s.doc_id <> g.survivor THEN 1 ELSE 0 END AS BIGINT) AS is_dup
       |FROM sig s JOIN grp g USING (scene_sig)
       |ORDER BY s.doc_id""".stripMargin

  private val frameSamplesOracle =
    s"""WITH meta AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS h
       |  FROM documents),
       |fr AS (
       |  SELECT doc_id, h,
       |    unnest(generate_series(0, CAST(1 + h % $FrameMod AS INTEGER) - 1, $FrameStride))
       |      AS frame_idx
       |  FROM meta)
       |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       |  CAST((h * (frame_idx + 7)) % 256 AS INTEGER) AS brightness
       |FROM fr ORDER BY doc_id, frame_idx""".stripMargin

  // --------------------------------------------- audio frame analysis

  /** Audio frame width in samples (one byte = one stub PCM sample);
    * only FULL frames are analyzed — a real pipeline pads or drops the
    * tail, and dropping is the deterministic choice both engines can
    * mirror.
    */
  val AudioFrameSamples = 64

  /** A frame whose total amplitude is below this is "silence". */
  val AudioSilenceEnergy = 2300L

  /** A sample at or above this absolute amplitude is "clipped". */
  val AudioClipAmplitude = 57

  /** One analyzed audio frame (what a real PCM decoder would emit per
    * window): total absolute amplitude and clipped-sample count.
    */
  case class AudioFrame(doc_id: Long, frame_idx: Int, energy: Long, clipped: Int)

  /** Audio-modality analysis — the third leg of the multimodal mandate
    * (image = [[phashDedup]], video = [[frameSamples]], audio = this):
    * per-payload waveform quality metrics a speech-corpus pipeline
    * gates on (silence fraction, clipping rate, mean frame energy).
    * The stub "waveform" reads each payload byte as a centered PCM
    * sample (`amplitude = byte − 64`); a real build swaps ONE loop for
    * a PCM/FFmpeg frame iterator — the partition-batched decode, the
    * per-frame fan-out and the relational agg downstream are identical.
    * Sub-frame tails are dropped (full frames only), payloads shorter
    * than one frame never reach the analyzer — both mirrored exactly
    * in the oracle.
    */
  def audioQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = singleByteDocs(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = r.getAs[Array[Byte]](1)
          Iterator.range(0, p.length / AudioFrameSamples).map { f =>
            var e = 0L; var clip = 0; var j = f * AudioFrameSamples
            val end = j + AudioFrameSamples
            while (j < end) {
              val a = math.abs((p(j) & 0xff) - 64)
              e += a
              if (a >= AudioClipAmplitude) clip += 1
              j += 1
            }
            AudioFrame(id, f, e, clip)
          }
        }
      }
    frames.toDF()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("energy")).as("total_energy"),
        (sum(col("energy")).cast("double") / count(lit(1))).as("mean_frame_energy"),
        sum(when(col("energy") < AudioSilenceEnergy, 1L).otherwise(0L)).as("silent_frames"),
        sum(col("clipped")).cast("long").as("clipped_samples"))
      .orderBy("doc_id")
  }

  private val audioQualityOracle =
    s"""WITH chars AS (
       |  SELECT doc_id, len(text) AS n, i, abs(ord(substr(text, i, 1)) - 64) AS a
       |  FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text))) AS i) u
       |  WHERE len(text) >= $AudioFrameSamples AND $singleByteSql),
       |frames AS (
       |  SELECT doc_id, (i - 1) // $AudioFrameSamples AS f,
       |    CAST(sum(a) AS BIGINT) AS energy,
       |    sum(CASE WHEN a >= $AudioClipAmplitude THEN 1 ELSE 0 END) AS clipped
       |  FROM chars WHERE (i - 1) // $AudioFrameSamples < n // $AudioFrameSamples
       |  GROUP BY doc_id, (i - 1) // $AudioFrameSamples)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
       |  CAST(sum(energy) AS BIGINT) AS total_energy,
       |  CAST(sum(energy) AS DOUBLE) / count(*) AS mean_frame_energy,
       |  CAST(sum(CASE WHEN energy < $AudioSilenceEnergy THEN 1 ELSE 0 END) AS BIGINT)
       |    AS silent_frames,
       |  CAST(sum(clipped) AS BIGINT) AS clipped_samples
       |FROM frames GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------- perceptual-hash dedup

  /** Media smaller than this many payload bytes are skipped by the
    * near-dup pass (the thumbnail guard every image pipeline applies:
    * tiny images have too few "pixels" for a stable perceptual hash —
    * here, too few informative windows, which measurably floods the
    * low-Hamming range with coincidental matches).
    */
  val PhashMinBytes = 128

  /** 64 overlapping payload windows: window i covers bytes
    * [i*stride, i*stride + width). Overlap (width > stride) makes an
    * accidental aligned match between unrelated payloads require a
    * 3× longer identical run, which is what separates genuine
    * near-dups from vocabulary coincidence on structured content.
    */
  val PhashStride = 8
  val PhashWindowBytes = 24

  /** Bands for the Hamming-LSH candidate join: the 64-bit hash splits
    * into 8 bands of 8 bits. Pigeonhole: a pair within Hamming
    * distance d < 8 has at least one band with zero differing bits,
    * so band-equality candidates are EXACT for [[PhashMaxHamming]] ≤ 7.
    */
  val PhashBands = 8

  /** Near-dup acceptance threshold (bits differing out of 64). */
  val PhashMaxHamming = 3

  /** Per-(band, value) posting cap — same skew story as the shingle
    * index's df-cap: a band value shared by more media than this is
    * corpus-wide boilerplate structure, and pairing inside it is
    * quadratic noise. A true near-dup pair (h ≤ 3) shares ≥ 5 of 8
    * bands, so it is lost only if ALL its shared bands are over-cap
    * (measured: zero variant-pair loss at both test SFs). Applied
    * identically in the oracle, so the compare stays exact.
    */
  val PhashMaxBandDf = 96

  /** Synthetic id offset for the re-encoded variant corpus. */
  val PhashVariantOffset = 1000000000L

  /** Per-media perceptual hash, stored as [[PhashBands]] band bytes. */
  case class MediaSig(media_id: Long, sig: Array[Int])

  /** The dedup input corpus: every large-enough payload plus a
    * "re-encoded copy" of it (same media, trailing 5% of bytes gone —
    * the stand-in for the same image saved at a different quality,
    * which a real pipeline must recognize as a duplicate).
    */
  private[operators] def phashCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = singleByteDocs(spark, dir)
      .filter(length(col("text")) >= PhashMinBytes)
    val originals = docs.select(
      col("doc_id").as("media_id"), encode(col("text"), "UTF-8").as("payload"))
    val variants = docs.select(
      (col("doc_id") + lit(PhashVariantOffset)).as("media_id"),
      encode(expr(
        "substring(text, 1, length(text) - CAST(length(text) / 20 AS INT))"),
        "UTF-8").as("payload"))
    originals.unionAll(variants)
  }

  /** Perceptual hash computed inside the partition-batched decode pass
    * (same shape as [[decodeMeta]]: one digest instance per partition,
    * payload bytes never leave the executor). The stub "perceives" the
    * payload through 64 overlapping byte windows — a real build swaps
    * the window loop for an 8×8 luma-mean aHash/DCT pHash over decoded
    * pixels; everything downstream (banding, candidate join, Hamming
    * verify) is decoder-agnostic.
    */
  private[operators] def decodePhash(
      spark: SparkSession, corpus: DataFrame): Dataset[MediaSig] = {
    import spark.implicits._
    corpus.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val sig = new Array[Int](PhashBands)
          var i = 0
          while (i < 64) {
            val lo = math.min(i * PhashStride, payload.length)
            val hi = math.min(lo + PhashWindowBytes, payload.length)
            md.reset()
            md.update(payload, lo, hi - lo)
            val bit = if ((md.digest()(0) & 0xff) < 128) 1 else 0
            sig(i / 8) |= bit << (i % 8)
            i += 1
          }
          MediaSig(id, sig)
        }
      }
  }

  /** Image near-dup via perceptual hash: persisted signature table
    * ([[PhashIndex]] — decode paid ONCE at ingest) → band explode →
    * df-capped band-equality candidate join (the SimHash band
    * machinery — bucketed, never all-pairs) → exact Hamming verify on
    * the 8 band bytes → pairs within [[PhashMaxHamming]]. Finds each
    * original/re-encode pair plus the corpus's planted truncation
    * near-dups. At 100 TB the candidate volume is bounded by
    * [[PhashMaxBandDf]] × corpus rows (cap × postings), the same
    * linear envelope as every shingle-index join here.
    */
  /** Memoized verified pair set per (session, dataset): the same
    * pairs feed the pair query, the cluster closure, and the survivor
    * pick, so the banded join + Hamming verify runs once per session
    * (the text-side mirror of [[Dedup.minhashLsh]]'s pair memo).
    */
  private val phashPairSets =
    new graft.util.IndexMemo[DataFrame](8)(_.unpersist(false))

  def phashDedup(spark: SparkSession, dir: String): DataFrame =
    phashPairSets.getOrElseUpdate(spark, dir)(
      phashPairsFromSigs(PhashIndex.sigs(spark, dir)).cache())
      .orderBy("x", "y")

  /** Inline-decode variant (tests prove it ≡ the persisted-index
    * path): one decode pass materialized, then the same banded join.
    */
  private[operators] def phashPairsOn(
      spark: SparkSession, corpus: DataFrame): DataFrame =
    phashPairsFromSigs(decodePhash(spark, corpus).toDF().localCheckpoint(true))

  /** Banded Hamming-LSH pair search over a materialized signature
    * frame (cached index read or checkpointed inline decode — band
    * explode, df-cap and both Hamming-verify sides all re-consume it,
    * so the caller must hand in a frame that is cheap to re-evaluate).
    */
  private[operators] def phashPairsFromSigs(sigs: DataFrame): DataFrame = {
    val bands = sigs.select(col("media_id"),
      posexplode(col("sig")).as(Seq("band", "bval")))
    val keep = bands.groupBy(col("band"), col("bval"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= PhashMaxBandDf)
      .select(col("band"), col("bval"))
    val kb = bands.join(keep, Seq("band", "bval"), "left_semi")
    val cand = kb.as("a").join(kb.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("x"), col("b.media_id").as("y"))
      .distinct()
    val hamming = aggregate(
      zip_with(col("sa.sig"), col("sb.sig"),
        (p, q) => bit_count(p.bitwiseXOR(q)).cast("int")),
      lit(0), (acc, v) => acc + v).cast("long")
    cand
      .join(sigs.as("sa"), col("x") === col("sa.media_id"))
      .join(sigs.as("sb"), col("y") === col("sb.media_id"))
      .select(col("x"), col("y"), hamming.as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
      .orderBy("x", "y")
  }

  /** Shared oracle CTE chain ending in `pairs(x, y, hamming)` (all
    * candidates, pre-threshold) — the pair query and the cluster
    * closure both build on it.
    */
  private[operators] val phashOracleCtes =
    s"""media AS (
       |  SELECT doc_id AS media_id, text AS payload
       |  FROM documents WHERE len(text) >= $PhashMinBytes AND $singleByteSql
       |  UNION ALL
       |  SELECT doc_id + $PhashVariantOffset,
       |    substr(text, 1, len(text) - len(text) // 20)
       |  FROM documents WHERE len(text) >= $PhashMinBytes AND $singleByteSql),
       |cells AS (
       |  SELECT media_id, i,
       |    CASE WHEN CAST(concat('0x', substr(md5(
       |        substr(payload, 1 + i * $PhashStride, $PhashWindowBytes)), 1, 2))
       |      AS BIGINT) < 128 THEN 1 ELSE 0 END AS bit
       |  FROM media, (SELECT unnest(generate_series(0, 63)) AS i)),
       |bands AS (
       |  SELECT media_id, i // 8 AS band,
       |    CAST(sum(bit * (1 << (i % 8))) AS INTEGER) AS bval
       |  FROM cells GROUP BY 1, 2),
       |keep AS (
       |  SELECT band, bval FROM bands
       |  GROUP BY band, bval HAVING count(*) <= $PhashMaxBandDf),
       |kb AS (SELECT b.* FROM bands b JOIN keep USING (band, bval)),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS x, b.media_id AS y
       |  FROM kb a JOIN kb b
       |    ON a.band = b.band AND a.bval = b.bval AND a.media_id < b.media_id),
       |sigs AS (
       |  SELECT media_id, list(bval ORDER BY band) AS sig
       |  FROM bands GROUP BY media_id),
       |pairs AS (
       |  SELECT x, y,
       |    CAST(list_sum(list_transform(range(1, ${PhashBands + 1}),
       |      j -> bit_count(xor(sa.sig[j], sb.sig[j])))) AS BIGINT) AS hamming
       |  FROM cand JOIN sigs sa ON x = sa.media_id JOIN sigs sb ON y = sb.media_id)""".stripMargin

  private val phashDedupOracle =
    s"""WITH $phashOracleCtes
       |SELECT x, y, hamming FROM pairs
       |WHERE hamming <= $PhashMaxHamming ORDER BY x, y""".stripMargin

  /** Image duplicate CLUSTERS: connected components over the pHash
    * near-dup pair graph — "which payloads are the same picture"
    * groups, the multimodal mirror of [[Dedup.dupClusters]] (find →
    * cluster → keep one). Reuses the identical CC machinery (driver
    * union-find under the pair cap, distributed min-label propagation
    * above it), so the scale story is already proven there; edges come
    * from the banded candidate join, never all-pairs.
    */
  def phashClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = phashDedup(spark, dir).select(col("x"), col("y"))
      .localCheckpoint(true)
    val head = pairs.limit(Dedup.DriverCcMaxPairs + 1).collect()
    val cc =
      if (head.length <= Dedup.DriverCcMaxPairs) Dedup.driverUnionFind(spark, head)
      else Dedup.distributedCc(pairs)
    cc.withColumnRenamed("doc_id", "media_id")
      .orderBy("cluster_id", "media_id")
  }

  private val phashClustersOracle =
    s"""WITH RECURSIVE $phashOracleCtes,
       |near AS (SELECT x, y FROM pairs WHERE hamming <= $PhashMaxHamming),
       |edges AS (SELECT x, y FROM near UNION SELECT y, x FROM near),
       |reach AS (
       |  SELECT x AS id, y AS r FROM edges
       |  UNION
       |  SELECT reach.id, edges.y AS r FROM reach JOIN edges ON reach.r = edges.x),
       |comp AS (
       |  SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id),
       |csize AS (
       |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
       |SELECT c.id AS media_id, c.cluster_id, s.cluster_size,
       |  c.id = c.cluster_id AS kept
       |FROM comp c JOIN csize s USING (cluster_id)
       |ORDER BY cluster_id, media_id""".stripMargin

  /** Canonical-survivor selection over the IMAGE near-dup clusters —
    * the multimodal mirror of [[Dedup.keepBest]], under the SAME
    * survivor policy ([[Dedup.survivorRank]]: quality desc, content
    * length desc, id asc — every tiebreak total): of each pHash
    * cluster, keep the best-quality, longest payload. Quality scores
    * the decoded payload (the variant's truncated content scores as
    * what it IS, not as its source document), so a higher-quality
    * re-encode can outrank its original — exactly the curation
    * semantics a real image pipeline wants (keep the best copy, not
    * the first-seen copy).
    */
  def phashKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val clusters = phashClusters(spark, dir)
      .select(col("media_id"), col("cluster_id"), col("cluster_size"))
    val scored = phashCorpus(spark, dir).select(
      col("media_id"),
      TextAnalysis.qualityPoints(decode(col("payload"), "UTF-8")).as("quality"),
      length(col("payload")).cast("long").as("byte_len"))
    val rank = Dedup.survivorRank("byte_len", "media_id")
    clusters.join(scored, "media_id")
      .withColumn("keep", rank === 1)
      .select(col("media_id"), col("cluster_id"), col("cluster_size"),
        col("quality"), col("byte_len"), col("keep"))
      .orderBy("cluster_id", "media_id")
  }

  private val phashKeepBestOracle =
    s"""WITH RECURSIVE $phashOracleCtes,
       |near AS (SELECT x, y FROM pairs WHERE hamming <= $PhashMaxHamming),
       |edges AS (SELECT x, y FROM near UNION SELECT y, x FROM near),
       |reach AS (
       |  SELECT x AS id, y AS r FROM edges
       |  UNION
       |  SELECT reach.id, edges.y AS r FROM reach JOIN edges ON reach.r = edges.x),
       |comp AS (
       |  SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id),
       |csize AS (
       |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id),
       |scored AS (
       |  SELECT media_id,
       |    CAST(${TextAnalysis.qualityPointsSql("payload")} AS INTEGER) AS quality,
       |    CAST(octet_length(encode(payload)) AS BIGINT) AS byte_len
       |  FROM media),
       |ranked AS (
       |  SELECT c.id AS media_id, c.cluster_id, s.cluster_size,
       |    q.quality, q.byte_len,
       |    row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY q.quality DESC, q.byte_len DESC, c.id ASC) AS rn
       |  FROM comp c JOIN csize s USING (cluster_id)
       |  JOIN scored q ON q.media_id = c.id)
       |SELECT media_id, cluster_id, cluster_size, quality, byte_len,
       |  rn = 1 AS keep
       |FROM ranked ORDER BY cluster_id, media_id""".stripMargin

  // ---------------------------------------------------------- registry

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("multimodal_meta", mediaStats _, Some(mediaStatsOracle),
      "binary payload -> partition-batched decode -> typed metadata agg"),
    GraftQuery("multimodal_frames", frameSamples _, Some(frameSamplesOracle),
      "strided frame sampling: lazy per-partition decode fan-out -> frame-feature rows"),
    GraftQuery("multimodal_scenes", sceneDetect _, Some(sceneDetectOracle),
      "threshold shot detection over sampled frames: cuts -> scene runs, one doc_id exchange"),
    GraftQuery("multimodal_scene_dedup", sceneDedup _, Some(sceneDedupOracle),
      "video near-dup by temporal structure: scene-length-sequence signature, exact group dedup"),
    GraftQuery("multimodal_phash_dedup", phashDedup _, Some(phashDedupOracle),
      "perceptual-hash near-dup: decode-pass pHash -> banded Hamming-LSH candidates -> exact verify"),
    GraftQuery("multimodal_audio", audioQuality _, Some(audioQualityOracle),
      "audio quality gates: stub-PCM frame energy, silence fraction, clipping rate"),
    GraftQuery("multimodal_phash_clusters", phashClusters _, Some(phashClustersOracle),
      "image dup clusters: connected components over the pHash pair graph"),
    GraftQuery("multimodal_keep_best", phashKeepBest _, Some(phashKeepBestOracle),
      "image survivor selection: shared keep-best policy over pHash clusters"))
}
