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
  def frameSamples(spark: SparkSession, dir: String): DataFrame = {
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
      .orderBy("doc_id", "frame_idx")
  }

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

  // ---------------------------------------------------------- registry

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("multimodal_meta", mediaStats _, Some(mediaStatsOracle),
      "binary payload -> partition-batched decode -> typed metadata agg"),
    GraftQuery("multimodal_frames", frameSamples _, Some(frameSamplesOracle),
      "strided frame sampling: lazy per-partition decode fan-out -> frame-feature rows"))
}
