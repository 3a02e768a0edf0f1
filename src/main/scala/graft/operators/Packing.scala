package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables.t

/** Sequence packing — the step that turns a curated document corpus
  * into fixed-length training windows (GPT-style concat-and-chunk: the
  * shard's token stream is concatenated in a deterministic order and
  * sliced every [[ContextLen]] tokens, documents spanning boundaries).
  *
  * Scale notes:
  *   - Packing is a prefix sum, and a GLOBAL prefix sum over 100 TB is
  *     a single-sequence bottleneck — so the corpus is packed per
  *     SHARD (`doc_id % NumShards`): each shard's running token total
  *     is an independent window-function partition, which makes the
  *     whole operator one hash-shuffle + per-partition sort, perfectly
  *     parallel across 1000 executors. NumShards on a real cluster is
  *     O(executors), here 8 so each shard is non-trivial at sf0.01.
  *   - Window ids / offsets are pure integer arithmetic on the prefix
  *     sum — no data movement after the one shuffle, and bit-exact
  *     cross-engine (no fp anywhere).
  *   - [[packStats]] is the packing-efficiency report a pipeline
  *     tracks per run: windows produced and pad fraction per shard,
  *     from one integer aggregation of the same token counts.
  */
object Packing {

  /** Tokens per training window (small, to be non-trivial on the
    * ~40-70-token fixture docs).
    */
  val ContextLen = 128

  /** Packing shards (each packs an independent token stream). */
  val NumShards = 8

  private def tokenized(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % NumShards).as("shard"),
        size(split(col("text"), " ")).as("n_tokens"))

  /** Per-document window assignment: which training window (within
    * the document's shard) the document starts in, at what token
    * offset, and how many windows it spans.
    */
  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tokenized(spark, dir)
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).cast("long"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"cum_before DIV $ContextLen").as("window_id"),
        (col("cum_before") % ContextLen).as("win_offset"),
        (expr(s"(cum_before % $ContextLen + n_tokens - 1) DIV $ContextLen") + 1)
          .as("n_win_span"))
      .orderBy("doc_id")
  }

  private val seqPackOracle =
    s"""WITH tk AS (
       |  SELECT doc_id, doc_id % $NumShards AS shard,
       |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT *, CAST(coalesce(sum(n_tokens) OVER (
       |      PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS cum_before
       |  FROM tk)
       |SELECT doc_id, shard, n_tokens,
       |  cum_before // $ContextLen AS window_id,
       |  cum_before % $ContextLen AS win_offset,
       |  (cum_before % $ContextLen + n_tokens - 1) // $ContextLen + 1 AS n_win_span
       |FROM c ORDER BY doc_id""".stripMargin

  /** Packing-efficiency report per shard: documents, tokens, windows
    * produced, pad tokens in the final partial window, fill fraction
    * (single IEEE division of exact integers).
    */
  def packStats(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        expr(s"(total_tokens + ${ContextLen - 1}) DIV $ContextLen").as("n_windows"),
        (expr(s"(total_tokens + ${ContextLen - 1}) DIV $ContextLen") * ContextLen -
          col("total_tokens")).as("pad_tokens"),
        round(col("total_tokens").cast("double") /
          (expr(s"(total_tokens + ${ContextLen - 1}) DIV $ContextLen") * ContextLen), 12)
          .as("fill_frac"))
      .orderBy("shard")

  private val packStatsOracle =
    s"""WITH tk AS (
       |  SELECT doc_id, doc_id % $NumShards AS shard,
       |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
       |  FROM documents),
       |s AS (
       |  SELECT shard, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |  FROM tk GROUP BY 1)
       |SELECT shard, n_docs, total_tokens,
       |  (total_tokens + ${ContextLen - 1}) // $ContextLen AS n_windows,
       |  (total_tokens + ${ContextLen - 1}) // $ContextLen * $ContextLen - total_tokens
       |    AS pad_tokens,
       |  round(CAST(total_tokens AS DOUBLE) /
       |    ((total_tokens + ${ContextLen - 1}) // $ContextLen * $ContextLen), 12)
       |    AS fill_frac
       |FROM s ORDER BY shard""".stripMargin

  // ---------------------------------------------------------- registry

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("seq_pack", seqPack _, Some(seqPackOracle),
      "per-shard concat-and-chunk packing: window id / offset / span per document"),
    GraftQuery("pack_stats", packStats _, Some(packStatsOracle),
      "packing-efficiency report: windows and pad fraction per shard"))
}
