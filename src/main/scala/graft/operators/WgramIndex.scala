package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.table.IceliteTable

/** The substring W-gram inverted index as a PERSISTED icelite table
  * pair — the seventh build-once-at-ingest / maintain-incrementally
  * lifecycle (shingle/cluster/LM/pHash/sketch/line): the substring-run
  * GATE (who shares a verbatim ≥ W-token span with an earlier doc) is
  * position-free, so it needs only distinct (doc, gram-hash) postings
  * plus per-gram metadata, and serving both from tables means the gate
  * never re-n-grams corpus text after ingest. (The run-SIZING query
  * `dedup_substring` stays inline — runs are positional, and positions
  * ride only that query's exchange.)
  *
  * Layout (warehouse `widx` namespace):
  *  - `wgram_post(doc_id, hs)` — distinct [[Dedup.phash60]] W-gram
  *    postings (8-byte keys);
  *  - `wgram_df(hs, df, min_doc)` — document frequency and FIRST
  *    carrier per gram. The flag read is then pure per-doc logic:
  *    flagged iff ∃ gram with df ≤ [[Dedup.MaxShingleDf]] and
  *    min_doc < doc_id — no pair join exists on this path at any
  *    scale.
  *
  * Incremental maintenance: postings append + associative metadata
  * MERGE (df adds, min_doc takes the least). Append ≡ rebuild holds
  * exactly under the one-batch-per-doc ingest contract; the full df is
  * stored so later appends can push a gram over the cap, and the cap
  * applies at read.
  */
object WgramIndex {

  private val Ns = "widx"
  private val PostTable = "wgram_post"
  private val MetaTable = "wgram_df"

  /** Visible for tests: how many full index BUILDS ran in this JVM. */
  private[graft] val builds = new AtomicInteger(0)

  private val warehouses = scala.collection.mutable.Map.empty[String, String]

  /** Distinct W-gram postings of a docs frame. */
  private def postings(docs: DataFrame): DataFrame =
    Dedup.wordNgramStream(docs, Dedup.SubstringWidth)
      .select(col("doc_id"), Dedup.phash60(col("s")).as("hs"))
      .dropDuplicates("doc_id", "hs")

  /** Build both tables from a documents frame (ingest-time job): one
    * corpus n-gram scan; metadata derives from the WRITTEN postings.
    */
  def build(spark: SparkSession, warehouse: String, docs: DataFrame): Unit = {
    builds.incrementAndGet()
    val post = postings(docs)
    val pTbl = IceliteTable.create(spark, warehouse, Ns, PostTable, post.schema)
    pTbl.append(post)
    val meta = pTbl.read().groupBy(col("hs"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("min_doc"))
    IceliteTable.create(spark, warehouse, Ns, MetaTable, meta.schema).append(meta)
  }

  /** Fold a NEW document batch in: postings append, metadata MERGE
    * (matched grams add df and take the least first-carrier, new grams
    * insert). After this, reads equal a full rebuild over old ∪ new.
    */
  def append(spark: SparkSession, warehouse: String, newDocs: DataFrame): Unit = {
    val post = postings(newDocs).localCheckpoint(true) // feeds both writes
    IceliteTable.load(spark, warehouse, Ns, PostTable).append(post)
    val delta = post.groupBy(col("hs"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("min_doc"))
    IceliteTable.load(spark, warehouse, Ns, MetaTable).merge(delta, Seq("hs"),
      matchedUpdate = Some(lit(true)), notMatchedInsert = Some(lit(true)),
      matchedUpdateSet = Map(
        "df" -> (col("t.df") + col("s.df")),
        "min_doc" -> least(col("t.min_doc"), col("s.min_doc"))))
  }

  /** Uncached postings read `(doc_id, hs)`. */
  private[operators] def readPost(spark: SparkSession, warehouse: String): DataFrame =
    IceliteTable.load(spark, warehouse, Ns, PostTable).read()

  /** Uncached metadata read `(hs, df, min_doc)`. */
  private[operators] def readMeta(spark: SparkSession, warehouse: String): DataFrame =
    IceliteTable.load(spark, warehouse, Ns, MetaTable).read()

  /** The substring-run flag set over an explicit warehouse: docs with
    * ≥ 1 capped gram whose first carrier precedes them.
    */
  private[operators] def flaggedDocs(spark: SparkSession, warehouse: String): DataFrame =
    readPost(spark, warehouse)
      .join(readMeta(spark, warehouse), Seq("hs"))
      .filter(col("df") <= Dedup.MaxShingleDf && col("min_doc") < col("doc_id"))
      .select(col("doc_id")).distinct()

  /** Ensure the index for dataset `dir` exists (first use in this JVM
    * builds it — [[graft.Bench]] runs this untimed as the ingest step)
    * and return its warehouse.
    */
  def ensureBuilt(spark: SparkSession, dir: String): String = warehouses.synchronized {
    warehouses.getOrElseUpdate(dir, {
      val wh = graft.util.Scratch.dir("wgram-index")
      build(spark, wh, t(spark, dir, "documents"))
      wh
    })
  }
}
