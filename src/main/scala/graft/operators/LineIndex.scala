package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.table.IceliteTable

/** The corpus line-level document frequencies (the df table behind
  * [[Dedup.lineDedup]]'s boilerplate gate) as a PERSISTED icelite
  * table — the same build-once-at-ingest / maintain-incrementally
  * lifecycle as [[ShingleIndex]], [[ClusterIndex]], [[LmIndex]],
  * [[PhashIndex]] and [[SketchIndex]] (sixth table): at 100 TB the
  * line-df index is an artifact documents are folded into as they
  * land, never a per-query corpus re-segmentation.
  *
  * Layout (warehouse `lidx` namespace):
  *  - `line_df(h, df)` — distinct-doc count per [[Dedup.phash60]] line
  *    hash (8-byte keys through every shuffle);
  *  - `line_post(doc_id, h, cnt, nc, ntk)` — per-(doc, line-hash)
  *    instance count and char/token masses, the posting side: the
  *    per-doc retention ledger and clean token mass are pure
  *    index-table joins, so NO consumer re-segments corpus text after
  *    ingest (`text_line_dedup` and `corpus_final`'s line stage read
  *    this), and the incremental curation state resolves
  *    threshold-crossing lines to their carrier docs through it.
  *
  * Incremental maintenance is an associative MERGE (matched hashes add
  * the batch's distinct-doc count, new hashes insert) plus a postings
  * append. Append ≡ rebuild holds EXACTLY under the ingest contract
  * every index in this family assumes: a document lands in exactly ONE
  * batch (doc_ids are never re-ingested), so per-batch distinct-doc
  * counts partition the corpus df and batch postings are disjoint. The
  * full df is stored (not just the over-threshold subset) so later
  * appends can push an under-threshold line over
  * [[Dedup.LineMaxDocDf]]; the threshold applies at read time.
  */
object LineIndex {

  private val Ns = "lidx"
  private val DfTable = "line_df"
  private val PostTable = "line_post"

  /** Visible for tests: how many full index BUILDS ran in this JVM. */
  private[graft] val builds = new AtomicInteger(0)

  private val warehouses = scala.collection.mutable.Map.empty[String, String]

  private val served = new graft.util.IndexMemo[DataFrame](8)(_.unpersist(false))

  /** Build the df table from a documents frame (ingest-time job): one
    * corpus segmentation scan, one hash agg over 8-byte line keys.
    */
  /** Per-(doc, line-hash) posting rows from a docs frame: instance
    * count + char/token masses (lines can repeat within a doc).
    */
  private def postings(docs: DataFrame): DataFrame =
    Dedup.lineHashStream(docs)
      .groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("cnt"), sum(col("nc")).as("nc"),
        sum(col("ntk")).as("ntk"))

  def build(spark: SparkSession, warehouse: String, docs: DataFrame): Unit = {
    builds.incrementAndGet()
    val post = postings(docs)
    val pTbl = IceliteTable.create(spark, warehouse, Ns, PostTable, post.schema)
    pTbl.append(post)
    // df derives from the WRITTEN postings (distinct per (doc, h)), not
    // a second segmentation pass
    val df = pTbl.read().groupBy(col("h")).agg(count(lit(1)).as("df"))
    IceliteTable.create(spark, warehouse, Ns, DfTable, df.schema).append(df)
  }

  /** Fold a NEW document batch into the persisted index: append its
    * postings, associative df MERGE (matched hashes add the batch
    * count, new hashes insert). After this, reads equal a full rebuild
    * over old ∪ new.
    */
  def append(spark: SparkSession, warehouse: String, newDocs: DataFrame): Unit = {
    val post = postings(newDocs).localCheckpoint(true) // feeds both writes
    IceliteTable.load(spark, warehouse, Ns, PostTable).append(post)
    val d = post.groupBy(col("h")).agg(count(lit(1)).as("df"))
    IceliteTable.load(spark, warehouse, Ns, DfTable).merge(d, Seq("h"),
      matchedUpdate = Some(lit(true)), notMatchedInsert = Some(lit(true)),
      matchedUpdateSet = Map("df" -> (col("t.df") + col("s.df"))))
  }

  /** Uncached read of the persisted df table. */
  def readDf(spark: SparkSession, warehouse: String): DataFrame =
    IceliteTable.load(spark, warehouse, Ns, DfTable).read()

  /** Uncached read of the persisted postings table. */
  private[operators] def readPost(spark: SparkSession, warehouse: String): DataFrame =
    IceliteTable.load(spark, warehouse, Ns, PostTable).read()

  /** Ensure the df table for dataset `dir` exists (first use in this
    * JVM builds it — [[graft.Bench]] runs this untimed as the ingest
    * step) and return its warehouse.
    */
  def ensureBuilt(spark: SparkSession, dir: String): String = warehouses.synchronized {
    warehouses.getOrElseUpdate(dir, {
      val wh = graft.util.Scratch.dir("line-index")
      build(spark, wh, t(spark, dir, "documents"))
      wh
    })
  }

  /** Memoized cached over-threshold boilerplate hash set per
    * (session, dataset) — what [[Dedup.lineDedup]] joins against.
    */
  def boilerplate(spark: SparkSession, dir: String): DataFrame =
    served.getOrElseUpdate(spark, dir) {
      readDf(spark, ensureBuilt(spark, dir)).cache()
    }.filter(col("df") > Dedup.LineMaxDocDf)
}
