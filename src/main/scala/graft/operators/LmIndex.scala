package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.table.IceliteTable

/** The corpus language-model statistics (bigram/predecessor counts
  * behind [[TextAnalysis.lmScore]]) as PERSISTED icelite tables — the
  * same build-once-at-ingest / maintain-incrementally lifecycle as
  * [[ShingleIndex]] and [[ClusterIndex]]: at 100 TB the LM counts are
  * an artifact documents are folded into as they land, never a
  * per-query corpus re-scan.
  *
  * Layout (warehouse `idx` namespace):
  *  - `lm_c1(h1, c1)` — occurrences per predecessor-word hash;
  *  - `lm_c2(h2, c2)` — occurrences per bigram hash.
  *
  * Both key on [[Dedup.phash60]] (8-byte keys through every shuffle).
  * Counts are plain sums, so incremental maintenance is an associative
  * MERGE (matched keys add, new keys insert) and append ≡ rebuild
  * EXACTLY — the property [[LmIndexSpec]] proves. The total T (the
  * uniform-backoff cost base) derives from the c1 table at read time,
  * so no separate totals row can drift from the counts.
  */
object LmIndex {

  private val Ns = "idx"
  private val C1Table = "lm_c1"
  private val C2Table = "lm_c2"

  /** Visible for tests: how many full index BUILDS ran in this JVM. */
  private[graft] val builds = new AtomicInteger(0)

  private val warehouses = scala.collection.mutable.Map.empty[String, String]

  private val served =
    new graft.util.IndexMemo[(DataFrame, DataFrame)](8)({ case (a, b) =>
      a.unpersist(false); b.unpersist(false); ()
    })

  /** Build both count tables from a documents frame (ingest-time job):
    * one corpus scan, one materialized hash stream, two count aggs.
    */
  def build(spark: SparkSession, warehouse: String, docs: DataFrame): Unit = {
    builds.incrementAndGet()
    val bg = TextAnalysis.bigramHashStream(docs).localCheckpoint(true)
    val c1 = bg.groupBy(col("h1")).agg(count(lit(1)).as("c1"))
    val c2 = bg.groupBy(col("h2")).agg(count(lit(1)).as("c2"))
    IceliteTable.create(spark, warehouse, Ns, C1Table, c1.schema).append(c1)
    IceliteTable.create(spark, warehouse, Ns, C2Table, c2.schema).append(c2)
  }

  /** Fold a NEW document batch into the persisted counts: associative
    * MERGE per table (matched hashes add the batch count, new hashes
    * insert). After this, reads equal a full rebuild over old ∪ new.
    */
  def append(spark: SparkSession, warehouse: String, newDocs: DataFrame): Unit = {
    val bg = TextAnalysis.bigramHashStream(newDocs).localCheckpoint(true)
    val d1 = bg.groupBy(col("h1")).agg(count(lit(1)).as("c1"))
    val d2 = bg.groupBy(col("h2")).agg(count(lit(1)).as("c2"))
    IceliteTable.load(spark, warehouse, Ns, C1Table).merge(d1, Seq("h1"),
      matchedUpdate = Some(lit(true)), notMatchedInsert = Some(lit(true)),
      matchedUpdateSet = Map("c1" -> (col("t.c1") + col("s.c1"))))
    IceliteTable.load(spark, warehouse, Ns, C2Table).merge(d2, Seq("h2"),
      matchedUpdate = Some(lit(true)), notMatchedInsert = Some(lit(true)),
      matchedUpdateSet = Map("c2" -> (col("t.c2") + col("s.c2"))))
  }

  /** Uncached reads of the persisted (c1, c2) tables. */
  def readCounts(spark: SparkSession, warehouse: String): (DataFrame, DataFrame) =
    (IceliteTable.load(spark, warehouse, Ns, C1Table).read(),
      IceliteTable.load(spark, warehouse, Ns, C2Table).read())

  /** Ensure the count tables for dataset `dir` exist (first use in
    * this JVM builds them — [[graft.Bench]] runs this untimed as the
    * ingest step) and return their warehouse.
    */
  def ensureBuilt(spark: SparkSession, dir: String): String = warehouses.synchronized {
    warehouses.getOrElseUpdate(dir, {
      val wh = graft.util.Scratch.dir("lm-index")
      build(spark, wh, t(spark, dir, "documents"))
      wh
    })
  }

  /** Memoized cached count tables per (session, dataset) — what
    * [[TextAnalysis.lmScore]] joins against.
    */
  def counts(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    served.getOrElseUpdate(spark, dir) {
      val (c1, c2) = readCounts(spark, ensureBuilt(spark, dir))
      (c1.cache(), c2.cache())
    }
}
