package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.IceliteTable

/** Per-source vocabulary KMV sketches as a PERSISTED icelite artifact
  * — the fifth entry in the build-once-at-ingest index family
  * ([[ShingleIndex]] shingles, [[ClusterIndex]] embedding cells,
  * [[LmIndex]] LM counts, [[PhashIndex]] media signatures), and the
  * way mergeable sketches are actually deployed: built per segment
  * when data lands, MERGED relationally afterwards — the corpora never
  * move again, only k-long sketch rows do.
  *
  * Layout (warehouse `kidx` namespace):
  *  - `vocab_kmv(source, vals)` — one row per source, `vals` = the
  *    ≤ k smallest distinct portable hashes of the source's vocabulary
  *    (the [[graft.functions.KmvSketchAgg]] retained-minima state),
  *    ascending.
  *
  * Incremental maintenance ([[appendDocs]]) is EXACT, not
  * approximate-compatible: the KMV merge ("k smallest of the union of
  * minima") is associative and commutative over distinct hashes, so
  * folding a new batch's sketches into the stored rows with one
  * column-level MERGE (`vals = k-smallest(old ∪ new)`) equals a full
  * rebuild over old ∪ new bit for bit — [[SketchIndexSpec]] proves
  * both that and persisted ≡ inline.
  */
object SketchIndex {

  private val Ns = "kidx"
  private val Table = "vocab_kmv"

  /** Sketch size — shared with the ad-hoc KMV queries. */
  def K: Int = Relational.KmvK

  /** Visible for tests: how many full index BUILDS ran in this JVM. */
  private[graft] val builds = new AtomicInteger(0)

  // dataset dir → warehouse holding its sketch table (JVM-wide: the
  // parquet fixtures are immutable, so one build serves every session)
  private val warehouses = scala.collection.mutable.Map.empty[String, String]

  private val served = new graft.util.IndexMemo[DataFrame](8)(_.unpersist(false))

  /** One vocabulary sketch row per source over `docs` — the same
    * derivation at build, append, and (for the inline spec twin)
    * query time.
    */
  private[operators] def sketchOf(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"))
      .agg(graft.functions.KmvSketchAgg
        .kmvSketchValues(Dedup.phash(col("w")), K).as("kmv"))
      // nullable-element array: the parquet round trip reads elements
      // as nullable, and the incremental MERGE casts to the stored
      // type — a containsNull=false column would reject its own merge
      .select(col("source"), col("kmv.values").cast("array<bigint>").as("vals"))

  /** Build the sketch table from a document corpus (ingest-time job):
    * one corpus scan, ≤ k longs per source through the shuffle, one
    * keyed commit (keyed so incremental merges prune by source).
    */
  def build(spark: SparkSession, warehouse: String, docs: DataFrame): Unit = {
    builds.incrementAndGet()
    val sk = sketchOf(docs)
    IceliteTable.create(spark, warehouse, Ns, Table, sk.schema)
      .upsert(sk, Seq("source"))
  }

  /** Fold a NEW document batch into the persisted sketches: sketch
    * only the batch, then one column-level MERGE per source —
    * `vals = k-smallest(stored ∪ batch)`, new sources insert. Exactly
    * the aggregate's own merge, so reads afterwards equal a full
    * rebuild over old ∪ new.
    */
  def append(spark: SparkSession, warehouse: String, newDocs: DataFrame): Unit = {
    val sk = sketchOf(newDocs)
    IceliteTable.load(spark, warehouse, Ns, Table).merge(sk, Seq("source"),
      matchedUpdate = Some(lit(true)),
      notMatchedInsert = Some(lit(true)),
      matchedUpdateSet = Map("vals" ->
        slice(array_sort(array_union(col("t.vals"), col("s.vals"))), 1, K)))
    ()
  }

  /** Dataset-keyed incremental maintenance: fold a new batch into
    * dataset `dir`'s sketch table and drop the served memo so this
    * session sees the merged rows.
    */
  def appendDocs(spark: SparkSession, dir: String, newDocs: DataFrame): Unit = {
    append(spark, ensureBuilt(spark, dir), newDocs)
    served.invalidate(spark, dir)
  }

  /** Ensure the sketch table for dataset `dir` exists (first use in
    * this JVM scans the corpus — [[graft.Bench]] runs this untimed as
    * the ingest step) and return its warehouse.
    */
  def ensureBuilt(spark: SparkSession, dir: String): String = warehouses.synchronized {
    warehouses.getOrElseUpdate(dir, {
      val wh = graft.util.Scratch.dir("sketch-index")
      build(spark, wh, graft.Tables.t(spark, dir, "documents"))
      wh
    })
  }

  /** Uncached read of an explicit warehouse's sketch table. */
  def readSketches(spark: SparkSession, warehouse: String): DataFrame =
    IceliteTable.load(spark, warehouse, Ns, Table).read()
      .select("source", "vals")

  /** Memoized cached sketch table per (session, dataset) — what the
    * sketch-algebra query combines pairwise.
    */
  def sketches(spark: SparkSession, dir: String): DataFrame =
    served.getOrElseUpdate(spark, dir) {
      IceliteTable.load(spark, ensureBuilt(spark, dir), Ns, Table)
        .read().select("source", "vals").cache()
    }
}
