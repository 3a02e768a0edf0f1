package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.table.IceliteTable

/** The item co-purchase graph (directed weighted edges: parts linked
  * by the orders they share) as a PERSISTED icelite table — the same
  * build-once-at-ingest / maintain-incrementally lifecycle as
  * [[ShingleIndex]], [[ClusterIndex]], [[LmIndex]], [[PhashIndex]],
  * [[SketchIndex]], [[LineIndex]] and [[WgramIndex]] (eighth table).
  * Before this index, EVERY graph query (PageRank, triangles, BFS,
  * label propagation, link prediction, basket pair mining) re-derived
  * the edge list from a lineitem self-join per query — at 100 TB that
  * is a full-fact-table self-join paid six times per analysis session
  * for an artifact that only changes when orders land.
  *
  * Layout (warehouse `gidx` namespace):
  *  - `copurchase_edges(u, v, w)` — directed pair rows, `w` = number
  *    of shared orders (multiplicity-exact: a part appearing twice in
  *    one order contributes twice, identical to the inline self-join).
  *    Both directions are stored so consumers slice without a union:
  *    unweighted neighbor lists (`select u, v`), canonical `u < v`
  *    pairs (triangles, basket mining), and support-thresholded
  *    evidence edges (`w >= k`, link prediction) are all one filter.
  *
  * Incremental maintenance is an associative MERGE: the new batch's
  * pair counts add onto matched edges, unmatched insert. Append ≡
  * rebuild holds EXACTLY under the ingest contract the family assumes,
  * instantiated for graphs: an ORDER lands in exactly one batch (all
  * its lineitems together, order keys never re-ingested), so per-batch
  * pair counts partition the total co-purchase weight.
  */
object EdgeIndex {

  private val Ns = "gidx"
  private val EdgeTable = "copurchase_edges"

  /** Visible for tests: how many full index BUILDS ran in this JVM. */
  private[graft] val builds = new AtomicInteger(0)

  private val warehouses = scala.collection.mutable.Map.empty[String, String]

  private val served = new graft.util.IndexMemo[DataFrame](8)(_.unpersist(false))

  /** Directed weighted co-purchase edges from a lineitem frame — ONE
    * order-key self-join (pair volume Σ basket², never |lineitem|²)
    * and one hash-agg on the pair key.
    */
  private def edgesOf(li: DataFrame): DataFrame = {
    val l = li.select(col("l_orderkey"), col("l_partkey"))
    l.as("a").join(l.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") =!= col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w"))
  }

  def build(spark: SparkSession, warehouse: String, li: DataFrame): Unit = {
    builds.incrementAndGet()
    val e = edgesOf(li)
    IceliteTable.create(spark, warehouse, Ns, EdgeTable, e.schema).append(e)
  }

  /** Fold a NEW order batch into the persisted graph: associative
    * weight MERGE (matched pairs add the batch weight, new pairs
    * insert). After this, reads equal a full rebuild over old ∪ new.
    */
  def append(spark: SparkSession, warehouse: String, newLi: DataFrame): Unit = {
    val d = edgesOf(newLi)
    IceliteTable.load(spark, warehouse, Ns, EdgeTable).merge(d, Seq("u", "v"),
      matchedUpdate = Some(lit(true)), notMatchedInsert = Some(lit(true)),
      matchedUpdateSet = Map("w" -> (col("t.w") + col("s.w"))))
  }

  /** Uncached read of the persisted edge table. */
  def readEdges(spark: SparkSession, warehouse: String): DataFrame =
    IceliteTable.load(spark, warehouse, Ns, EdgeTable).read()

  /** Ensure the edge table for dataset `dir` exists (first use in this
    * JVM builds it — [[graft.Bench]] runs this untimed as the ingest
    * step) and return its warehouse.
    */
  def ensureBuilt(spark: SparkSession, dir: String): String = warehouses.synchronized {
    warehouses.getOrElseUpdate(dir, {
      val wh = graft.util.Scratch.dir("edge-index")
      build(spark, wh, t(spark, dir, "lineitem"))
      wh
    })
  }

  /** Memoized cached (u, v, w) edge frame per (session, dataset) —
    * what every graph consumer reads instead of re-joining lineitem.
    */
  def edges(spark: SparkSession, dir: String): DataFrame =
    served.getOrElseUpdate(spark, dir) {
      readEdges(spark, ensureBuilt(spark, dir)).cache()
    }
}
