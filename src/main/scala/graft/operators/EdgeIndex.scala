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
  * SERVING SHAPE — everything a graph query reads is a DISK-BACKED
  * bucketed table built at ingest, never a block-manager cache:
  *  - `gidx_edges_b_*` — the edge rows as a Spark BUCKETED table on
  *    `u` ([[bucketedEdges]]);
  *  - `gidx_edges_d_*` — the degree-joined (u, v, d) rows, ALSO
  *    bucketed on `u` ([[degreedEdges]]) — the per-round join input of
  *    the iterative consumers, with the degree aggregation pre-paid.
  *  Both build inside [[ensureBuilt]] (the untimed ingest step
  *  [[graft.Bench]] reports as `ingest_edge_index_sec`), and every
  *  consumer reference is a bucket-aligned parquet SCAN: earlier
  *  rounds held the degree frame in a `.cache()` built lazily by the
  *  first consumer, and under memory pressure the rebuild (or even the
  *  first build) landed inside a TIMED query — measured as the
  *  r15/r16 `graph_communities` driver-run regressions. A bucketed
  *  scan re-derives `hashpartitioning(u, buckets)` over its own output
  *  attributes at every reference, so the exchange-free property needs
  *  no cache residency at all, and the worst case under any pressure
  *  is a re-read of a small parquet file — never a shuffle, never a
  *  degree re-aggregation, never an icelite re-scan.
  *
  * Incremental maintenance is an associative MERGE: the new batch's
  * pair counts add onto matched edges, unmatched insert. Append ≡
  * rebuild holds EXACTLY under the ingest contract the family assumes,
  * instantiated for graphs: an ORDER lands in exactly one batch (all
  * its lineitems together, order keys never re-ingested), so per-batch
  * pair counts partition the total co-purchase weight. The serving
  * tables are keyed on the edge table's head commit seq, so an
  * in-session merge forces a serving rebuild instead of silently
  * reading stale buckets.
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

  /** The icelite edge table for dataset `dir` (first use in this JVM
    * builds it) — the durable store the serving tables derive from.
    */
  private def ensureTable(spark: SparkSession, dir: String): String =
    warehouses.synchronized {
      warehouses.getOrElseUpdate(dir, {
        val wh = graft.util.Scratch.dir("edge-index")
        build(spark, wh, t(spark, dir, "lineitem"))
        wh
      })
    }

  /** Ensure the edge table AND its bucketed serving tables for dataset
    * `dir` exist ([[graft.Bench]] runs this untimed as the ingest
    * step) and return the icelite warehouse. After this returns, no
    * graph query ever pays an index or serving build inside its own
    * timed run — the property the r16 driver-bench regression traced
    * back to lazily-built serving state.
    */
  def ensureBuilt(spark: SparkSession, dir: String): String = {
    val wh = ensureTable(spark, dir)
    serve(spark, dir)
    wh
  }

  /** Memoized cached (u, v, w) edge frame per (session, dataset,
    * head seq) — the single-reference consumers' read (e.g. the
    * basket-pair report), off the bucketed serving scan. Seq-keyed
    * like [[serve]], so an in-session incremental merge can never
    * serve a stale pre-merge frame (whose underlying serving table
    * serve() would by then have dropped).
    */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    val (bName, _, _, _) = serve(spark, dir)
    served.getOrElseUpdate(spark, s"$dir@$bName") {
      spark.table(bName).cache()
    }
  }

  /** Upper bound on the LIVE directed edge count from TABLE METADATA
    * alone (zero IO, zero jobs): the sum of per-snapshot record counts
    * over the retained log. Exact after a pure build; an upper bound
    * once merges update-in-place (each update re-writes the row and
    * its delete masks the old image) — which is the safe direction
    * for a broadcast size gate.
    */
  def directedEdgeCountBound(spark: SparkSession, dir: String): Long =
    IceliteTable.load(spark, ensureTable(spark, dir), Ns, EdgeTable)
      .meta.snapshots.map(_.recordCount).sum

  /** Head commit seq of the persisted edge table — the freshness token
    * the bucketed serving snapshot is keyed on.
    */
  private def edgeTableSeq(spark: SparkSession, dir: String): Long =
    IceliteTable.load(spark, ensureTable(spark, dir), Ns, EdgeTable).meta.lastSeq

  /** Buckets for [[bucketedEdges]] — matched to the session's shuffle
    * width locally; a cluster deployment sizes it to its parallelism
    * once at ingest, like any bucketed fact table.
    */
  val EdgeBuckets = 32

  /** Support floor baked into the third serving table — DEFINED from
    * [[Graph.LinkMinSupport]] (the wedge consumers' evidence floor),
    * so a threshold change re-points the serving table instead of
    * silently orphaning it.
    */
  private def ServingMinSupport: Long = Graph.LinkMinSupport.toLong

  private val bucketServed =
    new graft.util.IndexMemo[(String, String, String, String)](8)(_ => ())

  /** Build-if-missing the two bucketed serving tables for the CURRENT
    * head seq of the edge table and return their metastore names
    * (edges, degree-joined). Keyed on the head seq, so an in-session
    * incremental append (merge) advances the seq and forces a rebuild
    * instead of silently serving the stale bucket snapshot.
    */
  private def serve(spark: SparkSession, dir: String): (String, String, String, String) = {
    val seq = edgeTableSeq(spark, dir)
    bucketServed.getOrElseUpdate(spark, s"$dir@s$seq") {
      // collision-proof name: a full-path digest, not String.hashCode
      // (32-bit hashCode collisions across dataset dirs — or a
      // metastore outliving the scratch path — would silently serve
      // another dataset's edges to every graph query)
      val tok = pathToken(dir)
      val bName = s"gidx_edges_b_${tok}_s$seq"
      val dName = s"gidx_edges_d_${tok}_s$seq"
      val sName = s"gidx_edges_s_${tok}_s$seq"
      val oName = s"gidx_edges_o_${tok}_s$seq"
      // drop serving snapshots of OLDER seqs of the same dataset (the
      // metastore entry outlives the memo across sessions)
      spark.catalog.listTables().collect()
        .map(_.name)
        .filter(n => (n.startsWith(s"gidx_edges_b_${tok}_s") ||
          n.startsWith(s"gidx_edges_d_${tok}_s") ||
          n.startsWith(s"gidx_edges_s_${tok}_s") ||
          n.startsWith(s"gidx_edges_o_${tok}_s")) &&
          n != bName && n != dName && n != sName && n != oName)
        .foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
      if (!spark.catalog.tableExists(bName)) {
        readEdges(spark, ensureTable(spark, dir))
          .write.bucketBy(EdgeBuckets, "u").sortBy("u")
          .option("path", graft.util.Scratch.dir("edge-bucketed"))
          .saveAsTable(bName)
      }
      if (!spark.catalog.tableExists(dName)) {
        // degrees aggregate bucket-locally off the bucketed scan (no
        // exchange) and the degree join is bucket-aligned (no
        // exchange); the result persists bucketed on `u` so every
        // per-round consumer reference re-derives hashpartitioning(u)
        // from the SCAN — pre-paying at ingest the aggregation the
        // old cached frame recomputed whenever cache residency broke
        val e = spark.table(bName).select(col("u"), col("v"))
        val deg = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
        e.join(deg, "u")
          .write.bucketBy(EdgeBuckets, "u").sortBy("u")
          .option("path", graft.util.Scratch.dir("edge-degreed"))
          .saveAsTable(dName)
      }
      if (!spark.catalog.tableExists(sName)) {
        // the support-thresholded evidence slice is ~two orders of
        // magnitude smaller than the full edge set (repeat
        // co-purchases only) and BOTH wedge consumers read it twice
        // per query — serving it as its own bucketed table makes
        // their scans proportional to the evidence, not to |E|
        spark.table(bName).filter(col("w") >= ServingMinSupport)
          .select(col("u"), col("v"))
          .write.bucketBy(EdgeBuckets, "u").sortBy("u")
          .option("path", graft.util.Scratch.dir("edge-support"))
          .saveAsTable(sName)
      }
      if (!spark.catalog.tableExists(oName)) {
        // DEGREE-ORDERED orientation (compact-forward): each
        // undirected edge oriented lower-degree endpoint → higher
        // (ties by id). Under this total order ≺ = (deg, id) the
        // out-degree of every vertex is O(√|E|), so the triangle
        // wedge volume Σ C(outdeg, 2) is the provable MINIMUM over
        // all acyclic orientations — the id-order slice this replaces
        // paid Σ ordered-deg², severalfold more on skewed graphs.
        // `vd` carries deg(v) so wedge consumers can compare the
        // order key (vd, v) between two out-neighbors row-locally.
        // Both joins below are bucket-aligned on u (deg aggregates
        // bucket-locally; the dv join re-keys — ingest-time, linear).
        val e = spark.table(bName).select(col("u"), col("v"))
        val deg = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
        val canon = e.filter(col("u") < col("v"))
        val flip = col("dv") < col("du") ||
          (col("dv") === col("du") && col("v") < col("u"))
        canon
          .join(deg.select(col("u"), col("d").as("du")), "u")
          .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
          .select(
            when(flip, col("v")).otherwise(col("u")).as("u"),
            when(flip, col("u")).otherwise(col("v")).as("v"),
            when(flip, col("du")).otherwise(col("dv")).as("vd"))
          .write.bucketBy(EdgeBuckets, "u").sortBy("u")
          .option("path", graft.util.Scratch.dir("edge-oriented"))
          .saveAsTable(oName)
      }
      (bName, dName, sName, oName)
    }
  }

  /** Metastore-safe, collision-proof token for a dataset path: a
    * readable sanitized tail plus an md5 prefix of the FULL path.
    */
  private def pathToken(dir: String): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val tail = dir.replaceAll("[^A-Za-z0-9]+", "_").takeRight(24).stripPrefix("_")
    s"${tail}_$md5"
  }

  /** The edge table served as a Spark BUCKETED table on `u` — built at
    * ingest ([[ensureBuilt]]). Why a storage bucket and not an in-plan
    * pin: each round's join references the edge leaf inside the
    * previous round's nested plan, and any repartition/localCheckpoint
    * pin is re-aliased there and re-exchanged (measured in r14 — the
    * |E| edge list shuffled EVERY round, 72-98 MB per graph query at
    * sf0.1). A bucketed SCAN, by contrast, re-derives
    * `hashpartitioning(u, buckets)` over its own output attributes at
    * every reference, so every per-round equi-join on `u` is
    * exchange-free on the edge side no matter how deep the nesting —
    * the per-round shuffle collapses to the |V|-sized rank/label
    * vector plus the map-side-combined per-partition message vectors.
    * At 100 TB this is the difference between K·|E| and K·|V| bytes
    * on the wire per query.
    */
  def bucketedEdges(spark: SparkSession, dir: String): DataFrame =
    spark.table(serve(spark, dir)._1)

  /** Bucket-partitioned (u, v, d) serving table — the per-iteration
    * join input of the iterative consumers (PageRank, PPR, label
    * propagation), built at ingest with the degree aggregation
    * pre-paid. Each reference is a bucket-aligned parquet scan:
    * disk-backed by construction, so no memory pressure can ever turn
    * a per-round reference into a degree re-aggregation (the r16
    * driver-bench pathology this replaces — the old `.cache()`d join
    * was built inside the first timed consumer and re-derived under
    * pressure).
    */
  def degreedEdges(spark: SparkSession, dir: String): DataFrame =
    spark.table(serve(spark, dir)._2)

  /** Support-filtered slice (w ≥ minW) — the wedge-join consumers'
    * input (link prediction, neighbor Jaccard). At the baked serving
    * floor this is its OWN ingest-built bucketed table (~300× smaller
    * than the full edge set at sf0.1 — the consumers' scans are
    * proportional to the evidence, not |E|); other floors filter the
    * full serving scan (row-local, keeps hashpartitioning(u)). Either
    * way the wedge self-join runs with ZERO exchanges straight off
    * two parquet scans.
    */
  def supportEdges(spark: SparkSession, dir: String, minW: Long): DataFrame =
    if (minW == ServingMinSupport) spark.table(serve(spark, dir)._3)
    else bucketedEdges(spark, dir).filter(col("w") >= minW)
      .select(col("u"), col("v"))

  /** Degree-ordered oriented edges (u, v, vd) — triangle counting's
    * input, one row per undirected edge oriented from its lower-
    * (degree, id) endpoint, with `vd` = deg(v) so consumers can
    * compare the (vd, v) order key between out-neighbors row-locally.
    * Served as its own ingest-built table bucketed on `u`: the wedge
    * self-join on the source vertex runs with ZERO exchanges straight
    * off two parquet scans (three scan-local references per query;
    * re-reading bucketed parquet measured FASTER than the columnar
    * cache locally, and is immune to cache eviction by construction).
    */
  def orientedEdges(spark: SparkSession, dir: String): DataFrame =
    spark.table(serve(spark, dir)._4)
}
