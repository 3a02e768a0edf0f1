package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables.t

/** Spherical k-means (Lloyd's algorithm under cosine similarity) over
  * the embeddings table — the clustering pass a training-data pipeline
  * uses for semantic bucketing: cluster-balanced mixture sampling,
  * semantic dedup blocking, and topic discovery.
  *
  * Cosine is scale-invariant, so centroid component SUMS stand in for
  * means (the [[Similarity]] IVF trick) and every score is an exact
  * decimal accumulation followed by one IEEE division — bit-identical
  * to the DuckDB oracle, which unrolls the same fixed iterations as a
  * CTE chain. Seeding is deterministic: the first [[K]] vectors by
  * vec_id are the initial centroids, so both engines converge through
  * identical states.
  *
  * Scale: each Lloyd round is ONE broadcast of the K×dims centroid
  * table against a linear scan of the exploded corpus (shuffle =
  * vectors × K partial dot products reduced map-side) plus a
  * vectors-sized argmax window. No pairwise joins anywhere; rounds are
  * fixed, so the whole plan is static — at 1000 executors this is the
  * textbook distributed Lloyd sweep.
  */
object Clustering {

  /** Cluster count of the REGISTERED query (seeded from vec_id 0..K-1);
    * the oracle CTE chain is generated from the same constant.
    */
  val K = 8

  /** Assignment passes of the registered query (assign → update →
    * assign = 2 Lloyd rounds); the oracle unrolls the same count.
    */
  val Iters = 2

  /** Per-SHARD centroid budget for sharded training. A corpus-scaled
    * k (e.g. [[Dedup.semK]]'s k ∝ n) makes global Lloyd work ∝ n²
    * (every vector scores against every centroid); hash-sharding the
    * corpus by `vec_id % shardMod` with ≤ this many centroids per
    * shard caps per-vector work at a CONSTANT — total training cost
    * goes linear in n, the SemDeDup-at-scale shape. `shardModFor`
    * derives the modulus from k, so k ≤ 64 (the report K, small-SF
    * semantic points) keeps ONE shard and is bit-identical to the
    * unsharded chain.
    */
  val ShardK = 64

  /** Shard modulus for a k-means parameter point: 1 (global Lloyd,
    * unchanged semantics) while k fits one shard's budget, else the
    * smallest modulus that bounds per-shard centroids at [[ShardK]].
    * Seeds are `vec_id < k` with shard `cid % shardMod`, so with
    * dense vec_ids every shard holds ~k/shardMod seeds and cluster
    * membership never crosses shards (assignment is shard-restricted
    * and the update step preserves cids). The oracle computes the
    * same modulus in SQL.
    */
  def shardModFor(k: Int): Int = math.max(1, math.ceil(k.toDouble / ShardK).toInt)

  private val Dec = "decimal(38,20)"

  /** The registered cluster report: assignments come from the
    * PERSISTED ingest-time index ([[ClusterIndex.assignments]]) — the
    * per-query cost is the report join, never a Lloyd re-run over the
    * corpus (the difference between an index read and a clustering job
    * per invocation at 100 TB).
    */
  def kmeansClusters(spark: SparkSession, dir: String): DataFrame =
    report(ClusterIndex.assignments(spark, dir, K, Iters),
      t(spark, dir, "embeddings").select("vec_id", "label"))

  /** Parameterized spherical k-means, clustering + report INLINE (the
    * unit specs drive at arbitrary (k, iters)). Each Lloyd round ends
    * in an EAGER `localCheckpoint` of the (tiny, k×dims) centroid
    * tables, so plan depth is CONSTANT in `iters` — without it the
    * lineage grows a full assign+update layer per round and the
    * optimizer re-plans the whole unrolled chain, which is what kills
    * iterative jobs at realistic round counts. Checkpointing
    * materializes only the centroids, never the corpus.
    */
  def kmeans(spark: SparkSession, dir: String, k: Int, iters: Int): DataFrame = {
    val (e, a) = assignmentsWithBase(spark, dir, k, iters)
    report(a, e.select("vec_id", "label"))
  }

  /** Per-cluster member count + majority label over an assignment
    * frame: one groupBy and a k-sized window — report cost, not
    * clustering cost.
    */
  private def report(a: DataFrame, labels: DataFrame): DataFrame = {
    val byLab = a.join(labels, "vec_id")
      .groupBy(col("cid"), col("label")).agg(count(lit(1)).as("n"))
    val wl = Window.partitionBy(col("cid")).orderBy(desc("n"), asc("label"))
    val maj = byLab.withColumn("rn", row_number().over(wl)).filter(col("rn") === 1)
    byLab.groupBy("cid").agg(sum("n").as("n_members"))
      .join(maj.select(col("cid"), col("label").as("majority_label"),
        col("n").as("majority_n")), "cid")
      .select(col("cid").as("cluster_id"), col("n_members"),
        col("majority_label"), col("majority_n"))
      .orderBy("cluster_id")
  }

  /** Final-round cluster assignment (vec_id, cid) — the blocking key
    * other operators compose with (e.g. [[Dedup.semanticDedup]]).
    */
  def assignments(spark: SparkSession, dir: String, k: Int, iters: Int): DataFrame =
    assignmentsWithBase(spark, dir, k, iters)._2

  /** (vec_id, label, nsq, i, val) element explode of a norm-carrying
    * embeddings frame — the relational shape every pass here runs on.
    */
  private def elemsOf(e: DataFrame): DataFrame = e
    .select(col("vec_id"), col("label"), col("nsq"),
      posexplode(col("embedding")).as(Seq("i0", "v")))
    .select(col("vec_id"), col("label"), col("nsq"),
      (col("i0") + 1).as("i"), col("v").cast("double").as("val"))

  /** Size gate for the matrix-argmax fast path: the centroid table
    * collects to the driver and bakes into a [[graft.functions.CentroidArgMax]]
    * projection only while k×dims stays bounded (4M doubles ≈ 32 MB —
    * comfortably broadcastable); past it, assignment falls back to the
    * relational explode+join+aggregate, which never materializes the
    * matrix anywhere. The sf1 scale probe motivated the fast path: the
    * n×k×dims exact-decimal aggregation dominated the cluster-index
    * ingest (741 s at 10× data), while the same math as k per-row dot
    * products costs no shuffle at all.
    */
  val MatrixMaxValues: Long = 4L << 20

  /** Assignment under EXPLICIT centroids, via the gated matrix fast
    * path when it fits ([[CentroidArgMax]] — bit-exact with the
    * relational pipeline by construction, see its doc) or the
    * relational path otherwise. `e` is the norm-carrying embeddings
    * frame; `dims` its embedding width.
    */
  private def assignGated(
      e: DataFrame, c: DataFrame, cn: DataFrame, dims: Int,
      shardMod: Int = 1): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val cnRows = cn.collect() // k rows — tiny at any scale
    val k = cnRows.length
    if (k.toLong * dims > MatrixMaxValues || k == 0)
      return assignUnder(elemsOf(e), c, cn, shardMod)
    val cids = cnRows.map(_.getLong(0)).sorted
    val idx = cids.zipWithIndex.toMap
    val cnorms = new Array[Double](k)
    cnRows.foreach(r => cnorms(idx(r.getLong(0))) = r.getDouble(1))
    val matrix = Array.fill(k)(new Array[Double](dims))
    c.collect().foreach { r => // (cid, i, cval), i is 1-based
      val i = r.getInt(1) - 1
      if (i >= 0 && i < dims) matrix(idx(r.getLong(0)))(i) = r.getDouble(2)
    }
    val expr = graft.functions.CentroidArgMax(
      ColumnBridge.expression(col("embedding")),
      ColumnBridge.expression(col("nsq")),
      cids, matrix, cnorms,
      vecId = if (shardMod > 1) Some(ColumnBridge.expression(col("vec_id"))) else None,
      shardMod = shardMod)
    e.select(col("vec_id"), ColumnBridge.column(expr).as("cid"))
  }

  /** Assignment of exploded elements under EXPLICIT centroids (cid, i,
    * cval) + norms (cid, c_nsq): exact-decimal dot, one division,
    * argmax by (cos desc, cid asc). Shared by the Lloyd loop and the
    * incremental batch path ([[assignBatch]]) so both are bit-identical
    * by construction.
    */
  private def assignUnder(
      elems: DataFrame, c: DataFrame, cn: DataFrame, shardMod: Int = 1): DataFrame = {
    // sharded mode: vectors score ONLY same-shard centroids — the join
    // key carries the shard, so per-vector candidate count is the
    // shard's centroid budget, never the global k
    val (ev, cc, keys) =
      if (shardMod <= 1) (elems, c, Seq("i"))
      else (elems.withColumn("_shard", pmod(col("vec_id"), lit(shardMod.toLong))),
        c.withColumn("_shard", pmod(col("cid"), lit(shardMod.toLong))),
        Seq("i", "_shard"))
    val cos = ev.join(broadcast(cc), keys)
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum((col("val") * col("cval")).cast(Dec)).cast("double").as("cdot"),
        first(col("nsq")).as("nsq"))
      .join(broadcast(cn), "cid")
      .select(col("vec_id"), col("cid"),
        (col("cdot") / (sqrt(col("nsq")) * sqrt(col("c_nsq")))).as("cos"))
    // argmax as ONE struct-max aggregation (cos desc, min-cid tie-break
    // via negation) instead of a row_number window: the n×k cosine
    // stream map-side-combines to one row per vector per partition and
    // never sorts — the sf1 probe showed this window (×k centroids ×
    // Lloyd rounds) dominating the cluster-index ingest. Identical
    // result: max over (cos, -cid) IS the (cos desc, cid asc) pick.
    cos.groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("cid")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m").getField("nc")).as("cid"))
  }

  private def normsOf(c: DataFrame): DataFrame =
    c.groupBy(col("cid"))
      .agg(sum((col("cval") * col("cval")).cast(Dec)).cast("double").as("c_nsq"))

  /** Final assignments AND the centroids they were computed under,
    * from ONE chain — what [[ClusterIndex]] materializes per
    * parameter point (persisting them together guarantees the pair is
    * consistent without relying on two deterministic replays).
    */
  def assignmentsAndCentroids(
      spark: SparkSession, dir: String, k: Int, iters: Int,
      shardMod: Int = 1): (DataFrame, DataFrame) = {
    val (_, a, c) = chain(spark, dir, k, iters, shardMod)
    (a, c)
  }

  /** Assign a NEW vector batch (vec_id, label, embedding) under FROZEN
    * centroids — the incremental index-maintenance path: embeddings
    * landing after ingest get cluster assignments from one broadcast
    * of the k×dims centroid table against a linear batch scan; nobody
    * re-clusters the corpus. (Centroids are refreshed by periodically
    * re-running the build, the standard ANN/SemDeDup maintenance
    * cadence.)
    */
  def assignBatch(batch: DataFrame, centroids: DataFrame, shardMod: Int = 1): DataFrame = {
    val e = batch.select(col("vec_id"), col("label"), col("embedding"),
      Dedup.decimalNormSq(col("embedding")).as("nsq"))
    assignGated(e, centroids, normsOf(centroids), dimsOf(e), shardMod)
  }

  /** Embedding width of a frame (one limit-1 job; 0 for an empty
    * frame, which routes the gate to the relational no-op path).
    */
  private def dimsOf(e: DataFrame): Int =
    e.select(col("embedding")).head(1) match {
      case Array(r) => r.getSeq[Float](0).length
      case _ => 0
    }

  private def assignmentsWithBase(
      spark: SparkSession, dir: String, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val (e, a, _) = chain(spark, dir, k, iters)
    (e, a)
  }

  /** [[assignmentsAndCentroids]] over an EXPLICIT norm-carrying
    * embeddings frame — what the split-build incremental gate
    * ([[ClusterIndex.buildPoint]]) trains on a corpus subset.
    */
  private[operators] def assignmentsAndCentroidsOn(
      e: DataFrame, k: Int, iters: Int, shardMod: Int = 1): (DataFrame, DataFrame) = {
    val (_, a, c) = chainOn(e, k, iters, shardMod)
    (a, c)
  }

  /** The full Lloyd chain: returns (embeddings+norms, final
    * assignments, the centroids that final assignment used).
    */
  private def chain(
      spark: SparkSession, dir: String, k: Int, iters: Int,
      shardMod: Int = 1): (DataFrame, DataFrame, DataFrame) =
    // the SESSION-cached norm-carrying frame ([[Similarity.embWithNorms]]):
    // every assign/update job of every chain reuses one materialized
    // norm fold instead of re-reading + re-folding the parquet per job
    chainOn(Similarity.embWithNorms(spark, dir), k, iters, shardMod)

  /** `shardMod > 1` runs SHARD-LOCAL Lloyd: every assignment pass
    * restricts a vector's candidates to same-shard centroids
    * (`vec_id % shardMod == cid % shardMod`). Seeding and the update
    * step are UNCHANGED — seeds `vec_id < k` land one per shard line
    * by construction, and cluster membership never crosses shards
    * (restricted assignment + cid-preserving update), so the sharded
    * chain IS k/shardMod independent Lloyd chains computed in the
    * same jobs. Per-vector work: shard budget × dims, constant in k.
    */
  private def chainOn(
      e: DataFrame, k: Int, iters: Int,
      shardMod: Int = 1): (DataFrame, DataFrame, DataFrame) = {
    require(k > 0 && iters > 0, s"need k > 0 and iters > 0 (got k=$k, iters=$iters)")
    val elems = elemsOf(e)
    val dims = dimsOf(e)

    // new centroids = exact-decimal component sums of the members; the
    // norm table derives from the centroid table, so callers checkpoint
    // only `c` and compute `cn` from the (tiny) checkpointed frame
    def update(a: DataFrame): DataFrame =
      elems.join(a, "vec_id").groupBy(col("cid"), col("i"))
        .agg(sum(col("val").cast(Dec)).cast("double").as("cval"))

    var c = elems.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("i"), col("val").as("cval"))
    var cn = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("nsq").as("c_nsq"))
    var a: DataFrame = null
    for (r <- 1 to iters) {
      a = assignGated(e, c, cn, dims, shardMod)
      if (r < iters) { // the last round's centroids are never used
        c = update(a).localCheckpoint(true) // ONE materialization per round
        cn = normsOf(c) // k rows over the checkpointed frame — no second job
      }
    }
    (e, a, c)
  }

  /** The Lloyd rounds unrolled as a DuckDB CTE chain, ending at the
    * final assignment `a<iters>` (with `e`/`elems`/`norms` CTEs in
    * scope) — shared by the k-means report oracle and any oracle that
    * composes cluster assignments (e.g. semantic dedup).
    */
  private[operators] def kmeansAssignCte(k: Int, iters: Int): String =
    kmeansAssignCteK(k.toString, iters)

  /** Same CTE chain with `kSql` an arbitrary SQL expression for the
    * cluster count — the chain is generic in k (centroids are ROWS,
    * only the iterations unroll), so a data-dependent k (e.g. scaled
    * to corpus size via a scalar subquery) drops straight in.
    * `shardModSql` mirrors the engine's shard-local training: every
    * assignment round restricts candidates to same-shard centroids
    * (`vec_id % s == cid % s`); the default modulus 1 makes the
    * predicate trivially true — the unsharded chain.
    */
  private[operators] def kmeansAssignCteK(
      kSql: String, iters: Int, fromSql: String = "embeddings",
      shardModSql: String = "1"): String = {
    val base =
      s"""WITH e AS (SELECT vec_id, label, embedding FROM $fromSql),
         |smod AS (SELECT GREATEST(1, ($shardModSql)) AS s),
         |elems AS (
         |  SELECT vec_id, label, embedding[i] AS val, i FROM e,
         |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u),
         |norms AS (
         |  SELECT vec_id,
         |    CAST(sum(CAST(CAST(val AS DOUBLE) * CAST(val AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE) AS nsq
         |  FROM elems GROUP BY vec_id),
         |c0 AS (
         |  SELECT vec_id AS cid, i, CAST(val AS DOUBLE) AS cval
         |  FROM elems WHERE vec_id < ($kSql)),
         |cn0 AS (SELECT vec_id AS cid, nsq AS c_nsq FROM norms WHERE vec_id < ($kSql))""".stripMargin
    val rounds = (1 to iters).map { r =>
      val upd =
        if (r == iters) "" // the last round's centroids are never used
        else s""",
           |c$r AS (
           |  SELECT a.cid, ev.i,
           |    CAST(sum(CAST(CAST(ev.val AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE) AS cval
           |  FROM elems ev JOIN a$r a USING (vec_id) GROUP BY a.cid, ev.i),
           |cn$r AS (
           |  SELECT cid, CAST(sum(CAST(cval * cval AS DECIMAL(38,20))) AS DOUBLE) AS c_nsq
           |  FROM c$r GROUP BY cid)""".stripMargin
      s""",
         |dots$r AS (
         |  SELECT ev.vec_id, c.cid,
         |    CAST(sum(CAST(CAST(ev.val AS DOUBLE) * c.cval AS DECIMAL(38,20))) AS DOUBLE)
         |      / (sqrt(any_value(n.nsq)) * sqrt(any_value(cn.c_nsq))) AS cos
         |  FROM elems ev CROSS JOIN smod sm
         |  JOIN c${r - 1} c ON ev.i = c.i AND (ev.vec_id % sm.s) = (c.cid % sm.s)
         |  JOIN norms n ON n.vec_id = ev.vec_id
         |  JOIN cn${r - 1} cn ON cn.cid = c.cid
         |  GROUP BY ev.vec_id, c.cid),
         |a$r AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
         |    FROM dots$r) WHERE rn = 1)""".stripMargin + upd
    }.mkString
    base + rounds
  }

  /** The fixed Lloyd rounds of the registered query + cluster report. */
  private val kmeansOracle: String =
    kmeansAssignCte(K, Iters) +
      s""",
         |labeled AS (SELECT a.cid, e.label FROM a$Iters a JOIN e USING (vec_id)),
         |bylab AS (SELECT cid, label, count(*) AS n FROM labeled GROUP BY cid, label),
         |maj AS (
         |  SELECT cid, label, n,
         |    row_number() OVER (PARTITION BY cid ORDER BY n DESC, label) AS rn
         |  FROM bylab),
         |sizes AS (SELECT cid, CAST(sum(n) AS BIGINT) AS n_members FROM bylab GROUP BY cid)
         |SELECT s.cid AS cluster_id, s.n_members,
         |  m.label AS majority_label, m.n AS majority_n
         |FROM sizes s JOIN maj m ON m.cid = s.cid AND m.rn = 1
         |ORDER BY cluster_id""".stripMargin

  // ---------------------------------------------------------- registry

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("kmeans_clusters", kmeansClusters _, Some(kmeansOracle),
      "spherical k-means (2 Lloyd rounds, deterministic seeds): cluster sizes + majority labels"))
}
