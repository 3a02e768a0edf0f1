package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** End-to-end INCREMENTAL-maintenance gate over all eight persisted
  * index lifecycles — the driver-gated proof that the `append*` paths
  * are not spec-only: the corpus is deterministically split into a
  * base (≈90%) and a late-landing batch (≈10%), every index is BUILT
  * from the base and the batch is FOLDED IN through the incremental
  * API ([[ShingleIndex.append]], [[LmIndex.append]],
  * [[LineIndex.append]], [[SketchIndex.append]], [[PhashIndex.append]],
  * [[WgramIndex.append]], [[EdgeIndex.append]],
  * [[ClusterIndex.appendPoint]]), and the query
  * reads one
  * (row-count, content-checksum) fingerprint per index over the MERGED
  * state. The DuckDB oracle recomputes each fingerprint from the FULL
  * union — for the seven append≡rebuild indexes directly, and for the
  * ANN index by replaying the Lloyd chain on the base subset and
  * assigning every vector under those frozen final-round centroids
  * (exactly the incremental contract: late vectors never retrain the
  * model). A hash match is therefore a cross-engine proof that
  * incremental maintenance converged to the rebuild/frozen-model
  * state on real data, not just on spec fixtures.
  *
  * The split builds live in their own scratch warehouses (memoized per
  * dataset, built on first use), so the shared per-dataset serving
  * indexes every other query reads are never touched.
  *
  * Scale shape: the build is the ingest cost every index already
  * accounts (one corpus scan each); the gate read is eight index-table
  * scans with single hash-agg fingerprints — ≤ 2 longs per index
  * through the final collect.
  */
object IndexIncremental {

  /** Split rule: id % [[BatchMod]] == [[BatchRem]] is the late batch. */
  val BatchMod = 10
  val BatchRem = 7

  /** Checksum modulus (prime, keeps per-row terms ≤ ~1e6 so the sums
    * stay far from BIGINT range in both engines).
    */
  val ChkMod = 1000003L

  // dataset dir → family → warehouse of its split-built index (JVM-wide
  // memo, like every index lifecycle here: the fixtures are immutable)
  private val built =
    scala.collection.mutable.Map.empty[String, Map[String, String]]

  private def ensureSplitBuilt(spark: SparkSession, dir: String): Map[String, String] =
    built.synchronized {
      built.getOrElseUpdate(dir, {
        val docs = Tables.t(spark, dir, "documents")
        val base = docs.filter(col("doc_id") % BatchMod =!= BatchRem)
        val batch = docs.filter(col("doc_id") % BatchMod === BatchRem)
        def wh(name: String)(build: String => Unit): (String, String) = {
          val w = graft.util.Scratch.dir(s"inc-$name")
          build(w)
          name -> w
        }
        val media = Multimodal.phashCorpus(spark, dir)
        val emb = Tables.t(spark, dir, "embeddings")
        Map(
          wh("shingle") { w =>
            ShingleIndex.build(spark, w, base)
            ShingleIndex.append(spark, w, batch)
          },
          wh("lm") { w =>
            LmIndex.build(spark, w, base)
            LmIndex.append(spark, w, batch)
          },
          wh("line") { w =>
            LineIndex.build(spark, w, base)
            LineIndex.append(spark, w, batch)
          },
          wh("sketch") { w =>
            SketchIndex.build(spark, w, base)
            SketchIndex.append(spark, w, batch)
          },
          wh("phash") { w =>
            PhashIndex.build(spark, w,
              media.filter(col("media_id") % BatchMod =!= BatchRem))
            PhashIndex.append(spark, w,
              media.filter(col("media_id") % BatchMod === BatchRem))
          },
          wh("wgram") { w =>
            WgramIndex.build(spark, w, base)
            WgramIndex.append(spark, w, batch)
          },
          wh("edge") { w =>
            // order-atomic split (the edge-index ingest contract: an
            // order lands whole in exactly one batch)
            val li = Tables.t(spark, dir, "lineitem")
            EdgeIndex.build(spark, w,
              li.filter(col("l_orderkey") % BatchMod =!= BatchRem))
            EdgeIndex.append(spark, w,
              li.filter(col("l_orderkey") % BatchMod === BatchRem))
          },
          wh("ann") { w =>
            ClusterIndex.buildPoint(spark, w,
              emb.filter(col("vec_id") % BatchMod =!= BatchRem),
              Clustering.K, Clustering.Iters)
            ClusterIndex.appendPoint(spark, w,
              emb.filter(col("vec_id") % BatchMod === BatchRem),
              Clustering.K, Clustering.Iters)
          })
      })
    }

  /** One (family, n, chk) fingerprint row per merged index. */
  def indexIncremental(spark: SparkSession, dir: String): DataFrame = {
    val whs = ensureSplitBuilt(spark, dir)
    val M = ChkMod
    def fp(family: String, df: DataFrame, n: org.apache.spark.sql.Column,
        chk: org.apache.spark.sql.Column): DataFrame =
      df.agg(n.cast("long").as("n"),
          coalesce(chk.cast("long"), lit(0L)).as("chk"))
        .select(lit(family).as("family"), col("n"), col("chk"))
    val shingle = ShingleIndex.readIndex(spark, whs("shingle"))
    val (_, c2) = LmIndex.readCounts(spark, whs("lm"))
    val lineDf = LineIndex.readDf(spark, whs("line"))
    val sketch = SketchIndex.readSketches(spark, whs("sketch"))
      .select(explode(col("vals")).as("v"))
    val bands = PhashIndex.readSigs(spark, whs("phash"))
      .select(col("media_id"), posexplode(col("sig")).as(Seq("band", "bval")))
    val assign = ClusterIndex.readPoint(spark, whs("ann"),
      Clustering.K, Clustering.Iters)
    val wgram = WgramIndex.readMeta(spark, whs("wgram"))
    val edges = EdgeIndex.readEdges(spark, whs("edge"))
    fp("ann", assign, count(lit(1)),
        sum((col("vec_id") % M) * (col("cid") + 1) % M))
      .unionAll(fp("edge", edges, count(lit(1)),
        sum((col("u") % M + col("v") % M + col("w")) % M)))
      .unionAll(fp("line", lineDf, count(lit(1)),
        sum((col("h") % M + col("df")) % M)))
      .unionAll(fp("lm", c2, count(lit(1)),
        sum((col("h2") % M + col("c2")) % M)))
      .unionAll(fp("phash", bands, countDistinct(col("media_id")),
        sum((col("media_id") % M + (col("band") + 1) * col("bval")) % M)))
      .unionAll(fp("shingle", shingle, count(lit(1)),
        sum((col("h") % M + col("doc_id") % M) % M)))
      .unionAll(fp("sketch", sketch, count(lit(1)), sum(col("v") % M)))
      .unionAll(fp("wgram", wgram, count(lit(1)),
        sum((col("hs") % M + col("df") + col("min_doc") % M) % M)))
      .orderBy("family")
  }

  private val indexIncrementalOracle: String = {
    val M = ChkMod
    val K = Clustering.K
    val it = Clustering.Iters
    val baseEmb =
      s"(SELECT * FROM embeddings WHERE vec_id % $BatchMod <> $BatchRem)"
    s"""${Clustering.kmeansAssignCteK(K.toString, it, baseEmb)},
       |fe AS (SELECT vec_id, embedding FROM embeddings),
       |felems AS (
       |  SELECT vec_id, embedding[i] AS val, i FROM fe,
       |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) fu),
       |fnorms AS (
       |  SELECT vec_id,
       |    CAST(sum(CAST(CAST(val AS DOUBLE) * CAST(val AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE) AS nsq
       |  FROM felems GROUP BY vec_id),
       |fdots AS (
       |  SELECT ev.vec_id, c.cid,
       |    CAST(sum(CAST(CAST(ev.val AS DOUBLE) * c.cval AS DECIMAL(38,20))) AS DOUBLE)
       |      / (sqrt(any_value(n.nsq)) * sqrt(any_value(cn.c_nsq))) AS cos
       |  FROM felems ev JOIN c${it - 1} c ON ev.i = c.i
       |  JOIN fnorms n ON n.vec_id = ev.vec_id
       |  JOIN cn${it - 1} cn ON cn.cid = c.cid
       |  GROUP BY ev.vec_id, c.cid),
       |fassign AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
       |    FROM fdots) WHERE rn = 1),
       |${Dedup.lineCleanOracleCtes},
       |ldf AS (SELECT h, count(DISTINCT doc_id) AS df FROM lhash GROUP BY h),
       |lmw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |lmbg AS (
       |  SELECT ${Dedup.phash60Sql("u.t")} AS h2
       |  FROM (
       |    SELECT doc_id, unnest([{'w1': w[i], 't': w[i] || ' ' || w[i + 1]}
       |      for i in generate_series(1, len(w) - 1)]) AS u
       |    FROM lmw WHERE len(w) >= 2) lms),
       |lmc2 AS (SELECT h2, count(*) AS c2 FROM lmbg GROUP BY h2),
       |${Multimodal.phashOracleCtes},
       |spw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sp0 AS (
       |  SELECT DISTINCT doc_id, u AS s
       |  FROM (SELECT doc_id, unnest(${Dedup.shinglesSql}) AS u FROM spw) spq),
       |spc AS (
       |  SELECT doc_id, s FROM sp0 WHERE s IN (
       |    SELECT s FROM sp0 GROUP BY s
       |    HAVING count(*) <= ${Dedup.MaxShingleDf})),
       |sph AS (
       |  SELECT doc_id, (${Dedup.phashSql("s")}) % ${Dedup.P} AS h FROM spc),
       |skw AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
       |skh AS (
       |  SELECT DISTINCT source, ${Dedup.phashSql("w")} AS h
       |  FROM skw WHERE len(w) > 0),
       |skr AS (
       |  SELECT source, h,
       |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |  FROM skh),
       |skv AS (SELECT source, h FROM skr WHERE rn <= ${SketchIndex.K}),
       |${Dedup.substringFlaggedOracleCtes},
       |wgm AS (
       |  SELECT s AS hs, count(*) AS df, min(doc_id) AS min_doc
       |  FROM sg0 GROUP BY s)
       |SELECT * FROM (
       |  SELECT 'ann' AS family, CAST(count(*) AS BIGINT) AS n,
       |    CAST(coalesce(sum((vec_id % $M) * (cid + 1) % $M), 0) AS BIGINT) AS chk
       |  FROM fassign
       |  UNION ALL
       |  SELECT 'line', CAST(count(*) AS BIGINT),
       |    CAST(coalesce(sum((h % $M + df) % $M), 0) AS BIGINT) FROM ldf
       |  UNION ALL
       |  SELECT 'lm', CAST(count(*) AS BIGINT),
       |    CAST(coalesce(sum((h2 % $M + c2) % $M), 0) AS BIGINT) FROM lmc2
       |  UNION ALL
       |  SELECT 'phash', CAST(count(DISTINCT media_id) AS BIGINT),
       |    CAST(coalesce(sum((media_id % $M + (band + 1) * bval) % $M), 0) AS BIGINT)
       |  FROM bands
       |  UNION ALL
       |  SELECT 'shingle', CAST(count(*) AS BIGINT),
       |    CAST(coalesce(sum((h % $M + doc_id % $M) % $M), 0) AS BIGINT) FROM sph
       |  UNION ALL
       |  SELECT 'sketch', CAST(count(*) AS BIGINT),
       |    CAST(coalesce(sum(h % $M), 0) AS BIGINT) FROM skv
       |  UNION ALL
       |  SELECT 'edge', CAST(count(*) AS BIGINT),
       |    CAST(coalesce(sum((u % $M + v % $M + w) % $M), 0) AS BIGINT)
       |  FROM (
       |    SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS w
       |    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
       |    WHERE a.l_partkey <> b.l_partkey GROUP BY 1, 2) fedges
       |  UNION ALL
       |  SELECT 'wgram', CAST(count(*) AS BIGINT),
       |    CAST(coalesce(sum((hs % $M + df + min_doc % $M) % $M), 0) AS BIGINT)
       |  FROM wgm
       |) ORDER BY family""".stripMargin
  }

  // ---------------------------------------------------------- registry

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("index_incremental", indexIncremental _, Some(indexIncrementalOracle),
      "all eight index lifecycles: build on a 90% base, fold the 10% batch via append*, fingerprint the merged state vs a full-union recompute"))
}
