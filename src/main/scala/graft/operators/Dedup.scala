package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables.t

/** Deduplication operator family for large-scale training-data pipelines
  * (driver-mandated EXT surface, SURVEY.md §2.4): exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup — each over
  * the `documents` / `embeddings` tables with a DuckDB oracle.
  *
  * Cross-engine portability rules:
  *  - content hashing uses md5 → first 8 hex chars → uint32, identical
  *    in Spark (`conv(...,16,10)`) and DuckDB (`CAST('0x…' AS BIGINT)`);
  *  - MinHash permutations are integer arithmetic mod a Mersenne prime
  *    (no engine-specific hash functions anywhere);
  *  - floating-point reductions (cosine) accumulate in exact decimal,
  *    so results are independent of partitioning and fold order.
  *
  * Scale notes: every operator is expressed as explode → hash-join →
  * aggregate (no driver-side loops, no O(n²) cross joins except where a
  * blocking key bounds the pair set). At 100 TB the LSH band join IS the
  * scale path: candidates per band bucket, verified exactly.
  */
object Dedup {

  // ---------------------------------------------------------- constants

  /** Mersenne prime 2^31-1: permutation modulus. */
  val P: Long = 2147483647L

  /** MinHash permutation coefficients (16 perms; hashed-prime constants,
    * all < P so a*(h mod P)+b stays within signed 64-bit).
    */
  val As: Seq[Long] = Seq(1610612741L, 805306457L, 402653189L, 201326611L,
    100663319L, 50331653L, 25165843L, 12582917L,
    6291469L, 3145739L, 1572869L, 786433L,
    393241L, 196613L, 98317L, 49157L)
  val Bs: Seq[Long] = Seq(12289L, 24593L, 49157L, 98299L,
    196613L, 393241L, 786433L, 1572869L,
    3145739L, 6291469L, 769L, 1543L,
    3079L, 6151L, 53L, 97L)

  val BandRows = 2 // rows per LSH band → 8 bands over 16 perms
  val JaccardThreshold = 0.5

  /** Asymmetric-overlap threshold for [[containment]]. */
  val ContainmentThreshold = 0.9
  val CosineThreshold = 0.45
  val ShingleWidth = 5

  /** Document-frequency cap on the shingle index: a shingle present in
    * more than this many documents is boilerplate (license headers,
    * navigation chrome) and carries no dedup signal, while its
    * inverted-index posting list creates df² candidate pairs — one
    * shingle shared by 10⁶ docs is a 10¹² bucket. Capping df bounds
    * the self-join fanout to MaxShingleDf per posting list, which is
    * what lets the n-gram path survive 100 TB skew. Mirrored
    * bit-for-bit in every dedup oracle.
    */
  val MaxShingleDf = 128

  // ----------------------------------------------------------- helpers

  /** Portable 32-bit content hash: md5 hex prefix as unsigned int. */
  def phash(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Oracle-side rendering of [[phash]]. */
  def phashSql(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 8)) AS BIGINT)"

  /** 60-bit portable hash (15 hex chars of md5 — the widest prefix
    * that fits a signed 64-bit int in BOTH engines). Used where a hash
    * stands in for a wide join key and 32 bits would collide at corpus
    * scale: 60 bits keeps the accidental-equality rate ~4e-7 even at
    * 10¹² keys, and both engines compute the identical value, so any
    * collision is part of the gated semantics, never a compare skew.
    */
  def phash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Oracle-side rendering of [[phash60]]. */
  def phash60Sql(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Exploded word n-gram stream over `text`, duplicates preserved,
    * one n-gram row per start position, as column `s`. Built from
    * codegen'd primitives — split once, explode the start-index range,
    * `element_at` the positions — all inside ONE whole-stage-codegen
    * pipeline with NO shuffle (the window-`lead` formulation pays a
    * full shuffle+sort by doc_id first; interpreted `transform`/
    * `slice` HOFs are ~10× slower again). `carryCols` (existing
    * columns of `docs`) pass through unchanged — the shared building
    * block for shingles ([[shingleStream]]), corpus bigram stats
    * (`Pipeline.ngramCounts`) and repetition metrics
    * (`Hygiene.textRepetition`); docs with fewer than `width` words
    * yield no rows.
    */
  def wordNgramStream(docs: DataFrame, width: Int, sep: String = "_",
      carryCols: Seq[String] = Seq("doc_id"), posCol: Option[String] = None): DataFrame = {
    val carry = carryCols.map(col)
    val pos = posCol.map(p => (col("__i") + 1).as(p)).toSeq // 1-based start position
    docs
      .select(carry :+ split(col("text"), " ").as("__ws"): _*)
      .filter(size(col("__ws")) >= width)
      .select(carry :+ col("__ws") :+
        explode(sequence(lit(0), size(col("__ws")) - width)).as("__i"): _*)
      .select(carry ++ pos :+
        concat_ws(sep,
          (1 to width).map(o => element_at(col("__ws"), col("__i") + o)): _*).as("s"): _*)
  }

  /** Exploded distinct (doc_id, shingle) stream: word 5-shingles,
    * underscore-joined. One shuffle total, on the natural
    * (doc_id, shingle) key of the distinct.
    */
  def shingleStream(docs: DataFrame): DataFrame =
    wordNgramStream(docs, ShingleWidth).dropDuplicates("doc_id", "s")

  /** The capped shingle index (doc_id, s, h) every dedup operator
    * starts from — served from the PERSISTED index tables
    * ([[ShingleIndex]]: build once at ingest, maintain incrementally,
    * read everywhere), with the [[MaxShingleDf]] stop-shingle cap
    * applied at read. Content is identical to building the index
    * inline from the corpus; the cost is a table read, not a corpus
    * re-shingle.
    */
  def shingleIndex(spark: SparkSession, dir: String): DataFrame =
    ShingleIndex.index(spark, dir)

  /** Oracle-side shingle set (same join character, same distinctness). */
  val shinglesSql: String =
    """list_distinct([ w[i] || '_' || w[i+1] || '_' || w[i+2] || '_' || w[i+3] || '_' || w[i+4]
      |  for i in generate_series(1, len(w) - 4) ])""".stripMargin

  /** Oracle-side df-cap filter over an exploded shingle CTE named `e0`
    * (mirrors the semi join in [[shingleIndex]]).
    */
  val dfCapSql: String =
    s"SELECT s FROM e0 GROUP BY s HAVING count(DISTINCT doc_id) <= $MaxShingleDf"

  /** Exact decimal dot product of two float arrays (fold-order-proof). */
  def decimalDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast("decimal(38,20)")),
      lit(0).cast("decimal(38,20)"), (acc, v) => (acc + v).cast("decimal(38,20)")).cast("double")

  /** Exact decimal sum of squares (for norms). */
  def decimalNormSq(a: Column): Column =
    aggregate(transform(a, x => (x.cast("double") * x.cast("double")).cast("decimal(38,20)")),
      lit(0).cast("decimal(38,20)"), (acc, v) => (acc + v).cast("decimal(38,20)")).cast("double")

  // ------------------------------------------------------- exact dedup

  /** Exact dedup by content hash (hash-groupBy — one shuffle on the
    * digest; the canonical survivor is the min doc_id per group).
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("kept_doc_id"), count(lit(1)).as("dup_count"))
      .orderBy("kept_doc_id")

  private val exactOracle =
    """SELECT md5(text) AS content_hash, min(doc_id) AS kept_doc_id,
      |  count(*) AS dup_count
      |FROM documents GROUP BY md5(text) ORDER BY kept_doc_id""".stripMargin

  // ------------------------------------------------- incremental dedup

  /** Incremental ingest dedup — the production shape: a NEW batch
    * (doc_id ≥ 400 stands in for today's crawl) is classified against
    * the EXISTING corpus's fingerprint index (content hash → kept doc),
    * not against itself. The base side carries only (hash, kept_id) —
    * at 100 TB that index is a few bytes per document and lives as a
    * bucketed table joined on its own key; the new batch never touches
    * base text. `dup_of` is null for genuinely new documents.
    */
  val IncrementalSplitId = 400L

  def incremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val baseIndex = docs.filter(col("doc_id") < IncrementalSplitId)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("dup_of"))
    docs.filter(col("doc_id") >= IncrementalSplitId)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .join(baseIndex, Seq("h"), "left")
      .select(col("doc_id"), col("dup_of"))
      .orderBy("doc_id")
  }

  private val incrementalOracle =
    s"""WITH base AS (
       |  SELECT md5(text) AS h, min(doc_id) AS dup_of FROM documents
       |  WHERE doc_id < $IncrementalSplitId GROUP BY 1)
       |SELECT d.doc_id, base.dup_of
       |FROM (SELECT doc_id, md5(text) AS h FROM documents
       |      WHERE doc_id >= $IncrementalSplitId) d
       |LEFT JOIN base USING (h)
       |ORDER BY d.doc_id""".stripMargin

  // ----------------------------------------------- n-gram Jaccard pairs

  /** Near-duplicate pairs by exact n-gram Jaccard via an inverted-index
    * join: doc→shingles→explode→join on shingle→count common. No cross
    * join: only pairs sharing ≥1 shingle are ever materialized. Jaccard
    * is a ratio of integer counts — bit-exact cross-engine.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // the shingle index feeds three plan branches (sizes + both join
    // sides); the shared cached index runs the scan+window once
    val e = shingleIndex(spark, dir)
    val sizes = e.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = e.as("a").join(e.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("sa"), col("x") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("y") === col("sb.doc_id"))
      .select(col("x"), col("y"),
        (col("common").cast("double") /
          (col("sa.n") + col("sb.n") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy("x", "y")
  }

  private val ngramJaccardOracle =
    s"""WITH words AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, $shinglesSql AS sh FROM words WHERE len(w) >= 5),
       |e0 AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |e AS (SELECT doc_id, s FROM e0 WHERE s IN ($dfCapSql)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
       |common AS (
       |  SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS common
       |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT x, y,
       |  CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
       |FROM common JOIN sizes sa ON x = sa.doc_id JOIN sizes sb ON y = sb.doc_id
       |WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= $JaccardThreshold
       |ORDER BY x, y""".stripMargin

  /** CONTAINMENT dedup — the asymmetric complement of Jaccard: a short
    * document wholly embedded in a longer one (quoted articles,
    * boilerplate-wrapped reposts, prefix/suffix-padded copies) scores
    * common/least(|A|,|B|) ≈ 1 while its Jaccard stays low (the union
    * is dominated by the longer doc), so a symmetric threshold never
    * catches it. Same df-capped inverted-index join as
    * [[ngramJaccard]]; only the normalizer differs.
    */
  def containment(spark: SparkSession, dir: String): DataFrame = {
    val e = shingleIndex(spark, dir)
    val sizes = e.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = e.as("a").join(e.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("sa"), col("x") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("y") === col("sb.doc_id"))
      .select(col("x"), col("y"),
        (col("common").cast("double") / least(col("sa.n"), col("sb.n")))
          .as("containment"),
        (col("common").cast("double") /
          (col("sa.n") + col("sb.n") - col("common"))).as("jaccard"))
      .filter(col("containment") >= ContainmentThreshold)
      .orderBy("x", "y")
  }

  private val containmentOracle =
    s"""WITH words AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, $shinglesSql AS sh FROM words WHERE len(w) >= 5),
       |e0 AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |e AS (SELECT doc_id, s FROM e0 WHERE s IN ($dfCapSql)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
       |common AS (
       |  SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS common
       |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT x, y,
       |  CAST(common AS DOUBLE) / least(sa.n, sb.n) AS containment,
       |  CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
       |FROM common JOIN sizes sa ON x = sa.doc_id JOIN sizes sb ON y = sb.doc_id
       |WHERE CAST(common AS DOUBLE) / least(sa.n, sb.n) >= $ContainmentThreshold
       |ORDER BY x, y""".stripMargin

  // ------------------------------------------- edit-distance verification

  /** Minimum shared (df-capped) shingles before a candidate pair pays
    * the O(n·m) edit-distance verification — the cheap token-level
    * filter that keeps the expensive character-level check off the
    * quadratic pair space.
    */
  val MinEditCommon = 3

  /** Normalized edit-similarity keep threshold for [[editDistance]]. */
  val EditSimThreshold = 0.8

  /** Candidate-volume cap for [[editDistance]]: shingles in MORE docs
    * than this are skipped at candidate-generation time. The
    * character-level DP is the most expensive verification in the
    * dedup family, and a clique of c docs sharing their shingles
    * (replica fixtures; mass boilerplate in an organic corpus) costs
    * c² DP pairs PER shingle group — the r17 sf1 probe measured the
    * blowup (62 s for a query that is ~1 s without replica cliques).
    * Over-cap groups are precisely the docs cheaper dedup already
    * catches (byte-identical replicas → [[exact]]; corpus-wide
    * boilerplate → [[substringRuns]]/line-level), so skipping them
    * here loses nothing the pipeline misses. Docs that had ≥ 1
    * skipped shingle are flagged (`x_capped`/`y_capped` columns) on
    * every pair that SURVIVES candidate generation — a pair whose
    * every shared shingle is over-cap produces no output row, so its
    * suppression is visible only through the cheaper dedup families
    * that catch those docs, not in this query's result. The oracle
    * mirrors the cap exactly (same df aggregation, same flags), so
    * the cap is part of the GATED semantics — never an engine-side
    * divergence from the oracle — but the reported-cap discipline is
    * weaker than [[SemMaxClusterSize]]'s: it reports on survivors
    * only.
    */
  val EditMaxShingleDf = 32

  /** CHARACTER-level near-dup pairs — Levenshtein-verified: shingle
    * candidates (≥ [[MinEditCommon]] shared index shingles — reusing
    * the persisted inverted index, so no pair space beyond docs that
    * already share token runs), then the classic integer edit-distance
    * DP on exactly those pairs, keeping edit_sim = 1 − lev/max(len) ≥
    * [[EditSimThreshold]]. Catches what token-set measures miss in
    * BOTH directions: reordered-token pairs score high Jaccard but low
    * edit_sim; small character edits inside many tokens score low
    * Jaccard but high edit_sim. Both engines implement the same
    * unit-cost DP, so `lev` is the same integer and edit_sim one IEEE
    * division.
    *
    * Scale: candidate generation is the [[ngramJaccard]] index join
    * (df-capped at [[EditMaxShingleDf]] — tighter than the global
    * [[MaxShingleDf]], see its scaladoc — never all-pairs); the DP —
    * the expensive part — runs scan-local on the ≥MinEditCommon
    * survivors only. That gating order (set overlap before character
    * DP, clique caps before both) is the only way character-level
    * verification survives a 100 TB corpus.
    */
  def editDistance(spark: SparkSession, dir: String): DataFrame =
    editDistanceOn(shingleIndex(spark, dir), t(spark, dir, "documents"), EditMaxShingleDf)

  /** The capped pipeline over an explicit index + corpus — the unit
    * the degenerate-clique spec drives directly.
    */
  private[operators] def editDistanceOn(
      e: DataFrame, docs: DataFrame, maxDf: Long): DataFrame = {
    val dfs = e.groupBy("s").agg(count(lit(1)).as("df"))
    val ee = e.join(dfs.filter(col("df") <= maxDf).select("s"), Seq("s"), "left_semi")
    // docs touching ≥ 1 skipped shingle — the reported cap surface
    val cappedDocs = e.join(dfs.filter(col("df") > maxDf).select("s"), Seq("s"), "left_semi")
      .select("doc_id").distinct()
    val cand = ee.as("a").join(ee.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= MinEditCommon)
    val dx = docs.select(col("doc_id").as("x"), col("text").as("tx"))
    val dy = docs.select(col("doc_id").as("y"), col("text").as("ty"))
    val cx = cappedDocs.select(col("doc_id").as("x"), lit(true).as("x_capped"))
    val cy = cappedDocs.select(col("doc_id").as("y"), lit(true).as("y_capped"))
    // byte-identical pair => lev = 0 exactly; the conditional SKIPS
    // the O(len²) DP for it (CaseWhen codegen evaluates the else
    // branch lazily). Pure short-circuit, never a semantics change —
    // and it is what makes exact-duplicate-heavy corpora (replica
    // fixtures, mirrored documents) cheap: their clique pairs cost a
    // string compare, not a quadratic DP each
    val levC = when(col("tx") === col("ty"), lit(0))
      .otherwise(levenshtein(col("tx"), col("ty")))
    cand.join(dx, "x").join(dy, "y")
      .join(cx, Seq("x"), "left").join(cy, Seq("y"), "left")
      .select(col("x"), col("y"), col("common"),
        levC.cast("long").as("lev"),
        round(lit(1.0) - levC.cast("double") /
          greatest(length(col("tx")), length(col("ty"))), 12).as("edit_sim"),
        coalesce(col("x_capped"), lit(false)).as("x_capped"),
        coalesce(col("y_capped"), lit(false)).as("y_capped"))
      .filter(col("edit_sim") >= EditSimThreshold)
      .orderBy("x", "y")
  }

  private val editDistanceOracle =
    s"""WITH words AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, $shinglesSql AS sh FROM words WHERE len(w) >= 5),
       |e0 AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |e AS (SELECT doc_id, s FROM e0 WHERE s IN ($dfCapSql)),
       |dfs AS (SELECT s, count(*) AS df FROM e GROUP BY s),
       |ee AS (SELECT e.* FROM e JOIN dfs USING (s) WHERE df <= $EditMaxShingleDf),
       |cappd AS (
       |  SELECT DISTINCT doc_id FROM e JOIN dfs USING (s) WHERE df > $EditMaxShingleDf),
       |cand AS (
       |  SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS common
       |  FROM ee a JOIN ee b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $MinEditCommon),
       |p AS (
       |  SELECT cand.x, cand.y, cand.common,
       |    CAST(levenshtein(dx.text, dy.text) AS BIGINT) AS lev,
       |    round(1.0 - CAST(levenshtein(dx.text, dy.text) AS DOUBLE)
       |      / greatest(length(dx.text), length(dy.text)), 12) AS edit_sim,
       |    cand.x IN (SELECT doc_id FROM cappd) AS x_capped,
       |    cand.y IN (SELECT doc_id FROM cappd) AS y_capped
       |  FROM cand JOIN documents dx ON dx.doc_id = cand.x
       |  JOIN documents dy ON dy.doc_id = cand.y)
       |SELECT x, y, common, lev, edit_sim, x_capped, y_capped FROM p
       |WHERE edit_sim >= $EditSimThreshold ORDER BY x, y""".stripMargin

  // ---------------------------------------------- exact substring dedup

  /** Minimum verbatim run length, in tokens, that counts as substring
    * duplication (a W-gram = a run of exactly W consecutive tokens).
    */
  val SubstringWidth = 12

  /** EXACT substring dedup — documents sharing a VERBATIM run of
    * ≥ [[SubstringWidth]] consecutive tokens (boilerplate frames,
    * quoted passages, license headers inside otherwise-distinct
    * documents). Set-based near-dup (Jaccard / containment / MinHash)
    * is blind to a short verbatim run inside two long distinct docs:
    * the shared shingles are a sliver of either set, so every
    * set-similarity score stays near 0 while the training-data harm
    * (a memorizable repeated span) is real.
    *
    * Core identity: two docs share a verbatim run of ≥ W consecutive
    * tokens **iff** they share at least one W-token n-gram — so
    * candidates come from an inverted-index equi-join on the W-gram,
    * never all-pairs (the same posting-list shape as [[ngramJaccard]]).
    * The MAXIMAL shared run needs positions, not sets: matches with
    * equal start-offset difference (`delta = i_y − i_x`) and
    * consecutive `i_x` chain into one run of `chain_len + W − 1`
    * tokens; the gaps-and-islands `i − row_number()` trick finds
    * chains without a suffix structure. df-capped like every shingle
    * join ([[MaxShingleDf]]): a W-gram in more docs than the cap is
    * corpus-wide boilerplate whose quadratic pairing belongs in the
    * cluster formulation, and a run containing a capped gram splits
    * at it — in BOTH engines, so the compare stays exact.
    *
    * The persisted 5-shingle index cannot serve this operator: it
    * stores DISTINCT (doc, shingle) without positions, and a run is a
    * positional property. The W-gram stream is the same zero-shuffle
    * codegen pipeline as every n-gram consumer, so the inline build
    * costs one scan. Plan shape: scan → gram explode → df-cap
    * semi-join → posting join → ONE window shuffle on (x, y, delta)
    * (the chain-id window reuses that exchange — its keys extend the
    * partition keys, so only a sort is added) → final (x, y) agg.
    *
    * The posting join keys on [[phash60]] of the gram, not the gram
    * STRING: a W=12-token gram is ~80 bytes and was the suite's
    * largest shuffle payload (18 MB at sf0.1 — and the gram column
    * rides the df-cap exchange, the join exchange AND the window
    * exchange); an 8-byte key cuts that ~10×, which at 100 TB is the
    * difference between shuffling the corpus text twice and shuffling
    * a fingerprint stream. 60-bit accidental equality (~4e-7 at 10¹²
    * grams) can at worst surface a phantom pair with `max_run` = W;
    * both engines hash identically, so the gate is unaffected.
    */
  def substringRuns(spark: SparkSession, dir: String): DataFrame =
    substringRunsOn(t(spark, dir, "documents"))

  private[operators] def substringRunsOn(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val W = SubstringWidth
    // materialize the fingerprint stream ONCE (3 numeric cols/row): the
    // df-cap agg, its semi join and BOTH posting-join sides consume it,
    // and recomputing would tokenize + md5 the corpus four times (the
    // inline analog of ShingleIndex's persist-at-ingest rule)
    val g0 = wordNgramStream(docs, W, posCol = Some("i"))
      .select(col("doc_id"), col("i"), phash60(col("s")).as("hs"))
      .localCheckpoint(true)
    val keep = g0.groupBy(col("hs"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") <= MaxShingleDf).select(col("hs"))
    val g = g0.join(keep, Seq("hs"), "left_semi")
    val hits = g.as("a").join(g.as("b"),
        col("a.hs") === col("b.hs") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        col("a.hs").as("s"), col("a.i").as("i"),
        (col("b.i") - col("a.i")).as("delta"))
    val byDelta = Window.partitionBy(col("x"), col("y"), col("delta"))
    val chained = hits
      .withColumn("chain", col("i") - row_number().over(byDelta.orderBy(col("i"))))
      .withColumn("chain_len", count(lit(1)).over(
        Window.partitionBy(col("x"), col("y"), col("delta"), col("chain"))))
    chained.groupBy(col("x"), col("y"))
      .agg((max(col("chain_len")) + (W - 1)).as("max_run"),
        countDistinct(col("s")).as("shared_grams"))
      .orderBy("x", "y")
  }

  private val substringOracle = {
    val W = SubstringWidth
    val terms = (0 until W).map(o => s"w[i+$o]").mkString(" || '_' || ")
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |g1 AS (SELECT doc_id, u.i AS i, u.s AS sg FROM (
       |  SELECT doc_id, unnest([{'i': i, 's': $terms}
       |    for i in generate_series(1, len(w) - ${W - 1})]) AS u
       |  FROM words WHERE len(w) >= $W) t),
       |g0 AS (SELECT doc_id, i, ${phash60Sql("sg")} AS s FROM g1),
       |g AS (SELECT doc_id, i, s FROM g0 WHERE s IN (
       |  SELECT s FROM g0 GROUP BY s HAVING count(DISTINCT doc_id) <= $MaxShingleDf)),
       |hits AS (SELECT a.doc_id AS x, b.doc_id AS y, a.s AS s, a.i AS i,
       |    b.i - a.i AS delta
       |  FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id),
       |chains AS (SELECT x, y, s, delta,
       |    i - row_number() OVER (PARTITION BY x, y, delta ORDER BY i) AS chain
       |  FROM hits),
       |runs AS (SELECT x, y, delta, chain, count(*) + ${W - 1} AS run_len
       |  FROM chains GROUP BY x, y, delta, chain)
       |SELECT r.x, r.y, r.max_run, sh.shared_grams FROM
       |  (SELECT x, y, max(run_len) AS max_run FROM runs GROUP BY x, y) r
       |  JOIN (SELECT x, y, count(DISTINCT s) AS shared_grams
       |        FROM hits GROUP BY x, y) sh USING (x, y)
       |ORDER BY x, y""".stripMargin
  }

  // --------------------------------------------------- MinHash + LSH

  /** MinHash signatures + banded LSH + exact verification — the scale
    * path for near-dup at 100 TB (shingle sets never pairwise-compared
    * globally; candidates come from band-bucket joins only).
    *
    * Pipeline: portable shingle hash → 16 permutation minima per doc →
    * 8 bands of 2 → self-join per band value → distinct candidate pairs
    * → exact Jaccard filter. Output equals the exact pair set wherever
    * LSH recall is 1 (verified locally; the oracle replicates the full
    * pipeline including banding, so the match is exact regardless).
    */
  /** Memoized LSH-verified pair set per (session, dataset): the same
    * verified pairs feed both the pair query and the cluster closure,
    * so the band-join + verify runs once per session, like the shingle
    * index it builds on.
    */
  private val lshPairSets =
    new graft.util.IndexMemo[DataFrame](8)(_.unpersist(false))

  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    lshPairSets.getOrElseUpdate(spark, dir)(minhashLshUncached(spark, dir).cache())
      .orderBy("x", "y")

  private def minhashLshUncached(spark: SparkSession, dir: String): DataFrame = {
    val e = shingleIndex(spark, dir)
    val bands = bandsFrom(sigsFrom(e))
    val candidates = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .distinct()
    verifyPairs(e, candidates).orderBy("x", "y")
  }

  /** MinHash signatures `(doc_id, mh0..mh15)` from a capped shingle
    * index frame `(doc_id, s, h)` — the per-doc half of the LSH
    * pipeline, shared by the session pair query and the incremental
    * curation state (`CurationState`), which persists signatures and
    * recomputes them only for signature-dirty docs.
    */
  private[operators] def sigsFrom(e: DataFrame): DataFrame = {
    val mhCols = As.zip(Bs).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("h") + lit(b), lit(P))).as(s"mh$i")
    }
    e.groupBy(col("doc_id")).agg(mhCols.head, mhCols.tail: _*)
  }

  /** Banded signature rows `(doc_id, band, sig)` from [[sigsFrom]]. */
  private[operators] def bandsFrom(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until As.size / BandRows).map { j =>
      struct(lit(j).as("band"),
        concat_ws(":", (0 until BandRows).map(r => col(s"mh${j * BandRows + r}")): _*).as("sig"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Exact Jaccard verification of candidate pairs `(x, y)` through
    * the capped index `e` — scoped to the candidate pairs ONLY, via
    * the inverted index itself (the oracle's `common` CTE shape):
    * candidates ⋈ index on the left doc, then ⋈ index on (right doc,
    * shingle) counts the intersection — O(candidates · |set|) rows
    * touched, never the global pair space, and no per-doc collect_set
    * materialization (which would otherwise run once per join branch).
    * AQE broadcasts the tiny candidate side at these sizes; at 100 TB
    * the same plan degrades gracefully to a shuffle join on doc_id.
    */
  private[operators] def verifyPairs(e: DataFrame, candidates: DataFrame): DataFrame = {
    val sizes = e.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = e.as("ea").join(candidates, col("ea.doc_id") === col("x"))
      .select(col("x"), col("y"), col("ea.s").as("cs"))
      .join(e.as("eb"), col("eb.doc_id") === col("y") && col("eb.s") === col("cs"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("sa"), col("x") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("y") === col("sb.doc_id"))
      .select(col("x"), col("y"),
        (col("common").cast("double") /
          (col("sa.n") + col("sb.n") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
  }

  /** Shared oracle CTE pipeline replicating [[minhashLsh]] end to end
    * (capped shingle index → 16 permutation minima → 8 bands →
    * candidate pairs → exact intersection counts). Used by BOTH the
    * pair oracle and the cluster oracle so the DuckDB side applies the
    * exact same banding restriction the engine does — an oracle built
    * from the exact all-pairs join would disagree on any dataset where
    * LSH recall < 1.
    */
  private val lshOracleCtes: String = {
    val mhSelect = As.zip(Bs).zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * h + $b) % $P) AS mh$i"
    }.mkString(",\n    ")
    val bandSelect = (0 until As.size / BandRows).map { j =>
      val sig = (0 until BandRows).map(r => s"CAST(mh${j * BandRows + r} AS VARCHAR)")
        .mkString(" || ':' || ")
      s"SELECT doc_id, $j AS band, $sig AS sig FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""words AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, $shinglesSql AS sh FROM words WHERE len(w) >= 5),
       |e0 AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |e AS (
       |  SELECT doc_id, ${phashSql("s")} % $P AS h, s
       |  FROM e0 WHERE s IN ($dfCapSql)),
       |sigs AS (
       |  SELECT doc_id,
       |    ${mhSelect}
       |  FROM e GROUP BY doc_id),
       |bands AS (
       |  $bandSelect),
       |candidates AS (
       |  SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
       |common AS (
       |  SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS common
       |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  private val minhashLshOracle: String =
    s"""WITH $lshOracleCtes
       |SELECT c.x, c.y,
       |  CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
       |FROM candidates c
       |JOIN common USING (x, y)
       |JOIN sizes sa ON c.x = sa.doc_id JOIN sizes sb ON c.y = sb.doc_id
       |WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= $JaccardThreshold
       |ORDER BY x, y""".stripMargin

  // ----------------------------------------------------------- SimHash

  /** 32-bit SimHash per document: portable token hash, per-bit ±1 votes
    * weighted by term frequency, sign → bit. One explode + one groupBy.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val tok = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("h", phash(col("w")))
    val votes = (0 until 32).map { k =>
      sum(when(pmod(floor(col("h") / math.pow(2, k).toLong), lit(2)) === 1, 1).otherwise(-1)).as(s"v$k")
    }
    val bits = (0 until 32).map { k =>
      when(col(s"v$k") > 0, math.pow(2, k).toLong).otherwise(0L)
    }
    tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
      .orderBy("doc_id")
  }

  private val simhashOracle: String = {
    val votes = (0 until 32).map { k =>
      s"sum(CASE WHEN (h // ${math.pow(2, k).toLong}) % 2 = 1 THEN 1 ELSE -1 END) AS v$k"
    }.mkString(",\n    ")
    val bits = (0 until 32).map { k =>
      s"CASE WHEN v$k > 0 THEN ${math.pow(2, k).toLong} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, ${phashSql("w")} AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM tok GROUP BY doc_id)
       |SELECT doc_id, CAST($bits AS BIGINT) AS simhash
       |FROM votes ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------- embedding cosine near-dup

  /** Embedding near-dup pairs: within-label blocking (bounded pair set)
    * + exact decimal-accumulated cosine ≥ threshold. At 100 TB the
    * blocking key generalizes to any coarse cluster id (label, IVF cell,
    * sign-LSH bucket) — the pair join never goes global.
    */
  def embeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        decimalNormSq(col("embedding")).as("nsq"))
    // Two-phase: cheap native-codegen double prefilter with a guard
    // band (strict superset of the answer — fp error across a 64-term
    // loop is far below 1e-6), then the exact decimal rescore only on
    // survivors. Cuts the interpreted decimal folds from O(pairs) to
    // O(answers); the kernel itself is a whole-stage-codegen loop
    // (graft.functions.FloatDot), not an interpreted HOF.
    val fastDot = graft.functions.VecExpressions.floatDot(col("a.embedding"), col("b.embedding"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .filter(fastDot / (sqrt(col("a.nsq")) * sqrt(col("b.nsq"))) >= CosineThreshold - 1e-6)
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
        col("a.label").as("label"),
        // identical vectors => cosine 1.0 exactly (dot == nsq under
        // the same exact-decimal accumulation); the conditional skips
        // the interpreted decimal fold for them — replica-duplicated
        // embeddings cost an array compare, not a 64-term decimal dot
        when(col("a.embedding") === col("b.embedding"), lit(1.0))
          .otherwise(round(decimalDot(col("a.embedding"), col("b.embedding")) /
            (sqrt(col("a.nsq")) * sqrt(col("b.nsq"))), 12)).as("cosine"))
      .filter(col("cosine") >= CosineThreshold)
      .orderBy("x", "y")
  }

  private val embeddingCosineOracle =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding FROM embeddings),
       |elems AS (
       |  SELECT vec_id, embedding[i] AS val, i FROM e,
       |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u),
       |norms AS (
       |  SELECT vec_id,
       |    CAST(sum(CAST(CAST(val AS DOUBLE) * CAST(val AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE) AS nsq
       |  FROM elems GROUP BY vec_id),
       |pairs AS (
       |  SELECT a.vec_id AS x, b.vec_id AS y, a.label AS label
       |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
       |dots AS (
       |  SELECT p.x, p.y,
       |    CAST(sum(CAST(CAST(ea.val AS DOUBLE) * CAST(eb.val AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE) AS dot
       |  FROM pairs p
       |  JOIN elems ea ON ea.vec_id = p.x
       |  JOIN elems eb ON eb.vec_id = p.y AND ea.i = eb.i
       |  GROUP BY p.x, p.y)
       |SELECT p.x AS x, p.y AS y, p.label AS label,
       |  round(d.dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 12) AS cosine
       |FROM pairs p JOIN dots d ON p.x = d.x AND p.y = d.y
       |JOIN norms na ON p.x = na.vec_id JOIN norms nb ON p.y = nb.vec_id
       |WHERE d.dot / (sqrt(na.nsq) * sqrt(nb.nsq)) >= $CosineThreshold
       |ORDER BY p.x, p.y""".stripMargin

  // ----------------------------------------- duplicate-cluster closure

  /** Connected components over the near-dup pair graph — the step that
    * turns pairwise matches into dedup groups (keep one doc per
    * cluster). Iterative min-label propagation on DataFrames: each
    * round every node adopts the minimum label among itself and its
    * neighbors; converges in O(component diameter) rounds (dup
    * clusters are shallow — bounded at 20). `localCheckpoint` breaks
    * the growing lineage each round, the standard pattern for
    * iterative DataFrame algorithms. At 100 TB this is the same
    * shuffle-per-round large-join CC used before resorting to graph
    * frameworks; edges come from the LSH-verified pair set
    * ([[minhashLsh]]) — identical to the exact n-gram pairs at this
    * threshold, but with candidate volume bounded by band buckets, the
    * only edge source that survives 100 TB (the exact inverted-index
    * self-join pays the full posting-list fanout).
    */
  /** Pair graphs small enough for the driver go through union-find
    * directly (one collect of the already-tiny verified-pair set);
    * larger graphs run the distributed propagation loop. Both paths
    * produce min-id roots, so results are identical.
    */
  val DriverCcMaxPairs = 1000000

  def dupClusters(spark: SparkSession, dir: String): DataFrame =
    clustersFromPairs(spark,
      minhashLsh(spark, dir).select(col("x"), col("y")))

  /** Connected components over a verified pair frame — the adaptive
    * driver/distributed path shared by [[dupClusters]] and the
    * incremental curation read (which persists the pair set and only
    * re-derives the closure).
    */
  private[operators] def clustersFromPairs(
      spark: SparkSession, pairsIn: DataFrame): DataFrame = {
    val pairs = pairsIn.localCheckpoint(true)
    // one materialization decides the path AND feeds the driver CC
    val head = pairs.limit(DriverCcMaxPairs + 1).collect()
    if (head.length <= DriverCcMaxPairs) driverUnionFind(spark, head)
    else distributedCc(pairs)
  }

  private[operators] def driverUnionFind(
      spark: SparkSession, rows: Array[org.apache.spark.sql.Row]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(a: Long): Long = {
      var r = a
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = a // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { row =>
      val (x, y) = (row.getLong(0), row.getLong(1))
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { // min id becomes the root
        if (rx < ry) parent(ry) = rx else parent(rx) = ry
      }
      parent.getOrElseUpdate(x, find(x)); parent.getOrElseUpdate(y, find(y))
    }
    val comp = parent.keys.toSeq.map(id => id -> find(id))
    val sizes = comp.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    comp.sortBy { case (id, root) => (root, id) }
      .map { case (id, root) => (id, root, sizes(root), id == root) }
      .toDF("doc_id", "cluster_id", "cluster_size", "kept")
  }

  private[operators] def distributedCc(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .unionByName(pairs.select(col("y").as("x"), col("x").as("y")))
      .localCheckpoint(true)
    val nodes = edges.select(col("x").as("id")).distinct()
    var labels = nodes.select(col("id"), col("id").as("root")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      val viaNeighbors = edges.as("e")
        .join(labels.as("l"), col("e.y") === col("l.id"))
        .select(col("e.x").as("id"), col("l.root").as("cand"))
      val next = labels.select(col("id"), col("root").as("cand"))
        .unionByName(viaNeighbors)
        .groupBy(col("id")).agg(min(col("cand")).as("root"))
        .localCheckpoint(true)
      changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.root") =!= col("o.root")).count()
      labels = next
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $iter rounds " +
          "(component diameter exceeds the cap; raise the bound)")
    val sizes = labels.groupBy(col("root")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "root")
      .select(col("id").as("doc_id"), col("root").as("cluster_id"),
        col("cluster_size"), (col("id") === col("root")).as("kept"))
      .orderBy("cluster_id", "doc_id")
  }

  /** Shared oracle CTE chain ending in `comp(id, cluster_id)` — the
    * SAME LSH-banded verified-pair pipeline the engine runs (NOT the
    * exact all-pairs join — the cluster edges must restrict to band
    * candidates exactly like [[minhashLsh]] does), then a recursive
    * transitive closure (components are tiny, so path enumeration is
    * bounded) and min-reachable-id labeling. Callers prepend
    * `WITH RECURSIVE` and append their own consuming CTEs/SELECT.
    */
  private[operators] val clusterOracleCtes: String =
    s"""$lshOracleCtes,
       |pairs AS (
       |  SELECT c.x AS x, c.y AS y FROM candidates c
       |  JOIN common USING (x, y)
       |  JOIN sizes sa ON c.x = sa.doc_id JOIN sizes sb ON c.y = sb.doc_id
       |  WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= $JaccardThreshold),
       |edges AS (SELECT x, y FROM pairs UNION SELECT y, x FROM pairs),
       |reach AS (
       |  SELECT x AS id, y AS r FROM edges
       |  UNION
       |  SELECT reach.id, edges.y AS r FROM reach JOIN edges ON reach.r = edges.x),
       |comp AS (
       |  SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id)""".stripMargin

  private val dupClustersOracle: String = {
    s"""WITH RECURSIVE $clusterOracleCtes,
       |csize AS (
       |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
       |SELECT c.id AS doc_id, c.cluster_id, s.cluster_size,
       |  c.id = c.cluster_id AS kept
       |FROM comp c JOIN csize s USING (cluster_id)
       |ORDER BY cluster_id, doc_id""".stripMargin
  }

  // -------------------------------------- canonical survivor selection

  /** Canonical-survivor selection — the step AFTER cluster detection
    * that decides WHICH copy of each near-dup cluster enters the
    * training corpus. [[dupClusters]]' `kept` flag keeps the min id
    * (deterministic but content-blind); a real curation pipeline keeps
    * the BEST copy. Policy: highest [[TextAnalysis.qualityPoints]],
    * then longest text (most complete variant), then lowest doc_id —
    * each tiebreak total, so the survivor is unique and reproducible.
    *
    * Plan shape: the cluster map is ∝ the duplicated subset (tiny next
    * to the corpus); one equi-join brings in the score inputs, one
    * window partitioned by cluster_id ranks members. At 100 TB both
    * the join and the window key on cluster_id/doc_id — no global
    * sort, no driver loop, cluster sizes bound each window partition.
    */
  /** THE survivor-selection total order, shared by every keep-best
    * consumer (text clusters here, image clusters in
    * [[Multimodal.phashKeepBest]]): highest `quality`, then longest
    * content (`lenCol` — chars for text, bytes for media), then lowest
    * id — each tiebreak total, so the survivor is unique and
    * reproducible. One window partitioned by cluster_id; cluster sizes
    * bound each partition, so no global sort at any scale.
    */
  private[operators] def survivorRank(lenCol: String, idCol: String): Column = {
    import org.apache.spark.sql.expressions.Window
    row_number().over(
      Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col(lenCol).desc, col(idCol).asc))
  }

  def keepBest(spark: SparkSession, dir: String): DataFrame = {
    val clusters = dupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    val scored = t(spark, dir, "documents").select(
      col("doc_id"),
      graft.operators.TextAnalysis.qualityPoints(col("text")).as("quality"),
      length(col("text")).cast("long").as("text_len"))
    val rank = survivorRank("text_len", "doc_id")
    clusters.join(scored, "doc_id")
      .withColumn("keep", rank === 1)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("quality"), col("text_len"), col("keep"))
      .orderBy("cluster_id", "doc_id")
  }

  /** Oracle CTE block appended after [[clusterOracleCtes]], ending in
    * `ranked(doc_id, cluster_id, cluster_size, quality, text_len, rn)`
    * — the survivor ranking shared verbatim by [[keepBest]]'s oracle
    * and the composed corpus query (`Pipeline.corpusFinal`), so the two
    * can never disagree on which cluster member survives.
    */
  private[operators] val survivorOracleCtes: String =
    s"""csize AS (
       |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id),
       |scored AS (
       |  SELECT doc_id,
       |    CAST(${graft.operators.TextAnalysis.qualityPointsSql("text")} AS INTEGER)
       |      AS quality,
       |    CAST(len(text) AS BIGINT) AS text_len
       |  FROM documents),
       |ranked AS (
       |  SELECT c.id AS doc_id, c.cluster_id, s.cluster_size,
       |    q.quality, q.text_len,
       |    row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY q.quality DESC, q.text_len DESC, c.id ASC) AS rn
       |  FROM comp c JOIN csize s USING (cluster_id)
       |  JOIN scored q ON q.doc_id = c.id)""".stripMargin

  private val keepBestOracle: String = {
    s"""WITH RECURSIVE $clusterOracleCtes,
       |$survivorOracleCtes
       |SELECT doc_id, cluster_id, cluster_size, quality, text_len,
       |  rn = 1 AS keep
       |FROM ranked ORDER BY cluster_id, doc_id""".stripMargin
  }

  // -------------------------------------------------- semantic dedup

  /** SemDeDup blocking k for a corpus of `n` vectors: k grows with the
    * corpus so within-cluster pair cost stays Σ n_c² ≈ n ×
    * [[SemTargetClusterSize]] — LINEAR in n — instead of n²/k at fixed
    * k. Floor of [[Clustering.K]] keeps small fixtures on the
    * well-tested seed set; the oracle computes the same formula in SQL.
    */
  val SemTargetClusterSize = 125
  def semK(n: Long): Int = math.max(Clustering.K, math.ceil(n / SemTargetClusterSize.toDouble).toInt)

  /** Per-cluster size cap for the pairwise phase: a pathological
    * cluster (k-means collapse, degenerate embeddings) of size c costs
    * c² pairs no matter how k scales, so clusters beyond the cap are
    * SKIPPED (reported `capped`, n_dropped 0, skip logged) rather than
    * allowed to detonate the stage — the same bounded-work rule as
    * [[DriverCcMaxPairs]]. Mirrored in the oracle, so capping is part
    * of the gated semantics, not a silent engine-side truncation.
    */
  val SemMaxClusterSize = 500

  /** SemDeDup-style semantic dedup: k-means clusters as the blocking
    * key ([[Clustering.assignments]] with k ∝ corpus size via
    * [[semK]]), pairwise exact-decimal cosine ONLY within each
    * eligible cluster (size ≤ [[SemMaxClusterSize]]), drop the higher
    * vec_id of every near-dup pair; reports per-cluster member/drop
    * counts and the capped flag. This is the published web-scale
    * recipe (cluster first, compare within): pair cost is Σ n_c²,
    * bounded by k scaling and the per-cluster cap, never all-pairs.
    * Same two-phase scoring as [[embeddingCosine]] — codegen float
    * prefilter with a guard band, decimal rescore on survivors only.
    * The oracle replays the identical Lloyd rounds as a CTE chain
    * (same data-dependent k) and recomputes the within-cluster pairs
    * under the same cap.
    */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), decimalNormSq(col("embedding")).as("nsq"))
    val k = semK(t(spark, dir, "embeddings").count())
    // blocking key from the PERSISTED ingest-time cluster index — the
    // per-query cost is the within-cluster pairwise phase, never a
    // Lloyd re-run over the corpus
    val a = ClusterIndex.assignments(spark, dir, k, Clustering.Iters)
    semanticDedupOn(e, a, SemMaxClusterSize)
  }

  /** The pairwise phase over explicit embeddings + assignments — the
    * unit the skew spec drives with a fabricated degenerate cluster.
    */
  private[operators] def semanticDedupOn(
      e: DataFrame, a: DataFrame, maxClusterSize: Long): DataFrame = {
    val sizes = a.groupBy("cid").agg(count(lit(1)).as("n_members"))
    val eligible = sizes.filter(col("n_members") <= maxClusterSize).select("cid")
    val skipped = sizes.filter(col("n_members") > maxClusterSize)
      .collect() // bounded: ≤ k rows
    if (skipped.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"semanticDedup skipped pairwise scoring for ${skipped.length} " +
          s"over-cap cluster(s) (cap $maxClusterSize): " +
          skipped.map(r => s"cid=${r.get(0)} size=${r.get(1)}").mkString(", "))
    val m = e.join(a, "vec_id").join(broadcast(eligible), Seq("cid"), "left_semi")
    val fastDot = graft.functions.VecExpressions.floatDot(col("a.embedding"), col("b.embedding"))
    val dropped = m.as("a").join(m.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(fastDot / (sqrt(col("a.nsq")) * sqrt(col("b.nsq"))) >= CosineThreshold - 1e-6)
      .filter(round(decimalDot(col("a.embedding"), col("b.embedding")) /
        (sqrt(col("a.nsq")) * sqrt(col("b.nsq"))), 12) >= CosineThreshold)
      .groupBy(col("a.cid").as("cid"))
      .agg(countDistinct(col("b.vec_id")).as("n_dropped"))
    sizes
      .join(dropped, Seq("cid"), "left")
      .select(col("cid").as("cluster_id"), col("n_members"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_members") > maxClusterSize).as("capped"))
      .orderBy("cluster_id")
  }

  /** Data-dependent k in SQL — the exact [[semK]] formula. */
  private val semKSql: String =
    s"SELECT GREATEST(${Clustering.K}, CAST(ceil(count(*) / $SemTargetClusterSize.0) AS BIGINT)) FROM embeddings"

  /** The engine's shard modulus for that k ([[Clustering.shardModFor]])
    * in SQL — 1 at small corpora (global Lloyd, unchanged), > 1 once k
    * outgrows one shard's budget (the linear-ingest path).
    */
  private val semShardModSql: String =
    s"SELECT CAST(ceil(($semKSql) / ${Clustering.ShardK}.0) AS BIGINT)"

  private val semanticDedupOracle: String =
    Clustering.kmeansAssignCteK(semKSql, Clustering.Iters,
      shardModSql = semShardModSql) +
      s""",
         |m AS (SELECT vec_id, cid FROM a${Clustering.Iters}),
         |sizes AS (SELECT cid, count(*) AS n_members FROM m GROUP BY cid),
         |elig AS (SELECT cid FROM sizes WHERE n_members <= $SemMaxClusterSize),
         |me AS (SELECT m.* FROM m JOIN elig USING (cid)),
         |pdots AS (
         |  SELECT pa.cid, pa.vec_id AS x, pb.vec_id AS y,
         |    CAST(sum(CAST(CAST(ea.val AS DOUBLE) * CAST(eb.val AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE) AS dot
         |  FROM me pa JOIN me pb ON pa.cid = pb.cid AND pa.vec_id < pb.vec_id
         |  JOIN elems ea ON ea.vec_id = pa.vec_id
         |  JOIN elems eb ON eb.vec_id = pb.vec_id AND ea.i = eb.i
         |  GROUP BY pa.cid, pa.vec_id, pb.vec_id),
         |sim AS (
         |  SELECT d.cid, d.y AS dropped
         |  FROM pdots d
         |  JOIN norms na ON na.vec_id = d.x
         |  JOIN norms nb ON nb.vec_id = d.y
         |  WHERE round(d.dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 12) >= $CosineThreshold),
         |drops AS (SELECT cid, count(DISTINCT dropped) AS n_dropped FROM sim GROUP BY cid)
         |SELECT s.cid AS cluster_id, CAST(s.n_members AS BIGINT) AS n_members,
         |  CAST(coalesce(d.n_dropped, 0) AS BIGINT) AS n_dropped,
         |  s.n_members > $SemMaxClusterSize AS capped
         |FROM sizes s LEFT JOIN drops d USING (cid) ORDER BY cluster_id""".stripMargin

  // ------------------------------------- line-level boilerplate removal

  /** "Line" width in words: the fixture corpus carries no newlines, so
    * a line is a fixed non-overlapping word window — the same
    * segmentation a CCNet-style line dedup applies to newline-free
    * content. Real newline-delimited corpora swap the segmenter, not
    * the index.
    */
  val LineWords = 4

  /** A line shared by MORE distinct docs than this is corpus
    * boilerplate (header/footer/nav frames) and is dropped from every
    * doc that carries it.
    */
  val LineMaxDocDf = 5

  /** Line-level boilerplate removal (the CCNet/RefinedWeb line-dedup
    * gate): segment every doc into [[LineWords]]-word lines, key each
    * by [[phash60]] (8-byte keys through the index — the shingle-index
    * rule), count each line's DISTINCT-doc df, and drop from every doc
    * the lines shared by more than [[LineMaxDocDf]] docs; emits the
    * per-doc retention ledger (lines kept/dropped, chars dropped).
    *
    * Scale shape: BOTH sides are PERSISTED [[LineIndex]] tables (built
    * once at ingest, folded incrementally as docs land — the
    * shingle/cluster/LM/pHash/sketch lifecycle, sixth table): the
    * per-doc ledger is a postings-table scan left-joined with the ≤
    * corpus/(df+1)-sized boilerplate subset by 8-byte hash — no corpus
    * re-segmentation per query at any scale. No candidate pairs exist
    * anywhere in this operator — the quadratic risk the shingle joins
    * must cap simply never arises.
    */
  def lineDedup(spark: SparkSession, dir: String): DataFrame =
    LineIndex.readPost(spark, LineIndex.ensureBuilt(spark, dir))
      .join(LineIndex.boilerplate(spark, dir)
        .select(col("h"), lit(true).as("_drop")), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("_drop").isNull, col("cnt")).otherwise(0L)).as("lines_kept"),
        sum(when(col("_drop").isNotNull, col("cnt")).otherwise(0L)).as("lines_dropped"),
        sum(when(col("_drop").isNotNull, col("nc")).otherwise(0L)).as("chars_dropped"))
      .orderBy("doc_id")

  /** The corpus line segmentation as an 8-byte hash stream
    * `(doc_id, nc, h)` — ONE scan-local codegen projection; feeds both
    * the [[LineIndex]] build and the per-query flag join.
    */
  private[operators] def lineHashStream(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, cast(ceil(size(a) / $LineWords.0) as int) - 1), " +
          s"s -> array_join(slice(a, s * $LineWords + 1, $LineWords), ' '))")).as("seg"))
      .select(col("doc_id"), length(col("seg")).cast("long").as("nc"),
        size(split(col("seg"), " ")).cast("long").as("ntk"),
        phash60(col("seg")).as("h"))

  /** Distinct-doc df per line hash — the [[LineIndex]] build agg. */
  private[operators] def lineDf(hashed: DataFrame): DataFrame =
    hashed.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df"))

  /** Per-doc retention ledger given the hash stream and the
    * over-threshold boilerplate hash set.
    */
  private def lineLedger(hashed: DataFrame, boiler: DataFrame): DataFrame =
    hashed.join(boiler.select(col("h"), lit(true).as("_drop")), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("_drop").isNull, 1L).otherwise(0L)).as("lines_kept"),
        sum(when(col("_drop").isNotNull, 1L).otherwise(0L)).as("lines_dropped"),
        sum(when(col("_drop").isNotNull, col("nc")).otherwise(0L)).as("chars_dropped"))
      .orderBy("doc_id")

  /** Index-free inline variant (the persisted ≡ inline spec baseline):
    * the segment stream is materialized once and feeds both the df agg
    * and the flag join.
    */
  private[operators] def lineDedupOn(docs: DataFrame): DataFrame = {
    val hashed = lineHashStream(docs)
      .localCheckpoint(true) // feeds the df index AND the flag join
    lineLedger(hashed, lineDf(hashed).filter(col("df") > LineMaxDocDf))
  }

  /** Per-doc token mass AFTER line-level boilerplate removal
    * `(doc_id, nt_clean)` — what [[Pipeline.corpusFinal]]'s mixture
    * budget and shard mass count (the tokens a training run actually
    * reads). Served ENTIRELY from the PERSISTED [[LineIndex]]: a
    * postings-table scan + a left join against the tiny over-threshold
    * hash set — no corpus re-segmentation per query. `sum(ntk)` over a
    * doc's postings equals its raw token count, so `nt − nt_clean` is
    * exactly the dropped-line token mass.
    */
  private[operators] def lineCleanTokens(spark: SparkSession, dir: String): DataFrame =
    LineIndex.readPost(spark, LineIndex.ensureBuilt(spark, dir))
      .join(LineIndex.boilerplate(spark, dir)
        .select(col("h"), lit(true).as("_drop")), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("_drop").isNull, col("ntk")).otherwise(0L)).as("nt_clean"))

  /** Oracle CTEs for [[lineCleanTokens]] (whole-corpus line df, like
    * the persisted index): `lclean(doc_id, ntc)`.
    */
  private[operators] val lineCleanOracleCtes: String =
    s"""lsegs AS (
       |  SELECT doc_id, array_to_string(a[(s * $LineWords + 1):((s + 1) * $LineWords)], ' ') AS seg
       |  FROM (SELECT doc_id, string_split(text, ' ') AS a FROM documents) lw,
       |  LATERAL (SELECT unnest(generate_series(0,
       |    CAST(ceil(len(a) / $LineWords.0) AS INT) - 1)) AS s) lu),
       |lhash AS (
       |  SELECT doc_id, CAST(len(string_split(seg, ' ')) AS BIGINT) AS ntk,
       |    ${phash60Sql("seg")} AS h
       |  FROM lsegs),
       |lboiler AS (
       |  SELECT h FROM lhash GROUP BY h
       |  HAVING count(DISTINCT doc_id) > $LineMaxDocDf),
       |lclean AS (
       |  SELECT lhash.doc_id,
       |    CAST(sum(CASE WHEN lb.h IS NULL THEN ntk ELSE 0 END) AS BIGINT) AS ntc
       |  FROM lhash LEFT JOIN lboiler lb ON lhash.h = lb.h
       |  GROUP BY lhash.doc_id)""".stripMargin

  /** The doc set flagged by the substring-run gate: every doc that is
    * the HIGHER id of at least one [[substringRuns]] pair (keep the
    * first occurrence of a repeated span, drop later carriers — the
    * [[keepBest]] orientation). Two docs pair iff they share ≥ 1
    * df-capped W-gram, which is position-free — so the flag is pure
    * per-doc logic over per-gram metadata (∃ capped gram whose FIRST
    * carrier precedes the doc), served from the PERSISTED
    * [[WgramIndex]]: no corpus re-n-gram and no pair join per query.
    */
  private[operators] def substringFlagged(spark: SparkSession, dir: String): DataFrame =
    WgramIndex.flaggedDocs(spark, WgramIndex.ensureBuilt(spark, dir))

  /** Index-free inline variant (the persisted ≡ inline spec baseline,
    * and the original pair-join formulation the metadata read must
    * agree with).
    */
  private[operators] def substringFlaggedInline(docs: DataFrame): DataFrame = {
    val g0 = wordNgramStream(docs, SubstringWidth)
      .select(col("doc_id"), phash60(col("s")).as("hs"))
      .dropDuplicates("doc_id", "hs")
      .localCheckpoint(true) // feeds the df-cap agg AND both join sides
    val keep = g0.groupBy(col("hs"))
      .agg(count(lit(1)).as("df")) // stream is distinct per (doc, hs)
      .filter(col("df") <= MaxShingleDf).select(col("hs"))
    val g = g0.join(keep, Seq("hs"), "left_semi")
    g.as("a").join(g.as("b"),
        col("a.hs") === col("b.hs") && col("a.doc_id") < col("b.doc_id"))
      .select(col("b.doc_id").as("doc_id")).distinct()
  }

  /** Oracle CTEs for [[substringFlagged]]: `substr_bad(doc_id)`. */
  private[operators] val substringFlaggedOracleCtes: String = {
    val W = SubstringWidth
    val terms = (0 until W).map(o => s"sw[i+$o]").mkString(" || '_' || ")
    s"""sg1 AS (
       |  SELECT doc_id, u AS sgr FROM (
       |    SELECT doc_id, unnest([$terms
       |      for i in generate_series(1, len(sw) - ${W - 1})]) AS u
       |    FROM (SELECT doc_id, string_split(text, ' ') AS sw FROM documents) swd
       |    WHERE len(sw) >= $W) sgt),
       |sg0 AS (SELECT DISTINCT doc_id, ${phash60Sql("sgr")} AS s FROM sg1),
       |sgc AS (SELECT doc_id, s FROM sg0 WHERE s IN (
       |  SELECT s FROM sg0 GROUP BY s HAVING count(*) <= $MaxShingleDf)),
       |substr_bad AS (
       |  SELECT DISTINCT sb.doc_id FROM sgc sa
       |  JOIN sgc sb ON sa.s = sb.s AND sa.doc_id < sb.doc_id)""".stripMargin
  }

  private val lineDedupOracle: String =
    s"""WITH segs AS (
       |  SELECT doc_id, array_to_string(a[(s * $LineWords + 1):((s + 1) * $LineWords)], ' ') AS seg
       |  FROM (SELECT doc_id, string_split(text, ' ') AS a FROM documents) w,
       |  LATERAL (SELECT unnest(generate_series(0,
       |    CAST(ceil(len(a) / $LineWords.0) AS INT) - 1)) AS s) u),
       |hashed AS (
       |  SELECT doc_id, CAST(len(seg) AS BIGINT) AS nc,
       |    ${phash60Sql("seg")} AS h
       |  FROM segs),
       |boiler AS (
       |  SELECT h FROM hashed GROUP BY h
       |  HAVING count(DISTINCT doc_id) > $LineMaxDocDf)
       |SELECT hashed.doc_id,
       |  CAST(sum(CASE WHEN b.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS lines_kept,
       |  CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS lines_dropped,
       |  CAST(sum(CASE WHEN b.h IS NOT NULL THEN nc ELSE 0 END) AS BIGINT) AS chars_dropped
       |FROM hashed LEFT JOIN boiler b ON hashed.h = b.h
       |GROUP BY hashed.doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- registry

  // ---------------------------------------------------------- winnowing

  /** Winnowing gram width (words per k-gram). */
  val WinnowK = 3

  /** Winnowing window width (grams per selection window). */
  val WinnowW = 4

  /** Document-frequency cap on winnowed fingerprints (boilerplate
    * guard, same argument as [[MaxShingleDf]]).
    */
  val WinnowDfCap = 16

  /** Winnowing fingerprints (the local document-fingerprinting scheme
    * of Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
    * Document Fingerprinting", SIGMOD'03): hash every word
    * [[WinnowK]]-gram, slide a [[WinnowW]]-gram window, keep each
    * window's MINIMUM hash — the selected set is a ~2/(W+1)-density
    * sample of positions with the winnowing GUARANTEE: any verbatim
    * run of at least W+K-1 shared words contributes at least one
    * common fingerprint, so long plagiarized/boilerplate passages can
    * never slip between sampled positions (what a fixed-stride or
    * random sample cannot promise). Pairs are then counted through
    * the df-capped inverted fingerprint index — the standard
    * bucket-join shape, never all-pairs.
    *
    * Scale shape: gram hashing rides [[wordNgramStream]] (one codegen
    * scan, no shuffle); the window minimum is one (doc_id)-partitioned
    * window pass; the index is corpus-positions/(W+1)·2 rows instead
    * of every position, and [[WinnowDfCap]] bounds posting-list
    * fanout exactly like the shingle index's cap. Min-hash selection
    * is deterministic, so both engines pick identical fingerprints.
    */
  def winnowing(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val grams = wordNgramStream(docs, WinnowK, posCol = Some("i"))
      .select(col("doc_id"), col("i"), phash60(col("s")).as("g"))
    val wMin = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.currentRow, WinnowW - 1)
    val wCnt = Window.partitionBy(col("doc_id"))
    val fps = grams
      .withColumn("fp", min(col("g")).over(wMin))
      .withColumn("ng", count(lit(1)).over(wCnt))
      .filter(col("i") <= col("ng") - (WinnowW - 1)) // complete windows only
      .select(col("doc_id"), col("fp")).distinct()
    val capped = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= WinnowDfCap).select(col("fp"))
    val inv = fps.join(capped, "fp")
    inv.as("a").join(inv.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .orderBy(desc("shared"), col("doc_a"), col("doc_b"))
      .limit(25)
  }

  private val winnowingOracle = {
    val gram = (1 to WinnowK).map(o => s"ws[i+${o - 1}]").mkString(" || '_' || ")
    s"""WITH w AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       |g AS (
       |  SELECT doc_id, i, ${phash60Sql(gram)} AS g,
       |    len(ws) - ${WinnowK - 1} AS ng
       |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - ${WinnowK - 1})) AS i) u
       |  WHERE len(ws) >= $WinnowK),
       |m0 AS (
       |  SELECT doc_id, i, ng,
       |    min(g) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS fp
       |  FROM g),
       |fps AS (SELECT DISTINCT doc_id, fp FROM m0 WHERE i <= ng - ${WinnowW - 1}),
       |capped AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= $WinnowDfCap),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  JOIN capped c ON c.fp = a.fp
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, shared FROM pairs
       |ORDER BY shared DESC, doc_a, doc_b LIMIT 25""".stripMargin
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("text_line_dedup", lineDedup _, Some(lineDedupOracle),
      "line-level boilerplate removal: hashed line df index, drop lines shared by > N docs"),
    GraftQuery("dedup_winnowing", winnowing _, Some(winnowingOracle),
      "winnowing fingerprints (window-min k-gram hashes) + df-capped pair counting"),
    GraftQuery("dedup_semantic", semanticDedup _, Some(semanticDedupOracle),
      "SemDeDup: k-means cluster blocking + within-cluster exact cosine, drop higher id"),
    GraftQuery("dedup_exact", exact _, Some(exactOracle),
      "exact dedup by content hash"),
    GraftQuery("dedup_ngram_jaccard", ngramJaccard _, Some(ngramJaccardOracle),
      "near-dup pairs, exact 5-gram Jaccard via inverted-index join"),
    GraftQuery("dedup_containment", containment _, Some(containmentOracle),
      "asymmetric containment: short docs embedded in longer ones (Jaccard-blind)"),
    GraftQuery("dedup_edit_distance", editDistance _, Some(editDistanceOracle),
      "Levenshtein-verified near-dup pairs: shingle candidates gate the character-level DP"),
    GraftQuery("dedup_substring", substringRuns _, Some(substringOracle),
      "verbatim repeated token runs >= 12 via positional W-gram chain join"),
    GraftQuery("dedup_minhash_lsh", minhashLsh _, Some(minhashLshOracle),
      "MinHash(16) + 8-band LSH candidates + exact verify"),
    GraftQuery("dedup_simhash", simhash _, Some(simhashOracle),
      "32-bit SimHash signatures (portable hash)"),
    GraftQuery("dedup_embedding_cosine", embeddingCosine _, Some(embeddingCosineOracle),
      "embedding near-dup pairs, blocked exact cosine"),
    GraftQuery("dedup_clusters", dupClusters _, Some(dupClustersOracle),
      "connected components over the near-dup pair graph (keep-one-per-cluster)"),
    GraftQuery("dedup_keep_best", keepBest _, Some(keepBestOracle),
      "canonical survivor per dup cluster: quality desc, length desc, id asc"),
    GraftQuery("dedup_incremental", incremental _, Some(incrementalOracle),
      "new batch classified against the existing corpus fingerprint index"))
}
