package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables.t
import graft.operators.Dedup.{dfCapSql, shinglesSql}

/** Data-hygiene operators a 100 TB training-data pipeline runs before
  * anything is allowed into a training mix: benchmark decontamination
  * (n-gram overlap against an eval suite), repetition-based quality
  * metrics (the Gopher-style "fraction of characters in the most
  * common 2-gram" family), and PII detection/redaction.
  *
  * Portability rules match the rest of the suite: integer counts
  * everywhere, a SINGLE IEEE division per emitted fraction (rounded to
  * 12 places), total ORDER BY, identical column aliases both sides.
  *
  * Scale notes:
  *   - Decontamination joins the corpus's shingle index against the
  *     BENCHMARK side, which is tiny by construction (eval suites are
  *     KBs–MBs while the corpus is TBs) — so the bench shingle set is
  *     broadcast and the corpus is touched exactly once, scan-local.
  *     Reuses the shared df-capped [[Dedup.shingleIndex]]: a shingle
  *     shared by >MaxShingleDf documents is boilerplate, not evidence
  *     of contamination — the same stop-gram rule real decontam
  *     pipelines apply.
  *   - Repetition metrics are per-document map-side pipelines (split /
  *     explode / hash-agg on (doc_id, bigram)) — one shuffle on the
  *     natural key, no cross-document state.
  *   - PII redaction is a pure row-local projection (regexp in one
  *     whole-stage-codegen pass); at scale it runs at scan speed.
  */
object Hygiene {

  // ------------------------------------------------- overlap reports

  /** Shared tail of every shingle-overlap audit: given a scoped
    * (doc_id, s) stream and a distinct shingle set to test against,
    * emit per-document overlap count, shingle total, and fraction
    * (one division, 12 places), most-contaminated first. Used by both
    * [[decontamOverlap]] and [[splitLeakage]] so the two reports can
    * never drift in rounding or ordering.
    */
  private def overlapReport(scoped: DataFrame, shingleSet: DataFrame,
      fracCol: String): DataFrame = {
    val totals = scoped.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    // LEFT SEMI: each scoped row matches at most once, so the set side
    // needs no pre-distinct — callers pass the raw shingle stream and
    // skip that whole extra shuffle (dedup happens inside the join)
    scoped.join(shingleSet, Seq("s"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
      .join(totals, Seq("doc_id"))
      .select(col("doc_id"), col("n_overlap"), col("n_shingles"),
        round(col("n_overlap").cast("double") / col("n_shingles"), 12)
          .as(fracCol))
      .orderBy(desc("n_overlap"), col("doc_id"))
  }

  /** Oracle-side rendering of [[overlapReport]] over CTEs named
    * `corpusCte` (doc_id, s) and `setCte` (s).
    */
  private def overlapReportSql(corpusCte: String, setCte: String,
      fracCol: String): String =
    s"""totals AS (SELECT doc_id, count(*) AS n_shingles FROM $corpusCte GROUP BY 1),
       |ov AS (
       |  SELECT c.doc_id, count(*) AS n_overlap
       |  FROM $corpusCte c JOIN $setCte USING (s) GROUP BY 1)
       |SELECT doc_id, n_overlap, n_shingles,
       |  round(CAST(n_overlap AS DOUBLE) / n_shingles, 12) AS $fracCol
       |FROM ov JOIN totals USING (doc_id)
       |ORDER BY n_overlap DESC, doc_id""".stripMargin

  // ------------------------------------------------- decontamination

  /** Every 7th doc_id stands in for the benchmark/eval suite. */
  val BenchMod = 7

  /** Benchmark decontamination: flag corpus documents sharing ≥1
    * word-5-gram with the eval suite, with the overlap count and the
    * contaminated fraction of each document's shingle set. The shape —
    * corpus inverted index ⋈ broadcast benchmark n-gram set — is the
    * standard GPT-3/Llama-style decontamination pass.
    */
  def decontamOverlap(spark: SparkSession, dir: String): DataFrame = {
    val idx = Dedup.shingleIndex(spark, dir).select(col("doc_id"), col("s"))
    val bench = idx.filter(col("doc_id") % BenchMod === 0).select(col("s")).distinct()
    val corpus = idx.filter(col("doc_id") % BenchMod =!= 0)
    overlapReport(corpus, broadcast(bench), "contamination_frac")
  }

  private val decontamOverlapOracle =
    s"""WITH words AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, $shinglesSql AS sh FROM words WHERE len(w) >= 5),
       |e0 AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |e AS (SELECT doc_id, s FROM e0 WHERE s IN ($dfCapSql)),
       |bench AS (SELECT DISTINCT s FROM e WHERE doc_id % $BenchMod = 0),
       |corpus AS (SELECT doc_id, s FROM e WHERE doc_id % $BenchMod <> 0),
       |${overlapReportSql("corpus", "bench", "contamination_frac")}""".stripMargin

  // -------------------------------------------- cross-split leakage

  /** Train→test leakage audit: test-split documents sharing ≥1
    * df-capped 5-gram with any TRAIN-split document, under the REAL
    * hash split ([[Pipeline.splitAssign]]'s bucket function) — the
    * check a training run performs on its own split before shipping
    * eval numbers.
    *
    * Unlike [[decontamOverlap]] (tiny eval suite → forced broadcast),
    * the train side here is 80% of the corpus, so no broadcast is
    * forced: the equi-join on the shingle is left to Catalyst/AQE,
    * which broadcasts while the distinct train-shingle set fits the
    * threshold and falls back to the hash-partitioned inverted-index
    * join — whose bucket sizes the df cap bounds — when it doesn't.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(Dedup.phash(col("doc_id").cast("string")), lit(100))
    val idx = Dedup.shingleIndex(spark, dir)
      .select(col("doc_id"), col("s"), bucket.as("bucket"))
    // no distinct on the train side: the semi join dedups, so 80% of
    // the index skips a full pre-aggregation shuffle
    val trainSh = idx.filter(col("bucket") < 80).select(col("s"))
    val test = idx.filter(col("bucket") >= 90).select(col("doc_id"), col("s"))
    overlapReport(test, trainSh, "leak_frac")
  }

  private val splitLeakageOracle =
    s"""WITH words AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, $shinglesSql AS sh FROM words WHERE len(w) >= 5),
       |e0 AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       |e AS (
       |  SELECT doc_id, s,
       |    ${Dedup.phashSql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
       |  FROM e0 WHERE s IN ($dfCapSql)),
       |train_sh AS (SELECT DISTINCT s FROM e WHERE bucket < 80),
       |test AS (SELECT doc_id, s FROM e WHERE bucket >= 90),
       |${overlapReportSql("test", "train_sh", "leak_frac")}""".stripMargin

  // -------------------------------------------- repetition quality

  /** Gopher-style repetition metrics per document: duplicate-word
    * fraction and the fraction of (non-space) characters covered by
    * the most frequent word bigram. High values on either are the
    * classic machine-generated/boilerplate signal quality filters cut
    * on. Top-bigram tie-break is (count DESC, bigram ASC) so the
    * winner is deterministic cross-engine.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    // per-doc scalars are projected BEFORE the n-gram explode and ride
    // along every bigram row, so the whole query is ONE corpus scan
    // (stats as a separate branch would scan + re-split the corpus
    // twice); constant-per-doc, so min() in the agg recovers them
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"),
      size(split(col("text"), " ")).as("n_words"),
      size(array_distinct(split(col("text"), " "))).as("n_distinct_words"),
      length(translate(col("text"), " ", "")).as("n_word_chars"))
    val bigrams = Dedup.wordNgramStream(docs, 2, "_",
      Seq("doc_id", "n_words", "n_distinct_words", "n_word_chars"))
    val counted = bigrams
      .groupBy(col("doc_id"), col("s"))
      .agg(count(lit(1)).as("c"), min(col("n_words")).as("n_words"),
        min(col("n_distinct_words")).as("n_distinct_words"),
        min(col("n_word_chars")).as("n_word_chars"))
    val w = Window.partitionBy(col("doc_id")).orderBy(desc("c"), asc("s"))
    counted.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        round((col("n_words") - col("n_distinct_words")).cast("double") / col("n_words"), 12)
          .as("dup_word_frac"),
        col("s").as("top_bigram"), col("c").as("top_bigram_count"),
        round((col("c") * (length(col("s")) - 1)).cast("double") /
          col("n_word_chars"), 12).as("top_bigram_char_frac"))
      .orderBy("doc_id")
  }

  private val textRepetitionOracle =
    """WITH words AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    unnest([ w[i] || '_' || w[i+1] for i in generate_series(1, len(w)-1) ]) AS b
      |  FROM words WHERE len(w) >= 2),
      |bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
      |top AS (
      |  SELECT doc_id, b AS top_bigram, c AS top_bigram_count,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, b) AS rn
      |  FROM bgc),
      |stats AS (
      |  SELECT doc_id, CAST(len(w) AS INTEGER) AS n_words,
      |    CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct_words,
      |    length(replace(text, ' ', '')) AS n_word_chars
      |  FROM words)
      |SELECT s.doc_id, s.n_words, s.n_distinct_words,
      |  round(CAST(s.n_words - s.n_distinct_words AS DOUBLE) / s.n_words, 12) AS dup_word_frac,
      |  t.top_bigram, t.top_bigram_count,
      |  round(CAST(t.top_bigram_count * (length(t.top_bigram) - 1) AS DOUBLE) / s.n_word_chars, 12)
      |    AS top_bigram_char_frac
      |FROM stats s JOIN top t ON s.doc_id = t.doc_id AND t.rn = 1
      |ORDER BY s.doc_id""".stripMargin

  // ------------------------------------------------- PII redaction

  /** Conservative patterns valid in BOTH Java regex (Spark) and RE2
    * (DuckDB): no lookarounds, no backrefs.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\d{3}-\\d{4}"

  /** PII detect + redact. The fixture corpus is synthetic word-soup
    * with no organic PII, so deterministic PII is injected first
    * (emails on doc_id % 10 == 0, phone numbers on % 10 == 5) — the
    * operator under test is the detection/redaction projection, which
    * is a row-local single-pass regexp (codegen'd, scan-speed at any
    * scale). `redacted_hash` proves the redacted text is byte-exact
    * cross-engine, not just the match counts.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val aug = t(spark, dir, "documents").select(d,
      when(d % 10 === 0,
        concat(col("text"), lit(" contact user"), d.cast("string"),
          lit("@example.com for details")))
        .when(d % 10 === 5,
          concat(col("text"), lit(" call 555-"),
            lpad((d % 10000).cast("string"), 4, "0"), lit(" today")))
        .otherwise(col("text")).as("t"))
    aug.select(d,
      size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).as("n_phones"),
      md5(regexp_replace(regexp_replace(col("t"), lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit("<PHONE>"))).as("redacted_hash"))
      .filter(col("n_emails") + col("n_phones") > 0)
      .orderBy("doc_id")
  }

  // DuckDB regexp_replace is first-match-only without the 'g' flag;
  // Spark's is always global — the flag keeps them identical.
  private val piiRedactOracle =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 10 = 0
       |           THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com for details'
       |         WHEN doc_id % 10 = 5
       |           THEN text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
       |         ELSE text END AS t
       |  FROM documents),
       |red AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(t, '$EmailRe')) AS INTEGER) AS n_emails,
       |    CAST(len(regexp_extract_all(t, '$PhoneRe')) AS INTEGER) AS n_phones,
       |    regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
       |      '$PhoneRe', '<PHONE>', 'g') AS redacted
       |  FROM aug)
       |SELECT doc_id, n_emails, n_phones, md5(redacted) AS redacted_hash
       |FROM red WHERE n_emails + n_phones > 0
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------- semantic decontamination

  /** Flagging threshold for embedding-level decontamination: corpus
    * vectors whose cosine to ANY eval vector reaches this are
    * suspicious (chosen to be non-vacuous on the synthetic fixtures at
    * every SF; a production suite tunes it per eval benchmark).
    */
  val SemDecontamThreshold = 0.35

  /** EMBEDDING-level decontamination — the semantic complement of the
    * n-gram overlap audit ([[decontamOverlap]]): a paraphrased eval
    * item shares no 5-grams but still sits next to the benchmark in
    * embedding space. Corpus vectors are scored against the eval set
    * (vec_id < [[Similarity.NumQueries]], standing in for an embedded
    * eval suite) and every (vector, #eval hits, max cosine) at or over
    * [[SemDecontamThreshold]] is reported.
    *
    * Scale: the eval side is tiny by construction → broadcast; the
    * corpus is touched ONCE, scan-local, with the same two-phase
    * scoring as the dedup family (codegen float prefilter with a guard
    * band, exact-decimal rescore of survivors only — the filter is the
    * selective step, so almost nothing reaches the decimal path).
    */
  def decontamSemantic(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.embWithNorms(spark, dir)
    decontamSemanticOn(
      e.filter(col("vec_id") >= Similarity.NumQueries),
      e.filter(col("vec_id") < Similarity.NumQueries))
  }

  /** [[decontamSemantic]] over explicit corpus/eval `embWithNorms`
    * frames — the per-vector decision depends only on the vector and
    * the FIXED eval set, so the incremental curation state scores each
    * landing batch through this with bit-identical results to a full
    * corpus pass.
    */
  private[operators] def decontamSemanticOn(
      corpus: DataFrame, evalSet: DataFrame): DataFrame = {
    import graft.functions.VecExpressions.floatDot
    import Dedup.decimalDot
    val eval = evalSet
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nsq").as("q_nsq"))
    corpus
      .crossJoin(broadcast(eval))
      .filter(floatDot(col("q_emb"), col("embedding")) /
        (sqrt(col("q_nsq")) * sqrt(col("nsq"))) >= SemDecontamThreshold - 1e-6)
      .select(col("vec_id"),
        round(decimalDot(col("q_emb"), col("embedding")) /
          (sqrt(col("q_nsq")) * sqrt(col("nsq"))), 12).as("cos"))
      .filter(col("cos") >= SemDecontamThreshold)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_eval_hits"), max(col("cos")).as("max_cos"))
      .orderBy("vec_id")
  }

  private val decontamSemanticOracle =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |elems AS (
       |  SELECT vec_id, embedding[i] AS val, i FROM e,
       |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u),
       |norms AS (
       |  SELECT vec_id,
       |    CAST(sum(CAST(CAST(val AS DOUBLE) * CAST(val AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE) AS nsq
       |  FROM elems GROUP BY vec_id),
       |pairs AS (
       |  SELECT c.vec_id AS vec_id, q.vec_id AS q_id,
       |    CAST(sum(CAST(CAST(c.val AS DOUBLE) * CAST(q.val AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE) AS dot
       |  FROM elems c JOIN elems q ON c.i = q.i
       |    AND q.vec_id < ${Similarity.NumQueries} AND c.vec_id >= ${Similarity.NumQueries}
       |  GROUP BY 1, 2),
       |cos AS (
       |  SELECT p.vec_id,
       |    round(dot / (sqrt(nc.nsq) * sqrt(nq.nsq)), 12) AS cos
       |  FROM pairs p
       |  JOIN norms nc ON p.vec_id = nc.vec_id
       |  JOIN norms nq ON p.q_id = nq.vec_id)
       |SELECT vec_id, count(*) AS n_eval_hits, max(cos) AS max_cos
       |FROM cos WHERE cos >= $SemDecontamThreshold
       |GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------- registry

  /** Risky-class threshold: an equivalence class under the
    * quasi-identifier signature with fewer rows than this re-identifies
    * its members.
    */
  val KAnon: Int = 5

  /** K-anonymity audit with one local-recoding generalization step —
    * the privacy gate a dataset passes before release: rows group into
    * equivalence classes under the quasi-identifier signature (nation,
    * market segment, fine balance bucket); classes below k = [[KAnon]]
    * re-identify their members, so THEIR rows coarsen the balance
    * bucket 5× (local recoding — compliant classes keep full
    * resolution) and class sizes recompute over the mixed signature.
    * Output: per nation, the class counts and minimum class size (the
    * k actually attained) before and after generalization.
    *
    * All-integer: balance buckets divide SHIFTED non-negative cents
    * (Spark's `div` truncates toward zero while DuckDB's `//` floors,
    * so negative balances must never reach the division).
    *
    * Scale shape: two hash-aggs on the bounded QI signature space plus
    * one shuffle join of rows to their fine-class size — the row
    * stream is touched twice, no self-join; class cardinality (not row
    * count) bounds every later operator.
    */
  def kanonAudit(spark: SparkSession, dir: String): DataFrame = {
    val rows = t(spark, dir, "customer").select(
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("seg"),
      expr("(floor(c_acctbal * 100) + 100000L) div 100000L").as("fine_b"),
      expr("(floor(c_acctbal * 100) + 100000L) div 500000L").as("coarse_b"))
    val fine = rows.groupBy("nation", "seg", "fine_b")
      .agg(count(lit(1)).as("n")).withColumnRenamed("n", "fine_n")
    val recoded = rows.join(fine, Seq("nation", "seg", "fine_b"))
      .select(col("nation"), col("seg"),
        when(col("fine_n") < KAnon, col("coarse_b") * lit(-1L) - lit(1L))
          .otherwise(col("fine_b")).as("bucket"))
    val post = recoded.groupBy("nation", "seg", "bucket")
      .agg(count(lit(1)).as("post_n"))
    val preStats = fine.groupBy("nation").agg(
      count(lit(1)).as("n_classes"),
      min(col("fine_n")).as("k_before"),
      sum(when(col("fine_n") < KAnon, col("fine_n")).otherwise(0L)).as("rows_at_risk"))
    val postStats = post.groupBy("nation").agg(
      count(lit(1)).as("n_classes_post"),
      min(col("post_n")).as("k_after"),
      sum(when(col("post_n") < KAnon, col("post_n")).otherwise(0L)).as("rows_at_risk_post"))
    preStats.join(postStats, "nation").orderBy("nation")
  }

  private val kanonAuditOracle =
    s"""WITH rows_ AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS seg,
       |    (CAST(floor(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS fine_b,
       |    (CAST(floor(c_acctbal * 100) AS BIGINT) + 100000) // 500000 AS coarse_b
       |  FROM customer),
       |fine AS (
       |  SELECT nation, seg, fine_b, count(*) AS fine_n
       |  FROM rows_ GROUP BY 1, 2, 3),
       |recoded AS (
       |  SELECT r.nation AS nation, r.seg AS seg,
       |    CASE WHEN f.fine_n < $KAnon THEN r.coarse_b * -1 - 1 ELSE r.fine_b END AS bucket
       |  FROM rows_ r JOIN fine f
       |    ON r.nation = f.nation AND r.seg = f.seg AND r.fine_b = f.fine_b),
       |post AS (
       |  SELECT nation, seg, bucket, count(*) AS post_n
       |  FROM recoded GROUP BY 1, 2, 3),
       |pre_s AS (
       |  SELECT nation, count(*) AS n_classes, min(fine_n) AS k_before,
       |    sum(CASE WHEN fine_n < $KAnon THEN fine_n ELSE 0 END) AS rows_at_risk
       |  FROM fine GROUP BY 1),
       |post_s AS (
       |  SELECT nation, count(*) AS n_classes_post, min(post_n) AS k_after,
       |    sum(CASE WHEN post_n < $KAnon THEN post_n ELSE 0 END) AS rows_at_risk_post
       |  FROM post GROUP BY 1)
       |SELECT nation, n_classes, k_before, CAST(rows_at_risk AS BIGINT) AS rows_at_risk,
       |  n_classes_post, k_after, CAST(rows_at_risk_post AS BIGINT) AS rows_at_risk_post
       |FROM pre_s JOIN post_s USING (nation)
       |ORDER BY nation""".stripMargin

  // --------------------------------------- differentially-private release

  /** Per-document contribution clip for the noisy token-mass release —
    * THE bounded-sensitivity move: an unbounded sum has unbounded
    * sensitivity (one document could shift the statistic arbitrarily),
    * so each document contributes at most this many characters and the
    * mass noise is scaled by exactly this cap.
    */
  val DpMassCap = 2000L

  /** Small-cell suppression threshold, applied to the NOISY count (a
    * post-processing step, so it spends no extra privacy budget).
    */
  val DpSuppressK = 5L

  /** Symmetric-geometric noise (the discrete analog of Laplace, ε=ln 2
    * for a sensitivity-1 count) drawn deterministically from the
    * portable hash of (salt, release keys): sign from the low hash
    * bit, magnitude = trailing-zero count of the remaining bits —
    * P(mag = m) = 2^-(m+1), capped at 16 by OR-ing 2^16 in. All
    * integer bit arithmetic (`>>`, `&`, two's-complement lowest-set-
    * bit, `bit_count`), so both engines draw the identical noise and
    * the release is reproducible — the property a DP data-release
    * pipeline needs for audits (the "seeded noise" deployment; true
    * deployments key the salt by release epoch).
    */
  private def dpNoise(salt: String, keys: Column*): Column = {
    val h = Dedup.phash(concat_ws(":", (lit(salt) +: keys): _*))
    val x = shiftright(h, 1).bitwiseOR(lit(65536L))
    val mag = bit_count(x.bitwiseAND(lit(0L) - x) - lit(1L)).cast("long")
    when(pmod(h, lit(2)) === 1, mag).otherwise(-mag)
  }

  private def dpNoiseSql(salt: String): String = {
    val h = Dedup.phashSql(s"concat_ws(':', '$salt', lang, source, len_kb)")
    val x = s"((($h) >> 1) | 65536)"
    s"(CASE WHEN ($h) % 2 = 1 THEN 1 ELSE -1 END) * " +
      s"CAST(bit_count((($x) & -($x)) - 1) AS BIGINT)"
  }

  /** Differentially-private corpus statistics release: the per-(lang,
    * source, length-bucket) document counts and clipped character
    * masses a data owner can publish about a private training corpus.
    * Counts get unit-sensitivity symmetric-geometric noise; masses
    * clip each document's contribution at [[DpMassCap]] and scale the
    * same noise by the cap (the sensitivity); cells whose NOISY count
    * falls below [[DpSuppressK]] are suppressed entirely (count-based
    * suppression on the released value — post-processing, free under
    * DP). True counts never appear in the output.
    *
    * Scale shape: ONE hash-aggregation over the corpus (map-side
    * partials — the clip is scan-local arithmetic), then noise and
    * suppression run on the GROUPED frame, ≤ |cells| rows. Nothing
    * else touches the data.
    */
  def dpCounts(spark: SparkSession, dir: String): DataFrame = {
    val cells = t(spark, dir, "documents")
      .select(col("lang"), col("source"),
        least((col("n_chars") / 1000).cast("long"), lit(8L)).as("len_kb"),
        least(col("n_chars"), lit(DpMassCap)).as("clipped"))
      .groupBy("lang", "source", "len_kb")
      .agg(count(lit(1)).as("n_true"), sum(col("clipped")).as("mass_true"))
    cells.select(col("lang"), col("source"), col("len_kb"),
        greatest(col("n_true") + dpNoise("dpn", col("lang"), col("source"), col("len_kb")),
          lit(0L)).as("n_noisy"),
        greatest(col("mass_true") +
          dpNoise("dpm", col("lang"), col("source"), col("len_kb")) * lit(DpMassCap),
          lit(0L)).as("mass_noisy"))
      .filter(col("n_noisy") >= DpSuppressK)
      .orderBy("lang", "source", "len_kb")
  }

  private val dpCountsOracle =
    s"""WITH cells AS (
       |  SELECT lang, source,
       |    least(n_chars // 1000, 8) AS len_kb,
       |    count(*) AS n_true,
       |    CAST(sum(least(n_chars, $DpMassCap)) AS BIGINT) AS mass_true
       |  FROM documents GROUP BY 1, 2, 3),
       |noised AS (
       |  SELECT lang, source, len_kb,
       |    greatest(n_true + ${dpNoiseSql("dpn")}, 0) AS n_noisy,
       |    greatest(mass_true + ${dpNoiseSql("dpm")} * $DpMassCap, 0) AS mass_noisy
       |  FROM cells)
       |SELECT lang, source, len_kb, n_noisy, mass_noisy
       |FROM noised WHERE n_noisy >= $DpSuppressK
       |ORDER BY lang, source, len_kb""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("privacy_dp_counts", dpCounts _, Some(dpCountsOracle),
      "DP-style noisy release: clipped masses, symmetric-geometric noise, small-cell suppression"),
    GraftQuery("kanon_audit", kanonAudit _, Some(kanonAuditOracle),
      "k-anonymity audit + one local-recoding generalization: per-nation attained k before/after"),
    GraftQuery("decontam_semantic", decontamSemantic _, Some(decontamSemanticOracle),
      "embedding-level decontamination: corpus vs broadcast eval set, two-phase cosine"),
    GraftQuery("decontam_overlap", decontamOverlap _, Some(decontamOverlapOracle),
      "benchmark decontamination: corpus shingle index vs broadcast eval-suite n-grams"),
    GraftQuery("split_leakage", splitLeakage _, Some(splitLeakageOracle),
      "train-to-test shingle leakage under the real hash split (inverted-index join)"),
    GraftQuery("text_repetition", textRepetition _, Some(textRepetitionOracle),
      "Gopher-style repetition quality: dup-word and top-bigram char fractions"),
    GraftQuery("pii_redact", piiRedact _, Some(piiRedactOracle),
      "PII detect + redact: portable regex, byte-exact redaction proven by hash"))
}
