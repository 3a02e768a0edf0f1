package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables.t
import Dedup.{phash, phashSql, P}

/** Text-analysis operator family for training-data pipelines (EXT
  * surface): language-ID heuristic, quality scoring, token counting,
  * and document fingerprinting — all pure Column expressions (whole-
  * stage codegen, no UDFs) with bit-exact DuckDB oracles.
  */
object TextAnalysis {

  /** Public marker-word lists per language (tiny stopword heuristic).
    * Deliberately small and hardcoded — the operator demonstrates the
    * n-gram/stopword scoring mechanism, not lexicon quality.
    */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "que", "un"),
    "fr" -> Seq("le", "la", "et", "les", "est", "que", "un"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni", "ta", "zai"))

  private val langs = Markers.keys.toSeq.sorted

  /** The integer quality-point system (length in range +5, has
    * stopwords +3, low punctuation +2) as a Column over a text column —
    * the ONE definition `text_quality` and `curation_funnel` both
    * score with (and [[qualityPointsSql]] mirrors), so the gate and
    * the report can never silently disagree on what "quality" means.
    */
  def qualityPoints(text: Column): Column = {
    val words = split(text, " ")
    val nTokens = size(words)
    val nChars = length(text)
    val punct = nChars - length(regexp_replace(text, "[.,!?;:]", ""))
    val stop = size(filter(words, w => w.isin(Markers("en"): _*)))
    when(nTokens.between(30, 1000), lit(5)).otherwise(lit(0)) +
      when(stop > 0, lit(3)).otherwise(lit(0)) +
      when(punct.cast("double") / nChars < 0.1, lit(2)).otherwise(lit(0))
  }

  /** Oracle-side rendering of [[qualityPoints]] over a text SQL expr. */
  def qualityPointsSql(t: String): String = {
    val stopSet = Markers("en").map(x => s"'$x'").mkString(", ")
    s"""CASE WHEN len(string_split($t, ' ')) BETWEEN 30 AND 1000 THEN 5 ELSE 0 END +
       |   CASE WHEN len(list_filter(string_split($t, ' '), x -> x IN ($stopSet))) > 0 THEN 3 ELSE 0 END +
       |   CASE WHEN CAST(length($t) - length(regexp_replace($t, '[.,!?;:]', '', 'g')) AS DOUBLE)
       |        / length($t) < 0.1 THEN 2 ELSE 0 END""".stripMargin
  }

  // ------------------------------------------------------- language id

  /** Stopword-ratio language scoring: tokens matched against each
    * language's marker set; predicted language = argmax ratio with
    * alphabetical tiebreak. One explode + one groupBy (scales linearly;
    * marker sets broadcast as literals inside codegen'd CASE).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val tok = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), " ")).as("w"))
    val scores = langs.map { l =>
      (sum(when(col("w").isin(Markers(l): _*), 1).otherwise(0)).cast("double") /
        count(lit(1))).as(s"score_$l")
    }
    val agg = tok.groupBy(col("doc_id"), col("lang")).agg(scores.head, scores.tail: _*)
    // argmax with alphabetical tiebreak via a struct-max over (score, revLang)
    val best = langs.map(l => struct(col(s"score_$l").as("s"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    agg.select(col("doc_id"), col("lang"),
        best.getField("l").as("predicted"),
        round(best.getField("s"), 12).as("marker_ratio"))
      .orderBy("doc_id")
  }

  private val langIdOracle: String = {
    val scoreCols = langs.map { l =>
      val set = Markers(l).map(w => s"'$w'").mkString(", ")
      s"CAST(sum(CASE WHEN w IN ($set) THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS score_$l"
    }.mkString(",\n    ")
    // argmax with alphabetical tiebreak (strictly-greater chain keeps the
    // earlier language on ties, languages visited in sorted order)
    val best = langs.tail.foldLeft((s"score_${langs.head}", s"'${langs.head}'")) {
      case ((sExpr, lExpr), l) =>
        (s"CASE WHEN score_$l > ($sExpr) THEN score_$l ELSE ($sExpr) END",
          s"CASE WHEN score_$l > ($sExpr) THEN '$l' ELSE ($lExpr) END")
    }
    s"""WITH tok AS (
       |  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
       |  FROM documents),
       |scores AS (
       |  SELECT doc_id, lang,
       |    $scoreCols
       |  FROM tok GROUP BY doc_id, lang)
       |SELECT doc_id, lang, ${best._2} AS predicted,
       |  round(${best._1}, 12) AS marker_ratio
       |FROM scores ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------- quality scores

  /** Quality scoring: length, token stats, stopword ratio, punctuation
    * and digit density, plus a composite score — the standard cheap
    * pre-filters of a training-data pipeline.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val words = split(col("text"), " ")
    val nTokens = size(words)
    val nChars = length(col("text"))
    val punct = nChars - length(regexp_replace(col("text"), "[.,!?;:]", ""))
    val digits = nChars - length(regexp_replace(col("text"), "[0-9]", ""))
    val stop = size(filter(words, w => w.isin(Markers("en"): _*)))
    val meanWordLen = (nChars - (nTokens - lit(1))).cast("double") / nTokens
    d.select(
        col("doc_id"),
        nTokens.as("n_tokens"),
        nChars.cast("long").as("n_chars_computed"),
        round(meanWordLen, 12).as("mean_word_len"),
        (stop.cast("double") / nTokens).as("stopword_ratio"),
        (punct.cast("double") / nChars).as("punct_ratio"),
        (digits.cast("double") / nChars).as("digit_ratio"),
        // composite: in-range length & some stopwords & low noise.
        // Integer points / 10 — one fp division, no fp accumulation
        // (0.5+0.3+0.2 in binary fp is not exactly 1.0).
        (qualityPoints(col("text")).cast("double") / 10.0).as("quality_score"))
      .orderBy("doc_id")
  }

  private val qualityOracle: String = {
    val stopSet = Markers("en").map(w => s"'$w'").mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    length(text) AS n_chars_computed,
       |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
       |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits,
       |    len(list_filter(string_split(text, ' '), w -> w IN ($stopSet))) AS stop
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(n_tokens AS INTEGER) AS n_tokens,
       |  CAST(n_chars_computed AS BIGINT) AS n_chars_computed,
       |  round(CAST(n_chars_computed - (n_tokens - 1) AS DOUBLE) / n_tokens, 12) AS mean_word_len,
       |  CAST(stop AS DOUBLE) / n_tokens AS stopword_ratio,
       |  CAST(punct AS DOUBLE) / n_chars_computed AS punct_ratio,
       |  CAST(digits AS DOUBLE) / n_chars_computed AS digit_ratio,
       |  CAST(${qualityPointsSql("text")}
       |   AS DOUBLE) / 10.0 AS quality_score
       |FROM base ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------- token counting

  /** Token counting three ways: whitespace tokens, BPE-ish regex pieces
    * (word cores + punctuation singletons), and the chars/4 estimate
    * used for LLM budget planning.
    */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]', 0)")).as("bpe_ish_tokens"),
        ceil(length(col("text")).cast("double") / 4).cast("long").as("est_tokens"))
      .orderBy("doc_id")

  private val tokensOracle =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS INTEGER) AS bpe_ish_tokens,
      |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4) AS BIGINT) AS est_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- fingerprinting

  /** Document fingerprints: content digest, order-insensitive bag
    * digest (sorted distinct tokens), and an order-SENSITIVE positional
    * rolling hash (token hash × position, mod P) — the cheap shift-
    * detecting signature.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val words = split(lower(col("text")), " ")
    val posHash = aggregate(
      zip_with(words, sequence(lit(1), size(words)),
        (w, i) => pmod(pmod(phash(w), lit(P)) * pmod(i.cast("long"), lit(64)) + i.cast("long"), lit(P))),
      lit(0L), (acc, v) => pmod(acc + v, lit(P)))
    d.select(
        col("doc_id"),
        md5(col("text")).as("content_fp"),
        md5(concat_ws(" ", array_sort(array_distinct(words)))).as("bag_fp"),
        posHash.as("rolling_fp"))
      .orderBy("doc_id")
  }

  private val fingerprintOracle =
    s"""WITH w AS (
       |  SELECT doc_id, text, string_split(lower(text), ' ') AS words FROM documents),
       |e AS (
       |  SELECT doc_id, words[i] AS tok, i
       |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words))) AS i) u),
       |roll AS (
       |  SELECT doc_id,
       |    CAST(sum((${phashSql("tok")} % $P) * (i % 64) + i) % $P AS BIGINT) AS rolling_fp
       |  FROM e GROUP BY doc_id)
       |SELECT w.doc_id AS doc_id, md5(text) AS content_fp,
       |  md5(array_to_string(list_sort(list_distinct(words)), ' ')) AS bag_fp,
       |  roll.rolling_fp AS rolling_fp
       |FROM w JOIN roll ON w.doc_id = roll.doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- registry

  // ------------------------------------------------- corpus-level stats
  /** Corpus-level statistics per (lang, source): doc counts, vocabulary
    * size (distinct tokens — the two-level agg shape that scales:
    * distinct runs as partial/final hash-agg, never a global set on one
    * node), token totals, mean doc length.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val tok = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    tok.groupBy(col("lang"), col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        countDistinct(col("w")).as("vocab"),
        (count(lit(1)).cast("double") / countDistinct(col("doc_id"))).as("mean_doc_tokens"))
      .orderBy("lang", "source")
  }

  private val corpusStatsOracle =
    """SELECT lang, source,
      |  count(DISTINCT doc_id) AS n_docs,
      |  count(*) AS n_tokens,
      |  count(DISTINCT w) AS vocab,
      |  CAST(count(*) AS DOUBLE) / count(DISTINCT doc_id) AS mean_doc_tokens
      |FROM (SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS w
      |      FROM documents)
      |WHERE len(w) > 0
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ------------------------------------------- normalized exact dedup
  /** Exact dedup after text normalization (lowercase, punctuation and
    * whitespace collapse) — catches trivially-reformatted duplicates
    * that byte-exact hashing misses; same one-shuffle hash-groupBy
    * shape as [[Dedup.exact]].
    */
  def dedupNormalized(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[.,!?;:]", ""), " +", " "))
    t(spark, dir, "documents")
      .groupBy(md5(norm).as("norm_hash"))
      .agg(min(col("doc_id")).as("kept_doc_id"), count(lit(1)).as("dup_count"))
      .orderBy("kept_doc_id")
  }

  private val dedupNormalizedOracle =
    """SELECT md5(trim(regexp_replace(
      |    regexp_replace(lower(text), '[.,!?;:]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash,
      |  min(doc_id) AS kept_doc_id, count(*) AS dup_count
      |FROM documents
      |GROUP BY 1 ORDER BY kept_doc_id""".stripMargin

  // ----------------------------------------------- heavy hitters (MG)

  /** Misra-Gries counter budget for [[heavyHitters]]: every bigram
    * with relative frequency > 1/(HhK+1) ≈ 0.098% is guaranteed to
    * survive the sketch pass, so the 0.12% report threshold can have
    * no false negatives. Fixed k — the sketch state does NOT grow
    * with the corpus.
    */
  val HhK = 1024

  /** Report threshold as a fraction of total bigram occurrences. Must
    * stay above 1/(HhK+1) or the sketch guarantee no longer covers
    * the report set.
    */
  val HhSupport = 0.0012

  // Catalyst prunes the unused lang column from the shared tokenizer,
  // so the global query pays no extra scan width
  private def bigrams(spark: SparkSession, dir: String): DataFrame =
    langBigrams(spark, dir).select(col("t"))

  /** Corpus-wide frequent token bigrams (vocab/boilerplate discovery)
    * via the classic two-pass heavy hitters: pass 1 runs the
    * [[graft.functions.MisraGriesAgg]] bounded sketch (one scan, O(k)
    * state per partial, ≤ k entries of shuffle per partition — the
    * distinct-bigram stream NEVER shuffles) yielding ≤ k candidates +
    * the exact total; pass 2 rescans counting ONLY candidate rows (a
    * codegen'd InSet scan predicate before the tiny groupBy). Output
    * is exact — candidates ⊇ true hitters is the sketch guarantee —
    * unlike a plain groupBy whose shuffle carries every distinct key
    * (vocabulary-sized at 100 TB).
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val bg = bigrams(spark, dir)
    val pass1 = bg.agg(
      graft.functions.MisraGriesAgg.mgCandidates(col("t"), HhK).as("cand"),
      count(lit(1)).as("n")).collect()(0)
    val cand = pass1.getSeq[String](0)
    val n = pass1.getLong(1)
    // threshold compared in DOUBLE on both sides (IEEE multiply is
    // engine-independent; a ceil/round could split on the oracle)
    bg.filter(col("t").isin(cand: _*))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") >= lit(HhSupport) * n.toDouble)
      .select(col("t").as("bigram"), col("cnt"))
      .orderBy("bigram")
  }

  private val heavyHittersOracle =
    s"""WITH tok AS (
       |  SELECT string_split(text, ' ') AS a FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2),
       |bg AS (
       |  SELECT a[i] || ' ' || a[i + 1] AS t
       |  FROM tok, LATERAL (SELECT unnest(range(1, len(a))) AS i) u),
       |c AS (SELECT t, count(*) AS cnt FROM bg GROUP BY t),
       |tot AS (SELECT sum(cnt) AS n FROM c)
       |SELECT c.t AS bigram, c.cnt AS cnt
       |FROM c, tot
       |WHERE CAST(c.cnt AS DOUBLE) >= CAST($HhSupport AS DOUBLE) * CAST(tot.n AS DOUBLE)
       |ORDER BY bigram""".stripMargin

  /** Count-Min sketch depth (pairwise-independent hash rows). */
  val CmsDepth = 4

  /** Count-Min sketch width (cells per row). */
  val CmsWidth = 2048

  /** Count-Min hash modulus (2^31 − 1, prime): row hashes are
    * `((a_j·(h mod P) + b_j) mod P) mod W` over the 60-bit token hash
    * — every product stays under 2^62, so BIGINT arithmetic is exact
    * in both engines.
    */
  val CmsP = 2147483647L

  private val CmsA = Seq(1103515245L, 69069L, 1664525L, 22695477L)
  private val CmsB = Seq(12345L, 362437L, 1013904223L, 1L)

  /** Count-Min frequency sketch next to [[heavyHitters]]' Misra-Gries:
    * MG answers "which keys are frequent", CMS answers "how frequent
    * is THIS key" for any key, in D·W integers of mergeable state
    * (cells are counts — two corpora's sketches ADD). The sketch IS a
    * grouped count: each token occurrence emits its D (row, cell)
    * coordinates scan-locally and ONE hash-agg over ≤ D·W = 8192
    * groups builds the matrix — at 100 TB the shuffle carries the
    * matrix, never tokens. The gate probes the 20 exact-top tokens and
    * reports estimate vs exact: CMS never underestimates, and the
    * collision bias surfaces as `overcount = est − exact ≥ 0`.
    */
  def freqCms(spark: SparkSession, dir: String): DataFrame = {
    val tok = t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .select(col("w"), Dedup.phash60(col("w")).as("h"))
      .localCheckpoint(true)
    try {
      val coords = (0 until CmsDepth).map(j =>
        struct(lit(j).as("j"),
          (((lit(CmsA(j)) * (col("h") % CmsP) + CmsB(j)) % CmsP) % CmsWidth).as("cell")))
      val cms = tok.select(explode(array(coords: _*)).as("c"))
        .groupBy(col("c.j").as("j"), col("c.cell").as("cell"))
        .agg(count(lit(1)).as("cnt"))
      val top = tok.groupBy(col("w"), col("h"))
        .agg(count(lit(1)).as("exact_n"))
        .orderBy(desc("exact_n"), col("w"))
        .limit(20)
      val probes = (0 until CmsDepth).map(j =>
        struct(lit(j).as("j"),
          (((lit(CmsA(j)) * (col("h") % CmsP) + CmsB(j)) % CmsP) % CmsWidth).as("cell")))
      top.select(col("w"), col("exact_n"), explode(array(probes: _*)).as("c"))
        .join(broadcast(cms), col("c.j") === cms("j") && col("c.cell") === cms("cell"))
        .groupBy(col("w"), col("exact_n"))
        .agg(min(col("cnt")).as("cms_n"))
        .select(col("w").as("token"), col("exact_n"), col("cms_n"),
          (col("cms_n") - col("exact_n")).as("overcount"))
        .orderBy(desc("exact_n"), col("token"))
    } finally tok.unpersist()
  }

  private val freqCmsOracle = {
    def cellOf(j: Int) = s"((${CmsA(j)} * (h % $CmsP) + ${CmsB(j)}) % $CmsP) % $CmsWidth"
    val coordRows = (0 until CmsDepth).map(j =>
      s"SELECT $j AS j, ${cellOf(j)} AS cell, h FROM tok").mkString("\n  UNION ALL ")
    s"""WITH tok AS (
       |  SELECT u.w AS w, ${Dedup.phash60Sql("u.w")} AS h
       |  FROM documents, LATERAL unnest(string_split(text, ' ')) u(w)),
       |coords AS (
       |  $coordRows),
       |cms AS (SELECT j, cell, count(*) AS cnt FROM coords GROUP BY j, cell),
       |top AS (
       |  SELECT w, h, count(*) AS exact_n FROM tok GROUP BY w, h
       |  ORDER BY exact_n DESC, w LIMIT 20),
       |est AS (
       |  SELECT t.w, t.exact_n, min(cms.cnt) AS cms_n
       |  FROM top t, range(0, $CmsDepth) r(j)
       |  JOIN cms ON cms.j = r.j
       |   AND cms.cell = ((CASE r.j ${(0 until CmsDepth).map(j => s"WHEN $j THEN ${CmsA(j)} * (t.h % $CmsP) + ${CmsB(j)}").mkString(" ")} END) % $CmsP) % $CmsWidth
       |  GROUP BY t.w, t.exact_n)
       |SELECT w AS token, exact_n, cms_n, cms_n - exact_n AS overcount
       |FROM est ORDER BY exact_n DESC, token""".stripMargin
  }

  /** Per-language report threshold for [[heavyHittersByLang]] — above
    * 1/(HhK+1) so the per-GROUP sketch guarantee covers it.
    */
  val HhLangSupport = 0.0014

  private def langBigrams(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("lang"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(a) - 2), i -> concat(a[i], ' ', a[i + 1]))")).as("t"))

  /** GROUPED heavy hitters: frequent bigrams PER LANGUAGE — the sketch
    * as a grouped aggregate. Pass 1 is one groupBy carrying ≤ k
    * counter entries per (partition, group) through the shuffle (the
    * per-group distinct-key stream still never shuffles); the per-group
    * candidate sets + totals are driver-bounded at #groups × k. Pass 2
    * rescans behind a BROADCAST semi join on (group, candidate) — the
    * grouped analog of the global query's InSet predicate — then exact
    * counts filter at each group's own threshold.
    */
  def heavyHittersByLang(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bg = langBigrams(spark, dir)
    val pass1 = bg.groupBy(col("lang"))
      .agg(graft.functions.MisraGriesAgg.mgCandidates(col("t"), HhK).as("cand"),
        count(lit(1)).as("n"))
      .collect()
    val candDf = pass1.toSeq
      .flatMap(r => r.getSeq[String](1).map(tt => (r.getString(0), tt)))
      .toDF("lang", "t")
    val thresholds = pass1.toSeq
      .map(r => (r.getString(0), HhLangSupport * r.getLong(2).toDouble))
      .toDF("lang", "thresh")
    bg.join(broadcast(candDf), Seq("lang", "t"), "left_semi")
      .groupBy(col("lang"), col("t"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(thresholds), "lang")
      .filter(col("cnt").cast("double") >= col("thresh"))
      .select(col("lang"), col("t").as("bigram"), col("cnt"))
      .orderBy("lang", "bigram")
  }

  /** How many top-lift supported bigrams [[collocations]] reports. */
  val CollocTopN = 50

  /** Collocation extraction (phrase/vocabulary discovery — the
    * multi-word-expression mining step of a tokenizer pipeline): the
    * top-N support-filtered bigrams ranked by POINTWISE LIFT, the PMI
    * argument `N·c(w1,w2) / (c(w1)·c(w2))` — observed pair frequency
    * over the independence expectation — computed as one IEEE double
    * expression (exact integer inputs, identical operation order on
    * both engines, so the gate hash-compares the doubles bit-for-bit;
    * the log is monotone, so lift ranks exactly as PMI does). The
    * top-N rank breaks lift ties on (w1, w2), making the report a
    * deterministic total order; the rank window runs over the ≤ k
    * supported bigrams, never the corpus, so its single partition is
    * sketch-bounded, not data-bounded.
    *
    * Scale shape mirrors [[heavyHitters]]: the support floor makes the
    * Misra-Gries candidate set PROVABLY complete (any bigram at
    * support ≥ 1/(k+1) of the stream survives the sketch), so pass 1
    * is one O(k)-state scan — the distinct-bigram stream never
    * shuffles; pass 2 rescans counting only the ≤ k candidate bigrams
    * and their ≤ 2k member words behind broadcast InSet predicates.
    * Unigram counts for the vocabulary at large are never aggregated —
    * only the candidates' members — so no vocabulary-sized shuffle
    * exists anywhere.
    */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
    val bg = bigrams(spark, dir)
    val pass1 = bg.agg(
      graft.functions.MisraGriesAgg.mgCandidates(col("t"), HhK).as("cand"),
      count(lit(1)).as("nb")).collect()(0)
    val cand = pass1.getSeq[String](0)
    val nb = pass1.getLong(1)
    val words = cand.flatMap(_.split(" ", 2)).distinct
    val nTok = toks.agg(count(lit(1))).collect()(0).getLong(0)
    val wc = toks.filter(col("w").isin(words: _*))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val sup = bg.filter(col("t").isin(cand: _*))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt_pair"))
      .filter(col("cnt_pair").cast("double") >= lit(HhSupport) * nb.toDouble)
      .withColumn("w1", element_at(split(col("t"), " ", 2), 1))
      .withColumn("w2", element_at(split(col("t"), " ", 2), 2))
    val lift = col("cnt_pair").cast("double") * lit(nTok.toDouble) /
      (col("cnt_w1").cast("double") * col("cnt_w2").cast("double"))
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("lift").desc, col("w1"), col("w2"))
    sup
      .join(broadcast(wc.select(col("w").as("w1"), col("cw").as("cnt_w1"))), "w1")
      .join(broadcast(wc.select(col("w").as("w2"), col("cw").as("cnt_w2"))), "w2")
      .withColumn("lift", lift)
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= CollocTopN)
      .select(col("rank"), col("w1"), col("w2"), col("cnt_pair"),
        col("cnt_w1"), col("cnt_w2"), col("lift"))
      .orderBy("rank")
  }

  private val collocationsOracle =
    s"""WITH tok AS (SELECT string_split(text, ' ') AS a FROM documents),
       |words AS (SELECT unnest(a) AS w FROM tok),
       |wc AS (SELECT w, count(*) AS cw FROM words GROUP BY w),
       |ntok AS (SELECT count(*) AS n FROM words),
       |bg AS (
       |  SELECT a[i] || ' ' || a[i + 1] AS t
       |  FROM (SELECT a FROM tok WHERE len(a) >= 2) s,
       |       LATERAL (SELECT unnest(range(1, len(a))) AS i) u),
       |c AS (SELECT t, count(*) AS cnt FROM bg GROUP BY t),
       |nb AS (SELECT sum(cnt) AS n FROM c),
       |sup AS (
       |  SELECT split_part(t, ' ', 1) AS w1, split_part(t, ' ', 2) AS w2, cnt
       |  FROM c, nb
       |  WHERE CAST(cnt AS DOUBLE) >= CAST($HhSupport AS DOUBLE) * CAST(nb.n AS DOUBLE))
       |SELECT CAST(row_number() OVER (ORDER BY lift DESC, w1, w2) AS BIGINT) AS rank,
       |  w1, w2, cnt_pair, cnt_w1, cnt_w2, lift
       |FROM (
       |  SELECT sup.w1, sup.w2, sup.cnt AS cnt_pair, x.cw AS cnt_w1, y.cw AS cnt_w2,
       |    CAST(sup.cnt AS DOUBLE) * CAST(ntok.n AS DOUBLE)
       |      / (CAST(x.cw AS DOUBLE) * CAST(y.cw AS DOUBLE)) AS lift
       |  FROM sup JOIN wc x ON sup.w1 = x.w JOIN wc y ON sup.w2 = y.w, ntok) z
       |QUALIFY rank <= $CollocTopN
       |ORDER BY rank""".stripMargin

  private val heavyHittersByLangOracle =
    s"""WITH tok AS (
       |  SELECT lang, string_split(text, ' ') AS a FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2),
       |bg AS (
       |  SELECT lang, a[i] || ' ' || a[i + 1] AS t
       |  FROM tok, LATERAL (SELECT unnest(range(1, len(a))) AS i) u),
       |c AS (SELECT lang, t, count(*) AS cnt FROM bg GROUP BY lang, t),
       |tot AS (SELECT lang, sum(cnt) AS n FROM c GROUP BY lang)
       |SELECT c.lang, c.t AS bigram, c.cnt AS cnt
       |FROM c JOIN tot ON c.lang = tot.lang
       |WHERE CAST(c.cnt AS DOUBLE) >= CAST($HhLangSupport AS DOUBLE) * CAST(tot.n AS DOUBLE)
       |ORDER BY c.lang, bigram""".stripMargin

  // -------------------------------------- corpus-LM quality scoring

  /** Corpus-LM quality score (the CCNet/perplexity-filter step of a
    * training-data pipeline) as an INTEGER bit-cost proxy: each doc
    * bigram (w1, w2) costs `len2(c1(w1)) − len2(c2(w1, w2))` bits,
    * where `len2(x)` = binary-digit count = ⌊log2 x⌋ + 1 and c1/c2 are
    * corpus predecessor/bigram counts — an integer-arithmetic stand-in
    * for −log2 p(w2|w1) (within 1 bit of it, monotone in the ratio).
    * A doc's score is its mean bigram cost: low = predictable
    * boilerplate-ish text, high = rare transitions. Transcendental-free
    * on purpose (the [[Profiling]] drift report's rule): a real log
    * differs in final ulps across libm implementations and would break
    * the bit-exact oracle; `conv(x, 10, 2)`/`bin(x)` string lengths
    * are exact in both engines. The averaging division is one IEEE
    * double op over two exact integers — identical everywhere.
    *
    * Plan shape at 100 TB: tokens explode scan-locally; every
    * groupBy/join keys on a [[Dedup.phash60]] of the word/bigram, so
    * the count-table shuffles and the scoring join carry 8-byte keys,
    * never token text. Cost rows join c2/c1 in two hash joins — no
    * driver state, no per-doc collect; the count tables are the same
    * corpus-bounded cardinality every n-gram consumer here shuffles.
    * (Corpus = scoring target here, so every bigram is seen ≥ 1 —
    * scoring a doc set against a FOREIGN corpus LM adds the standard
    * uniform-backoff branch on the left join's null.)
    */
  /** The gated query reads the PERSISTED count tables ([[LmIndex]],
    * built once at ingest like the shingle/cluster indexes) — only the
    * per-doc hash stream is computed at query time. Served counts are
    * identical to the inline aggregation (LmIndexSpec), so the oracle
    * is unchanged.
    */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val (c1, c2) = LmIndex.counts(spark, dir)
    lmScoreJoin(bigramHashStream(t(spark, dir, "documents")), c1, c2)
  }

  /** The shared (doc_id, h1, h2) bigram-hash stream: one scan-local
    * explode, 8-byte [[Dedup.phash60]] keys for predecessor and bigram.
    */
  private[operators] def bigramHashStream(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, concat(a[i], ' ', a[i + 1]) AS t))")).as("p"))
      .select(col("doc_id"),
        Dedup.phash60(col("p.w1")).as("h1"),
        Dedup.phash60(col("p.t")).as("h2"))

  private def len2(c: Column): Column = length(conv(c, 10, 2))

  /** Scoring join shared by the inline and index-served paths. */
  private def lmScoreJoin(bg: DataFrame, c1: DataFrame, c2: DataFrame): DataFrame =
    bg.join(c2, "h2").join(c1, "h1")
      .select(col("doc_id"), (len2(col("c1")) - len2(col("c2"))).as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("bits")).cast("double") / count(lit(1))).as("avg_bits"))
      .orderBy("doc_id")

  private[operators] def lmScoreOn(docs: DataFrame): DataFrame = {
    // one materialization (3 numeric cols/row): the c1/c2 count aggs
    // and the scoring join all consume this stream, and recomputing it
    // means tokenizing + hashing the corpus three times
    val bg = bigramHashStream(docs).localCheckpoint(true)
    val c2 = bg.groupBy(col("h2")).agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy(col("h1")).agg(count(lit(1)).as("c1"))
    lmScoreJoin(bg, c1, c2)
  }

  /** Batch-perceptron rounds [[qualityClassifier]] trains. */
  val PerceptronRounds = 4

  /** Per-feature cap keeping perceptron features small integers. */
  val FeatureCap = 20

  /** Quality-classifier TRAINING — the fasttext-style linear-filter
    * step of a production pipeline, here as a batch perceptron
    * distilling the rule-based gate ([[qualityPoints]] ≥ 8 as the
    * teacher label) into a learned weight vector over five capped
    * INTEGER features (bias, token-count bucket, stopword hits,
    * punctuation count, char-count bucket). Integer features + integer
    * updates keep every weight and dot product bit-exact cross-engine
    * — no sigmoid, no float gradient, yet the real training loop
    * shape: K full-batch rounds, each updating `w += Σ y·x` over the
    * currently misclassified set.
    *
    * Output is the training curve + learned artifact: per round, the
    * misclassified count entering the round and the weights leaving
    * it. Not a convergence claim (the teacher need not be separable in
    * these features) — determinism is the gate.
    *
    * Scale: the feature frame is ONE scan materialized once
    * ([[org.apache.spark.sql.Dataset.localCheckpoint]], the
    * Lloyd-round pattern); each round is one filtered aggregation to a
    * 1-row driver collect (broadcast weights as literals), so K rounds
    * cost K aggregation jobs regardless of corpus size.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qualityClassifierOn(spark, t(spark, dir, "documents"))

  /** Perceptron feature frame: five capped integer features + the
    * teacher label, with pass-through columns for downstream grouping.
    */
  private def perceptronFeatures(docs: DataFrame, carry: Seq[String]): DataFrame = {
    val words = split(col("text"), " ")
    val stops = size(filter(words, w => w.isin(Markers("en"): _*)))
    val punct = length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))
    docs.select(carry.map(col) ++ Seq(
      lit(1L).as("x0"),
      least(expr("size(split(text, ' ')) DIV 25"), lit(FeatureCap)).cast("long").as("x1"),
      least(stops, lit(FeatureCap)).cast("long").as("x2"),
      least(punct, lit(FeatureCap)).cast("long").as("x3"),
      least(expr("length(text) DIV 50"), lit(FeatureCap)).cast("long").as("x4"),
      when(qualityPoints(col("text")) >= 8, 1L).otherwise(-1L).as("y")): _*)
  }

  /** Run the K training rounds over a materialized feature frame;
    * returns (per-round curve, final weights).
    */
  private def perceptronTrain(
      f: DataFrame): (Seq[(Long, Long, Long, Long, Long, Long, Long)], Array[Long]) = {
    val w = Array.fill(5)(0L)
    val rows = (1 to PerceptronRounds).map { k =>
      val dot = (0 to 4).map(i => col(s"x$i") * lit(w(i))).reduce(_ + _)
      val r = f.filter(col("y") * dot <= 0)
        .agg(count(lit(1)).as("n"),
          sum(col("y") * col("x0")), sum(col("y") * col("x1")),
          sum(col("y") * col("x2")), sum(col("y") * col("x3")),
          sum(col("y") * col("x4")))
        .collect()(0)
      (0 to 4).foreach(i => w(i) += (if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)))
      (k.toLong, r.getLong(0), w(0), w(1), w(2), w(3), w(4))
    }
    (rows, w)
  }

  private[operators] def qualityClassifierOn(
      spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val f = perceptronFeatures(docs, Nil).localCheckpoint(true)
    try {
      val (rows, _) = perceptronTrain(f)
      rows.toDF("step", "n_mis", "w_bias", "w_len", "w_stop", "w_punct", "w_chars")
        .orderBy("step")
    } finally f.unpersist()
  }

  /** The classifier's APPLY side — train → deploy in one gated plan
    * (the [[bpeMerges]]/[[bpeTokenize]] pairing, for the quality
    * filter): the K training rounds produce the weight vector (a
    * driver-side artifact, as a shipped model is), then ONE scan-local
    * projection scores every document — keep = w·x > 0 — and a
    * hash-agg reports the per-source filter outcome plus agreement
    * with the rule-based teacher. At scale ONE corpus scan
    * materializes the 6-integer feature frame; the K training
    * aggregations and the final scoring projection all run over that
    * materialization, never the text again. The oracle re-derives the
    * identical weights through the same unrolled integer CTE chain.
    */
  def qualityClassifierApply(spark: SparkSession, dir: String): DataFrame =
    qualityClassifierApplyOn(spark, t(spark, dir, "documents"))

  private[operators] def qualityClassifierApplyOn(
      spark: SparkSession, docs: DataFrame): DataFrame = {
    val f = perceptronFeatures(docs, Seq("source")).localCheckpoint(true)
    try {
      val (_, w) = perceptronTrain(f)
      val dot = (0 to 4).map(i => col(s"x$i") * lit(w(i))).reduce(_ + _)
      f.withColumn("pred_keep", dot > 0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pred_keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("pred_keep") === (col("y") > 0), 1L).otherwise(0L))
            .as("n_agree"))
        .orderBy("source")
    } finally f.unpersist()
  }

  /** Shared trainer CTE chain (feature frame `f` with `source`
    * carried, zero weights `p0`, then `m1/p1 .. mK/pK`) — the training
    * curve and the apply query both build on it.
    */
  private val qualityOracleCtes: String = {
    val stopSet = Markers("en").map(x => s"'$x'").mkString(", ")
    val rounds = (1 to PerceptronRounds).map { k =>
      s"""m$k AS (
         |  SELECT count(*) AS n,
         |    CAST(coalesce(sum(y * x0), 0) AS BIGINT) AS db,
         |    CAST(coalesce(sum(y * x1), 0) AS BIGINT) AS dl,
         |    CAST(coalesce(sum(y * x2), 0) AS BIGINT) AS ds,
         |    CAST(coalesce(sum(y * x3), 0) AS BIGINT) AS dp,
         |    CAST(coalesce(sum(y * x4), 0) AS BIGINT) AS dc
         |  FROM f, p${k - 1}
         |  WHERE y * (wb*x0 + wl*x1 + ws*x2 + wp*x3 + wc*x4) <= 0),
         |p$k AS (
         |  SELECT p.wb + m.db AS wb, p.wl + m.dl AS wl, p.ws + m.ds AS ws,
         |    p.wp + m.dp AS wp, p.wc + m.dc AS wc
         |  FROM p${k - 1} p, m$k m)""".stripMargin
    }.mkString(",\n")
    s"""f AS (
       |  SELECT source,
       |    CAST(1 AS BIGINT) AS x0,
       |    CAST(least(len(string_split(text, ' ')) // 25, $FeatureCap) AS BIGINT) AS x1,
       |    CAST(least(len(list_filter(string_split(text, ' '), x -> x IN ($stopSet))),
       |      $FeatureCap) AS BIGINT) AS x2,
       |    CAST(least(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')),
       |      $FeatureCap) AS BIGINT) AS x3,
       |    CAST(least(length(text) // 50, $FeatureCap) AS BIGINT) AS x4,
       |    CAST(CASE WHEN ${qualityPointsSql("text")} >= 8
       |         THEN 1 ELSE -1 END AS BIGINT) AS y
       |  FROM documents),
       |p0 AS (
       |  SELECT CAST(0 AS BIGINT) AS wb, CAST(0 AS BIGINT) AS wl,
       |    CAST(0 AS BIGINT) AS ws, CAST(0 AS BIGINT) AS wp,
       |    CAST(0 AS BIGINT) AS wc),
       |$rounds""".stripMargin
  }

  private val qualityClassifierOracle: String = {
    val out = (1 to PerceptronRounds).map { k =>
      s"SELECT CAST($k AS BIGINT) AS step, m$k.n AS n_mis, p$k.wb AS w_bias, p$k.wl AS w_len, " +
        s"p$k.ws AS w_stop, p$k.wp AS w_punct, p$k.wc AS w_chars FROM m$k, p$k"
    }.mkString("\n  UNION ALL ")
    s"""WITH $qualityOracleCtes
       |SELECT * FROM (
       |  $out
       |) ORDER BY step""".stripMargin
  }

  private val qualityClassifierApplyOracle: String = {
    val dot = "wb*x0 + wl*x1 + ws*x2 + wp*x3 + wc*x4"
    s"""WITH $qualityOracleCtes
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN $dot > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN ($dot > 0) = (y > 0) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_agree
       |FROM f, p$PerceptronRounds
       |GROUP BY source ORDER BY source""".stripMargin
  }

  /** The classifier lifecycle's EVALUATION leg (train → apply →
    * EVALUATE, what any deployed filter publishes before it gates
    * data): per-source confusion matrix of the learned gate against
    * the rule-based teacher, with precision/recall/F1. The counts are
    * pure integers; each metric is ONE guarded IEEE division of exact
    * integers (null where its denominator is 0, never an engine-
    * specific inf), so the whole report is bit-portable.
    *
    * Scale: same shape as [[qualityClassifierApply]] — the feature
    * frame is ONE materialized scan, training is K 1-row aggregations,
    * and the evaluation itself is one hash-agg by source over the
    * already-materialized features.
    */
  def qualityClassifierEval(spark: SparkSession, dir: String): DataFrame =
    qualityClassifierEvalOn(spark, t(spark, dir, "documents"))

  private[operators] def qualityClassifierEvalOn(
      spark: SparkSession, docs: DataFrame): DataFrame = {
    val f = perceptronFeatures(docs, Seq("source")).localCheckpoint(true)
    try {
      val (_, w) = perceptronTrain(f)
      val dot = (0 to 4).map(i => col(s"x$i") * lit(w(i))).reduce(_ + _)
      f.withColumn("pred", dot > 0).withColumn("pos", col("y") > 0)
        .groupBy(col("source"))
        .agg(
          sum(when(col("pred") && col("pos"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("pred") && !col("pos"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("pred") && col("pos"), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("pred") && !col("pos"), 1L).otherwise(0L)).as("tn"))
        .select(col("source"), col("tp"), col("fp"), col("fn"), col("tn"),
          when(col("tp") + col("fp") > 0,
            round(col("tp").cast("double") / (col("tp") + col("fp")), 12)).as("prec"),
          when(col("tp") + col("fn") > 0,
            round(col("tp").cast("double") / (col("tp") + col("fn")), 12)).as("rec"),
          when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
            round((lit(2L) * col("tp")).cast("double") /
              (lit(2L) * col("tp") + col("fp") + col("fn")), 12)).as("f1"))
        .orderBy("source")
    } finally f.unpersist()
  }

  private val qualityClassifierEvalOracle: String = {
    val dot = "wb*x0 + wl*x1 + ws*x2 + wp*x3 + wc*x4"
    s"""WITH $qualityOracleCtes,
       |scored AS (
       |  SELECT source, y, $dot AS d FROM f, p$PerceptronRounds),
       |cm AS (
       |  SELECT source,
       |    CAST(sum(CASE WHEN d > 0 AND y > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN d > 0 AND y < 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN d <= 0 AND y > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN d <= 0 AND y < 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM scored GROUP BY source)
       |SELECT source, tp, fp, fn, tn,
       |  CASE WHEN tp + fp > 0
       |    THEN round(CAST(tp AS DOUBLE) / (tp + fp), 12) END AS prec,
       |  CASE WHEN tp + fn > 0
       |    THEN round(CAST(tp AS DOUBLE) / (tp + fn), 12) END AS rec,
       |  CASE WHEN 2 * tp + fp + fn > 0
       |    THEN round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 12) END AS f1
       |FROM cm ORDER BY source""".stripMargin
  }

  /** Number of BPE merge rules [[bpeMerges]] learns. */
  val BpeMergeRounds = 6

  /** BPE tokenizer TRAINING — the classic Sennrich trainer loop over
    * the word-count vocabulary (the input real BPE trainers use: a
    * vocabulary-sized table, never the corpus): count adjacent symbol
    * pairs weighted by word frequency, merge the most frequent pair in
    * every word (left-to-right, non-overlapping), repeat. Output is
    * the learned merge table (step, symbols, pair count) — the
    * artifact a tokenizer ships.
    *
    * Portability is the hard part, solved by ENCODING: a word's symbol
    * sequence is a string with two-space separators
    * (`"  l  o  w  "`), and applying merge (L, R) is
    * `replace(v, " L  R ", " LR ")` — the single-space-flanked pattern
    * lets adjacent matches share a boundary, and literal `replace` is
    * left-to-right non-overlapping with IDENTICAL semantics in Java
    * and DuckDB, so both engines re-segment identically ("a a a" →
    * "aa a", verified). Ties break (count desc, left asc, right asc) —
    * total, so the learned rules are unique. The per-round argmax is a
    * 1-row driver collect (the [[Clustering]] Lloyd-round pattern);
    * each round is one explode + one hash agg + one map over the
    * vocabulary.
    */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMergesOn(spark, t(spark, dir, "documents"))

  private[operators] def bpeMergesOn(
      spark: SparkSession, docs: DataFrame,
      rounds: Int = BpeMergeRounds): DataFrame = {
    import spark.implicits._
    var vocab = bpeVocab(docs)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= rounds && !exhausted) {
      val best = bpePairCounts(vocab)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        learned += ((k, l, r, c))
        vocab = bpeApply(vocab, Seq((l, r))).localCheckpoint(true)
        k += 1
      }
    }
    learned.toSeq.toDF("step", "merge_left", "merge_right", "pair_count")
      .orderBy("step")
  }

  /** Word-count vocabulary in the two-space symbol encoding. */
  private def bpeVocab(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(concat(lit("  "), regexp_replace(col("w"), "(.)", "$1  ")).as("v"),
        col("cnt"))
      .localCheckpoint(true)

  /** Adjacent-pair counts of a spaced vocabulary — one explode + one
    * hash agg over the vocabulary table.
    */
  private def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("cnt"), split(trim(col("v")), "  ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS l, a[i + 1] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))

  /** Apply merges to the spaced vocabulary in order, ONE projection. */
  private def bpeApply(vocab: DataFrame, merges: Seq[(String, String)]): DataFrame =
    vocab.select(
      merges.foldLeft(col("v")) { case (v, (l, r)) =>
        call_function("replace", v, lit(s" $l  $r "), lit(s" $l$r "))
      }.as("v"), col("cnt"))

  /** BATCHED BPE training — the production-scale trainer loop: per
    * round, ONE pair-count job selects up to `batchM` merges at once,
    * so learning a 30k-rule vocabulary costs thousands of driver
    * round-trips, not 30k. The batch is PROVABLY sequential-equivalent
    * (bit-identical merge table to [[bpeMergesOn]], which
    * `TextAnalysisSpec` pins at 100 merges):
    *
    *  - candidates are walked in the argmax total order (count desc,
    *    left, right) and accepted as a CONSECUTIVE prefix while each is
    *    symbol-disjoint from every earlier accepted merge (its left/
    *    right differ from their lefts, rights AND concatenations) —
    *    disjointness means applying one cannot change another's count
    *    or occurrences;
    *  - the prefix is then truncated to merges whose count is STRICTLY
    *    greater than the first non-accepted candidate's: every pair a
    *    batch application can create has count bounded by some
    *    overlapping parent pair outside the batch (each new-symbol
    *    adjacency was a parent adjacency), and every non-batch pair
    *    sits at-or-below that same count — strictness leaves no
    *    tie-break for a created pair to win, so round j's argmax is
    *    exactly the j-th batch member;
    *  - a tie-flooded round degrades to the single argmax (the exact
    *    sequential step), so progress never stalls.
    */
  private[operators] def bpeMergesBatchedOn(
      spark: SparkSession, docs: DataFrame, totalMerges: Int,
      batchM: Int = 8): DataFrame = {
    import spark.implicits._
    var vocab = bpeVocab(docs)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (learned.size < totalMerges && !exhausted) {
      val want = math.min(batchM, totalMerges - learned.size)
      // top candidates, enough to find the disjoint prefix AND the
      // first-rejected count that bounds it (driver-side: ≤ 4M+1 rows)
      val top = bpePairCounts(vocab)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(want * 4 + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val symbols = scala.collection.mutable.Set.empty[String]
        var stop = false
        var closed = false
        var i = 0
        while (!stop && !closed && i < top.length && accepted.size < want) {
          val (l, r, c) = top(i)
          if (symbols(l) || symbols(r)) stop = true // prefix must stay consecutive
          else {
            accepted += ((l, r, c)); symbols ++= Seq(l, r, l + r)
            // a SELF-pair (l == l) closes the batch: the pairs its
            // application creates (e.g. (ll, l) from a run of three)
            // descend from the accepted pair ITSELF, so no outside
            // bound can protect later batch members from them — it
            // must be the batch's last merge
            if (l == r) closed = true
          }
          i += 1
        }
        // strict-count truncation against the first candidate OUTSIDE
        // the accepted prefix: a rejected (overlapping) candidate, or
        // the next unconsidered one. When the walk exhausted the WHOLE
        // pair table with no overlap (i == top.length, which implies
        // top.length < the collect limit — all considered were
        // accepted, and the loop stops at `want` < limit otherwise),
        // no pair shares a symbol with any accepted merge: applying
        // the batch can neither create nor shrink any pair (a created
        // pair's parent shares a symbol and would have caused a stop),
        // so no bound is needed.
        val safe =
          if (stop) accepted.takeWhile(_._3 > top(i - 1)._3)
          else if (i < top.length) accepted.takeWhile(_._3 > top(i)._3)
          else accepted
        val batch = if (safe.nonEmpty) safe.toSeq else Seq(top.head) // tie-flood: exact argmax
        batch.foreach { case (l, r, c) => learned += ((learned.size + 1, l, r, c)) }
        vocab = bpeApply(vocab, batch.map { case (l, r, _) => (l, r) })
          .localCheckpoint(true)
      }
    }
    learned.toSeq.toDF("step", "merge_left", "merge_right", "pair_count")
      .orderBy("step")
  }

  /** Shared trainer CTE chain ending in `b1..bK` (one learned merge
    * each) — the merge-table query and the tokenizer apply both build
    * on it.
    *
    * Every `b$k` is TOTAL (exactly one row): when round k has no
    * learnable pair left (`p$k` empty — trainer exhaustion), the LEFT
    * JOIN emits a `is_real = FALSE` fallback whose replace pattern
    * (four consecutive spaces — the spaced vocabulary never contains a
    * run longer than two) is a no-op, so the `v$k`/`s$k` chains carry
    * the vocabulary through unchanged instead of a cross join against
    * an empty CTE emptying everything downstream. The engine stops
    * learning at the same round (its per-round argmax collect comes
    * back empty), so fallback rounds mirror its frozen vocabulary
    * exactly; the merges query filters fallbacks out with `is_real`.
    */
  private val bpeOracleCtes: String = bpeOracleCtesK(BpeMergeRounds)

  /** Every CTE is `AS MATERIALIZED`: each round references the prior
    * vocabulary CTE twice (pair counts + merge application), and
    * DuckDB's default CTE INLINING doubles the plan per round — at the
    * 100-round gate that is an exponentially-expanded tree whose
    * thousands of duplicated parquet scans die on the process
    * fd limit before any row is read. Materialization makes the
    * oracle's cost what the recurrence actually is: one pass per
    * round, like the engine's own job chain.
    */
  private def bpeOracleCtesK(totalRounds: Int): String = {
    val rounds = (1 to totalRounds).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT u.l AS l, u.r AS r, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, unnest([{'l': a[i], 'r': a[i + 1]}
         |      for i in generate_series(1, len(a) - 1)]) AS u
         |    FROM (SELECT cnt, string_split(trim(v), '  ') AS a FROM v${k - 1}) t
         |    WHERE len(a) >= 2) s
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (
         |  SELECT coalesce(t.l, '') AS l, coalesce(t.r, '') AS r,
         |    coalesce(t.c, 0) AS c, t.l IS NOT NULL AS is_real
         |  FROM (SELECT 1 AS one) o LEFT JOIN
         |    (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1) t ON TRUE),
         |v$k AS MATERIALIZED (
         |  SELECT replace(v.v, ' ' || b.l || '  ' || b.r || ' ',
         |    ' ' || b.l || b.r || ' ') AS v, v.cnt
         |  FROM v${k - 1} v, b$k b)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |v0 AS MATERIALIZED (
       |  SELECT '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS v, cnt FROM w0),
       |$rounds""".stripMargin
  }

  private val bpeMergesOracle: String = bpeMergesOracleK(BpeMergeRounds)

  private def bpeMergesOracleK(totalRounds: Int): String = {
    val out = (1 to totalRounds).map { k =>
      s"SELECT $k AS step, l AS merge_left, r AS merge_right, c AS pair_count " +
        s"FROM b$k WHERE is_real"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${bpeOracleCtesK(totalRounds)}
       |SELECT * FROM (
       |  $out
       |) ORDER BY step""".stripMargin
  }

  /** Mid-scale BPE rule count for the BATCHED-trainer gate. */
  val BpeMidRounds = 100

  /** Mid-scale BPE training through the BATCHED selector
    * ([[bpeMergesBatchedOn]], r17's production-scale trainer — up to 8
    * merges per pair-count job): 100 rules is enough rounds that the
    * batch acceptance logic (disjoint prefixes, strict-count
    * truncation, self-pair closing, tie-flood degradation) all fire on
    * real data, and the DRIVER gate now proves batched ≡ sequential
    * against an independent engine — the oracle is the GENERATED
    * 100-round sequential CTE chain (one argmax per round), never a
    * hand-written table. A 30k-vocabulary production run is this
    * exact code with a bigger constant.
    */
  def bpeMerges100(spark: SparkSession, dir: String): DataFrame =
    bpeMergesBatchedOn(spark, t(spark, dir, "documents"), BpeMidRounds)

  private val bpeMerges100Oracle: String = bpeMergesOracleK(BpeMidRounds)

  /** Tokenize the corpus under the LEARNED merges — train → apply end
    * to end: every word re-encodes and replays the K merge rules (the
    * rules are a driver-side artifact, as a shipped tokenizer is), and
    * the per-doc subword count against word/char counts is the
    * compression the tokenizer buys. The apply is scan-local (K
    * literal replaces inside one codegen projection — no joins, no
    * shuffle until the per-doc agg).
    */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame =
    bpeTokenizeOn(spark, t(spark, dir, "documents"))

  /** Train on `docs`, then re-encode every word and replay the learned
    * merges — the shared scan-local apply both [[bpeTokenizeOn]] and
    * [[bpeEvalOn]] aggregate over. `carry` columns ride along.
    */
  private def bpeApply(spark: SparkSession, docs: DataFrame, carry: Seq[Column]): DataFrame = {
    val merges = bpeMergesOn(spark, docs).collect() // ≤ K rows: the artifact
    val spaced = docs
      .select(carry :+ explode(split(col("text"), " ")).as("w"): _*)
      .filter(length(col("w")) > 0)
      .select(carry ++ Seq(length(col("w")).cast("long").as("nc"),
        concat(lit("  "), regexp_replace(col("w"), "(.)", "$1  ")).as("v")): _*)
    merges.foldLeft(spaced) { (df, m) =>
      val (l, r) = (m.getString(1), m.getString(2))
      df.withColumn("v", call_function("replace", col("v"),
        lit(s" $l  $r "), lit(s" $l$r ")))
    }
  }

  private[operators] def bpeTokenizeOn(spark: SparkSession, docs: DataFrame): DataFrame = {
    bpeApply(spark, docs, Seq(col("doc_id")))
      .select(col("doc_id"), col("nc"),
        size(split(trim(col("v")), "  ")).cast("long").as("toks"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("nc")).as("n_chars"),
        sum(col("toks")).as("n_subwords"))
      .orderBy("doc_id")
  }

  private val bpeTokenizeOracle: String = {
    val applies = (1 to BpeMergeRounds).map { k =>
      s"""s$k AS (
         |  SELECT doc_id, nc,
         |    replace(s.v, ' ' || b.l || '  ' || b.r || ' ',
         |      ' ' || b.l || b.r || ' ') AS v
         |  FROM s${k - 1} s, b$k b)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeOracleCtes,
       |dw AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0),
       |s0 AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS nc,
       |    '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS v
       |  FROM dw),
       |$applies
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(nc) AS BIGINT) AS n_chars,
       |  CAST(sum(len(string_split(trim(v), '  '))) AS BIGINT) AS n_subwords
       |FROM s$BpeMergeRounds GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Tokenizer EVALUATION — train → apply → EVALUATE, the triad the
    * quality classifier already has: per-source fertility
    * (subwords/word), compression (chars/subword), and vocabulary
    * utilization (distinct subwords actually emitted) under the
    * learned merges. Fertility per source is the number a tokenizer
    * team watches for under-served languages/domains (high fertility =
    * the vocab serves that source poorly). Ratios are single IEEE
    * double divisions of exact integer totals — bit-identical cross
    * engine.
    *
    * Scale: the apply is the same scan-local K-replace projection as
    * [[bpeTokenize]]; the word-level frame materializes ONCE and feeds
    * both aggregations (totals, and the distinct-subword count whose
    * shuffle is vocabulary-bounded after map-side partial distinct —
    * at most chars + K merge tokens per source, not corpus-sized).
    */
  def bpeEval(spark: SparkSession, dir: String): DataFrame =
    bpeEvalOn(spark, t(spark, dir, "documents"))

  private[operators] def bpeEvalOn(spark: SparkSession, docs: DataFrame): DataFrame = {
    val words = bpeApply(spark, docs, Seq(col("doc_id"), col("source")))
      .select(col("source"), col("doc_id"), col("nc"),
        split(trim(col("v")), "  ").as("sws"))
      .localCheckpoint(true) // two consumers below
    val totals = words.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("nc")).as("n_chars"),
        sum(size(col("sws")).cast("long")).as("n_subwords"))
    val vocabUsed = words
      .select(col("source"), explode(col("sws")).as("sw"))
      .groupBy(col("source"))
      .agg(countDistinct(col("sw")).as("n_distinct_subwords"))
    totals.join(vocabUsed, "source")
      .withColumn("fertility",
        col("n_subwords").cast("double") / col("n_words").cast("double"))
      .withColumn("chars_per_subword",
        col("n_chars").cast("double") / col("n_subwords").cast("double"))
      .orderBy("source")
  }

  private val bpeEvalOracle: String = {
    val applies = (1 to BpeMergeRounds).map { k =>
      s"""e$k AS (
         |  SELECT source, doc_id, nc,
         |    replace(s.v, ' ' || b.l || '  ' || b.r || ' ',
         |      ' ' || b.l || b.r || ' ') AS v
         |  FROM e${k - 1} s, b$k b)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeOracleCtes,
       |ew AS (
       |  SELECT source, doc_id, w FROM (
       |    SELECT source, doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0),
       |e0 AS (
       |  SELECT source, doc_id, CAST(len(w) AS BIGINT) AS nc,
       |    '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS v
       |  FROM ew),
       |$applies,
       |ev AS (
       |  SELECT source, doc_id, nc, string_split(trim(v), '  ') AS sws
       |  FROM e$BpeMergeRounds),
       |a1 AS (
       |  SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_words,
       |    CAST(sum(nc) AS BIGINT) AS n_chars,
       |    CAST(sum(len(sws)) AS BIGINT) AS n_subwords
       |  FROM ev GROUP BY source),
       |a2 AS (
       |  SELECT source, count(DISTINCT sw) AS n_distinct_subwords
       |  FROM (SELECT source, unnest(sws) AS sw FROM ev) u GROUP BY source)
       |SELECT a1.source, n_docs, n_words, n_chars, n_subwords, n_distinct_subwords,
       |  CAST(n_subwords AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility,
       |  CAST(n_chars AS DOUBLE) / CAST(n_subwords AS DOUBLE) AS chars_per_subword
       |FROM a1 JOIN a2 USING (source) ORDER BY source""".stripMargin
  }

  /** Foreign-LM scoring — the shape CCNet actually deploys: the LM is
    * trained on a REFERENCE corpus (here the `lang = 'en'` subset),
    * every doc is scored against it, and docs whose text the LM finds
    * expensive get filtered. Scoring a foreign corpus means unseen
    * transitions exist, so the left join's null takes the uniform
    * backoff: `len2(T)` bits (T = reference bigram occurrences — the
    * cost of a uniform pick among everything the LM ever saw; strictly
    * ≥ any seen cost, monotone, integer-exact). English docs score low,
    * cross-lingual docs high — the LM IS the language/quality filter.
    * Same 8-byte-key joins and transcendental-free arithmetic as
    * [[lmScore]]; the 1-row total joins in broadcast.
    */
  def lmScoreForeign(spark: SparkSession, dir: String): DataFrame = {
    val bigramsOf = (docs: DataFrame, carry: Seq[Column]) => docs
      .select(carry :+ split(col("text"), " ").as("a"): _*)
      .filter(size(col("a")) >= 2)
      .select(carry :+ explode(expr(
        "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, concat(a[i], ' ', a[i + 1]) AS t))")).as("p"): _*)
      .select(carry ++ Seq(
        Dedup.phash60(col("p.w1")).as("h1"), Dedup.phash60(col("p.t")).as("h2")): _*)
    val docs = t(spark, dir, "documents")
    // the reference stream feeds three consumers (c1, c2, total);
    // materialize once, same rule as lmScoreOn
    val ref = bigramsOf(docs.filter(col("lang") === "en"), Seq.empty)
      .localCheckpoint(true)
    val c2 = ref.groupBy(col("h2")).agg(count(lit(1)).as("c2"))
    val c1 = ref.groupBy(col("h1")).agg(count(lit(1)).as("c1"))
    val total = ref.agg(count(lit(1)).as("t_ref"))
    def len2(c: Column): Column = length(conv(c, 10, 2))
    bigramsOf(docs, Seq(col("doc_id"), col("lang")))
      .join(c2, Seq("h2"), "left").join(c1, Seq("h1"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("lang"),
        when(col("c2").isNotNull, len2(col("c1")) - len2(col("c2")))
          .otherwise(len2(col("t_ref"))).as("bits"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("bits")).cast("double") / count(lit(1))).as("avg_bits"))
      .orderBy("doc_id")
  }

  private val lmScoreForeignOracle =
    s"""WITH words AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       |bg AS (
       |  SELECT doc_id, lang,
       |    ${Dedup.phash60Sql("u.w1")} AS h1, ${Dedup.phash60Sql("u.t")} AS h2
       |  FROM (
       |    SELECT doc_id, lang, unnest([{'w1': w[i], 't': w[i] || ' ' || w[i + 1]}
       |      for i in generate_series(1, len(w) - 1)]) AS u
       |    FROM words WHERE len(w) >= 2) s),
       |ref AS (SELECT h1, h2 FROM bg WHERE lang = 'en'),
       |c2 AS (SELECT h2, count(*) AS c2 FROM ref GROUP BY h2),
       |c1 AS (SELECT h1, count(*) AS c1 FROM ref GROUP BY h1),
       |tot AS (SELECT count(*) AS t_ref FROM ref),
       |cost AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN c2.c2 IS NOT NULL
       |         THEN length(bin(c1.c1)) - length(bin(c2.c2))
       |         ELSE length(bin(tot.t_ref)) END AS bits
       |  FROM bg LEFT JOIN c2 USING (h2) LEFT JOIN c1 USING (h1), tot)
       |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(sum(bits) AS DOUBLE) / count(*) AS avg_bits
       |FROM cost GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin

  private val lmScoreOracle =
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |bg AS (
       |  SELECT doc_id,
       |    ${Dedup.phash60Sql("u.w1")} AS h1, ${Dedup.phash60Sql("u.t")} AS h2
       |  FROM (
       |    SELECT doc_id, unnest([{'w1': w[i], 't': w[i] || ' ' || w[i + 1]}
       |      for i in generate_series(1, len(w) - 1)]) AS u
       |    FROM words WHERE len(w) >= 2) s),
       |c2 AS (SELECT h2, count(*) AS c2 FROM bg GROUP BY h2),
       |c1 AS (SELECT h1, count(*) AS c1 FROM bg GROUP BY h1),
       |cost AS (
       |  SELECT doc_id, length(bin(c1.c1)) - length(bin(c2.c2)) AS bits
       |  FROM bg JOIN c2 USING (h2) JOIN c1 USING (h1))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(sum(bits) AS DOUBLE) / count(*) AS avg_bits
       |FROM cost GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Overlapping-window chunk size (chars) and stride for
    * [[chunking]]. Stride < size ⇒ each chunk overlaps the next by
    * `ChunkChars - ChunkStride` chars (RAG/context-window prep).
    */
  val ChunkChars = 200
  val ChunkStride = 150

  /** Document chunking: split every doc into overlapping fixed-width
    * character windows — the RAG-indexing / context-window prep step
    * between curation and embedding. Emits one row per chunk with its
    * offset, exact length, and content digest (md5 — the same
    * cross-engine-stable digest the dedup family keys on; chunk TEXT
    * itself stays out of the gate to keep the result narrow).
    *
    * Chunk count per doc is pure integer arithmetic over the string
    * length (`1 + ceil(max(0, n-W)/S)` as an integer DIV), so both
    * engines enumerate identical windows; an empty text still yields
    * its one (empty) chunk.
    *
    * Scale: `sequence` + `explode` + `substring` is one scan-local
    * whole-stage-codegen projection — no shuffle at any corpus size
    * (the orderBy is the gate's determinism, not the operator); the
    * output is ~n/S rows per doc, the natural input to the embedding
    * and packing stages downstream.
    */
  def chunking(spark: SparkSession, dir: String): DataFrame =
    chunkingOn(t(spark, dir, "documents"))

  private[operators] def chunkingOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .withColumn("chunk_idx", explode(sequence(lit(0),
        expr(s"(greatest(n - $ChunkChars, 0) + ${ChunkStride - 1}) DIV $ChunkStride")
          .cast("int"))))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * ChunkStride).as("chunk_start"),
        length(expr(s"substring(text, chunk_idx * $ChunkStride + 1, $ChunkChars)"))
          .as("chunk_chars"),
        md5(expr(s"substring(text, chunk_idx * $ChunkStride + 1, $ChunkChars)"))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  private val chunkingOracle =
    s"""WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents),
       |c AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0,
       |      (greatest(n - $ChunkChars, 0) + ${ChunkStride - 1}) // $ChunkStride))
       |      AS chunk_idx
       |  FROM d)
       |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       |  CAST(chunk_idx * $ChunkStride AS INT) AS chunk_start,
       |  CAST(len(substr(text, chunk_idx * $ChunkStride + 1, $ChunkChars)) AS INT)
       |    AS chunk_chars,
       |  md5(substr(text, chunk_idx * $ChunkStride + 1, $ChunkChars)) AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** BM25 query terms (fixed literal keyword query). */
  val Bm25Terms: Seq[String] = Seq("merge", "vector", "stream")

  /** Saturation cap on tf: BM25's tf factor saturates anyway, and the
    * cap bounds the all-integer scoring against 64-bit overflow.
    */
  val Bm25TfCap = 50

  /** idf scaling factor (integer score resolution). */
  val Bm25IdfScale = 1000L

  /** Keyword retrieval ranking — BM25 scoring (k1 = 1.2, b = 0.75)
    * with the RAW-LIFT idf variant `(N − df + ½)/(df + ½)` instead of
    * its log (the [[collocations]] precedent: the log is monotone
    * per-term, and an all-integer rational keeps both engines
    * bit-identical where transcendental rounding would diverge — the
    * variant is documented, not hidden). Each term contribution is ONE
    * integer floor division of exact 64-bit products:
    * `(IdfScale·(2N−2df+1) · 22·tf·S) // ((2df+1) · (10·tf·S + 3S + 9·dl·N))`
    * — the k1/b rationals multiplied through by `10S`, so no
    * intermediate rounding exists anywhere; tf caps at [[Bm25TfCap]].
    * Integer contributions sum order-independently.
    *
    * Scale shape: ONE corpus scan computes (dl, tf per query term)
    * scan-locally (no explode — `filter(words, …)` counts inside the
    * row); a 1-row aggregate broadcasts (N, S, df per term); scoring
    * is a scan-local projection over matching docs and the top-10 is
    * TakeOrdered. At 100 TB the same scoring runs off a word posting
    * index (the [[LmIndex]] lifecycle) instead of the corpus scan.
    */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val f = t(spark, dir, "documents").select(
      col("doc_id") +: size(words).cast("long").as("dl") +:
        Bm25Terms.zipWithIndex.map { case (term, i) =>
          size(filter(words, w => w === term)).cast("long").as(s"tf$i")
        }: _*).localCheckpoint(true)
    try {
      val statAggs = count(lit(1)).cast("long").as("n") +:
        sum(col("dl")).as("s") +:
        Bm25Terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
      val stats = f.agg(statAggs.head, statAggs.tail: _*)
      val contribs = Bm25Terms.indices.map { i =>
        val tf = least(col(s"tf$i"), lit(Bm25TfCap.toLong))
        val num = lit(Bm25IdfScale) * (lit(2) * col("n") - lit(2) * col(s"df$i") + lit(1)) *
          lit(22) * tf * col("s")
        val den = (lit(2) * col(s"df$i") + lit(1)) *
          (lit(10) * tf * col("s") + lit(3) * col("s") + lit(9) * col("dl") * col("n"))
        when(col(s"tf$i") > 0, expr_div(num, den)).otherwise(lit(0L))
      }
      f.crossJoin(broadcast(stats))
        .filter(Bm25Terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
        .select(col("doc_id"), contribs.reduce(_ + _).as("score"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(10)
    } finally f.unpersist()
  }

  /** Integer floor division as a Column (`div` keeps it exact — `/`
    * would detour through doubles).
    */
  private def expr_div(num: Column, den: Column): Column =
    call_function("div", num, den)

  private val bm25Oracle = {
    val tfs = Bm25Terms.zipWithIndex.map { case (term, i) =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$term')) AS BIGINT) AS tf$i"
    }.mkString(",\n       |    ")
    val dfs = Bm25Terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i").mkString(", ")
    val contribs = Bm25Terms.indices.map { i =>
      val tf = s"least(tf$i, $Bm25TfCap)"
      s"""CASE WHEN tf$i > 0 THEN
         |    ($Bm25IdfScale * (2 * n - 2 * df$i + 1) * 22 * $tf * s)
         |      // ((2 * df$i + 1) * (10 * $tf * s + 3 * s + 9 * dl * n))
         |    ELSE 0 END""".stripMargin
    }.mkString(" +\n  ")
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |    $tfs
       |  FROM documents),
       |st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS s, $dfs
       |  FROM f)
       |SELECT doc_id,
       |  CAST($contribs AS BIGINT) AS score
       |FROM f, st
       |WHERE ${Bm25Terms.indices.map(i => s"tf$i > 0").mkString(" OR ")}
       |ORDER BY score DESC, doc_id
       |LIMIT 10""".stripMargin
  }

  // -------------------------------------------------- keyphrase mining

  /** Max words per candidate keyphrase. */
  val KeyphraseMaxLen = 3

  /** RAKE-style keyphrase extraction (Rose et al., "Automatic Keyword
    * Extraction from Individual Documents" — the degree/frequency
    * heuristic): text splits into candidate phrases at stopwords and
    * punctuation-bearing tokens, each content word scores
    * degree(w)/freq(w) over the candidate-phrase corpus (degree = Σ
    * length of phrases containing w — favors words that appear inside
    * longer collocations; freq = plain occurrence count), and a
    * phrase scores the sum of its word scores. Top-20 corpus-wide.
    *
    * Determinism: phrase segmentation is a running-sum window over
    * boundary flags (integer); per-word ratios are ×10⁶ fixed-point
    * integer floor divisions (`degree·10⁶ div freq` — the PageRank
    * precedent: a double ratio cast to wide decimal diverges at the
    * last digit because the engines convert double→decimal via
    * different decimal expansions), so the phrase score is an exact
    * integer sum — bit-identical cross-engine.
    *
    * Scale shape: one (doc_id)-partitioned window pass segments
    * phrases, the word-stats table is vocabulary-sized (hash-agg with
    * map-side combine), and scoring is a broadcast-sized join of
    * phrase words against it — no pair space, no corpus re-scan.
    */
  def keyphrases(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stops = Markers("en")
    val tok = t(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(lower(col("text")), " ")).as(Seq("i0", "w")))
      .select(col("doc_id"), (col("i0") + 1).as("i"), col("w"))
    val flagged = tok.withColumn("b",
      when(col("w").isin(stops: _*) || col("w").rlike("[.,!?;:]") ||
        length(col("w")) === 0, 1).otherwise(0))
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val pid = flagged.withColumn("pid", sum(col("b")).over(wRun))
    val phrases = pid.filter(col("b") === 0)
      .groupBy(col("doc_id"), col("pid"))
      .agg(
        concat_ws(" ", transform(array_sort(collect_list(struct(col("i"), col("w")))),
          s => s.getField("w"))).as("phrase"),
        count(lit(1)).as("plen"))
      .filter(col("plen").between(1, KeyphraseMaxLen))
    val pw = phrases.select(col("doc_id"), col("pid"), col("phrase"), col("plen"),
      explode(split(col("phrase"), " ")).as("pword"))
    val stats = pw.groupBy(col("pword"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
    val scored = pw.join(broadcast(stats), "pword")
      .groupBy(col("doc_id"), col("pid"), col("phrase"))
      .agg(sum(call_function("div", col("degree") * lit(1000000L), col("freq")))
        .as("score_micro"))
    scored.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"), max(col("score_micro")).as("score_micro"))
      .orderBy(desc("score_micro"), col("phrase"))
      .limit(20)
  }

  private val keyphrasesOracle = {
    val stopSet = Markers("en").map(x => s"'$x'").mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, i, ws[i] AS w
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       |    LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) u),
       |flagged AS (
       |  SELECT doc_id, i, w,
       |    CASE WHEN w IN ($stopSet) OR regexp_matches(w, '[.,!?;:]')
       |           OR length(w) = 0 THEN 1 ELSE 0 END AS b
       |  FROM tok),
       |pid AS (
       |  SELECT doc_id, i, w, b,
       |    sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS pid
       |  FROM flagged),
       |phrases AS (
       |  SELECT doc_id, pid, string_agg(w, ' ' ORDER BY i) AS phrase,
       |    count(*) AS plen
       |  FROM pid WHERE b = 0 GROUP BY doc_id, pid
       |  HAVING count(*) BETWEEN 1 AND $KeyphraseMaxLen),
       |pw AS (
       |  SELECT doc_id, pid, phrase, plen, unnest(string_split(phrase, ' ')) AS pword
       |  FROM phrases),
       |stats AS (
       |  SELECT pword, count(*) AS freq, sum(plen) AS degree FROM pw GROUP BY pword),
       |scored AS (
       |  SELECT p.doc_id, p.pid, p.phrase,
       |    CAST(sum((s.degree * 1000000) // s.freq) AS BIGINT) AS score_micro
       |  FROM pw p JOIN stats s ON p.pword = s.pword
       |  GROUP BY 1, 2, 3)
       |SELECT phrase, count(*) AS n_occurrences, max(score_micro) AS score_micro
       |FROM scored GROUP BY phrase
       |ORDER BY score_micro DESC, phrase LIMIT 20""".stripMargin
  }

  // --------------------------------------------------- unigram LM (SentencePiece-style)

  /** Max word length the unigram-LM trainer segments (longer words are
    * excluded up front): the Viterbi DP unrolls ONE relational round
    * per consumed piece, so this bounds the generated chain in BOTH
    * engines identically.
    */
  val UlmMaxWordLen = 10

  /** Max candidate piece length in the seed vocabulary. */
  val UlmMaxPieceLen = 4

  /** Seed floor: a multi-char substring enters the seed vocabulary
    * only with at least this much weighted occurrence mass (every
    * position counted, weighted by word frequency). Single-char
    * pieces are ALWAYS kept — full segmentation coverage by
    * construction, the SentencePiece character-coverage invariant.
    */
  val UlmSeedFloor = 20L

  /** Multi-char vocabulary size kept after the EM-1 prune. */
  val UlmVocabKeep = 200

  /** Report size of [[unigramLm]]. */
  val UlmTopK = 20

  /** Unigram-LM (SentencePiece-style) tokenizer TRAINING — hard-EM
    * over the vocabulary-sized word-count frame, all-integer so the
    * DuckDB oracle reproduces it bit-exactly:
    *
    *  - SEED: every substring (≤ [[UlmMaxPieceLen]] chars) of every
    *    distinct word, scored by weighted occurrence count; multi-char
    *    pieces below [[UlmSeedFloor]] drop, single chars always stay
    *    (coverage).
    *  - E-STEP (Viterbi, exact): each word's best segmentation
    *    maximizes the sum of piece scores — computed RELATIONALLY as
    *    [[UlmMaxWordLen]] unrolled Bellman-Ford rounds over the
    *    match-edge DAG (dp rows (word, pos, score, seg); per round one
    *    bucketable equi-join + two hash aggs). Ties break on the
    *    lexicographically smallest segmentation string — a TOTAL
    *    order with optimal substructure (two same-score segs at one
    *    position are never prefix-related, since equal consumed
    *    length forces a differing character before either ends), so
    *    per-position pruning is exact, no per-row imperative DP and
    *    no UDF anywhere.
    *  - M-STEP: piece scores re-estimate as weighted usage counts in
    *    the best segmentations.
    *  - PRUNE: keep the [[UlmVocabKeep]] most-used multi-char pieces
    *    (+ all single chars), then one more E/M round under the
    *    pruned vocabulary — the trained tokenizer's final piece
    *    distribution, reported top-[[UlmTopK]].
    *
    * Scale shape: everything is vocabulary-sized (distinct words ×
    * ≤ L positions), never corpus-sized — the corpus is touched once
    * to build the word-count frame, exactly like the BPE trainer; the
    * DP frames are ~|vocab|·L rows through 2·L bounded rounds.
    */
  def unigramLm(spark: SparkSession, dir: String): DataFrame =
    unigramLmOn(spark, t(spark, dir, "documents"))

  private[operators] def unigramLmOn(spark: SparkSession, docs: DataFrame): DataFrame = {
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")).between(1, UlmMaxWordLen))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // every (position, length) substring occurrence of every word
    val subs = words.select(col("w"), col("cnt"), explode(expr(
        s"flatten(transform(sequence(0, length(w) - 1), " +
          s"i -> transform(sequence(1, least($UlmMaxPieceLen, length(w) - i)), " +
          "l -> named_struct('i', i, 'piece', substring(w, i + 1, l)))))")).as("e"))
      .select(col("w"), col("cnt"), col("e.i").as("i"), col("e.piece").as("piece"))
      .localCheckpoint(true)
    val seed = subs.groupBy("piece").agg(sum(col("cnt")).as("s"))
    val vocab1 = seed
      .filter(length(col("piece")) === 1 || col("s") >= UlmSeedFloor)
      .localCheckpoint(true)

    // exact Viterbi usage counts of `vocab` over every word
    def segmentCounts(vocab: DataFrame): DataFrame = {
      val edges = subs.join(vocab, "piece")
        .select(col("w"), col("i"), (col("i") + length(col("piece"))).as("j"),
          col("piece"), col("s"))
        .localCheckpoint(true)
      var dp = words.select(col("w"), lit(0).as("pos"),
        lit(0L).as("sc"), lit("").as("seg"))
      for (_ <- 1 to UlmMaxWordLen) {
        val stepped = dp.as("d")
          .join(edges.as("e"), col("d.w") === col("e.w") && col("d.pos") === col("e.i"))
          .select(col("d.w").as("w"), col("e.j").as("pos"),
            (col("d.sc") + col("e.s")).as("sc"),
            when(col("d.seg") === "", col("e.piece"))
              .otherwise(concat(col("d.seg"), lit(" "), col("e.piece"))).as("seg"))
        val states = dp.unionByName(stepped)
        val best = states.groupBy("w", "pos").agg(max("sc").as("sc"))
        dp = states.join(best, Seq("w", "pos", "sc"))
          .groupBy("w", "pos", "sc").agg(min("seg").as("seg"))
          .localCheckpoint(true)
      }
      dp.join(words, "w").filter(col("pos") === length(col("w")))
        .select(explode(split(col("seg"), " ")).as("piece"), col("cnt"))
        .groupBy("piece").agg(sum(col("cnt")).as("s"))
    }

    val c1 = segmentCounts(vocab1).localCheckpoint(true)
    val kept = c1.filter(length(col("piece")) > 1)
      .orderBy(col("s").desc, col("piece")).limit(UlmVocabKeep)
    val chars = vocab1.filter(length(col("piece")) === 1).select("piece")
      .join(c1, Seq("piece"), "left_outer")
      .select(col("piece"), coalesce(col("s"), lit(0L)).as("s"))
    val vocab2 = chars.unionByName(kept).localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("piece"))
    segmentCounts(vocab2)
      .select(col("piece"), col("s").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= UlmTopK)
      .select(col("rank"), col("piece"), col("score"))
      .orderBy("rank")
  }

  /** GENERATED unigram-LM oracle: the identical seed → Viterbi-DP →
    * count → prune → Viterbi-DP → count chain unrolled as DuckDB CTEs
    * (2 × [[UlmMaxWordLen]] dp rounds, four CTEs each). Key frames are
    * AS MATERIALIZED — each dp round references its predecessor twice
    * and DuckDB's default inlining would double the plan per round
    * (the `text_bpe_merges_100` lesson).
    */
  private def ulmDpChain(tag: String, edges: String): String = {
    val sb = new StringBuilder
    sb.append(s"dp${tag}0 AS MATERIALIZED (SELECT w, 0 AS pos, " +
      "CAST(0 AS BIGINT) AS sc, '' AS seg FROM words),\n")
    for (r <- 1 to UlmMaxWordLen) {
      val p = s"dp$tag${r - 1}"
      sb.append(
        s"""st$tag$r AS (SELECT d.w, e.j AS pos, d.sc + e.s AS sc,
           |  CASE WHEN d.seg = '' THEN e.piece ELSE d.seg || ' ' || e.piece END AS seg
           |  FROM $p d JOIN $edges e ON d.w = e.w AND d.pos = e.i),
           |al$tag$r AS MATERIALIZED (SELECT * FROM $p UNION ALL SELECT * FROM st$tag$r),
           |bt$tag$r AS (SELECT w, pos, max(sc) AS sc FROM al$tag$r GROUP BY w, pos),
           |dp$tag$r AS MATERIALIZED (SELECT a.w, a.pos, a.sc, min(a.seg) AS seg
           |  FROM al$tag$r a JOIN bt$tag$r b ON a.w = b.w AND a.pos = b.pos AND a.sc = b.sc
           |  GROUP BY a.w, a.pos, a.sc),
           |""".stripMargin)
    }
    sb.append(
      s"""cnt$tag AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS s FROM (
         |  SELECT unnest(string_split(d.seg, ' ')) AS piece, wo.cnt AS cnt
         |  FROM dp$tag$UlmMaxWordLen d JOIN words wo ON d.w = wo.w AND d.pos = length(wo.w))
         |  GROUP BY piece),
         |""".stripMargin)
    sb.toString
  }

  private val unigramLmOracle: String = {
    s"""WITH words AS MATERIALIZED (
       |  SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) BETWEEN 1 AND $UlmMaxWordLen GROUP BY w),
       |subs AS MATERIALIZED (
       |  SELECT w, cnt, CAST(t.i AS INTEGER) AS i,
       |    substr(w, CAST(t.i AS INTEGER) + 1, CAST(t2.l AS INTEGER)) AS piece
       |  FROM words
       |  CROSS JOIN range(0, $UlmMaxWordLen) t(i)
       |  CROSS JOIN range(1, ${UlmMaxPieceLen + 1}) t2(l)
       |  WHERE t.i < length(w) AND t.i + t2.l <= length(w)),
       |seed AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS s FROM subs GROUP BY piece),
       |vocab1 AS MATERIALIZED (
       |  SELECT piece, s FROM seed WHERE length(piece) = 1 OR s >= $UlmSeedFloor),
       |eda AS MATERIALIZED (
       |  SELECT s.w, s.i, s.i + length(s.piece) AS j, s.piece, v.s
       |  FROM subs s JOIN vocab1 v USING (piece)),
       |${ulmDpChain("a", "eda")}vocab2 AS MATERIALIZED (
       |  SELECT v.piece, coalesce(c.s, 0) AS s
       |  FROM (SELECT piece FROM vocab1 WHERE length(piece) = 1) v
       |  LEFT JOIN cnta c USING (piece)
       |  UNION ALL
       |  SELECT piece, s FROM (
       |    SELECT piece, s FROM cnta WHERE length(piece) > 1
       |    ORDER BY s DESC, piece LIMIT $UlmVocabKeep)),
       |edb AS MATERIALIZED (
       |  SELECT s.w, s.i, s.i + length(s.piece) AS j, s.piece, v.s
       |  FROM subs s JOIN vocab2 v USING (piece)),
       |${ulmDpChain("b", "edb")}ranked AS (
       |  SELECT CAST(row_number() OVER (ORDER BY s DESC, piece) AS INTEGER) AS rank,
       |    piece, s AS score
       |  FROM cntb)
       |SELECT rank, piece, score FROM ranked WHERE rank <= $UlmTopK ORDER BY rank""".stripMargin
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("text_unigram_lm", unigramLm _, Some(unigramLmOracle),
      "unigram-LM (SentencePiece-style) trainer: seed substrings, exact integer Viterbi hard-EM, prune, final piece distribution"),
    GraftQuery("text_keyphrases", keyphrases _, Some(keyphrasesOracle),
      "RAKE keyphrase extraction: stopword/punct segmentation, degree/freq word scores, decimal-exact phrase sum"),
    GraftQuery("text_bm25", bm25 _, Some(bm25Oracle),
      "BM25 keyword retrieval (raw-lift idf, all-integer rational scoring): one scan + 1-row broadcast"),
    GraftQuery("quality_classifier", qualityClassifier _, Some(qualityClassifierOracle),
      "batch-perceptron quality filter distilling the rule gate: integer-exact training curve + weights"),
    GraftQuery("quality_classifier_apply", qualityClassifierApply _, Some(qualityClassifierApplyOracle),
      "train -> deploy: learned weights score the corpus in one scan; per-source keep + teacher agreement"),
    GraftQuery("quality_classifier_eval", qualityClassifierEval _, Some(qualityClassifierEvalOracle),
      "train -> evaluate: per-source confusion matrix + precision/recall/F1 vs the teacher rule"),
    GraftQuery("text_chunking", chunking _, Some(chunkingOracle),
      "overlapping char-window chunking with offsets + digests (RAG prep, scan-local)"),
    GraftQuery("text_lm_score", lmScore _, Some(lmScoreOracle),
      "corpus-LM perplexity-proxy: integer bit-cost per bigram, mean per doc"),
    GraftQuery("text_lm_filter", lmScoreForeign _, Some(lmScoreForeignOracle),
      "foreign-LM scoring with uniform backoff: en-trained LM scores every doc"),
    GraftQuery("text_bpe_merges", bpeMerges _, Some(bpeMergesOracle),
      "BPE tokenizer training: iterative pair-count + merge over the word vocabulary"),
    GraftQuery("text_bpe_merges_100", bpeMerges100 _, Some(bpeMerges100Oracle),
      "mid-scale BATCHED BPE training (100 rules) vs the generated sequential oracle chain"),
    GraftQuery("text_bpe_tokenize", bpeTokenize _, Some(bpeTokenizeOracle),
      "tokenize under the learned BPE merges: per-doc subword/word/char counts"),
    GraftQuery("text_bpe_eval", bpeEval _, Some(bpeEvalOracle),
      "tokenizer evaluation: per-source fertility, compression, vocabulary utilization"),
    GraftQuery("text_freq_cms", freqCms _, Some(freqCmsOracle),
      "Count-Min frequency sketch: D·W mergeable cells, top-20 probe estimate vs exact"),
    GraftQuery("text_heavy_hitters", heavyHitters _, Some(heavyHittersOracle),
      "frequent bigrams via bounded Misra-Gries sketch + exact candidate rescan"),
    GraftQuery("text_heavy_hitters_by_lang", heavyHittersByLang _, Some(heavyHittersByLangOracle),
      "grouped heavy hitters: per-language frequent bigrams, sketch per group"),
    GraftQuery("text_collocations", collocations _, Some(collocationsOracle),
      "collocation mining: support-filtered bigrams ranked by pointwise lift (PMI ratio)"),
    GraftQuery("text_corpus_stats", corpusStats _, Some(corpusStatsOracle),
      "corpus-level stats: docs, tokens, vocabulary, mean length"),
    GraftQuery("dedup_exact_normalized", dedupNormalized _, Some(dedupNormalizedOracle),
      "exact dedup after lowercase/punct/whitespace normalization"),
    GraftQuery("text_langid", langId _, Some(langIdOracle),
      "stopword-marker language scoring with argmax"),
    GraftQuery("text_quality", quality _, Some(qualityOracle),
      "length/stopword/punct/digit quality metrics + composite score"),
    GraftQuery("text_tokens", tokens _, Some(tokensOracle),
      "whitespace / BPE-ish regex / estimate token counts"),
    GraftQuery("text_fingerprint", fingerprint _, Some(fingerprintOracle),
      "content, bag and positional rolling fingerprints"))
}
