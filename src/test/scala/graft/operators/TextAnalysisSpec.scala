package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, SparkEntry}

/** Known-answer semantics for the corpus-LM bit-cost scorer: costs on
  * a tiny corpus are hand-computable (len2 = binary digit count of the
  * corpus predecessor/bigram counts).
  */
class TextAnalysisSpec extends AnyFunSuite with SparkFixture {

  test("lm score: hand-computed bit costs on a planted corpus") {
    import spark.implicits._
    // doc 1 bigrams: (a,b), (b,a), (a,b)   doc 2 bigrams: (a,c)
    // c1: a→3, b→1   c2: "a b"→2, "b a"→1, "a c"→1
    // len2: 3→2, 1→1, 2→2
    // doc 1 costs: (2−2) + (1−1) + (2−2) = 0 → avg 0.0 over 3
    // doc 2 costs: (2−1) = 1 → avg 1.0 over 1
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = TextAnalysis.lmScoreOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows(1L) == ((3L, 0.0)))
    assert(rows(2L) == ((1L, 1.0)))
  }

  test("lm score: single-token and empty docs produce no row, others all score") {
    import spark.implicits._
    val docs = Seq((1L, "lonely"), (2L, ""), (3L, "two words here"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.lmScoreOn(docs).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L))
    assert(rows.head.getLong(1) == 2L) // two bigrams
  }

  test("BPE trainer: hand-computed merges on the classic low/lower/lowest corpus") {
    import spark.implicits._
    // vocab: low×3, lower×1, lowest×1
    // r1: (l,o)=5 ties (o,w)=5 → left-asc tiebreak picks (l,o)
    // r2: (lo,w)=5 → low
    // r3: (low,e)=2 beats (e,r)/(e,s)/(s,t)=1 → lowe
    // r4: (lowe,r)=1 ties (lowe,s)... wait (lowe,r)=1, (lowe,s)=1,
    //     (s,t)=1 → left asc: "lowe" < "s"; then right asc: r < s →
    //     (lowe,r)
    // r5: (lowe,s)=1, (s,t)=1 → (lowe,s)
    // r6: (lowes,t)=1 → lowest
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMergesOn(spark, docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L),
      (4, "lowe", "r", 1L), (5, "lowe", "s", 1L), (6, "lowes", "t", 1L)))
  }

  test("batched BPE trainer == sequential trainer at 100 merges on real documents") {
    // the production-scale loop: up to M merges selected per pair-count
    // job (symbol-disjoint consecutive prefix, strict-count truncation)
    // must reproduce the one-merge-per-round chain BIT-identically —
    // the rule's safety argument, exercised on a real corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val sequential = rows(TextAnalysis.bpeMergesOn(spark, docs, rounds = 100))
    val batched = rows(TextAnalysis.bpeMergesBatchedOn(spark, docs, 100, batchM = 8))
    assert(batched == sequential)
    // the synthetic corpus' vocabulary fully merges at 89 rules — both
    // trainers must agree on the exhaustion point too
    assert(sequential.size == 89)
  }

  test("batched BPE: a SELF-pair merge closes the batch (created pairs descend from it)") {
    import spark.implicits._
    // pair table: (o,o) x20, (a,b) x5, table exhausted in one window.
    // A naive disjoint batch would learn [(o,o), (a,b)], but merging
    // (o,o) CREATES (oo,o) x10 > (a,b) x5 — sequential learns (oo,o)
    // second. The self-pair must terminate the batch.
    val docs = Seq((1L, ("ooo " * 10).trim + " " + ("ab " * 5).trim)).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val seqr = rows(TextAnalysis.bpeMergesOn(spark, docs, rounds = 4))
    val bat = rows(TextAnalysis.bpeMergesBatchedOn(spark, docs, 4, batchM = 4))
    assert(bat == seqr, s"batched diverged:\nseq=$seqr\nbat=$bat")
    assert(seqr.take(2).map(t => (t._2, t._3)) == Seq(("o", "o"), ("oo", "o")))
  }

  test("batched BPE trainer == sequential on the classic tie-heavy corpus") {
    import spark.implicits._
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // ties everywhere (counts 1) force the tie-flood fallback to the
    // exact per-round argmax — order must still match exactly
    assert(rows(TextAnalysis.bpeMergesBatchedOn(spark, docs, 6, batchM = 4)) ==
      rows(TextAnalysis.bpeMergesOn(spark, docs)))
  }

  test("BPE tokenize: the learned merges fully reassemble the training words") {
    import spark.implicits._
    // with the 6 merges learned on this corpus (see trainer test),
    // every word collapses to a single subword: low, lower, lowest
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTokenizeOn(spark, docs).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((5L, 20L, 5L)))
  }

  test("BPE trainer exhaustion: fewer learnable merges than rounds stops cleanly, tokenize still counts") {
    import spark.implicits._
    // single-char words: no pair ever exists -> zero merges, tokenize
    // emits per-doc counts over the unmerged vocabulary (matches the
    // oracle's total b_k fallback chain, hand-run in DuckDB)
    val flat = Seq((1L, "a b a b")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeMergesOn(spark, flat).collect().isEmpty)
    val r0 = TextAnalysis.bpeTokenizeOn(spark, flat).collect().head
    assert((r0.getLong(1), r0.getLong(2), r0.getLong(3)) == ((4L, 4L, 4L)))
    // two learnable merges, then exhaustion mid-rounds
    val two = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeMergesOn(spark, two).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq((1, "a", "b", 2L), (2, "c", "d", 1L)))
    val r1 = TextAnalysis.bpeTokenizeOn(spark, two).collect().head
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((3L, 6L, 3L)))
  }

  test("BPE eval: per-source totals reconcile with tokenize; hand-computed fertility and vocab use") {
    import spark.implicits._
    // merges learned on the UNION (low+lower+lowest fully reassemble,
    // see trainer test): source s1's words all collapse to 1 subword;
    // s2's 'unseen' only benefits from merges its chars happen to hit
    val docs = Seq(
      (1L, "low low lower", "s1"), (2L, "lowest low", "s1"),
      (3L, "low unseen", "s2"))
      .toDF("doc_id", "text", "source")
    val ev = TextAnalysis.bpeEvalOn(spark, docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))).toMap
    // totals reconcile against the per-doc tokenize counts
    val tok = TextAnalysis.bpeTokenizeOn(spark, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def sumOf(ids: Seq[Long]) = (
      ids.size.toLong,
      ids.map(tok(_)._1).sum, ids.map(tok(_)._2).sum, ids.map(tok(_)._3).sum)
    val (d1, w1, c1, s1) = sumOf(Seq(1L, 2L))
    assert((ev("s1")._1, ev("s1")._2, ev("s1")._3, ev("s1")._4) == ((d1, w1, c1, s1)))
    val (d2, w2, c2, s2) = sumOf(Seq(3L))
    assert((ev("s2")._1, ev("s2")._2, ev("s2")._3, ev("s2")._4) == ((d2, w2, c2, s2)))
    // ratios are the exact double divisions of the integer totals
    assert(ev("s1")._6 == s1.toDouble / w1.toDouble)
    assert(ev("s2")._6 == s2.toDouble / w2.toDouble)
    assert(ev("s2")._7 == c2.toDouble / s2.toDouble)
    // vocabulary utilization is bounded by chars + learned merges and
    // can never exceed the subwords emitted
    val merges = TextAnalysis.bpeMergesOn(spark, docs).count()
    val chars = docs.collect().flatMap(_.getString(1).replace(" ", "")).distinct.length
    assert(ev("s1")._5 <= chars + merges && ev("s1")._5 <= s1)
    assert(ev("s2")._5 <= chars + merges && ev("s2")._5 <= s2)
  }

  test("foreign-LM filter: unseen transitions pay the uniform backoff, en-trained LM ranks en lowest") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextAnalysis.lmScoreForeign(spark, dir).collect()
    val docs = graft.Tables.t(spark, dir, "documents").count()
    val scoreable = graft.Tables.t(spark, dir, "documents")
      .where("size(split(text, ' ')) >= 2").count()
    assert(rows.length == scoreable && scoreable >= docs - 5)
    val byLang = rows.groupBy(_.getString(1)).map { case (l, rs) =>
      l -> rs.map(_.getDouble(3)).sum / rs.length
    }
    assert(byLang.keySet.contains("en"))
    // the en-trained LM must find en text cheapest on average
    assert(byLang("en") == byLang.values.min)
    assert(rows.forall(_.getDouble(3) >= 0))
  }

  test("lm score: repeated boilerplate scores strictly below rare text") {
    import spark.implicits._
    // 5 copies of the same sentence + one doc reusing those
    // predecessors with novel successors: the boilerplate's
    // transitions are the predictable ones (cost 0 — a predecessor
    // with a single successor is free, the correct LM behavior), the
    // rare doc pays bits exactly where a shared predecessor takes a
    // surprising turn.
    val boiler = (1 to 5).map(i => (i.toLong, "the same old line again"))
    val rare = Seq((9L, "the novel same surprise old twist"))
    val rows = TextAnalysis.lmScoreOn((boiler ++ rare).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows(1L) < rows(9L))
    assert(rows(1L) == rows(5L)) // identical docs score identically
  }

  test("classifier eval reconciles with apply: kept = tp+fp, agree = tp+tn, total = matrix sum") {
    val dir = "/root/testdata/sf0.001"
    val apply = SparkEntry.queries("quality_classifier_apply")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val eval = SparkEntry.queries("quality_classifier_eval")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(eval.nonEmpty)
    eval.foreach { case (src, (tp, fp, fn, tn)) =>
      val (nDocs, nKept, nAgree) = apply(src)
      assert(tp + fp == nKept, s"$src kept")
      assert(tp + tn == nAgree, s"$src agree")
      assert(tp + fp + fn + tn == nDocs, s"$src total")
    }
  }

  /** Brute-force reference for the unigram-LM E-step: per word, the
    * exact max-score segmentation with the (score desc, seg asc)
    * tie-break, enumerated driver-side.
    */
  private def bruteBest(w: String, vocab: Map[String, Long]): (Long, String) = {
    def go(pos: Int): Seq[(Long, String)] =
      if (pos == w.length) Seq((0L, ""))
      else for {
        l <- 1 to math.min(TextAnalysis.UlmMaxPieceLen, w.length - pos)
        piece = w.substring(pos, pos + l)
        sc <- vocab.get(piece).toSeq
        (restSc, restSeg) <- go(pos + l)
      } yield (sc + restSc, if (restSeg.isEmpty) piece else piece + " " + restSeg)
    go(0).minBy { case (sc, seg) => (-sc, seg) }
  }

  test("unigram-LM: relational Viterbi DP equals brute-force enumeration on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abab abab cab"), (2L, "abab cab cab bc"), (3L, "abc abab ab"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramLmOn(spark, docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out.nonEmpty && out.map(_._1) == (1 to out.size))

    // rebuild the reference trainer driver-side with the same knobs
    val wordCnt = docs.collect().flatMap(_.getString(1).split(" "))
      .filter(w => w.nonEmpty && w.length <= TextAnalysis.UlmMaxWordLen)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    def subCounts: Map[String, Long] = {
      val m = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      wordCnt.foreach { case (w, c) =>
        for (i <- 0 until w.length;
             l <- 1 to math.min(TextAnalysis.UlmMaxPieceLen, w.length - i))
          m(w.substring(i, i + l)) += c
      }
      m.toMap
    }
    val vocab1 = subCounts.filter { case (p, s) =>
      p.length == 1 || s >= TextAnalysis.UlmSeedFloor }
    def counts(vocab: Map[String, Long]): Map[String, Long] = {
      val m = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      wordCnt.foreach { case (w, c) =>
        bruteBest(w, vocab)._2.split(" ").foreach(p => m(p) += c) }
      m.toMap
    }
    val c1 = counts(vocab1)
    val kept = c1.filter(_._1.length > 1).toSeq
      .sortBy { case (p, s) => (-s, p) }.take(TextAnalysis.UlmVocabKeep)
    val chars = vocab1.keys.filter(_.length == 1)
      .map(p => p -> c1.getOrElse(p, 0L))
    val vocab2 = (chars ++ kept).toMap
    val expect = counts(vocab2).toSeq.sortBy { case (p, s) => (-s, p) }
      .take(TextAnalysis.UlmTopK).zipWithIndex
      .map { case ((p, s), i) => (i + 1, p, s) }
    assert(out == expect, s"engine=$out\nexpect=$expect")
  }

  test("unigram-LM on real data: full coverage, integer scores, deterministic reruns") {
    val dir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("text_unigram_lm")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val b = SparkEntry.queries("text_unigram_lm")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(a == b, "trainer must be deterministic")
    assert(a.size == TextAnalysis.UlmTopK)
    assert(a.map(_._3).sorted.reverse == a.map(_._3), "ranked by score desc")
    assert(a.forall(_._3 > 0))
  }
}
