package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The composed corpus manifest (`corpus_final`) must RECONCILE with
  * the standalone gate queries it is built from: every cumulative
  * attrition column equals the count derivable from the standalone
  * query outputs, and the per-row counters are monotone in pipeline
  * order. This is the spec the round-12 verdict asked for — the
  * composition may not silently drift from the gates it claims to
  * compose. Round 14 adds the substring gate, line-level cleanup and
  * the temperature mixture variant to the reconciliation.
  *
  * Column layout: 0 source, 1 split, 2 n_docs, 3 n_quality, 4 n_dedup,
  * 5 n_substr, 6 n_clean, 7 n_final, 8 tokens_final,
  * 9 tokens_line_dropped.
  */
class CorpusFinalSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = Pipeline.corpusFinal(spark, dir).collect()
  private lazy val tempRows = Pipeline.corpusFinalTemperature(spark, dir).collect()

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  private def corpus = docs.filter(col("doc_id") % Hygiene.BenchMod =!= 0)

  /** The cumulative survivor set after gate `n` (1 = quality,
    * 2 = +keep-best, 3 = +substring, 4 = +decontam) — each term from
    * the STANDALONE query it must reconcile with.
    */
  private def survAfter(n: Int) = {
    var s = corpus.filter(TextAnalysis.qualityPoints(col("text")) >= 8)
      .select(col("doc_id"))
    if (n >= 2) s = s.join(
      Dedup.keepBest(spark, dir).filter(!col("keep")).select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    if (n >= 3) s = s.join(
      Dedup.substringRuns(spark, dir).select(col("y").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    if (n >= 4) s = s
      .join(Hygiene.decontamOverlap(spark, dir).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .join(Hygiene.decontamSemantic(spark, dir).select(col("vec_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
    s
  }

  test("gate counters are monotone non-increasing in pipeline order") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(nd, nq, ndd, ns, nc, nf) = (2 to 7).map(r.getLong).toSeq
      assert(nd >= nq && nq >= ndd && ndd >= ns && ns >= nc && nc >= nf,
        s"non-monotone gate chain in row $r")
    }
  }

  test("candidate total = corpus minus eval suite") {
    assert(rows.map(_.getLong(2)).sum == corpus.count())
  }

  test("quality attrition reconciles with the standalone quality gate") {
    assert(rows.map(_.getLong(3)).sum == survAfter(1).count())
  }

  test("dedup attrition reconciles with dedup_keep_best") {
    assert(rows.map(_.getLong(4)).sum == survAfter(2).count())
  }

  test("substring attrition reconciles with dedup_substring's pair set") {
    assert(rows.map(_.getLong(5)).sum == survAfter(3).count())
    // and the gate actually fires on this corpus (the reconciliation
    // is vacuous if no survivor carries a flagged run)
    assert(rows.map(_.getLong(4)).sum > rows.map(_.getLong(5)).sum,
      "expected at least one quality+dedup survivor flagged by the substring gate")
  }

  test("clean attrition reconciles with both decontamination queries") {
    assert(rows.map(_.getLong(6)).sum == survAfter(4).count())
  }

  test("line cleanup reconciles with text_line_dedup's per-doc ledger") {
    // tokens_line_dropped sums (nt - nt_clean) over survivors; each
    // doc's dropped-token mass must be bounded by its ledger line
    // counts (each dropped line carries 1..LineWords tokens) and be
    // zero exactly when the ledger dropped no lines
    val perDoc = corpus
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
      .join(Dedup.lineCleanTokens(spark, dir), Seq("doc_id"))
      .join(Dedup.lineDedup(spark, dir).select(col("doc_id"), col("lines_dropped")),
        Seq("doc_id"))
      .select(col("doc_id"), (col("nt") - col("nt_clean")).as("dropped"),
        col("lines_dropped"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val (dropped, lines) = (r.getLong(1), r.getLong(2))
      if (lines == 0L) assert(dropped == 0L, s"doc ${r.getLong(0)}: no dropped lines but $dropped dropped tokens")
      else assert(dropped >= lines && dropped <= lines * Dedup.LineWords,
        s"doc ${r.getLong(0)}: $dropped dropped tokens outside [$lines, ${lines * Dedup.LineWords}]")
    }
    // and the manifest column equals the survivor-restricted sum
    val surv = survAfter(4)
    val expected = corpus
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
      .join(Dedup.lineCleanTokens(spark, dir), Seq("doc_id"))
      .join(surv, Seq("doc_id"))
      .agg(sum(col("nt") - col("nt_clean"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(9)).sum == expected)
  }

  test("split totals reconcile with split_group_aware under the gates") {
    // the composed split must be the group-aware assignment, never a
    // per-doc hash: compare per-split clean counts against the
    // standalone split query restricted to the same survivor set
    val expected = Pipeline.splitGroupAware(spark, dir)
      .join(survAfter(4), Seq("doc_id"))
      .groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(6)).sum).toMap
      .filter(_._2 > 0)
    assert(got == expected.filter(_._2 > 0))
  }

  test("mixture: the minimum-mass source keeps its whole clean set (rate 1)") {
    // per construction keep_threshold = target*MixRes DIV total, and the
    // min-mass source has target == total -> threshold == MixRes -> every
    // clean doc's draw passes; sampling noise cannot break this row
    val perSource = rows.groupBy(_.getString(0)).view
      .mapValues(rs => (rs.map(_.getLong(6)).sum, rs.map(_.getLong(7)).sum)).toMap
      .filter(_._2._1 > 0)
    assert(perSource.exists { case (_, (clean, fin)) => clean == fin },
      s"no source kept its full clean set: $perSource")
  }

  test("temperature variant: identical gate stack, mix_temperature's targets") {
    // gates are mixture-independent: every pre-mixture column must be
    // bit-identical between the two variants
    def gates(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getString(0), r.getString(1)) -> (2 to 6).map(r.getLong).toSeq).toMap
    assert(gates(tempRows) == gates(rows))
    // n_final per source must equal an independent re-derivation:
    // standalone gate joins -> clean token totals -> the SHARED
    // temperature threshold formula -> the salted integer draw
    val surv = survAfter(4)
    val clean = corpus.select(col("doc_id"), col("source"))
      .join(Dedup.lineCleanTokens(spark, dir), Seq("doc_id"))
      .join(surv, Seq("doc_id"))
    val thr = Pipeline.temperatureKeepThresholds(
      clean.groupBy(col("source")).agg(sum(col("nt_clean")).as("total_tokens")))
    val draw = pmod(Dedup.phash(concat_ws(":", lit("cft"), col("source"),
      col("doc_id").cast("string"))), lit(Pipeline.MixRes))
    val expected = clean.join(thr, Seq("source"))
      .filter(draw < col("keep_threshold"))
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = tempRows.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(7)).sum).toMap.filter(_._2 > 0)
    assert(got == expected.filter(_._2 > 0))
    // flattening direction (threshold-level, noise-free): α = 0.5 sits
    // between the uniform min-target plan and natural sampling, so the
    // head source's integer keep threshold must RISE vs uniform while
    // staying below full keep; the min-mass source keeps everything
    // (sqrt(n_min)·Σ√n ≤ Σn, so its flattened target covers its mass)
    val totals = clean.groupBy(col("source"))
      .agg(sum(col("nt_clean")).as("total_tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tempThr = thr.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val head = totals.maxBy(_._2)._1
    val minSrc = totals.minBy(_._2)._1
    val uniHeadThr = totals(minSrc) * Pipeline.MixRes / totals(head)
    assert(totals.size > 1 && tempThr(head) > uniHeadThr,
      s"temperature must keep more of the head than the uniform plan: $tempThr vs $uniHeadThr")
    assert(tempThr(head) < Pipeline.MixRes, "the head source must still downsample")
    assert(tempThr(minSrc) == Pipeline.MixRes,
      s"the min-mass source must keep its whole clean set: $tempThr")
  }
}
