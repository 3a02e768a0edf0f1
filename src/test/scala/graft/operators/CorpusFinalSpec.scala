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
  * compose.
  */
class CorpusFinalSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = Pipeline.corpusFinal(spark, dir).collect()

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  private def corpus = docs.filter(col("doc_id") % Hygiene.BenchMod =!= 0)

  test("gate counters are monotone non-increasing in pipeline order") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(nd, nq, ndd, nc, nf) = (2 to 6).map(r.getLong).toSeq
      assert(nd >= nq && nq >= ndd && ndd >= nc && nc >= nf,
        s"non-monotone gate chain in row $r")
    }
  }

  test("candidate total = corpus minus eval suite") {
    assert(rows.map(_.getLong(2)).sum == corpus.count())
  }

  test("quality attrition reconciles with the standalone quality gate") {
    val expected = corpus
      .filter(TextAnalysis.qualityPoints(col("text")) >= 8).count()
    assert(rows.map(_.getLong(3)).sum == expected)
  }

  test("dedup attrition reconciles with dedup_keep_best") {
    val losers = Dedup.keepBest(spark, dir)
      .filter(!col("keep")).select(col("doc_id"))
    val expected = corpus
      .filter(TextAnalysis.qualityPoints(col("text")) >= 8)
      .join(losers, Seq("doc_id"), "left_anti").count()
    assert(rows.map(_.getLong(4)).sum == expected)
  }

  test("clean attrition reconciles with both decontamination queries") {
    val losers = Dedup.keepBest(spark, dir)
      .filter(!col("keep")).select(col("doc_id"))
    val ngramBad = Hygiene.decontamOverlap(spark, dir).select(col("doc_id"))
    val semBad = Hygiene.decontamSemantic(spark, dir)
      .select(col("vec_id").as("doc_id"))
    val expected = corpus
      .filter(TextAnalysis.qualityPoints(col("text")) >= 8)
      .join(losers, Seq("doc_id"), "left_anti")
      .join(ngramBad, Seq("doc_id"), "left_anti")
      .join(semBad, Seq("doc_id"), "left_anti")
      .count()
    assert(rows.map(_.getLong(5)).sum == expected)
  }

  test("split totals reconcile with split_group_aware under the gates") {
    // the composed split must be the group-aware assignment, never a
    // per-doc hash: compare per-split clean counts against the
    // standalone split query restricted to the same survivor set
    val losers = Dedup.keepBest(spark, dir)
      .filter(!col("keep")).select(col("doc_id"))
    val ngramBad = Hygiene.decontamOverlap(spark, dir).select(col("doc_id"))
    val semBad = Hygiene.decontamSemantic(spark, dir)
      .select(col("vec_id").as("doc_id"))
    val surv = corpus
      .filter(TextAnalysis.qualityPoints(col("text")) >= 8)
      .join(losers, Seq("doc_id"), "left_anti")
      .join(ngramBad, Seq("doc_id"), "left_anti")
      .join(semBad, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
    val expected = Pipeline.splitGroupAware(spark, dir)
      .join(surv, Seq("doc_id"))
      .groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(5)).sum).toMap
      .filter(_._2 > 0)
    assert(got == expected.filter(_._2 > 0))
  }

  test("mixture: the minimum-mass source keeps its whole clean set (rate 1)") {
    // per construction keep_threshold = target*MixRes DIV total, and the
    // min-mass source has target == total -> threshold == MixRes -> every
    // clean doc's draw passes; sampling noise cannot break this row
    val perSource = rows.groupBy(_.getString(0)).view
      .mapValues(rs => (rs.map(_.getLong(5)).sum, rs.map(_.getLong(6)).sum)).toMap
      .filter(_._2._1 > 0)
    assert(perSource.exists { case (_, (clean, fin)) => clean == fin },
      s"no source kept its full clean set: $perSource")
  }
}
