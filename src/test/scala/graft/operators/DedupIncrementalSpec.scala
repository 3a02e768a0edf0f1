package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The duplicate-HIT paths of `dedup_incremental` and the dedup stage
  * of `curation_funnel`, exercised with synthetic duplicates: the
  * oracle gate's fixtures contain (almost) no duplicate texts, so a
  * wrong join key or inverted boundary there would still hash-match on
  * an all-NULL / nothing-filtered result.
  */
class DedupIncrementalSpec extends AnyFunSuite with SparkFixture {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("incdup").toString
    rows.map { case (id, text, lang) => (id, text, lang, "synthetic", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("incremental dedup links new-batch duplicates to the EARLIEST base doc; new texts get null") {
    val dup = "this exact text already exists in the base corpus"
    val dir = writeDocs(Seq(
      (10L, dup, "en"),                       // base: first holder of the hash
      (20L, dup, "en"),                       // base: later duplicate — must NOT win
      (30L, "some other base document", "en"),
      (400L, dup, "en"),                      // delta: duplicate of base → dup_of = 10
      (401L, "genuinely new content", "en"),  // delta: new → null
      (402L, "some other base document", "en"))) // delta: dup of 30
    val got = Dedup.incremental(spark, dir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got == Seq((400L, 10L), (401L, -1L), (402L, 30L)))
  }

  test("curation funnel: duplicates pass the quality gate but only the first survives dedup") {
    // 40-token text with stopwords and no punctuation: pts = 5 + 3 + 2
    val good = ("the quick brown fox jumps over the lazy dog and " * 4).trim
    val junk = "short text" // fails the length gate
    val dir = writeDocs(Seq(
      (1L, good, "en"), (2L, good, "en"), (3L, good, "en"), // exact dups, all quality
      (4L, junk, "en"),
      (5L, good + " unique tail words here", "en")))
    val row = Pipeline.curationFunnel(spark, dir).collect().head
    assert(row.getString(0) == "en")
    assert(row.getLong(1) == 5) // n_total
    assert(row.getLong(2) == 4) // n_quality: junk fails the gate
    assert(row.getLong(3) == 2) // n_kept: {good x3 -> 1} + {good+tail -> 1}
    val expectedChars = good.length + (good + " unique tail words here").length
    assert(row.getLong(4) == expectedChars)
  }
}
