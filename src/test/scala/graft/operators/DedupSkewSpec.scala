package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The 100 TB skew guard, demonstrated: a boilerplate shingle shared by
  * every document must NOT create an all-pairs explosion in the n-gram
  * inverted-index join. With the document-frequency cap the hot shingle
  * drops out of the index; without it the self-join would materialize
  * n²/2 candidate pairs.
  */
class DedupSkewSpec extends AnyFunSuite with SparkFixture {

  test("df cap drops boilerplate shingles; true near-dups still pair up") {
    import spark.implicits._
    val n = 1000
    val boiler = "common license header words repeated on every page" // 8-word shingle source
    // every doc shares the boilerplate; docs 0/1 additionally share a
    // long unique-ish body (true near-duplicates); the rest are random
    val docs = (0 until n).map { i =>
      val body =
        if (i <= 1) s"alpha beta gamma delta epsilon zeta eta theta iota kappa v$i"
        else (1 to 12).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"$boiler $body", "en", "synthetic", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("skew").toString
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")

    val idx = Dedup.shingleIndex(spark, dir)
    val hotShingle = "common_license_header_words_repeated"
    // positive control: the raw (uncapped) stream DOES contain the hot
    // shingle — otherwise the exclusion assert below passes vacuously
    // whenever the shingle encoding changes
    assert(Dedup.shingleStream(spark.read.parquet(s"$dir/documents.parquet"))
      .filter(col("s") === hotShingle).count() == n)
    // the boilerplate shingles (df = 1000 > cap) are gone from the index
    assert(idx.filter(col("s") === hotShingle).count() == 0)
    // per-shingle fanout is bounded by the cap — the join's worst bucket
    val maxDf = idx.groupBy("s").count().agg(max("count")).collect().head.getLong(0)
    assert(maxDf <= Dedup.MaxShingleDf)

    // the true near-dup pair (docs 0,1) still survives: their shared
    // body shingles are rare and stay in the index
    val pairs = Dedup.ngramJaccard(spark, dir).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
  }

  test("semantic dedup: over-cap cluster is skipped-and-reported, small clusters still scored") {
    import spark.implicits._
    // identical unit vectors → every within-cluster pair is a near-dup
    val vec = Array.fill(4)(0.5f)
    val e = (0L to 6L).map(i => (i, vec)).toDF("vec_id", "embedding")
      .withColumn("nsq", Dedup.decimalNormSq(col("embedding")))
    // deliberately skewed blocking: cluster 0 holds 5 of 7 vectors
    val a = Seq(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 1, 6L -> 1)
      .toDF("vec_id", "cid")
    val out = Dedup.semanticDedupOn(e, a, maxClusterSize = 4L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // the degenerate cluster pays ZERO pairwise work and says so;
    // the small cluster still drops its higher-id duplicate
    assert(out.toSeq == Seq((0, 5L, 0L, true), (1, 2L, 1L, false)))
    // control: without the cap the same cluster detonates into 4 drops
    val unc = Dedup.semanticDedupOn(e, a, maxClusterSize = 100L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(unc.toSeq == Seq((0, 5L, 4L, false), (1, 2L, 1L, false)))
  }

  test("edit-distance: a replica clique is skipped-and-flagged, organic near-dups still verify") {
    import spark.implicits._
    // a degenerate clique: the SAME text replicated 40 times (df of
    // every clique shingle = 40 > cap) — the replica shape that made
    // the sf1 probe quadratic; plus one organic near-dup pair (one
    // character apart) whose shingles stay under the cap
    val clique = (0 until 40).map(i =>
      (100L + i, "the quick brown fox jumps over the lazy dog again and again", "en", "synthetic", 0L))
    val organic = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "synthetic", 0L),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappaX", "en", "synthetic", 0L))
    val dir = Files.createTempDirectory("editcap").toString
    (clique ++ organic).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val idx = Dedup.shingleIndex(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = Dedup.editDistanceOn(idx, docs, maxDf = Dedup.EditMaxShingleDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(5), r.getBoolean(6)))
    // the 40-doc clique (780 DP pairs) never reaches the DP; the
    // organic pair survives, unflagged
    assert(out.toSeq == Seq((0L, 1L, false, false)))
    // control: without the cap the clique detonates into 780 verified
    // pairs — the work the cap exists to refuse
    val unc = Dedup.editDistanceOn(idx, docs, maxDf = 10000L).collect()
    assert(unc.length == 1 + 40 * 39 / 2)
    // the cap is REPORTED, not silent: pairing a clique member with a
    // near-copy below MinEditCommon shared capped shingles is absent,
    // but a mixed pair would carry the flag — prove the flag path with
    // a doc sharing SOME capped and SOME free shingles
    val mixed = Seq(
      (200L, "the quick brown fox jumps over the lazy dog again and again unique tail one two three four five", "en", "synthetic", 0L),
      (201L, "the quick brown fox jumps over the lazy dog again and again unique tail one two three four fivX", "en", "synthetic", 0L))
    val dir2 = Files.createTempDirectory("editcap2").toString
    (clique ++ mixed).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir2/documents.parquet")
    val out2 = Dedup.editDistanceOn(Dedup.shingleIndex(spark, dir2),
        spark.read.parquet(s"$dir2/documents.parquet"), maxDf = Dedup.EditMaxShingleDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(5), r.getBoolean(6)))
    // 200/201 pair via their free tail shingles AND carry the capped
    // flag (their head shingles sit in the skipped clique group)
    assert(out2.toSeq == Seq((200L, 201L, true, true)))
  }
}
