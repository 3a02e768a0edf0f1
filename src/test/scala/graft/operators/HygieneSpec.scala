package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Semantics of the data-hygiene operators on purpose-built corpora
  * (the oracle gate checks cross-engine equality on the fixture; these
  * tests pin the SEMANTICS on inputs where the right answer is known
  * by construction).
  */
class HygieneSpec extends AnyFunSuite with SparkFixture {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("hygiene").toString
    rows.map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("decontamination flags exactly the docs sharing 5-grams with the bench split") {
    // doc 7 is in the benchmark split (7 % 7 == 0); doc 8 copies a
    // 6-word span of it (two shared 5-grams); docs 9/10 are disjoint
    val bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      7L -> bench,
      8L -> s"alpha beta gamma delta epsilon zeta x1 y1 z1 w1 v1",
      9L -> "one two three four five six seven eight nine ten",
      10L -> "red orange yellow green blue indigo violet pink brown black")
    val dir = writeDocs(docs)
    val out = Hygiene.decontamOverlap(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(8L))
    val r = out.head
    assert(r.getLong(1) == 2) // alpha..epsilon, beta..zeta
    assert(r.getLong(2) == 7) // 11 words -> 7 shingles
  }

  test("repetition metrics: known duplicate-heavy vs all-distinct docs") {
    val dir = writeDocs(Seq(
      // "ab cd ab cd ab" — top bigram ab_cd occurs 2x, 10 non-space chars
      1L -> "ab cd ab cd ab",
      2L -> "one two three four"))
    val out = Hygiene.textRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getInt(1) == 5 && r1.getInt(2) == 2) // n_words, distinct
    assert(math.abs(r1.getDouble(3) - 0.6) < 1e-12) // dup_word_frac = 3/5
    assert(r1.getString(4) == "ab_cd" && r1.getLong(5) == 2)
    assert(math.abs(r1.getDouble(6) - 0.8) < 1e-12) // 2*4/10
    val r2 = out(2L)
    assert(r2.getDouble(3) == 0.0 && r2.getLong(5) == 1)
  }

  test("pii redaction removes every match and counts them") {
    // ids chosen so the injection rule adds an email (20), a phone
    // (25), and nothing (21); doc 21 must not appear in the output
    val dir = writeDocs(Seq(
      20L -> "plain words here",
      21L -> "no pii in this one",
      25L -> "more plain words"))
    val out = Hygiene.piiRedact(spark, dir)
    val rows = out.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(rows == Map(20L -> ((1, 0)), 25L -> ((0, 1))))
    // the redacted text (recomputed) contains placeholders, no raw PII
    val red = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("t", when(col("doc_id") % 10 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com for details"))).otherwise(col("text")))
      .select(regexp_replace(col("t"), lit(Hygiene.EmailRe), lit("<EMAIL>")).as("r"))
      .filter(col("r").contains("<EMAIL>"))
    assert(red.count() == 1)
    assert(red.filter(col("r").contains("@")).count() == 0)
  }

  /** Reference implementation of the release's symmetric-geometric
    * noise draw (md5-prefix hash → sign bit + trailing-zero magnitude)
    * — the spec recomputes what both engines must emit.
    */
  private def dpNoiseRef(salt: String, lang: String, source: String, lenKb: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$lang:$source:$lenKb".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex, 16)
    val mag = java.lang.Long.numberOfTrailingZeros((h >> 1) | 65536L).toLong
    if (h % 2 == 1) mag else -mag
  }

  test("dp release: deterministic noise, contribution clipping, small-cell suppression") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dp").toString
    // one big cell (30 docs, n_chars 2500 → clipped to DpMassCap each,
    // len bucket 2) and one single-document cell that the noisy-count
    // suppression threshold must hide (|noise| ≤ 16 < the 30-doc count,
    // and 1 + noise < 5 unless the deterministic draw says otherwise)
    val docs = (1L to 30L).map(i => (i, "x", "en", "web", 2500L)) :+
      ((99L, "x", "zz", "web", 50L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = Hygiene.dpCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    val nExp = math.max(30L + dpNoiseRef("dpn", "en", "web", 2L), 0L)
    val mExp = math.max(
      30L * Hygiene.DpMassCap + dpNoiseRef("dpm", "en", "web", 2L) * Hygiene.DpMassCap, 0L)
    assert(out(("en", "web", 2L)) == ((nExp, mExp)))
    // the singleton cell: released only if its noisy count clears the
    // threshold — with this fixture's deterministic draw it must not
    val zzNoisy = math.max(1L + dpNoiseRef("dpn", "zz", "web", 0L), 0L)
    assert(out.contains(("zz", "web", 0L)) == (zzNoisy >= Hygiene.DpSuppressK))
    // true counts never appear: the released count differs from the
    // true one whenever the draw is nonzero (it is, for this cell)
    assert(dpNoiseRef("dpn", "en", "web", 2L) != 0L || nExp == 30L)
  }
}
