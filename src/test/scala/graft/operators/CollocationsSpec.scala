package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Collocation mining ([[TextAnalysis.collocations]]): the lift ratio
  * must put the genuinely BOUND pair (always adjacent, never apart)
  * above merely frequent pairs, the arithmetic must match the
  * hand-computed PMI argument exactly, and lift ties must break
  * deterministically on (w1, w2).
  */
class CollocationsSpec extends AnyFunSuite with SparkFixture {

  test("bound pair outranks frequent-but-independent pairs; hand-computed lifts; tie order") {
    import spark.implicits._
    // 16 tokens, 12 bigrams. "new york" is bound (4/4 adjacent);
    // every other pair occurs twice with independent-ish members.
    val docs = Seq(
      (0L, "new york a b", "en"), (1L, "new york b a", "en"),
      (2L, "new york a b", "en"), (3L, "new york b a", "en"))
      .toDF("doc_id", "text", "lang")
    val dir = Files.createTempDirectory("colloc").toString
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")

    val out = TextAnalysis.collocations(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    // lift(new york) = 4·16/(4·4) = 4.0; every two-count pair =
    // 2·16/(4·4) = 2.0, tied → ordered by (w1, w2)
    assert(out.toSeq == Seq(
      (1L, "new", "york", 4L, 4L, 4L, 4.0),
      (2L, "a", "b", 2L, 4L, 4L, 2.0),
      (3L, "b", "a", 2L, 4L, 4L, 2.0),
      (4L, "york", "a", 2L, 4L, 4L, 2.0),
      (5L, "york", "b", 2L, 4L, 4L, 2.0)))
  }
}
