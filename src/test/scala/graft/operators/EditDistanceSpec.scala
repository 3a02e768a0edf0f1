package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Character-level dedup ([[Dedup.editDistance]]): the edit gate must
  * keep what token-set measures miss (small in-word typos) and drop
  * what they over-claim (token reorderings) — the two directions the
  * operator exists for — and the expensive DP must only ever run on
  * shingle-sharing candidates.
  */
class EditDistanceSpec extends AnyFunSuite with SparkFixture {

  test("typo pair kept, reordered pair candidate-but-rejected, unrelated never a candidate") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"word$i").mkString(" ")
    // a few in-word character edits, spread out: most shingles intact
    val typos = base.replace("word7", "wxrd7")
      .replace("word19", "w0rd19").replace("word28", "word2x")
    // halves swapped: token multiset identical, character order not
    val reordered = ((16 to 30) ++ (1 to 15)).map(i => s"word$i").mkString(" ")
    val unrelated = (1 to 30).map(i => s"other$i").mkString(" ")
    val docs = Seq(
      (0L, base), (1L, typos), (2L, reordered), (3L, unrelated))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("editdist").toString
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")

    // positive control: the reordered doc IS a candidate (shares well
    // over MinEditCommon shingles with the base) — so its absence
    // below is the edit gate working, not candidate generation failing
    val idx = Dedup.shingleIndex(spark, dir)
    val common02 = idx.as("a").join(idx.as("b"),
        col("a.s") === col("b.s") &&
          col("a.doc_id") === 0L && col("b.doc_id") === 2L)
      .count()
    assert(common02 >= Dedup.MinEditCommon, s"reordered pair shares only $common02 shingles")

    val pairs = Dedup.editDistance(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(pairs.keySet == Set((0L, 1L)), s"expected only the typo pair, got ${pairs.keySet}")
    assert(pairs((0L, 1L)) >= Dedup.EditSimThreshold)
  }

  test("embed_outliers: per-label top-k, contiguous ranks, non-increasing distance") {
    val rows = Similarity.embedOutliers(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (label, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length), s"label $label ranks")
      assert(sorted.length <= Similarity.EmbedOutlierK)
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 >= b._3, s"label $label distance order")
        case _ =>
      }
    }
  }
}
