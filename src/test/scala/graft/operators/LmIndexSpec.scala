package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The persisted LM count tables must be indistinguishable from inline
  * aggregation, and incremental appends must equal a full rebuild —
  * counts are sums, so the MERGE maintenance is exact, not approximate.
  */
class LmIndexSpec extends AnyFunSuite with SparkFixture {

  private def docs(data: (Long, String)*): DataFrame = {
    import spark.implicits._
    data.toDF("doc_id", "text")
  }

  private def countMaps(c1: DataFrame, c2: DataFrame) = (
    c1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
    c2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)

  private def inlineCounts(d: DataFrame) = {
    import org.apache.spark.sql.functions._
    val bg = TextAnalysis.bigramHashStream(d)
    (bg.groupBy(col("h1")).agg(count(lit(1)).as("c1")),
      bg.groupBy(col("h2")).agg(count(lit(1)).as("c2")))
  }

  test("persisted counts equal inline aggregation bit for bit") {
    val d = docs((1L, "a b a b c"), (2L, "b c d"), (3L, "a b"))
    val wh = Files.createTempDirectory("lm-idx").toString
    LmIndex.build(spark, wh, d)
    val (p1, p2) = LmIndex.readCounts(spark, wh)
    val (i1, i2) = inlineCounts(d)
    assert(countMaps(p1, p2) == countMaps(i1, i2))
  }

  test("incremental append equals a full rebuild over old + new") {
    val old = docs((1L, "a b a b c"), (2L, "b c d"))
    val fresh = docs((3L, "a b e"), (4L, "e f"), (5L, "b c d d"))
    val whInc = Files.createTempDirectory("lm-idx-inc").toString
    LmIndex.build(spark, whInc, old)
    LmIndex.append(spark, whInc, fresh)
    val whFull = Files.createTempDirectory("lm-idx-full").toString
    LmIndex.build(spark, whFull, old.unionByName(fresh))
    val inc = LmIndex.readCounts(spark, whInc)
    val full = LmIndex.readCounts(spark, whFull)
    assert(countMaps(inc._1, inc._2) == countMaps(full._1, full._2))
  }

  test("lmScore over the served index equals the inline path on testdata") {
    val dir = "/root/testdata/sf0.001"
    val served = TextAnalysis.lmScore(spark, dir).collect().toSeq
    val inline = TextAnalysis.lmScoreOn(
      graft.Tables.t(spark, dir, "documents")).collect().toSeq
    assert(served == inline && served.nonEmpty)
  }
}
