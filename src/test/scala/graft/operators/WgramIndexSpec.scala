package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The substring W-gram index lifecycle: the per-gram-metadata flag
  * read (∃ capped gram with min_doc < doc_id) must equal the original
  * pair-join formulation, persisted ≡ inline on real data, and
  * append ≡ rebuild including the min_doc-lowering and cap-crossing
  * corners.
  */
class WgramIndexSpec extends AnyFunSuite with SparkFixture {

  private def filler(id: Long, n: Int): String =
    (0 until n).map(j => s"w${id}x$j").mkString(" ")

  private val gRun = (1 to Dedup.SubstringWidth).map(i => s"g$i").mkString(" ")

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("metadata flag read equals the pair-join formulation") {
    import spark.implicits._
    // carriers 3, 8, 15 share the W-gram; 20 is gram-free
    val docs = Seq(
      (3L, s"$gRun ${filler(3, 8)}"),
      (8L, s"$gRun ${filler(8, 8)}"),
      (15L, s"$gRun ${filler(15, 8)}"),
      (20L, filler(20, 20))).toDF("doc_id", "text")
    val wh = graft.util.Scratch.dir("wgram-spec")
    WgramIndex.build(spark, wh, docs)
    val flagged = WgramIndex.flaggedDocs(spark, wh)
      .collect().map(_.getLong(0)).sorted.toSeq
    val inline = Dedup.substringFlaggedInline(docs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(flagged == inline && flagged == Seq(8L, 15L)) // 3 is first carrier
  }

  test("append ≡ rebuild; a lower-id late doc lowers min_doc and flags the old first carrier") {
    import spark.implicits._
    val base = Seq(
      (10L, s"$gRun ${filler(10, 8)}"),
      (30L, s"$gRun ${filler(30, 8)}"),
      (40L, filler(40, 20))).toDF("doc_id", "text")
    val batch = Seq((2L, s"$gRun ${filler(2, 8)}")).toDF("doc_id", "text")
    val whInc = graft.util.Scratch.dir("wgram-spec-inc")
    WgramIndex.build(spark, whInc, base)
    WgramIndex.append(spark, whInc, batch)
    val whFull = graft.util.Scratch.dir("wgram-spec-full")
    WgramIndex.build(spark, whFull, base.unionByName(batch))
    assert(sortedRows(WgramIndex.readMeta(spark, whInc)) ==
      sortedRows(WgramIndex.readMeta(spark, whFull)))
    assert(sortedRows(WgramIndex.readPost(spark, whInc)) ==
      sortedRows(WgramIndex.readPost(spark, whFull)))
    // doc 10 was the first carrier (unflagged); batch doc 2 takes over
    // min_doc, so 10 joins 30 in the flag set and 2 is never flagged
    val flagged = WgramIndex.flaggedDocs(spark, whInc)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(flagged == Seq(10L, 30L))
  }

  test("persisted serving index equals the inline formulation on real data") {
    val dir = "/root/testdata/sf0.001"
    val served = Dedup.substringFlagged(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    val inline = Dedup.substringFlaggedInline(
      graft.Tables.t(spark, dir, "documents"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(served == inline)
  }
}
