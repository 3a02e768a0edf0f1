package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Line-level boilerplate removal: planted boilerplate frames (a
  * 4-word "nav bar" shared by many docs) must drop from every carrier
  * with exact per-doc accounting, while unique lines survive.
  */
class LineDedupSpec extends AnyFunSuite with SparkFixture {

  test("planted boilerplate frames drop from every doc; unique lines survive") {
    import spark.implicits._
    val frame = "home about contact legal" // one exact LineWords window
    // docs 1..8 lead with the frame (df 8 > cap 5) then 4 unique words;
    // docs 9..10 are frame-free
    val docs = ((1 to 8).map { i =>
      (i.toLong, s"$frame u${i}a u${i}b u${i}c u${i}d")
    } ++ Seq((9L, "nine solo words here"), (10L, "ten alone tokens now")))
      .toDF("doc_id", "text")
    val got = Dedup.lineDedupOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (1 to 8).foreach { i =>
      assert(got(i.toLong) == ((1L, 1L, frame.length.toLong)),
        s"doc $i must keep its unique line and drop the $frame frame")
    }
    assert(got(9L) == ((1L, 0L, 0L)) && got(10L) == ((1L, 0L, 0L)))
  }

  test("a frame under the df cap is NOT boilerplate (df must exceed, not meet, the cap)") {
    import spark.implicits._
    val frame = "rare shared little frame"
    // exactly LineMaxDocDf docs share the frame -> kept everywhere
    val docs = (1 to Dedup.LineMaxDocDf).map { i =>
      (i.toLong, s"$frame v${i}a v${i}b v${i}c v${i}d")
    }.toDF("doc_id", "text")
    val got = Dedup.lineDedupOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (1 to Dedup.LineMaxDocDf).foreach { i =>
      assert(got(i.toLong) == ((2L, 0L, 0L)), s"doc $i must keep both lines")
    }
  }

  test("partial tail lines segment and account correctly") {
    import spark.implicits._
    // 6 words = one full line + one 2-word tail line
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val r = Dedup.lineDedupOn(docs).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 0L, 0L)))
  }

  test("persisted line-df index equals inline aggregation bit for bit") {
    val dir = "/root/testdata/sf0.001"
    val served = Dedup.lineDedup(spark, dir).collect().toSeq
    val inline = Dedup.lineDedupOn(
      graft.Tables.t(spark, dir, "documents")).collect().toSeq
    assert(served == inline && served.nonEmpty)
  }

  test("incremental append equals a full rebuild over old + new") {
    import spark.implicits._
    val frame = "home about contact legal"
    def doc(i: Int) = (i.toLong, s"$frame u${i}a u${i}b u${i}c u${i}d")
    // old batch carries the frame 4 times (under the df cap); the new
    // batch pushes it to 8 (over) — the append must cross the threshold
    val old = (1 to 4).map(doc).toDF("doc_id", "text")
    val fresh = ((5 to 8).map(doc) :+ ((9L, "nine solo words here")))
      .toDF("doc_id", "text")
    val whInc = java.nio.file.Files.createTempDirectory("line-idx-inc").toString
    LineIndex.build(spark, whInc, old)
    LineIndex.append(spark, whInc, fresh)
    val whFull = java.nio.file.Files.createTempDirectory("line-idx-full").toString
    LineIndex.build(spark, whFull, old.unionByName(fresh))
    def m(wh: String) = LineIndex.readDf(spark, wh).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(whInc) == m(whFull))
    // and the merged index crosses the boilerplate threshold
    val over = m(whInc).count(_._2 > Dedup.LineMaxDocDf)
    assert(over == 1, "the shared frame must be over-threshold after append")
  }
}
