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
}
