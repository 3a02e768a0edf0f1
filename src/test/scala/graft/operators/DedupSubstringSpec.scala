package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Known-answer corpus for exact substring dedup: documents with a
  * PLANTED verbatim run of known length inside otherwise-disjoint
  * filler, so `max_run` is checkable by construction, not by
  * re-deriving the algorithm.
  */
class DedupSubstringSpec extends AnyFunSuite with SparkFixture {

  private val W = Dedup.SubstringWidth

  /** n filler words unique to `tag` — never shared across docs. */
  private def filler(tag: String, n: Int): String =
    (1 to n).map(i => s"f${tag}_$i").mkString(" ")

  /** A planted run of exactly n shared tokens. */
  private def planted(n: Int): String = (1 to n).map(i => s"p$i").mkString(" ")

  private def runsOf(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    Dedup.substringRunsOn(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
  }

  test("planted run is recovered at its exact length, once per pair") {
    val run = planted(30) // 30 shared tokens, elsewhere disjoint
    val out = runsOf(Seq(
      1L -> s"${filler("a", 20)} $run ${filler("b", 20)}",
      2L -> s"${filler("c", 5)} $run ${filler("d", 40)}",
      3L -> filler("e", 60))) // no shared run at all
    assert(out.keySet == Set((1L, 2L)))
    val (maxRun, sharedGrams) = out((1L, 2L))
    assert(maxRun == 30) // exact planted length, not W or a multiple
    assert(sharedGrams == 30 - W + 1) // one W-gram per start position
  }

  test("runs shorter than W are invisible; exactly W is the threshold") {
    val below = planted(W - 1)
    val at = planted(W)
    val outBelow = runsOf(Seq(
      1L -> s"${filler("a", 15)} $below ${filler("b", 15)}",
      2L -> s"${filler("c", 15)} $below ${filler("d", 15)}"))
    assert(outBelow.isEmpty)
    val outAt = runsOf(Seq(
      1L -> s"${filler("a", 15)} $at ${filler("b", 15)}",
      2L -> s"${filler("c", 15)} $at ${filler("d", 15)}"))
    assert(outAt((1L, 2L)) == (W.toLong, 1L))
  }

  test("two disjoint shared runs report the longer as max_run") {
    val r1 = planted(20)
    val r2 = (1 to 45).map(i => s"q$i").mkString(" ")
    val out = runsOf(Seq(
      1L -> s"$r1 ${filler("a", 20)} $r2",
      2L -> s"$r2 ${filler("b", 20)} $r1")) // swapped order: deltas differ
    val (maxRun, sharedGrams) = out((1L, 2L))
    assert(maxRun == 45)
    assert(sharedGrams == (20 - W + 1) + (45 - W + 1))
  }

  test("within-doc repetition does not inflate the run") {
    // doc 1 repeats the planted run twice with distinct gaps; the pair
    // still shares a single maximal run of 20
    val run = planted(20)
    val out = runsOf(Seq(
      1L -> s"$run ${filler("a", 15)} $run ${filler("b", 15)}",
      2L -> s"${filler("c", 10)} $run ${filler("d", 25)}"))
    assert(out((1L, 2L))._1 == 20)
  }

  test("a gram shared by more docs than the df cap is dropped in all pairs") {
    // the planted run appears in MaxShingleDf + 2 docs -> every pair is
    // capped away; a second run shared by only two docs survives
    val ubiquitous = planted(W)
    val rare = (1 to W).map(i => s"r$i").mkString(" ")
    val crowd = (3L to (Dedup.MaxShingleDf + 4).toLong).map(id =>
      id -> s"${filler(s"x$id", 15)} $ubiquitous")
    val out = runsOf(Seq(
      1L -> s"$ubiquitous ${filler("a", 10)} $rare",
      2L -> s"$rare ${filler("b", 10)} $ubiquitous") ++ crowd)
    assert(out.keySet == Set((1L, 2L)))
    assert(out((1L, 2L)) == (W.toLong, 1L))
  }
}
