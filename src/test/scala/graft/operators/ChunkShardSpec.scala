package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Known-answer semantics for the corpus output-prep operators added
  * this round: overlapping-window chunking, token-mass shard layout,
  * and last-touch attribution.
  */
class ChunkShardSpec extends AnyFunSuite with SparkFixture {

  import TextAnalysis.{ChunkChars, ChunkStride}

  test("chunking: window arithmetic — count, offsets, exact tail length") {
    import spark.implicits._
    // lengths straddling the boundaries: 0, W, W+1 (first length that
    // needs a 2nd chunk), W+S (still 2), W+S+1 (first needing a 3rd)
    val docs = Seq(
      (0L, ""),
      (1L, "x" * ChunkChars),
      (2L, "y" * (ChunkChars + 1)),
      (3L, "z" * (ChunkChars + ChunkStride)),
      (4L, "w" * (ChunkChars + ChunkStride + 1))
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.chunkingOn(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    val byDoc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(0L) == Seq((0L, 0, 0, 0))) // empty text: one empty chunk
    assert(byDoc(1L) == Seq((1L, 0, 0, ChunkChars)))
    assert(byDoc(2L) == Seq((2L, 0, 0, ChunkChars),
      (2L, 1, ChunkStride, ChunkChars + 1 - ChunkStride)))
    assert(byDoc(3L).map(_._4) == Seq(ChunkChars, ChunkChars))
    assert(byDoc(4L).map(_._4) ==
      Seq(ChunkChars, ChunkChars, ChunkChars + ChunkStride + 1 - 2 * ChunkStride))
  }

  test("chunking: consecutive chunks overlap by exactly W - S chars") {
    import spark.implicits._
    val text = (0 until 1000).map(i => ('a' + i % 26).toChar).mkString
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val rows = TextAnalysis.chunkingOn(docs).collect().sortBy(_.getInt(1))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getInt(2) - a.getInt(2) == ChunkStride)
        // previous chunk covers [start, start+W) — the next starts S in,
        // so W - S chars are shared
        assert(a.getInt(2) + a.getInt(3) - b.getInt(2) == ChunkChars - ChunkStride)
      case _ => ()
    }
    // full coverage: last chunk reaches the end of the text
    val last = rows.last
    assert(last.getInt(2) + last.getInt(3) == text.length)
  }

  test("shards: layout partitions the gated corpus exactly; count follows token mass") {
    import spark.implicits._
    // 60 tokens incl. a stopword → quality points 10, passes the gate;
    // doc_ids divisible by BenchMod (7) are eval docs and excluded
    val text = (Seq("the") ++ Seq.fill(59)("aa")).mkString(" ")
    def corpus(n: Long) = (1L to n).map(d => (d, text, 180L))
      .toDF("doc_id", "text", "n_chars")
    val out = Pipeline.corpusShardsOn(corpus(400L)).collect()
    // 400 − 57 eval docs = 343 surviving × 60 tokens = 20580
    //   → 20580 DIV 20000 = 1 shard
    assert(out.map(_.getLong(0)).toSeq == Seq(0L))
    assert(out.head.getLong(1) == 343L && out.head.getLong(2) == 20580L)
    assert(out.head.getDouble(4) == 1.0) // single shard is perfectly balanced
    // 3× the docs: 1029 surviving × 60 = 61740 → 3 shards
    val out3 = Pipeline.corpusShardsOn(corpus(1200L)).collect()
    assert(out3.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(out3.map(_.getLong(1)).sum == 1029L) // every surviving doc in exactly one shard
    assert(out3.map(_.getLong(2)).sum == 61740L)
    // a failing-quality doc never reaches a shard
    val withBad = corpus(400L)
      .union(Seq((401L, "the the the", 11L)).toDF("doc_id", "text", "n_chars"))
    val outB = Pipeline.corpusShardsOn(withBad).collect()
    assert(outB.map(_.getLong(1)).sum == 343L)
  }

  test("perceptron: separable planted corpus converges after one full-batch round") {
    import spark.implicits._
    // doc A (good, y=+1): 30 tokens ("the" + 29×"aa", 90 chars), one
    //   stopword, no punct → features (1, 30 DIV 25, 1, 0, 90 DIV 50)
    //   = (1, 1, 1, 0, 1)
    // doc B (bad, y=−1): "the the the" → (1, 0, 3, 0, 0)
    // round 1: w=0 misclassifies both → w = (0, 1, −2, 0, 1)
    // round 2: A dot=0 (y·dot=0 → still misclassified), B dot=−6 ✓
    //   → w += A = (1, 2, −1, 0, 2)
    // round 3: A dot=4 ✓, B dot=−2 ✓ → converged, weights frozen
    val good = (Seq("the") ++ Seq.fill(29)("aa")).mkString(" ")
    val docs = Seq((1L, good), (2L, "the the the")).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityClassifierOn(spark, docs).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    assert(rows.map(_._1).toSeq == (1 to TextAnalysis.PerceptronRounds))
    assert(rows(0) == ((1, 2L, (0L, 1L, -2L, 0L, 1L))))
    assert(rows(1) == ((2, 1L, (1L, 2L, -1L, 0L, 2L))))
    rows.drop(2).foreach { case (_, nMis, w) =>
      assert(nMis == 0L && w == ((1L, 2L, -1L, 0L, 2L)))
    }
  }

  test("perceptron apply: converged weights reproduce the teacher on the planted corpus") {
    import spark.implicits._
    // 2 good + 1 bad doc: round 1 updates w to (1, 2, −1, 0, 2), round
    // 2 classifies everything correctly → apply keeps exactly the
    // goods and agrees with the teacher on every doc
    val good = (Seq("the") ++ Seq.fill(29)("aa")).mkString(" ")
    val docs = Seq(("s1", good), ("s1", "the the the"), ("s2", good))
      .toDF("source", "text")
    val out = TextAnalysis.qualityClassifierApplyOn(spark, docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("s1") == ((2L, 1L, 2L)))
    assert(out("s2") == ((1L, 1L, 1L)))
  }

  test("scenes: planted brightness jumps cut exactly where they exceed the delta") {
    import spark.implicits._
    val d = Multimodal.SceneCutDelta
    // doc 1: jumps of ±(d+1) after frames 2 and 4 → scenes [2, 2, 1]
    // doc 2: all moves ≤ d → one scene of 3
    val frames = Seq(
      (1L, 0, 10), (1L, 10, 10), (1L, 20, 10 + d + 1), (1L, 30, 10 + d + 5),
      (1L, 40, 5),
      (2L, 0, 100), (2L, 10, 100 + d), (2L, 20, 100)
    ).toDF("doc_id", "frame_idx", "brightness")
    val out = Multimodal.sceneDetectOn(frames).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) == ((5L, 3L, 2L, 1L)))
    assert(out(2L) == ((3L, 1L, 3L, 3L)))
  }

  test("kmv set algebra: sub-k vocabularies make every estimate exact") {
    import spark.implicits._
    // vocabularies far below k=256, so sketches hold the full hash
    // sets and the estimators collapse to exact set arithmetic:
    // A={a,b,c}, B={b,c,d}: union 4, inter 2, J=0.5, inter-est 2
    // A∩C=∅: union 5, inter 0, J=0, inter-est 0
    val docs = Seq(
      ("A", "a b c"), ("B", "b c d"), ("C", "x y")
    ).toDF("source", "text")
    val out = Relational.kmvSetAlgebraOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))))
      .toMap
    assert(out(("A", "B")) == ((4L, 4L, 2L, 0.5, 2L)))
    assert(out(("A", "C")) == ((5L, 5L, 0L, 0.0, 0L)))
    assert(out(("B", "C")) == ((5L, 5L, 0L, 0.0, 0L)))
  }

  test("kmv sketch values: ascending retained minima, capped at k") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => ("g", i)).toDF("g", "v")
      .select(col("g"), Dedup.phash(col("v").cast("string")).as("h"))
    val row = df.groupBy("g")
      .agg(graft.functions.KmvSketchAgg.kmvSketchValues(col("h"), 16).as("kmv"))
      .select(col("kmv.sketch_size"), col("kmv.values")).collect()(0)
    val vals = row.getSeq[Long](1)
    assert(row.getLong(0) == 16L && vals.length == 16)
    assert(vals == vals.sorted, "retained minima must be ascending")
    // they are the true 16 smallest of the full hash set
    val all = df.select("h").collect().map(_.getLong(0)).distinct.sorted.take(16).toSeq
    assert(vals == all)
  }

  test("attribution: planted sequence credits the strictly-preceding touch") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    // user 1: view@1, click@2, purchase@3 (→ click), purchase@4 (→ click)
    // user 2: purchase@1 with no preceding touch (→ direct)
    // user 3: click@5, view@6, purchase@7 (→ view: LAST touch wins)
    val ev = Seq(
      (1L, 1L, "view", 0.0, ts(1)), (2L, 1L, "click", 0.0, ts(2)),
      (3L, 1L, "purchase", 10.0, ts(3)), (4L, 1L, "purchase", 5.0, ts(4)),
      (5L, 2L, "purchase", 7.0, ts(1)),
      (6L, 3L, "click", 0.0, ts(5)), (7L, 3L, "view", 0.0, ts(6)),
      (8L, 3L, "purchase", 2.0, ts(7))
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = Funnels.eventAttributionOn(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out("click") == ((2L, 15.0, 3000L))) // delays 1 ms + 2 ms in µs
    assert(out("direct") == ((1L, 7.0, 0L)))
    assert(out("view") == ((1L, 2.0, 1000L)))
  }

  test("stickiness: WAU equals the brute 7-day distinct, DAU ≤ WAU, days clamp to the observed range") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = Funnels.eventStickiness(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    assert(out.nonEmpty)
    val (mn, mx) = (pairs.map(_._2).min, pairs.map(_._2).max)
    assert(out.map(_._1).toSeq == (mn to mx).filter(d => pairs.exists(_._2 == d)))
    out.foreach { case (day, (dau, wau, st)) =>
      val bruteDau = pairs.filter(_._2 == day).map(_._1).distinct.length.toLong
      val bruteWau = pairs.filter(p => p._2 >= day - 6 && p._2 <= day)
        .map(_._1).distinct.length.toLong
      assert(dau == bruteDau && wau == bruteWau, s"day $day")
      assert(dau <= wau && st <= 1.0)
    }
  }
}
