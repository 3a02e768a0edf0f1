package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Multimodal plumbing: binary schema, deterministic stub decode, and
  * the partition-batched executor-side decode path.
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("media table exposes binary payload + format tag") {
    val mt = Multimodal.mediaTable(spark, dir)
    assert(mt.schema("payload").dataType.typeName == "binary")
    val row = mt.orderBy("doc_id").first()
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("stub decoder is deterministic and within declared ranges") {
    val (w1, h1, f1) = Multimodal.StubDecoder.decode("hello world".getBytes("UTF-8"), "img")
    val (w2, h2, f2) = Multimodal.StubDecoder.decode("hello world".getBytes("UTF-8"), "img")
    assert((w1, h1, f1) == (w2, h2, f2))
    assert(w1 >= 160 && w1 < 1920 && h1 >= 120 && h1 < 1080 && f1 >= 1 && f1 <= 240)
  }

  test("frame sampling yields exactly the strided frames of every document") {
    val byDoc = Multimodal.frameSamples(spark, dir).collect()
      .groupBy(_.getLong(0))
    val meta = Multimodal.decodeMeta(spark, dir).collect()
    assert(meta.nonEmpty && byDoc.size == meta.length)
    meta.foreach { m =>
      val frames = byDoc(m.doc_id).map(_.getInt(1)).toSeq
      val expected = 0 until m.n_frames by Multimodal.FrameStride
      assert(frames == expected.toSeq, s"doc ${m.doc_id}")
    }
    byDoc.values.flatten.foreach { r =>
      val b = r.getInt(2)
      assert(b >= 0 && b < 256)
    }
  }

  test("audio analysis: frame metrics match a scalar recomputation, partial tails dropped") {
    val rows = Multimodal.audioQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
    val w = Multimodal.AudioFrameSamples
    var checked = 0
    docs.foreach { d =>
      val bytes = d.getString(1).getBytes("UTF-8")
      val nf = bytes.length / w
      if (nf == 0) assert(!rows.contains(d.getLong(0)), "sub-frame payloads never analyzed")
      else {
        val r = rows(d.getLong(0)); checked += 1
        val energies = (0 until nf).map { f =>
          bytes.slice(f * w, (f + 1) * w).map(b => math.abs((b & 0xff) - 64).toLong).sum
        }
        assert(r.getLong(1) == nf && r.getLong(2) == energies.sum)
        assert(r.getLong(4) == energies.count(_ < Multimodal.AudioSilenceEnergy))
        val clips = (0 until nf * w).count(j =>
          math.abs((bytes(j) & 0xff) - 64) >= Multimodal.AudioClipAmplitude)
        assert(r.getLong(5) == clips)
      }
    }
    assert(checked > 0)
  }

  test("pHash: re-encoded and lightly-edited copies are found, unrelated payloads are not") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog and keeps going " * 5).trim
    val reencoded = base.substring(0, base.length - base.length / 20)
    val edited = base.substring(0, base.length - 6) + "cat okay"
    val unrelated = ("completely different content with nothing shared at all here now " * 5).trim
    val corpus = Seq(
      (1L, base), (2L, reencoded), (3L, edited), (4L, unrelated)
    ).toDF("media_id", "payload_str")
      .select(col("media_id"), encode(col("payload_str"), "UTF-8").as("payload"))
    val pairs = Multimodal.phashPairsOn(spark, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "re-encoded copy must match its original")
    assert(pairs.contains((1L, 3L)), "tail-edited copy must match its original")
    assert(!pairs.exists { case (x, y) => x == 4L || y == 4L },
      "unrelated payload must not pair with anything")
  }

  test("pHash signature matches an independent scalar recomputation") {
    import spark.implicits._
    val payload = "some deterministic payload for the perceptual hash check, long enough to span windows"
    val corpus = Seq((7L, payload)).toDF("media_id", "payload_str")
      .select(col("media_id"), encode(col("payload_str"), "UTF-8").as("payload"))
    val sig = Multimodal.decodePhash(spark, corpus).collect().head.sig.toSeq
    val bytes = payload.getBytes("UTF-8")
    val expected = new Array[Int](Multimodal.PhashBands)
    for (i <- 0 until 64) {
      val lo = math.min(i * Multimodal.PhashStride, bytes.length)
      val hi = math.min(lo + Multimodal.PhashWindowBytes, bytes.length)
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes.slice(lo, hi))
      if ((d(0) & 0xff) < 128) expected(i / 8) |= 1 << (i % 8)
    }
    assert(sig == expected.toSeq)
  }

  test("pHash banded pipeline equals brute-force all-pairs on a seeded random corpus") {
    import spark.implicits._
    // deterministic pseudo-random payloads; small enough that no band
    // bucket can exceed the df-cap, so banded output must equal the
    // exact all-pairs answer (the pigeonhole guarantee d < bands, end
    // to end through the real pipeline)
    val rnd = new scala.util.Random(12345)
    val corpus0 = (1L to 200L).map { id =>
      val base = rnd.alphanumeric.take(180 + rnd.nextInt(120)).mkString
      (id, if (id % 7 == 0) base.dropRight(base.length / 25) + "tail salt" else base)
    }
    val corpus = corpus0.toDF("media_id", "payload_str")
      .select(col("media_id"), encode(col("payload_str"), "UTF-8").as("payload"))
    val got = Multimodal.phashPairsOn(spark, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = Multimodal.decodePhash(spark, corpus).collect()
      .map(s => s.media_id -> s.sig).toMap
    val expected = (for {
      x <- sigs.keys; y <- sigs.keys if x < y
      h = sigs(x).zip(sigs(y)).map { case (p, q) =>
        java.lang.Integer.bitCount(p ^ q) }.sum
      if h <= Multimodal.PhashMaxHamming
    } yield (x, y, h.toLong)).toSet
    assert(got == expected)
  }

  test("pHash candidate join is banded, never a cartesian product") {
    val plan = Multimodal.phashDedup(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "pHash near-dup must pair via band buckets, not all-pairs")
  }

  test("keep-best picks exactly one survivor per image cluster, the shared-policy maximum") {
    val rows = Multimodal.phashKeepBest(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(1)).foreach { case (cid, members) =>
      assert(members.count(_.getBoolean(5)) == 1,
        s"cluster $cid must keep exactly one member")
      val best = members.minBy(r =>
        (-r.getInt(3), -r.getLong(4), r.getLong(0))) // quality desc, bytes desc, id asc
      assert(best.getBoolean(5), s"cluster $cid survivor must be the policy maximum")
    }
  }

  test("decodeMeta runs on executors per partition and matches the stub row-by-row") {
    val meta = Multimodal.decodeMeta(spark, dir).collect().map(m => m.doc_id -> m).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "source").collect()
    assert(docs.nonEmpty && meta.size == docs.length)
    docs.foreach { r =>
      val m = meta(r.getLong(0))
      val bytes = r.getString(1).getBytes("UTF-8")
      val (w, h, f) = Multimodal.StubDecoder.decode(bytes, r.getString(2))
      assert(m.byte_len == bytes.length && m.width == w && m.height == h && m.n_frames == f)
      assert(m.format == r.getString(2))
    }
  }
}
