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
