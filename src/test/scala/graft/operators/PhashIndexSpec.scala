package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.table.IceliteTable

/** The persisted pHash signature table must be indistinguishable from
  * an inline decode (the stub decode is deterministic), incremental
  * media appends must equal a full rebuild, and the served index must
  * actually be reused (one build per dataset per JVM).
  */
class PhashIndexSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def corpus(data: (Long, String)*): DataFrame = {
    import spark.implicits._
    data.toDF("media_id", "payload_str")
      .select(col("media_id"), encode(col("payload_str"), "UTF-8").as("payload"))
  }

  private def sigMap(df: DataFrame): Map[Long, Seq[Int]] =
    df.collect().map(r => r.getLong(0) ->
      r.getSeq[Int](r.fieldIndex("sig")).toSeq).toMap

  test("persisted signatures equal an inline decode bit for bit") {
    val c = corpus(
      (1L, "payload one long enough to cover several overlapping windows here"),
      (2L, "payload two with different content across every single window too"),
      (3L, "short"))
    val wh = Files.createTempDirectory("phash-idx").toString
    PhashIndex.build(spark, wh, c)
    val persisted = sigMap(IceliteTable.load(spark, wh, "midx", "phash_sigs").read())
    val inline = Multimodal.decodePhash(spark, c).collect()
      .map(s => s.media_id -> s.sig.toSeq).toMap
    assert(persisted == inline && persisted.size == 3)
  }

  test("pairs from the persisted index equal the inline-decode pipeline on testdata") {
    val viaIndex = Multimodal.phashDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inline = Multimodal.phashPairsOn(spark, Multimodal.phashCorpus(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex == inline && viaIndex.nonEmpty)
  }

  test("incremental appendMedia equals a full rebuild over old + new") {
    val old = corpus(
      (1L, "the first resident payload spanning enough bytes for the window pass"),
      (2L, "the second resident payload also spanning plenty of window bytes"))
    val fresh = corpus(
      (3L, "a newly ingested payload that lands after the initial index build"),
      (4L, "the first resident payload spanning enough bytes for the window pass"))
    val whFull = Files.createTempDirectory("phash-idx-full").toString
    PhashIndex.build(spark, whFull, old.unionByName(fresh))
    val whInc = Files.createTempDirectory("phash-idx-inc").toString
    PhashIndex.build(spark, whInc, old)
    PhashIndex.append(spark, whInc, fresh)
    val full = sigMap(IceliteTable.load(spark, whFull, "midx", "phash_sigs").read())
    val inc = sigMap(IceliteTable.load(spark, whInc, "midx", "phash_sigs").read())
    assert(inc == full && full.size == 4)
  }

  test("one build serves both pHash queries: no rebuild on the second query") {
    Multimodal.phashDedup(spark, dir).count()
    val buildsAfterFirst = PhashIndex.builds.get()
    Multimodal.phashClusters(spark, dir).count()
    assert(PhashIndex.builds.get() == buildsAfterFirst,
      "second pHash query must read the persisted index, not rebuild it")
  }
}
