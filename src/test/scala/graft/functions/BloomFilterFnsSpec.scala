package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Bloom-filter build aggregate + might_contain predicate: partition
  * independence of the built bytes, no false negatives, bounded false
  * positives, null semantics, and exactness of the prefilter+exact-join
  * composition.
  */
class BloomFilterFnsSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def buildBytes(keys: Seq[Long], parts: Int): Array[Byte] =
    keys.toDF("k").repartition(parts)
      .agg(BloomFilterFns.bloomBuild(col("k"), 10000L, 0.03))
      .head.getAs[Array[Byte]](0)

  test("SQL registration: bloom_build callable from SQL, bytes match the column API") {
    org.apache.spark.sql.graftbridge.ColumnBridge.registerTempFunction(
      spark, "bloom_build",
      GraftExtensions.functions.find(_._1.funcName == "bloom_build").get._3)
    val keys = (1L to 500L).map(_ * 3)
    keys.toDF("k").createOrReplaceTempView("bloom_keys")
    val viaSql = spark.sql("SELECT bloom_build(k, 10000, 0.03) FROM bloom_keys")
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(viaSql, buildBytes(keys, 4)))
  }

  test("built filter bytes are identical regardless of partitioning and row order") {
    val keys = (1L to 5000L).map(_ * 7)
    val a = buildBytes(keys, 1)
    val b = buildBytes(scala.util.Random.shuffle(keys), 8)
    assert(java.util.Arrays.equals(a, b))
  }

  test("no false negatives: every inserted key passes might_contain") {
    val keys = (1L to 4000L).map(_ * 13)
    val blob = buildBytes(keys, 4)
    val passed = keys.toDF("k")
      .where(BloomFilterFns.bloomMightContain(col("k"), blob))
      .count()
    assert(passed == keys.size)
  }

  test("false-positive rate over non-members is near the configured fpp") {
    val members = (1L to 5000L).map(_ * 2) // even keys
    val blob = buildBytes(members, 4)
    val nonMembers = (1L to 20000L).map(_ * 2 + 1) // odd keys, disjoint
    val fp = nonMembers.toDF("k")
      .where(BloomFilterFns.bloomMightContain(col("k"), blob))
      .count()
    val rate = fp.toDouble / nonMembers.size
    assert(rate < 0.15, s"false-positive rate $rate way above configured 0.03")
  }

  test("null key evaluates to null and is dropped by a where-filter") {
    val blob = buildBytes(Seq(1L, 2L, 3L), 1)
    val df = Seq[java.lang.Long](1L, null, 99999999L).toDF("k")
    val kept = df.where(BloomFilterFns.bloomMightContain(col("k"), blob))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L)) // null → null → filtered; non-member dropped
    val vals = df.select(
      BloomFilterFns.bloomMightContain(col("k"), blob).as("m")).collect()
    assert(vals(1).isNullAt(0))
  }

  test("prefilter + exact semi join equals the plain semi join") {
    val dim = (1L to 300L).filter(_ % 5 == 0).toDF("dk")
    val fact = (1L to 2000L).map(i => (i % 400, i)).toDF("fk", "v")
    val blob = dim.agg(BloomFilterFns.bloomBuild(col("dk"), 1000L, 0.03))
      .head.getAs[Array[Byte]](0)
    val pre = fact
      .where(BloomFilterFns.bloomMightContain(col("fk"), blob))
      .join(dim, col("fk") === col("dk"), "left_semi")
      .orderBy("fk", "v").collect().toSeq
    val plain = fact
      .join(dim, col("fk") === col("dk"), "left_semi")
      .orderBy("fk", "v").collect().toSeq
    assert(pre == plain)
  }

  test("non-long input is rejected at analysis") {
    val df = Seq("a").toDF("s")
    val blob = buildBytes(Seq(1L), 1)
    val e1 = intercept[Exception](
      df.agg(BloomFilterFns.bloomBuild(col("s"), 100L, 0.03)).collect())
    assert(e1.getMessage.contains("bloom_build"))
    val e2 = intercept[Exception](
      df.where(BloomFilterFns.bloomMightContain(col("s"), blob)).collect())
    assert(e2.getMessage.contains("bloom_might_contain"))
  }
}
