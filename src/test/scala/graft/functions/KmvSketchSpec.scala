package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.operators.Dedup.phash

/** Native KMV aggregate: partitioning invariance (the merge path),
  * exact-below-k behavior, estimate sanity, agreement with the plain
  * SQL-operator formulation, and the SQL registration path.
  */
class KmvSketchSpec extends AnyFunSuite with SparkFixture {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("result is independent of partitioning (associative merge, map-side partials)") {
    def run(parts: Int) =
      docs.repartition(parts)
        .agg(KmvSketchAgg.kmvSketch(phash(col("doc_id").cast("string")), 32).as("s"))
        .select(col("s.distinct_estimate"), col("s.sketch_size"))
        .collect().head
    val one = run(1)
    assert(run(7) == one && run(32) == one)
  }

  test("below k the sketch is exact; above k the estimate lands near the truth") {
    val exact = docs.select(countDistinct(col("doc_id"))).collect().head.getLong(0)
    // k far above the distinct count → estimate == exact count
    val big = docs
      .agg(KmvSketchAgg.kmvSketch(phash(col("doc_id").cast("string")), 10000).as("s"))
      .select(col("s.distinct_estimate"), col("s.sketch_size")).collect().head
    assert(big.getLong(0) == exact && big.getLong(1) == exact)
    // k = 16 on ~50 distinct values: a real estimate, sane error bar
    val small = docs
      .agg(KmvSketchAgg.kmvSketch(phash(col("doc_id").cast("string")), 16).as("s"))
      .select(col("s.distinct_estimate"), col("s.sketch_size")).collect().head
    assert(small.getLong(1) == 16L)
    assert(small.getLong(0) > exact / 3 && small.getLong(0) < exact * 3)
  }

  test("agrees with the generic-operator formulation (sorted distinct hashes, integer estimate)") {
    val k = 8
    val hs = docs.select(phash(col("doc_id").cast("string")).as("h"))
      .distinct().orderBy("h").limit(k).collect().map(_.getLong(0))
    val expected =
      if (hs.length < k) hs.length.toLong
      else (k - 1).toLong * KmvSketchAgg.HashDomain / hs.last
    val got = docs
      .agg(KmvSketchAgg.kmvSketch(phash(col("doc_id").cast("string")), k).as("s"))
      .select(col("s.distinct_estimate")).collect().head.getLong(0)
    assert(got == expected)
  }

  test("SQL registration: kmv_sketch callable from SQL with a literal k") {
    org.apache.spark.sql.graftbridge.ColumnBridge.registerTempFunction(
      spark, "kmv_sketch",
      GraftExtensions.functions.find(_._1.funcName == "kmv_sketch").get._3)
    docs.createOrReplaceTempView("kmv_docs")
    val viaSql = spark.sql(
      """SELECT s.distinct_estimate AS est, s.sketch_size AS n FROM (
        |  SELECT kmv_sketch(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT), 32) AS s
        |  FROM kmv_docs)""".stripMargin).collect().head
    val viaDf = docs
      .agg(KmvSketchAgg.kmvSketch(phash(col("doc_id").cast("string")), 32).as("s"))
      .select(col("s.distinct_estimate"), col("s.sketch_size")).collect().head
    assert(viaSql.getLong(0) == viaDf.getLong(0) && viaSql.getLong(1) == viaDf.getLong(1))
  }
}
