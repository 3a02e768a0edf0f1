package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The persisted co-purchase edge index (EdgeIndex, eighth ingest
  * lifecycle): persisted ≡ inline on real data, append ≡ rebuild under
  * the order-atomic ingest contract, and consumers read the index
  * instead of re-joining lineitem.
  */
class EdgeIndexSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def inlineEdges(li: org.apache.spark.sql.DataFrame) =
    li.select(col("l_orderkey"), col("l_partkey")).as("a")
      .join(li.select(col("l_orderkey"), col("l_partkey")).as("b"), "l_orderkey")
      .filter(col("a.l_partkey") =!= col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w"))

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("persisted edges equal the inline lineitem self-join, multiplicity-exact") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val persisted = asSet(EdgeIndex.readEdges(spark, EdgeIndex.ensureBuilt(spark, dir))
      .select("u", "v", "w"))
    assert(persisted == asSet(inlineEdges(li).select("u", "v", "w")))
    assert(persisted.nonEmpty)
  }

  test("append == rebuild when an order batch lands whole") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    // order-atomic split: ~90% of ORDERS are the base, the rest the batch
    val base = li.filter(pmod(col("l_orderkey"), lit(10)) =!= 0)
    val batch = li.filter(pmod(col("l_orderkey"), lit(10)) === 0)
    assert(batch.count() > 0 && base.count() > 0)

    val whIncr = Files.createTempDirectory("edge-incr").toString
    EdgeIndex.build(spark, whIncr, base)
    EdgeIndex.append(spark, whIncr, batch)

    val whFull = Files.createTempDirectory("edge-full").toString
    EdgeIndex.build(spark, whFull, li)

    assert(asSet(EdgeIndex.readEdges(spark, whIncr).select("u", "v", "w")) ==
      asSet(EdgeIndex.readEdges(spark, whFull).select("u", "v", "w")))
  }

  test("consumers read the index: no additional build is triggered per query") {
    EdgeIndex.ensureBuilt(spark, dir)
    val before = EdgeIndex.builds.get()
    // touch three consumers end to end
    assert(Relational.copurchasePairs(spark, dir).collect().nonEmpty)
    assert(Graph.linkPredict(spark, dir).collect().nonEmpty)
    assert(Graph.triangles(spark, dir).collect().nonEmpty)
    assert(EdgeIndex.builds.get() == before)
  }
}
