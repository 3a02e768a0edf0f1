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

  test("ensureBuilt materializes the bucketed serving tables eagerly (ingest, not query)") {
    EdgeIndex.ensureBuilt(spark, dir)
    // both disk-backed serving tables exist BEFORE any consumer runs —
    // the r16 pathology was the degree frame building lazily inside
    // the first timed graph query (and rebuilding under pressure)
    val names = spark.catalog.listTables().collect().map(_.name).toSet
    assert(names.exists(_.startsWith("gidx_edges_b_")), s"edge serving table missing: $names")
    assert(names.exists(_.startsWith("gidx_edges_d_")), s"degree serving table missing: $names")
    // a consumer run creates no NEW metastore tables and no new builds
    val before = EdgeIndex.builds.get()
    assert(Graph.communities(spark, dir).collect().nonEmpty)
    assert(Graph.pagerank(spark, dir).collect().nonEmpty)
    val after = spark.catalog.listTables().collect().map(_.name).toSet
    assert(after == names, s"consumer created serving tables: ${after -- names}")
    assert(EdgeIndex.builds.get() == before)
  }

  test("oriented serving table: one row per undirected edge, lower-(deg,id) endpoint first") {
    EdgeIndex.ensureBuilt(spark, dir)
    val e = EdgeIndex.bucketedEdges(spark, dir).select(col("u"), col("v"))
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val o = EdgeIndex.orientedEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly the undirected edge set, each edge once
    val undirected = e.filter(col("u") < col("v")).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(o.map(t => (math.min(t._1, t._2), math.max(t._1, t._2))).toSet == undirected)
    assert(o.length == undirected.size)
    // every row points lower-(deg, id) -> higher, and vd = deg(v)
    o.foreach { case (u, v, vd) =>
      assert(Ordering[(Long, Long)].lt((deg(u), u), (deg(v), v)),
        s"edge $u->$v violates degree order")
      assert(vd == deg(v), s"vd mismatch on $u->$v")
    }
  }

  test("degree-ordered triangles equal the id-order formulation (orientation-invariant)") {
    EdgeIndex.ensureBuilt(spark, dir)
    val canon = EdgeIndex.bucketedEdges(spark, dir)
      .filter(col("u") < col("v")).select(col("u"), col("v"))
    val idOrder = canon.as("e1")
      .join(canon.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
      .join(canon.as("e3"), col("a") === col("e3.u") && col("c") === col("e3.v"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(desc("n_triangles"), col("part")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Graph.triangles(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == idOrder)
    assert(got.nonEmpty)
  }

  test("degreed serving table carries pre-paid degrees equal to an inline aggregation") {
    EdgeIndex.ensureBuilt(spark, dir)
    val d = EdgeIndex.degreedEdges(spark, dir)
    val inline = EdgeIndex.bucketedEdges(spark, dir).select(col("u"), col("v"))
    val expected = inline.join(
      inline.groupBy(col("u")).agg(count(lit(1)).as("d")), "u")
    assert(d.select("u", "v", "d").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      expected.select("u", "v", "d").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }
}
