package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The two connected-components paths (driver union-find for small
  * pair graphs, distributed min-label propagation for large ones) must
  * agree exactly — the size-based switch may never change results.
  */
class DedupClustersSpec extends AnyFunSuite with SparkFixture {

  test("driver union-find and distributed propagation produce identical clusters") {
    import spark.implicits._
    // two chains, one triangle-with-tail, singletons-by-absence
    val pairs = Seq(
      (1L, 2L), (2L, 3L), // chain {1,2,3}
      (5L, 6L), // pair {5,6}
      (8L, 9L), (7L, 9L), (7L, 8L), // triangle {7,8,9}
      (10L, 14L), (11L, 14L), (12L, 13L), (13L, 14L)) // star/chain {10..14}
      .toDF("x", "y")
    val a = Dedup.driverUnionFind(spark, pairs.collect()).collect().toSeq
    val b = Dedup.distributedCc(pairs).collect().toSeq
    assert(a == b)
    // min-id roots and full coverage
    val byCluster = a.groupBy(_.getLong(1))
    assert(byCluster.keySet == Set(1L, 5L, 7L, 10L))
    assert(byCluster(10L).map(_.getLong(0)).toSet == Set(10L, 11L, 12L, 13L, 14L))
    assert(a.count(_.getBoolean(3)) == 4) // exactly one kept per cluster
  }

  test("keep-best selects exactly one survivor per cluster, by the declared policy") {
    val dir = "/root/testdata/sf0.001"
    val rows = Dedup.keepBest(spark, dir).collect()
    assert(rows.nonEmpty, "fixture must contain near-dup clusters")
    val clusters = Dedup.dupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == clusters.size, "keep-best is total over clustered docs")
    rows.groupBy(_.getLong(1)).foreach { case (cid, members) =>
      val kept = members.filter(_.getBoolean(5))
      assert(kept.length == 1, s"cluster $cid must keep exactly one")
      // the survivor is the policy max: quality desc, text_len desc, id asc
      val best = members.minBy(r =>
        (-r.getInt(3), -r.getLong(4), r.getLong(0)))
      assert(kept.head.getLong(0) == best.getLong(0), s"cluster $cid")
      // and cluster_size matches the member count
      assert(members.forall(_.getLong(2) == members.length), s"cluster $cid size")
    }
  }

  test("group-aware split never separates a near-dup cluster and covers every doc") {
    val dir = "/root/testdata/sf0.001"
    val split = Pipeline.splitGroupAware(spark, dir).collect()
    val docs = graft.Tables.t(spark, dir, "documents").count()
    assert(split.length == docs) // total function: one row per doc
    // every cluster maps to exactly one split label
    val clusters = Dedup.dupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty, "fixture must contain near-dup clusters")
    val splitOf = split.map(r => r.getLong(0) -> r.getString(2)).toMap
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      val labels = members.keys.map(splitOf).toSet
      assert(labels.size == 1, s"cluster $cid straddles splits: $labels")
    }
    // and the assignment is reproducible
    val again = Pipeline.splitGroupAware(spark, dir).collect()
    assert(split.toSeq == again.toSeq)
  }
}
