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
}
