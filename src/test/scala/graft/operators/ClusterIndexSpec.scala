package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The persisted cluster/IVF index ([[ClusterIndex]]): build-once-at-
  * ingest icelite tables whose read is bit-identical to an inline
  * recompute (the clustering passes are deterministic), shared by
  * every embedding-side consumer instead of each query re-running its
  * own Lloyd chain — the vector analogue of [[ShingleIndexSpec]].
  */
class ClusterIndexSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def assignRows(df: DataFrame): Set[(Long, Long)] =
    df.select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def cellRows(df: DataFrame): Set[(Long, Int, Int)] =
    df.select("vec_id", "c_label", "cell_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet

  test("persisted assignments are bit-identical to an inline Lloyd recompute") {
    val persisted = ClusterIndex.assignments(spark, dir, Clustering.K, Clustering.Iters)
    val inline = Clustering.assignments(spark, dir, Clustering.K, Clustering.Iters)
    val p = assignRows(persisted)
    assert(p == assignRows(inline))
    assert(p.nonEmpty)
    // total + exclusive: every vector appears exactly once
    assert(p.size == p.map(_._1).size)
  }

  test("persisted ivf_cells are bit-identical to an inline ranked-cell recompute") {
    val persisted = cellRows(ClusterIndex.ivfCells(spark, dir))
    val inline = cellRows(Similarity.ivfRankedCells(spark, dir))
    assert(persisted == inline)
    assert(persisted.nonEmpty)
    // a full ranking: every vector carries rank 1
    val ranked1 = persisted.filter(_._3 == 1).map(_._1)
    assert(ranked1 == persisted.map(_._1))
  }

  test("index tables build once and every consumer reads them back") {
    ClusterIndex.ensureBuilt(spark, dir)
    val after = ClusterIndex.builds.get()
    Clustering.kmeansClusters(spark, dir).count()
    Dedup.semanticDedup(spark, dir).count()
    Similarity.topkIvf(spark, dir).count()
    ClusterIndex.ensureBuilt(spark, dir) // idempotent
    assert(ClusterIndex.builds.get() == after,
      "a consumer triggered an index rebuild — the persisted table was not reused")
  }
}
