package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class ClusteringSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("kmeans: partition is total and exclusive; ids are seeds; majority bounded") {
    val out = Clustering.kmeansClusters(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.map(_.getAs[Long]("n_members")).sum == total) // every vector in exactly one cluster
    assert(out.map(_.getAs[Long]("cluster_id")).forall(c => c >= 0 && c < Clustering.K))
    assert(out.forall(r => r.getAs[Long]("majority_n") <= r.getAs[Long]("n_members")))
    assert(out.length <= Clustering.K && out.length > 1) // seeds may lose all members, but >1 survives
  }

  test("kmeans: deterministic across runs") {
    val a = Clustering.kmeansClusters(spark, dir).collect().toSeq
    val b = Clustering.kmeansClusters(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("kmeans plan: centroid tables broadcast, no pairwise corpus join") {
    // the inline Lloyd chain (the registered query reads the persisted
    // index, so the clustering plan only appears in the build path)
    val plan = Clustering.kmeans(spark, dir, Clustering.K, Clustering.Iters)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("kmeans parameterized: iters=5 completes with CONSTANT plan depth (centroid checkpoint)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def joins(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect { case j: Join => j }.size
    val p2 = Clustering.kmeans(spark, dir, k = 3, iters = 2)
    val p5 = Clustering.kmeans(spark, dir, k = 3, iters = 5)
    // without the per-round localCheckpoint the join count grows ~3 per
    // extra Lloyd round; with it the final plan reads checkpointed
    // centroids and its shape is independent of iteration count
    assert(joins(p5) == joins(p2), s"plan grew with iters: ${joins(p2)} -> ${joins(p5)}")
    val out = p5.collect()
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.map(_.getAs[Long]("n_members")).sum == total)
    assert(out.map(_.getAs[Long]("cluster_id")).forall(c => c >= 0 && c < 3))
  }
}
