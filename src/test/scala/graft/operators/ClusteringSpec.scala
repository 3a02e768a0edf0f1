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

  test("shardModFor: 1 through one shard's budget, then the smallest covering modulus") {
    assert(Clustering.shardModFor(1) == 1)
    assert(Clustering.shardModFor(Clustering.K) == 1)
    assert(Clustering.shardModFor(Clustering.ShardK) == 1)
    assert(Clustering.shardModFor(Clustering.ShardK + 1) == 2)
    assert(Clustering.shardModFor(480) == 8)
  }

  test("sharded Lloyd == independent per-shard Lloyd chains (both assignment paths)") {
    val emb = Similarity.embWithNorms(spark, dir)
    val k = 12
    val s = 3 // per-shard budget 4
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sharded = rows(Clustering.assignmentsAndCentroidsOn(emb, k, Clustering.Iters, s)._1)
    // ground truth: run the UNSHARDED chain on each shard's subset with
    // the same global seed rule (vec_id < k restricted to the shard)
    val perShard = (0 until s).flatMap { sh =>
      rows(Clustering.assignmentsAndCentroidsOn(
        emb.filter(pmod(col("vec_id"), lit(s)) === sh), k, Clustering.Iters)._1)
    }.toSet
    assert(sharded == perShard, "shard-restricted chain must equal independent shard chains")
    // membership never crosses shards
    assert(sharded.forall { case (v, c) => v % s == c % s })
    // shardMod=1 is the unsharded chain bit-for-bit
    assert(rows(Clustering.assignmentsAndCentroidsOn(emb, k, Clustering.Iters, 1)._1) ==
      rows(Clustering.assignmentsAndCentroidsOn(emb, k, Clustering.Iters)._1))
  }

  test("sharded assignBatch under frozen centroids matches the sharded build's final round") {
    val emb = Similarity.embWithNorms(spark, dir)
    val (a, c) = Clustering.assignmentsAndCentroidsOn(emb, 12, Clustering.Iters, 3)
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(Clustering.assignBatch(corpus, c, 3)) == rows(a))
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
