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

  test("incremental assignment under frozen centroids is bit-identical to the build's") {
    // re-assigning the corpus itself under the persisted centroids
    // must reproduce the persisted assignments exactly — the final
    // Lloyd round IS assignment under these centroids
    val corpus = graft.Tables.t(spark, dir, "embeddings")
    val persisted = assignRows(
      ClusterIndex.assignments(spark, dir, Clustering.K, Clustering.Iters))
    val re = assignRows(Clustering.assignBatch(corpus,
      ClusterIndex.centroids(spark, dir, Clustering.K, Clustering.Iters)))
    assert(re == persisted)
    // same property for the IVF side
    import org.apache.spark.sql.functions._
    val e = corpus.select(col("vec_id"), col("embedding"),
      Dedup.decimalNormSq(col("embedding")).as("nsq"))
    val reCells = cellRows(Similarity.rankCellsUnder(e,
      Similarity.ivfCentroids(spark, dir)))
    assert(reCells == cellRows(ClusterIndex.ivfCells(spark, dir)))
  }

  test("persisted PQ codes/codebooks are bit-identical to an inline trainer recompute") {
    val (codes, books) = Similarity.pqTrain(spark, dir)
    def codeRows(df: DataFrame): Set[(Long, Int, Int)] =
      df.select("vec_id", "m", "cid").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    def bookRows(df: DataFrame): Set[(Int, Int, Int, Double)] =
      df.select("m", "cid", "j", "cval").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    val p = codeRows(ClusterIndex.pqCodes(spark, dir))
    assert(p == codeRows(codes))
    assert(p.nonEmpty)
    // total encoding: every corpus vector carries exactly PqM codes
    assert(p.size == p.map(_._1).size * Similarity.PqM)
    assert(bookRows(ClusterIndex.pqCodebooks(spark, dir)) == bookRows(books))
  }

  test("incremental PQ encoding under frozen codebooks is bit-identical to the build's") {
    // re-encoding the corpus itself under the persisted codebooks must
    // reproduce the persisted code table exactly — the final trainer
    // round IS assignment under these codebooks
    import org.apache.spark.sql.functions._
    val corpus = graft.Tables.t(spark, dir, "embeddings")
      .filter(col("vec_id") >= Similarity.NumQueries)
    val re = Similarity.pqAssign(corpus, ClusterIndex.pqCodebooks(spark, dir))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val persisted = ClusterIndex.pqCodes(spark, dir)
      .select("vec_id", "m", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(re == persisted)
  }

  test("appendVectors: a new batch lands in every index table without a rebuild") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    ClusterIndex.ensureBuilt(spark, dir)
    val before = ClusterIndex.builds.get()
    val maxId = graft.Tables.t(spark, dir, "embeddings")
      .agg(max("vec_id")).collect().head.getLong(0)
    val dims = graft.Tables.t(spark, dir, "embeddings")
      .select(size(col("embedding"))).collect().head.getInt(0)
    val batch = Seq((maxId + 1, 0), (maxId + 2, 1)).toDF("vec_id", "label")
      .withColumn("embedding",
        array((1 to dims).map(i => (lit(1.0f) / lit(i.toFloat))): _*).cast("array<float>"))
    ClusterIndex.appendVectors(spark, dir, batch)
    assert(ClusterIndex.builds.get() == before,
      "incremental append must not re-run a clustering build")
    val a = ClusterIndex.assignments(spark, dir, Clustering.K, Clustering.Iters)
    assert(a.filter(col("vec_id") > maxId).count() == 2)
    val cells = ClusterIndex.ivfCells(spark, dir)
      .filter(col("vec_id") > maxId && col("cell_rank") === 1)
    assert(cells.count() == 2)
    // the PQ code table too: PqM codes per appended vector, no retrain
    val pq = ClusterIndex.pqCodes(spark, dir).filter(col("vec_id") > maxId)
    assert(pq.count() == 2L * Similarity.PqM)
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
