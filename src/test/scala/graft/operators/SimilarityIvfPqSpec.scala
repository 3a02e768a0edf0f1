package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The fused IVF-PQ path ([[Similarity.topkIvfPq]]): candidates must
  * come ONLY from the IVF cell probe (the pruning that makes the ADC
  * pass sub-corpus at scale), and the ADC approximation must be THE
  * SAME number the unpruned PQ path computes for any pair both paths
  * score — the fusion changes which pairs are looked at, never the
  * arithmetic.
  */
class SimilarityIvfPqSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("every fused result pair is inside the IVF probe candidate set") {
    val rankedCells = ClusterIndex.ivfCells(spark, dir)
    val corpus = rankedCells
      .filter(col("cell_rank") === 1 && col("vec_id") >= Similarity.NumQueries)
      .select(col("vec_id"), col("c_label").as("cell"))
    val probes = rankedCells
      .filter(col("cell_rank") <= Similarity.IvfProbes &&
        col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("c_label").as("cell"))
    val candSet = probes.join(corpus, "cell").select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = Similarity.topkIvfPq(spark, dir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)
    assert(out.forall(candSet.contains))
  }

  test("mmr rerank: K distinct picks from the IVF pool, pick 1 is pure relevance") {
    val out = Similarity.mmrRerank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, picks) =>
      // K picks, ranks 1..K, no result repeated
      assert(picks.map(_._2).sorted.toSeq == (1 to Similarity.MmrK).toSeq)
      assert(picks.map(_._3).distinct.length == picks.length)
    }
    // pick 1 carries no redundancy penalty yet — it must be the same
    // vector the plain IVF top-k path ranks first
    val ivfTop1 = Similarity.topkIvf(spark, dir).filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byQ.foreach { case (q, picks) =>
      assert(picks.find(_._2 == 1).map(_._3) == ivfTop1.get(q))
    }
    // all picks come from the probe candidate set (never outside the index)
    val rankedCells = ClusterIndex.ivfCells(spark, dir)
    val candSet = rankedCells
      .filter(col("cell_rank") <= Similarity.IvfProbes &&
        col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("c_label").as("cell"))
      .join(rankedCells
        .filter(col("cell_rank") === 1 && col("vec_id") >= Similarity.NumQueries)
        .select(col("vec_id"), col("c_label").as("cell")), "cell")
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.forall { case (q, _, v, _) => candSet.contains((q, v)) })
    // deterministic: a second run reproduces the pick sequence exactly
    val again = Similarity.mmrRerank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(again.toSeq == out.toSeq)
  }

  test("filtered ANN: only filter-passing corpus ids, all inside the EXPANDED probe set, scores exact") {
    val en = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rankedCells = ClusterIndex.ivfCells(spark, dir)
    val probeCand = rankedCells
      .filter(col("cell_rank") <= Similarity.FilteredProbes &&
        col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("c_label").as("cell"))
      .join(rankedCells
        .filter(col("cell_rank") === 1 && col("vec_id") >= Similarity.NumQueries)
        .select(col("vec_id"), col("c_label").as("cell")), "cell")
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = Similarity.topkFiltered(spark, dir)
      .select("q_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    // the filter applied BEFORE scoring: no non-en id can appear
    assert(out.forall { case (_, v, _) => en.contains(v) })
    // candidates come only from the expanded probe join
    assert(out.forall { case (q, v, _) => probeCand.contains((q, v)) })
    // scoring arithmetic is the shared exact-decimal cosine: any pair
    // the unfiltered IVF path also surfaces carries the identical score
    val unfiltered = Similarity.topkIvf(spark, dir)
      .select("q_id", "vec_id", "cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val shared = out.filter { case (q, v, _) => unfiltered.contains((q, v)) }
    shared.foreach { case (q, v, c) =>
      assert(unfiltered((q, v)) == c, s"pair ($q,$v) score diverged under the filter") }
  }

  test("ADC scores agree with the unpruned PQ path on shared pairs; ranks are total per query") {
    val fused = Similarity.topkIvfPq(spark, dir)
      .select("q_id", "vec_id", "ascore", "cosine", "rank").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3), r.getInt(4))))
    val unpruned = Similarity.topkPq(spark, dir)
      .select("q_id", "vec_id", "ascore", "cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3))))
      .toMap
    // any pair surviving BOTH shortlists carries identical ascore and
    // identical exact-rescored cosine — same codes, same lookup table
    val shared = fused.filter { case (k, _) => unpruned.contains(k) }
    assert(shared.nonEmpty)
    shared.foreach { case (k, (a, c, _)) =>
      assert(unpruned(k) == ((a, c)), s"pair $k diverged between fused and unpruned PQ")
    }
    // per-query ranks are contiguous from 1 (a total ranking, no gaps)
    fused.groupBy(_._1._1).foreach { case (_, rows) =>
      assert(rows.map(_._2._3).sorted.toSeq == (1 to rows.length))
    }
  }
}
