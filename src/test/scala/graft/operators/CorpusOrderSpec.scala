package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The training-order interleave ([[Pipeline.corpusOrder]]) and its
  * numbering primitive ([[DistributedRank]]): the distributed
  * offset+local-rank must reproduce exactly the rank a driver-side
  * sort assigns (the whole point — same answer, no single-task
  * window), and the stride-scheduled merge must keep every prefix of
  * the order proportionally mixed.
  */
class CorpusOrderSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("DistributedRank reproduces the driver-sort rank, grouped and global") {
    import spark.implicits._
    val df = Seq(
      ("a", 30L), ("a", 10L), ("a", 20L), ("b", 5L), ("b", 40L),
      ("c", 1L), ("a", 15L), ("b", 7L)).toDF("g", "k")
    val global = DistributedRank.withRank(df, Seq.empty, Seq(col("k")), "pos")
      .select("k", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expectGlobal = df.collect().map(_.getLong(1)).sorted.zipWithIndex
      .map { case (k, i) => (k, i + 1L) }.toMap
    assert(global == expectGlobal)

    val grouped = DistributedRank.withRank(df, Seq("g"), Seq(col("k")), "pos")
      .select("g", "k", "pos").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val expectGrouped = df.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.map(_._2).sorted.zipWithIndex.map { case (k, i) => ((g, k), i + 1L) }
      }.toMap
    assert(grouped == expectGrouped)
  }

  test("corpus_order: contiguous global positions; every prefix is proportionally mixed") {
    val rows = Pipeline.corpusOrder(spark, dir)
      .select("global_pos", "source", "src_pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    val n = rows.length.toDouble
    val perSource = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val nSources = perSource.size
    // stride scheduling: in any prefix of length L, source s appears
    // within 1 doc of its proportional share L·n_s/N — so the total
    // deviation across sources is < nSources at every prefix
    var counts = Map.empty[String, Int].withDefaultValue(0)
    rows.zipWithIndex.foreach { case ((_, src, _), i) =>
      counts = counts.updated(src, counts(src) + 1)
      val l = i + 1
      perSource.foreach { case (s, ns) =>
        val expected = l * ns / n
        assert(math.abs(counts(s) - expected) <= 1.0 + 1e-9,
          s"prefix $l: source $s has ${counts(s)}, expected ~$expected")
      }
      val _ = nSources
    }
    // within each source the positions are the full 1..n_s shuffle
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length))
    }
  }

  test("corpus_final_order carries exactly the manifest's train-split final docs per source") {
    val nFinalTrain = Pipeline.corpusFinal(spark, dir).collect()
      .filter(_.getString(1) == "train")
      .map(r => r.getString(0) -> r.getLong(7)).toMap
    val ordered = Pipeline.corpusFinalOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(ordered.nonEmpty)
    assert(ordered.map(_._1).sorted.toSeq == (1L to ordered.length))
    val perSource = ordered.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // every ordered doc is a manifest-final train doc and vice versa
    assert(perSource == nFinalTrain.filter(_._2 > 0),
      s"ordered $perSource vs manifest $nFinalTrain")
  }

  test("state-served corpus_final_order is bit-identical to the full-recompute derivation") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    val served = rows(Pipeline.corpusFinalOrder(spark, dir))
    val recomputed = rows(Pipeline.corpusFinalOrderRecompute(spark, dir))
    assert(served.nonEmpty)
    assert(served == recomputed)
  }
}
