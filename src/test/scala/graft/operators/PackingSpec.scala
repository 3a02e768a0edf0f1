package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, SparkEntry}

/** Sequence-packing invariants the oracle hash can't express directly:
  * the per-document window assignments and the per-shard efficiency
  * report must describe the SAME packing, and the window arithmetic
  * must tile each shard's token stream exactly.
  */
class PackingSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private val L = Packing.ContextLen

  test("window ids tile each shard's token stream with no gaps or overlaps") {
    val rows = SparkEntry.queries("seq_pack")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_._2)
      var cum = 0L
      inOrder.foreach { case (_, _, nTok, winId, off, span) =>
        assert(winId == cum / L)
        assert(off == cum % L)
        assert(span == (cum % L + nTok - 1) / L + 1)
        cum += nTok
      }
    }
  }

  test("pack_stats agrees with the per-document assignment") {
    val perDoc = SparkEntry.queries("seq_pack")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(5)))
    val stats = SparkEntry.queries("pack_stats")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(stats.keySet == perDoc.map(_._1).toSet)
    perDoc.groupBy(_._1).foreach { case (shard, docs) =>
      val (nDocs, totTok, nWin, pad) = stats(shard)
      assert(nDocs == docs.length)
      assert(totTok == docs.map(_._2.toLong).sum)
      // the report's window count is the last document's last window + 1
      val lastWin = docs.map(d => d._3 + d._4 - 1).max
      assert(nWin == lastWin + 1)
      assert(pad == nWin * L - totTok && pad >= 0 && pad < L)
    }
  }

  test("packing plan: one hash shuffle on shard feeds the window, stats pre-aggregate map-side") {
    val pePack = SparkEntry.queries("seq_pack")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(pePack.contains("hashpartitioning(shard"), s"window not shard-partitioned:\n$pePack")
    val peStats = SparkEntry.queries("pack_stats")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(peStats.contains("partial_count") && peStats.contains("partial_sum"),
      s"no map-side partial agg:\n$peStats")
  }
}
