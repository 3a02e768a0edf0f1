package graft.table

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.util.Scratch

/** Deletion vectors ([[Dv]], [[IceliteTable.consolidateDeleteVectors]]):
  * encoding roundtrips, read equivalence with the coordinate path,
  * supersession (old coordinates folded, new coordinates still apply),
  * time travel before the consolidation, plan shape, and compaction.
  */
class IceliteDvSpec extends AnyFunSuite with SparkFixture {

  // ------------------------------------------------------ Dv encoding

  test("sparse and dense encodings roundtrip; contains is exact") {
    val sparse = Array(0L, 5L, 1000000L, (1L << 40) + 3)
    val dv1 = Dv.encode(sparse)
    assert(dv1(0) == 0, "wide span must pick the sparse layout")
    assert(sparse.forall(Dv.contains(dv1, _)))
    assert(!Dv.contains(dv1, 1L) && !Dv.contains(dv1, 999999L) && !Dv.contains(dv1, 1L << 41))
    assert(Dv.cardinality(dv1) == 4 && Dv.positions(dv1).toSeq == sparse.toSeq)

    val dense = (0L until 1024L).filter(_ % 3 != 0).toArray
    val dv2 = Dv.encode(dense)
    assert(dv2(0) == 1, "dense prefix must pick the bitset layout")
    assert(dense.forall(Dv.contains(dv2, _)))
    assert((0L until 1024L).filter(_ % 3 == 0).forall(!Dv.contains(dv2, _)))
    assert(!Dv.contains(dv2, 1024L) && !Dv.contains(dv2, -1L))
    assert(Dv.cardinality(dv2) == dense.length && Dv.positions(dv2).toSeq == dense.toSeq)

    assert(Dv.positions(Dv.encode(Array.empty)).isEmpty)
    assert(!Dv.contains(Dv.encode(Array.empty), 0L))
  }

  // -------------------------------------------------------- table path

  private def seeded(name: String): IceliteTable = {
    import spark.implicits._
    val wh = Scratch.dir("dv-spec")
    val df = (1L to 300L).map(i => (i, i % 7, s"v$i")).toDF("k", "g", "s")
    val t = IceliteTable.create(spark, wh, "ns", name, df.schema)
    t.append(df.filter($"k" <= 150))
    t.append(df.filter($"k" > 150))
    t
  }

  private def keys(t: IceliteTable): Seq[Long] =
    t.read().select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("consolidation preserves the read exactly and supersedes the coordinates") {
    val t = seeded("t_eq")
    t.deleteWhere(col("k") % 5 === 0)
    t.deleteWhere(col("k") % 7 === 0)
    val before = keys(t)
    val seq = t.consolidateDeleteVectors()
    assert(seq == t.meta.lastSeq && t.meta.snapshots.last.dvFiles.nonEmpty)
    assert(keys(t) == before, "DV read must equal the coordinate read")
    // the plan dropped the (file, pos) anti-join for the codegen'd test
    val plan = t.read().queryExecution.executedPlan.toString
    assert(plan.contains("dv_contains"), s"DV membership test missing:\n$plan")
    assert(!plan.toLowerCase.contains("leftanti"), s"pos anti-join survived:\n$plan")
  }

  test("new coordinate deletes apply on top of a DV generation; re-consolidation folds them") {
    val t = seeded("t_top")
    t.deleteWhere(col("k") % 5 === 0)
    t.consolidateDeleteVectors()
    t.deleteWhere(col("k") % 11 === 0) // coordinates atop the DV
    val want = (1L to 300L).filterNot(k => k % 5 == 0 || k % 11 == 0)
    assert(keys(t) == want)
    t.consolidateDeleteVectors() // folds DV + new coordinates into one generation
    assert(keys(t) == want)
    val (dvSnaps, postCoords) = {
      val snaps = t.meta.snapshots
      val dvSeq = snaps.filter(_.dvFiles.nonEmpty).last.seq
      (snaps.count(_.dvFiles.nonEmpty), snaps.filter(_.seq > dvSeq).flatMap(_.posDeleteFiles))
    }
    assert(dvSnaps == 2 && postCoords.isEmpty)
  }

  test("consolidation with nothing new to fold is a no-op commit") {
    val t = seeded("t_noop")
    t.deleteWhere(col("k") % 5 === 0)
    val s1 = t.consolidateDeleteVectors()
    val s2 = t.consolidateDeleteVectors()
    assert(s2 == s1, "second consolidation must not commit")
  }

  test("time travel before the consolidation still resolves coordinates") {
    val t = seeded("t_tt") // seq 1, 2: appends
    t.deleteWhere(col("k") % 5 === 0) // seq 3
    t.consolidateDeleteVectors() // seq 4
    t.deleteWhere(col("k") % 11 === 0) // seq 5
    def at(seq: Long) = t.readAt(seq).select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(at(2) == (1L to 300L))
    assert(at(3) == (1L to 300L).filterNot(_ % 5 == 0))
    assert(at(4) == (1L to 300L).filterNot(_ % 5 == 0))
    assert(at(5) == (1L to 300L).filterNot(k => k % 5 == 0 || k % 11 == 0))
  }

  test("compact folds deletion vectors into the rewritten layout") {
    val t = seeded("t_cp")
    t.deleteWhere(col("k") % 5 === 0)
    t.consolidateDeleteVectors()
    t.compact(targetFileMB = 256)
    val want = (1L to 300L).filterNot(_ % 5 == 0)
    assert(keys(t) == want)
    assert(t.meta.liveDvFiles.isEmpty && t.meta.livePosDeleteFiles.isEmpty)
  }

  test("DV apply degrades to a shuffle join past the broadcast size gate, same answer") {
    val t = seeded("t_gate")
    t.deleteWhere(col("k") % 5 === 0)
    t.consolidateDeleteVectors()
    val want = keys(t)
    // under budget: the explicit broadcast HINT is present (it is what
    // would force a broadcast even past autoBroadcastJoinThreshold)
    val hinted = t.read().queryExecution.optimizedPlan.toString
    assert(hinted.contains("strategy=broadcast"), s"small DV set must hint broadcast:\n$hinted")
    t.maxBroadcastDeleteBytes = 1L // force the over-budget path
    try {
      // over budget: NO hint — the planner now decides freely (here it
      // still picks BHJ because the set is tiny; at real scale the
      // thresholds would choose the shuffle join instead of failing on
      // the broadcast hard limit)
      val unhinted = t.read().queryExecution.optimizedPlan.toString
      assert(unhinted.contains("dv_contains") && !unhinted.contains("strategy=broadcast"),
        s"over-budget DV set must not carry the broadcast hint:\n$unhinted")
      assert(keys(t) == want, "the gated path must read identically")
    } finally t.maxBroadcastDeleteBytes = 256L << 20
  }

  test("equality deletes and DVs compose") {
    import spark.implicits._
    val t = seeded("t_mix")
    t.deleteWhere(col("k") % 5 === 0)
    t.consolidateDeleteVectors()
    t.delete(Seq(3L, 7L, 10L).toDF("k"), Seq("k")) // eq-delete (10 already DV-dead)
    val want = (1L to 300L).filterNot(k => k % 5 == 0 || k == 3 || k == 7)
    assert(keys(t) == want)
  }

  // ------------------------------------------- full delete consolidation

  test("full consolidation resolves equality deletes too; the read keeps ONLY the DV path") {
    import spark.implicits._
    val t = seeded("t_full")
    // churn: upsert re-images (equality deletes + new rows), key deletes,
    // and a coordinate position delete
    t.upsert((1L to 300L).filter(_ % 3 == 0).map(i => (i, i % 7, s"w$i")).toDF("k", "g", "s"),
      Seq("k"))
    t.delete((1L to 300L).filter(_ % 13 == 0).toDF("k"), Seq("k"))
    t.deleteWhere(col("k") % 5 === 0)
    val before = keys(t)
    val seq = t.consolidateDeletesFull()
    assert(seq == t.meta.lastSeq && t.meta.snapshots.last.operation == "rewrite-dv-full")
    assert(keys(t) == before, "full-DV read must equal the pre-fold read")
    // values survive too (the upserted images, not the originals)
    val s3 = t.read().filter(col("k") === 3L).select("s").collect()(0).getString(0)
    assert(s3 == "w3", "upsert image must survive the fold")
    val plan = t.read().queryExecution.executedPlan.toString
    assert(plan.contains("dv_contains"), s"DV membership test missing:\n$plan")
    assert(!plan.contains("_max_del_seq"), s"eq-delete join survived the full fold:\n$plan")
    assert(!plan.toLowerCase.contains("leftanti"), s"pos anti-join survived:\n$plan")
  }

  test("hot-tail deletes after a full consolidation apply and fold on the next run") {
    import spark.implicits._
    val t = seeded("t_full_tail")
    t.delete((1L to 300L).filter(_ % 13 == 0).toDF("k"), Seq("k"))
    t.consolidateDeletesFull()
    t.delete((1L to 300L).filter(_ % 11 == 0).toDF("k"), Seq("k")) // hot tail
    t.deleteWhere(col("k") % 17 === 0)
    val want = (1L to 300L).filterNot(k => k % 13 == 0 || k % 11 == 0 || k % 17 == 0)
    assert(keys(t) == want)
    t.consolidateDeletesFull()
    assert(keys(t) == want)
    val plan = t.read().queryExecution.executedPlan.toString
    assert(!plan.contains("_max_del_seq") && !plan.toLowerCase.contains("leftanti"),
      s"second fold must clear the hot tail:\n$plan")
  }

  test("time travel before the full consolidation resolves the original equality deletes") {
    import spark.implicits._
    val t = seeded("t_full_tt") // seq 1, 2: appends
    t.delete((1L to 300L).filter(_ % 13 == 0).toDF("k"), Seq("k")) // seq 3
    t.consolidateDeletesFull() // seq 4
    t.delete((1L to 300L).filter(_ % 11 == 0).toDF("k"), Seq("k")) // seq 5
    def at(seq: Long) = t.readAt(seq).select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(at(2) == (1L to 300L))
    assert(at(3) == (1L to 300L).filterNot(_ % 13 == 0))
    assert(at(4) == (1L to 300L).filterNot(_ % 13 == 0))
    assert(at(5) == (1L to 300L).filterNot(k => k % 13 == 0 || k % 11 == 0))
  }

  test("full consolidation with no delete state is a no-op; rewrite-manifests refuses DV ranges") {
    val t = seeded("t_full_noop")
    val s = t.consolidateDeletesFull()
    assert(s == t.meta.lastSeq && t.meta.snapshots.last.operation != "rewrite-dv-full")
    t.deleteWhere(col("k") % 5 === 0)
    t.consolidateDeletesFull()
    val e = intercept[IllegalStateException](t.rewriteManifests(keepRecent = 0))
    assert(e.getMessage.contains("deletion-vector"))
  }
}
