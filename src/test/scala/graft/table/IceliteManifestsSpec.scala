package graft.table

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Manifest rewrite ([[IceliteTable.rewriteManifests]]): per-commit
  * file lists fold into one merged base snapshot — content and live
  * file sets bit-identical, metadata bounded by the recent-commit
  * count, the latest ANALYZE snapshot shielded, schema evolution in
  * the folded range refused, and the history trade (time travel /
  * changelog below the fold) enforced.
  */
class IceliteManifestsSpec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("icelite-mf").toString

  private def rows(data: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    data.toDF("id", "st", "v")
  }

  private def mk(w: String): IceliteTable =
    IceliteTable.create(spark, w, "ns", "mf", rows().schema)

  private def content(t: IceliteTable): Set[(Long, String, Long)] =
    t.read().collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("fold collapses snapshots, keeps content and live files bit-identical") {
    val t = mk(wh())
    (1 to 5).foreach(i => t.append(rows((i.toLong, "a", i.toLong))))
    t.upsert(rows((2L, "a", 22L)), Seq("id"))
    t.delete(rows((3L, "a", 0L)).select("id"), Seq("id"))
    val before = content(t)
    val liveBefore = t.meta.liveDataFiles.toSet
    assert(t.meta.snapshots.size == 7)
    t.rewriteManifests(keepRecent = 2)
    assert(t.meta.snapshots.size == 3) // merged + upsert + delete
    assert(t.meta.snapshots.head.operation == "rewrite-manifests")
    assert(t.meta.liveDataFiles.toSet == liveBefore, "no data file moves")
    assert(content(t) == before)
    // recent delete files still apply to folded data (seqs live in files)
    assert(before == Set((1L, "a", 1L), (2L, "a", 22L), (4L, "a", 4L), (5L, "a", 5L)))
  }

  test("history below the fold is traded away: time travel and changelog refuse") {
    val t = mk(wh())
    (1 to 4).foreach(i => t.append(rows((i.toLong, "a", i.toLong))))
    t.rewriteManifests(keepRecent = 1)
    intercept[IllegalArgumentException](t.readAt(1))
    intercept[IllegalStateException](t.readChanges(0, t.meta.lastSeq))
    // ranges entirely after the merged seq still derive
    assert(t.readChanges(3, 4).count() == 1)
  }

  test("the latest ANALYZE snapshot is never folded; its stats stay readable") {
    val t = mk(wh())
    (1 to 3).foreach(i => t.append(rows((i.toLong, "a", i.toLong))))
    t.analyze(Seq("v"))
    (4 to 5).foreach(i => t.append(rows((i.toLong, "a", i.toLong))))
    t.rewriteManifests(keepRecent = 0)
    val ops = t.meta.snapshots.map(_.operation)
    assert(ops.count(_ == "analyze") == 1, s"analyze survived the fold: $ops")
    assert(t.statsTable().count() > 0)
    assert(ops.head == "rewrite-manifests")
  }

  test("schema evolution inside the folded range refuses (epoch translation)") {
    val t = mk(wh())
    t.append(rows((1L, "a", 1L)))
    t.append(rows((2L, "a", 2L)))
    t.renameColumn("v", "val")
    t.append(rows((3L, "a", 3L)).toDF("id", "st", "val"))
    val e = intercept[IllegalStateException](t.rewriteManifests(keepRecent = 0))
    assert(e.getMessage.contains("schema evolution"))
  }

  test("no-op when fewer than two snapshots are foldable") {
    val t = mk(wh())
    t.append(rows((1L, "a", 1L)))
    t.append(rows((2L, "a", 2L)))
    val seqs = t.meta.snapshots.map(_.seq)
    t.rewriteManifests(keepRecent = 2)
    assert(t.meta.snapshots.map(_.seq) == seqs)
  }
}
