package graft.table

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.config.PartitionConfig

/** Dynamic partition overwrite ([[IceliteTable.overwritePartitions]]):
  * metadata-only classification of pure/mixed/untouched files, content
  * replacement semantics, idempotent re-load, live-delete interaction,
  * and the guard rails.
  */
class IceliteOverwriteSpec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("icelite-ovw").toString

  private def rows(data: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    data.toDF("id", "pt", "v")
  }

  private def mk(w: String): IceliteTable =
    IceliteTable.create(spark, w, "ns", "dyn", rows().schema,
      partitioning = Seq(PartitionConfig("pt")))

  private def content(t: IceliteTable): Set[(Long, String, Long)] =
    t.read().collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("overwrite replaces touched partitions, keeps untouched; pure file drops from metadata alone") {
    val t = mk(wh())
    t.append(rows((1L, "a", 10L), (2L, "b", 20L))) // mixed file (a+b)
    t.append(rows((3L, "a", 30L))) // pure file (a)
    val pureFile = t.meta.snapshots.last.dataFiles.head
    t.overwritePartitions(rows((9L, "a", 90L)))
    assert(content(t) == Set((9L, "a", 90L), (2L, "b", 20L)))
    // the pure 'a' file is gone from every snapshot's file list
    assert(!t.meta.snapshots.flatMap(_.dataFiles).contains(pureFile))
    assert(t.meta.snapshots.last.operation == "overwrite-partitions")
  }

  test("re-running the same load is idempotent (replace, never duplicate)") {
    val t = mk(wh())
    t.append(rows((1L, "a", 10L), (2L, "b", 20L)))
    t.overwritePartitions(rows((5L, "a", 50L), (6L, "a", 60L)))
    val once = content(t)
    t.overwritePartitions(rows((5L, "a", 50L), (6L, "a", 60L)))
    assert(content(t) == once)
  }

  test("multi-partition batch replaces each touched value; untouched bytes keep their files") {
    val t = mk(wh())
    t.append(rows((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)))
    t.overwritePartitions(rows((7L, "a", 7L), (8L, "c", 8L)))
    assert(content(t) == Set((7L, "a", 7L), (2L, "b", 2L), (8L, "c", 8L)))
  }

  test("live equality deletes keep applying to untouched partitions after an overwrite") {
    val t = mk(wh())
    t.append(rows((1L, "a", 1L), (2L, "b", 2L), (3L, "b", 3L)))
    t.delete(rows((2L, "b", 2L)).select("id"), Seq("id"))
    t.overwritePartitions(rows((9L, "a", 9L)))
    assert(content(t) == Set((9L, "a", 9L), (3L, "b", 3L)))
  }

  test("position deletes + mixed rewrite refuse (coordinates would dangle)") {
    val t = mk(wh())
    t.append(rows((1L, "a", 1L), (2L, "b", 2L))) // one mixed file
    t.deleteWhere(col("id") === 2L)
    val e = intercept[IllegalStateException](t.overwritePartitions(rows((9L, "a", 9L))))
    assert(e.getMessage.contains("position deletes"))
    // after folding with compact() the overwrite goes through
    t.compact()
    t.overwritePartitions(rows((9L, "a", 9L)))
    assert(content(t) == Set((9L, "a", 9L)))
  }

  test("unpartitioned and multi-partition tables are rejected") {
    val t = IceliteTable.create(spark, wh(), "ns", "flat", rows().schema)
    t.append(rows((1L, "a", 1L)))
    intercept[IllegalArgumentException](t.overwritePartitions(rows((2L, "a", 2L))))
  }

  test("time travel below an overwrite and changelog ranges crossing it refuse") {
    val t = mk(wh())
    val s1 = t.append(rows((1L, "a", 1L), (2L, "b", 2L)))
    val ow = t.overwritePartitions(rows((9L, "a", 9L)))
    // prior snapshots were pruned IN PLACE — seq 1 is no longer the
    // state as-of-then, so serving it would silently drop rows
    val e = intercept[IllegalArgumentException](t.readAt(s1).collect())
    assert(e.getMessage.contains("pruned"))
    val e2 = intercept[IllegalStateException](t.readChanges(s1 - 1, ow))
    assert(e2.getMessage.contains("overwrite"))
    // at or after the overwrite, reads serve normally
    assert(t.readAt(ow).count() == 2)
  }
}
