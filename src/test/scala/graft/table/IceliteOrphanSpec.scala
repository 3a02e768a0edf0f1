package graft.table

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Orphan-file cleanup ([[IceliteTable.removeOrphans]], Iceberg's
  * `remove_orphan_files`): uncommitted writer debris is swept, every
  * referenced shape (live files, staged appends) is shielded, the
  * grace window protects in-flight writers, and table content is
  * untouched.
  */
class IceliteOrphanSpec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("icelite-orph").toString

  private def rows(data: (Long, String)*): DataFrame = {
    import spark.implicits._
    data.toDF("id", "st")
  }

  private def mk(w: String): IceliteTable =
    IceliteTable.create(spark, w, "ns", "orph", rows().schema)

  private def exists(t: IceliteTable, rel: String): Boolean = {
    val fs = new Path(t.location).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(s"${t.location}/$rel"))
  }

  private def plantOrphan(t: IceliteTable, rel: String): Unit =
    rows((999L, "z")).write.parquet(s"${t.location}/$rel")

  test("sweeps uncommitted debris, keeps every live file, content unchanged") {
    val t = mk(wh())
    t.append(rows((1L, "a"), (2L, "b")))
    t.delete(rows((2L, "b")).select("id"), Seq("id"))
    val before = t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    plantOrphan(t, "data/orphan-1")
    plantOrphan(t, "data/orphan-2")
    plantOrphan(t, "deletes/orphan-3")
    assert(t.removeOrphans(graceMs = -1L) == 3)
    assert(!exists(t, "data/orphan-1") && !exists(t, "data/orphan-2") &&
      !exists(t, "deletes/orphan-3"))
    val after = t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before && after == Set((1L, "a")))
    // idempotent: a second sweep finds nothing
    assert(t.removeOrphans(graceMs = -1L) == 0)
  }

  test("the grace window protects an in-flight writer's output") {
    val t = mk(wh())
    t.append(rows((1L, "a")))
    plantOrphan(t, "data/orphan-young")
    assert(t.removeOrphans(graceMs = 3600L * 1000) == 0)
    assert(exists(t, "data/orphan-young"))
    assert(t.removeOrphans(graceMs = -1L) == 1)
  }

  test("a staged (WAP) append is shielded until published") {
    val t = mk(wh())
    t.append(rows((1L, "a")))
    val stageId = t.stageAppend(rows((2L, "b")))
    assert(t.removeOrphans(graceMs = -1L) == 0)
    t.publishStaged(stageId)
    assert(t.read().count() == 2)
  }

  test("a discarded stage becomes sweepable debris") {
    val t = mk(wh())
    t.append(rows((1L, "a")))
    val stageId = t.stageAppend(rows((2L, "b")))
    t.discardStaged(stageId)
    // discard already removes the stage dir; a sweep finds nothing more
    assert(t.removeOrphans(graceMs = -1L) == 0)
    assert(t.read().count() == 1)
  }
}
