package graft.table

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Copy-on-write UPDATE ([[IceliteTable.updateWhereCoW]]): the
  * read-optimized twin of the MoR paths — stat-pruned rewrite set,
  * zero delete files, masked-row folding, seq semantics, and the
  * guard rails (pos deletes, changelog crossing, unknown columns).
  */
class IceliteCowSpec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("icelite-cow").toString

  private def rows(data: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    data.toDF("id", "st", "v")
  }

  private def mk(w: String): IceliteTable =
    IceliteTable.create(spark, w, "ns", "cow", rows().schema)

  private def content(t: IceliteTable): Set[(Long, String, Long)] =
    t.read().collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("CoW result equals MoR updateWhere result; the CoW commit carries zero delete files") {
    val cow = mk(wh()); val mor = mk(wh())
    val base = rows((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L), (4L, "b", 40L))
    cow.append(base); mor.append(base)
    cow.updateWhereCoW(col("st") === "b", Map("v" -> (col("v") + 1L)))
    mor.updateWhere(col("st") === "b", Map("v" -> (col("v") + 1L)))
    assert(content(cow) == content(mor))
    val snap = cow.meta.snapshots.last
    assert(snap.operation == "rewrite-update")
    assert(snap.deleteFiles.isEmpty && snap.posDeleteFiles.isEmpty)
    // the MoR twin, by contrast, did commit a position-delete file
    assert(mor.meta.snapshots.last.posDeleteFiles.nonEmpty)
  }

  test("stat range prunes the rewrite set: out-of-range files keep their exact paths") {
    val t = mk(wh())
    t.trackStats(Seq("id"))
    t.append(rows((1L, "a", 1L), (2L, "a", 2L)))   // low band
    val lowFiles = t.meta.snapshots.last.dataFiles.toSet
    t.append(rows((100L, "a", 100L), (101L, "a", 101L))) // high band
    val highFiles = t.meta.snapshots.last.dataFiles.toSet
    t.updateWhereCoW(col("id") >= 100L, Map("v" -> lit(0L)),
      statRange = Some(("id", 100L, 101L)))
    val after = t.meta.snapshots.flatMap(_.dataFiles).toSet
    assert(lowFiles.subsetOf(after), "untouched band must keep its bytes")
    assert(highFiles.intersect(after).isEmpty, "touched band must be rewritten")
    assert(content(t) == Set((1L, "a", 1L), (2L, "a", 2L), (100L, "a", 0L), (101L, "a", 0L)))
  }

  test("rows masked by a live equality delete fold away and never resurrect as updated") {
    val t = mk(wh())
    t.append(rows((1L, "x", 1L), (2L, "y", 5L)))
    t.upsert(rows((1L, "x", 2L)), Seq("id")) // old (1, x, 1) now masked
    // the condition matches ONLY the masked old version
    t.updateWhereCoW(col("v") === 1L, Map("st" -> lit("Z")))
    assert(content(t) == Set((1L, "x", 2L), (2L, "y", 5L)))
    // and the fold is physical: a raw read shows no v=1 row anywhere
    assert(t.readRaw().filter(col("v") === 1L).count() == 0)
  }

  test("updated rows carry the new commit seq: later deletes beat them, earlier ones do not") {
    val t = mk(wh())
    t.append(rows((1L, "a", 1L), (2L, "a", 2L)))
    t.updateWhereCoW(col("id") === 1L, Map("v" -> lit(99L)))
    // a later equality delete at a later seq kills the updated row
    t.delete(rows((1L, "a", 0L)).select("id"), Seq("id"))
    assert(content(t) == Set((2L, "a", 2L)))
  }

  test("untouched rows keep their original seq: an old delete still masks them after rewrite") {
    val t = mk(wh())
    t.append(rows((1L, "a", 1L), (2L, "a", 2L), (3L, "b", 3L)))
    t.upsert(rows((2L, "a", 22L)), Seq("id"))
    // CoW rewrite matching only id=3; ids 1/2 rewrite as untouched rows
    t.updateWhereCoW(col("id") === 3L, Map("v" -> lit(33L)))
    // LWW must be unchanged: id=2 still serves the upserted version
    assert(content(t) == Set((1L, "a", 1L), (2L, "a", 22L), (3L, "b", 33L)))
  }

  test("live position deletes refuse the rewrite; compact() folds them and it proceeds") {
    val t = mk(wh())
    t.append(rows((1L, "a", 1L), (2L, "a", 2L)))
    t.deleteWhere(col("id") === 2L)
    val e = intercept[IllegalStateException](
      t.updateWhereCoW(col("id") === 1L, Map("v" -> lit(9L))))
    assert(e.getMessage.contains("position deletes"))
    t.compact()
    t.updateWhereCoW(col("id") === 1L, Map("v" -> lit(9L)))
    assert(content(t) == Set((1L, "a", 9L)))
  }

  test("a changelog range crossing the CoW rewrite refuses (MoR keeps it, CoW trades it)") {
    val t = mk(wh())
    t.append(rows((1L, "a", 1L)))
    t.updateWhereCoW(col("id") === 1L, Map("v" -> lit(2L)))
    val e = intercept[IllegalStateException](t.readChanges(0, t.meta.lastSeq))
    assert(e.getMessage.contains("maintenance snapshot"))
  }

  test("guards: unknown set column; undeclared stat-range column") {
    val t = mk(wh())
    t.append(rows((1L, "a", 1L)))
    intercept[IllegalArgumentException](
      t.updateWhereCoW(lit(true), Map("nope" -> lit(1L))))
    intercept[IllegalArgumentException](
      t.updateWhereCoW(lit(true), Map("v" -> lit(1L)),
        statRange = Some(("id", 0L, 5L))))
  }

  test("time travel below a CoW rewrite refuses: prior snapshots were pruned in place") {
    val t = mk(wh())
    val s1 = t.append(rows((1L, "a", 1L), (2L, "b", 2L)))
    val up = t.updateWhereCoW(col("st") === "b", Map("v" -> lit(99L)))
    val e = intercept[IllegalArgumentException](t.readAt(s1).collect())
    assert(e.getMessage.contains("pruned"))
    assert(t.readAt(up).count() == 2)
  }
}
