package graft.table

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Zero-copy clone ([[IceliteTable.cloneTo]]): metadata-only sharing,
  * divergence isolation, historical clones, pos-delete coordinate
  * portability, and local re-materialization via compact.
  */
class IceliteCloneSpec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("icelite-clone").toString

  private def rows(data: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    data.toDF("id", "grp", "v")
  }

  private def content(t: IceliteTable): Set[(Long, String, Long)] =
    t.read().collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("clone shares files by reference: no data copied, content identical") {
    val w = wh()
    val src = IceliteTable.create(spark, w, "ns", "src", rows().schema)
    src.upsert(rows((1L, "a", 1L), (2L, "b", 2L)), Seq("id"))
    val clone = src.cloneTo(w, "ns", "c1")
    assert(content(clone) == content(src))
    // zero-copy: the clone's own data dir does not exist yet
    assert(!Files.exists(java.nio.file.Paths.get(s"$w/ns/c1/data")))
    // every referenced file is absolute into the source location
    assert(clone.meta.snapshots.flatMap(_.dataFiles).forall(_.startsWith(s"$w/ns/src/")))
  }

  test("divergence is isolated in both directions") {
    val w = wh()
    val src = IceliteTable.create(spark, w, "ns", "src2", rows().schema)
    src.upsert(rows((1L, "a", 1L), (2L, "b", 2L)), Seq("id"))
    val clone = src.cloneTo(w, "ns", "c2")
    src.upsert(rows((1L, "a", 10L)), Seq("id"))
    clone.upsert(rows((2L, "b", 20L), (3L, "c", 3L)), Seq("id"))
    assert(content(src) == Set((1L, "a", 10L), (2L, "b", 2L)))
    assert(content(clone) == Set((1L, "a", 1L), (2L, "b", 20L), (3L, "c", 3L)))
  }

  test("historical clone at a past seq sees that state; beyond-rewrite history refuses") {
    val w = wh()
    val src = IceliteTable.create(spark, w, "ns", "src3", rows().schema)
    val s1 = src.upsert(rows((1L, "a", 1L)), Seq("id"))
    src.upsert(rows((1L, "a", 99L), (2L, "b", 2L)), Seq("id"))
    val old = src.cloneTo(w, "ns", "c3", atSeq = Some(s1))
    assert(content(old) == Set((1L, "a", 1L)))
    src.compact() // collapses history
    intercept[IllegalArgumentException](src.cloneTo(w, "ns", "c3b", atSeq = Some(s1)))
  }

  test("source position deletes keep applying inside the clone (coordinate portability)") {
    val w = wh()
    val src = IceliteTable.create(spark, w, "ns", "src4", rows().schema)
    src.append(rows((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)))
    src.deleteWhere(col("id") === 2L)
    val clone = src.cloneTo(w, "ns", "c4")
    assert(content(clone) == Set((1L, "a", 1L), (3L, "c", 3L)))
  }

  test("compact() on the clone re-materializes it fully local") {
    val w = wh()
    val src = IceliteTable.create(spark, w, "ns", "src5", rows().schema)
    src.upsert(rows((1L, "a", 1L), (2L, "b", 2L)), Seq("id"))
    val clone = src.cloneTo(w, "ns", "c5")
    clone.compact()
    assert(content(clone) == Set((1L, "a", 1L), (2L, "b", 2L)))
    assert(clone.meta.snapshots.flatMap(_.dataFiles).forall(!_.startsWith(s"$w/ns/src5/")))
  }
}
