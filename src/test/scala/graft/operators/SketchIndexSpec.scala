package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.table.IceliteTable

/** The persisted per-source KMV sketch table must be bit-identical to
  * an inline sketch pass, incremental appends must equal a full
  * rebuild EXACTLY (the KMV merge is associative over distinct
  * hashes), and the served index must be reused (one build per
  * dataset per JVM).
  */
class SketchIndexSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def sketchMap(df: DataFrame): Map[String, Seq[Long]] =
    df.collect().map(r => r.getString(0) ->
      r.getSeq[Long](r.fieldIndex("vals")).toSeq).toMap

  test("persisted sketches equal the inline sketch pass bit for bit") {
    val docs = graft.Tables.t(spark, dir, "documents")
    val inline = sketchMap(SketchIndex.sketchOf(docs))
    val persisted = sketchMap(SketchIndex.sketches(spark, dir))
    assert(persisted == inline)
    assert(persisted.nonEmpty)
    persisted.values.foreach { v =>
      assert(v == v.sorted && v.length <= SketchIndex.K)
    }
  }

  test("incremental append equals a full rebuild over old + new, exactly") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, dir, "documents")
    val old = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    val wh = Files.createTempDirectory("sketch-spec").toString
    SketchIndex.build(spark, wh, old)
    SketchIndex.append(spark, wh, fresh)
    val appended = sketchMap(
      IceliteTable.load(spark, wh, "kidx", "vocab_kmv").read()
        .select("source", "vals"))
    val rebuilt = sketchMap(SketchIndex.sketchOf(docs))
    assert(appended == rebuilt,
      "k-smallest(stored ∪ batch) must equal the sketch of old ∪ new")
    // a batch carrying a brand-new source INSERTS its sketch
    val extra = Seq(("zz_new_source", "alpha beta gamma")).toDF("source", "text")
    SketchIndex.append(spark, wh, extra)
    val after = sketchMap(
      IceliteTable.load(spark, wh, "kidx", "vocab_kmv").read()
        .select("source", "vals"))
    assert(after.contains("zz_new_source") &&
      after("zz_new_source").length == 3)
    assert((after - "zz_new_source") == rebuilt)
  }

  test("queries reuse one build per dataset per JVM") {
    val before = SketchIndex.builds.get()
    Relational.kmvSetAlgebra(spark, dir).count()
    Relational.kmvSetAlgebra(spark, dir).count()
    val after = SketchIndex.builds.get()
    assert(after - before <= 1,
      s"expected at most one sketch-index build, saw ${after - before}")
  }
}
