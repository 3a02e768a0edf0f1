package graft.table

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Write-audit-publish ([[IceliteTable.stageAppend]]): staged files
  * are invisible until an atomic metadata-only publish, auditable as
  * exact bytes, discardable without trace, protected from GC, and
  * seq-exact (publish refuses when another commit claimed the staged
  * seq).
  */
class IceliteWapSpec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("icelite-wap").toString

  private def rows(data: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    data.toDF("id", "grp", "score")
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.orderBy("id").collect().map(_.getLong(0)).toSeq

  test("stage → audit → publish: invisible until the atomic attach") {
    val t = IceliteTable.create(spark, wh(), "ns", "wap", rows().schema)
    t.append(rows((1L, "a", 1.0)))
    val stage = t.stageAppend(rows((2L, "b", 2.0), (3L, "b", 3.0)))
    assert(ids(t.read()) == Seq(1L))            // staged rows invisible
    assert(ids(t.readStaged(stage)) == Seq(2L, 3L)) // audit sees exact rows
    assert(t.stagedIds == Seq(stage))
    val seq = t.publishStaged(stage)
    assert(ids(t.read()) == Seq(1L, 2L, 3L))
    assert(t.meta.lastSeq == seq && t.stagedIds.isEmpty)
    intercept[IllegalArgumentException](t.publishStaged(stage)) // once only
  }

  test("discard leaves no trace") {
    val t = IceliteTable.create(spark, wh(), "ns", "wapd", rows().schema)
    t.append(rows((1L, "a", 1.0)))
    val stage = t.stageAppend(rows((2L, "b", 2.0)))
    t.discardStaged(stage)
    assert(ids(t.read()) == Seq(1L) && t.stagedIds.isEmpty)
    intercept[IllegalArgumentException](t.readStaged(stage))
  }

  test("publish refuses when another commit claimed the staged seq") {
    val t = IceliteTable.create(spark, wh(), "ns", "wapc", rows().schema)
    t.append(rows((1L, "a", 1.0)))
    val stage = t.stageAppend(rows((2L, "b", 2.0)))
    t.append(rows((9L, "z", 9.0))) // interleaved commit takes the seq
    val e = intercept[IllegalStateException](t.publishStaged(stage))
    assert(e.getMessage.contains("re-stage"))
    t.discardStaged(stage)
    assert(ids(t.read()) == Seq(1L, 9L))
  }

  test("cherry-pick re-applies the audited rows atop a moved head") {
    val t = IceliteTable.create(spark, wh(), "ns", "wapp", rows().schema)
    t.upsert(rows((1L, "a", 1.0), (2L, "old", 0.0)), Seq("id"))
    val stage = t.stageAppend(rows((2L, "b", 2.0), (3L, "b", 3.0)))
    val audited = t.readStaged(stage).collect().toSet
    // head moves past the staged seq: a foreign upsert touches one of
    // the staged keys and a delete kills another existing row
    t.upsert(rows((2L, "mid", 9.9)), Seq("id"))
    intercept[IllegalStateException](t.publishStaged(stage))
    val seq = t.cherryPickStaged(stage)
    assert(seq == t.meta.lastSeq)
    // the cherry-picked rows SUPERSEDE the interleaved upsert (keyed
    // re-apply) — exactly one live row per key, staged version wins
    val rows2 = t.read().collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows2.length == 3, s"duplicate key rows survived: ${rows2.toSeq.sortBy(_._1)}")
    assert(rows2.toSet == Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 3.0)))
    // published rows match the audited bytes; no stage residue remains
    assert(t.stagedIds.isEmpty)
    assert(audited.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      == Set((2L, "b", 2.0), (3L, "b", 3.0)))
    // GC finds nothing dangling: the staged dir was cleaned up
    intercept[IllegalArgumentException](t.readStaged(stage))
  }

  test("cherry-pick of an already-published stage cleans the manifest, never doubles rows") {
    val t = IceliteTable.create(spark, wh(), "ns", "wapx", rows().schema)
    t.append(rows((1L, "a", 1.0)))
    val stage = t.stageAppend(rows((2L, "b", 2.0)))
    // simulate the crash window: publish committed but manifest cleanup
    // didn't run — snapshot the manifest bytes and restore them after
    val manifest = new org.apache.hadoop.fs.Path(
      s"${t.location}/metadata/staged-$stage.json")
    val fs = manifest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = {
      val in = fs.open(manifest)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
        bos.toByteArray
      } finally in.close()
    }
    val pubSeq = t.publishStaged(stage)
    val out = fs.create(manifest)
    out.write(bytes)
    out.close()
    val got = t.cherryPickStaged(stage)
    assert(got == pubSeq) // detected as published; nothing re-applied
    assert(ids(t.read()) == Seq(1L, 2L))
    assert(t.read().count() == 2)
    assert(t.stagedIds.isEmpty)
    // the published files are intact (no recursive delete of live data)
    assert(ids(t.readAt(pubSeq)) == Seq(1L, 2L))
  }

  test("cherry-pick retry after crash-before-cleanup is idempotent (keyless table)") {
    val t = IceliteTable.create(spark, wh(), "ns", "wapi", rows().schema)
    t.append(rows((1L, "a", 1.0)))
    val stage = t.stageAppend(rows((2L, "b", 2.0), (3L, "b", 3.0)))
    t.append(rows((9L, "z", 9.0))) // head moves; exact-seq publish refuses
    val conf = spark.sparkContext.hadoopConfiguration
    val manifest = new org.apache.hadoop.fs.Path(
      s"${t.location}/metadata/staged-$stage.json")
    val stagedDir = new org.apache.hadoop.fs.Path(s"${t.location}/data/$stage")
    val fs = manifest.getFileSystem(conf)
    // snapshot the manifest bytes + staged data dir so the crash window
    // (commit done, cleanup not) can be reconstructed afterwards
    val bytes = {
      val in = fs.open(manifest)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
        bos.toByteArray
      } finally in.close()
    }
    val backup = new org.apache.hadoop.fs.Path(
      Files.createTempDirectory("wap-crash").toString, "staged")
    org.apache.hadoop.fs.FileUtil.copy(fs, stagedDir, fs, backup, false, conf)
    val seq = t.cherryPickStaged(stage)
    assert(ids(t.read()) == Seq(1L, 2L, 3L, 9L))
    // crash simulation: the cherry-pick committed but its cleanup never
    // ran — staged dir and manifest are back on disk
    val out = fs.create(manifest); out.write(bytes); out.close()
    org.apache.hadoop.fs.FileUtil.copy(fs, backup, fs, stagedDir, false, conf)
    // retry must detect the summary marker and clean up, NOT re-append
    val got = t.cherryPickStaged(stage)
    assert(got == seq)
    assert(t.read().count() == 4, "staged rows were re-appended on retry")
    assert(ids(t.read()) == Seq(1L, 2L, 3L, 9L))
    assert(t.stagedIds.isEmpty)
    assert(!fs.exists(stagedDir))
  }

  test("publish after schema evolution: staged files null-fill the new column") {
    val t = IceliteTable.create(spark, wh(), "ns", "wapev", rows().schema)
    t.append(rows((1L, "a", 1.0)))
    val stage = t.stageAppend(rows((2L, "b", 2.0)))
    // evolution lands while the stage awaits its audit
    t.addColumns(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tier", org.apache.spark.sql.types.StringType))))
    // the evolve commit claimed the staged seq — exact-seq publish refuses
    intercept[IllegalStateException](t.publishStaged(stage))
    t.discardStaged(stage)
    // a re-staged batch under the evolved schema publishes fine and
    // old rows serve null for the new column
    val stage2 = t.stageAppend(rows((3L, "c", 3.0)).withColumn("tier", lit("T")))
    t.publishStaged(stage2)
    assert(t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("tier")))).toSeq ==
      Seq((1L, None), (3L, Some("T"))))
  }

  test("GC spares staged appends and committed position-delete files") {
    val t = IceliteTable.create(spark, wh(), "ns", "wapgc", rows().schema)
    t.append(rows((1L, "a", 1.0), (2L, "a", 9.0)))
    t.deleteWhere(col("score") > 8.0) // committed pos-delete file
    val stage = t.stageAppend(rows((3L, "b", 3.0)))
    t.expireSnapshots(keepVersions = 1, orphanGraceMs = 0L) // aggressive GC
    // the pos delete still applies (its file survived GC)...
    assert(ids(t.read()) == Seq(1L))
    // ...and the staged append is still publishable
    t.publishStaged(stage)
    assert(ids(t.read()) == Seq(1L, 3L))
  }
}
