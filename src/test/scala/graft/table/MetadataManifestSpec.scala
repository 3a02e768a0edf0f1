package graft.table

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Metadata MANIFEST externalization: every commit's version JSON holds
  * O(snapshots) header lines + pointers; the heavy payload (file lists,
  * per-file stats/metrics) lives in immutable per-snapshot manifest
  * files written exactly once — the sf1 probe's metadata-growth fix
  * (the Nth bulk-load chunk used to re-serialize all N−1 prior file
  * lists into v{N}.json).
  */
class MetadataManifestSpec extends AnyFunSuite with SparkFixture {

  private def freshWarehouse(): String =
    Files.createTempDirectory("icelite-mwh").toString

  private val schema = StructType(Seq(
    StructField("_id", StringType), StructField("v", LongType)))

  private def rows(ids: (String, Long)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      ids.map { case (i, v) => org.apache.spark.sql.Row(i, v) }.asJava, schema)
  }

  private def readHead(wh: String, table: String): String = {
    val md = new java.io.File(s"$wh/ns/$table/metadata")
    val head = md.listFiles().map(_.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .maxBy(n => n.stripPrefix("v").stripSuffix(".json").toLong)
    new String(Files.readAllBytes(new java.io.File(md, head).toPath), "UTF-8")
  }

  test("commits externalize payloads: version JSON carries pointers, not file lists") {
    val wh = freshWarehouse()
    val t = IceliteTable.create(spark, wh, "ns", "m1", schema)
    (1 to 5).foreach(i => t.append(rows((s"id$i", i.toLong))))
    val head = readHead(wh, "m1")
    assert(head.contains("\"manifest\""))
    // the heavy keys must NOT appear inline in the version JSON
    assert(!head.contains("\"dataFiles\""), "file lists leaked into the version JSON")
    assert(!head.contains("\"fileStats\""))
    val mdir = new java.io.File(s"$wh/ns/m1/metadata/manifests")
    assert(mdir.listFiles().count(_.getName.endsWith(".json")) >= 5)
    // a cold reload resolves the pointers back to the same table state
    val t2 = IceliteTable.load(spark, wh, "ns", "m1")
    assert(t2.read().count() == 5)
    assert(t2.meta.snapshots.flatMap(_.dataFiles).size == t.meta.snapshots.flatMap(_.dataFiles).size)
    assert(t2.meta.snapshots.last.fileMetrics.nonEmpty, "metrics lost through the manifest round trip")
  }

  test("a manifest is written once: later commits re-point, never re-serialize history") {
    val wh = freshWarehouse()
    val t = IceliteTable.create(spark, wh, "ns", "m2", schema)
    t.append(rows(("a", 1L)))
    val mdir = new java.io.File(s"$wh/ns/m2/metadata/manifests")
    val after1 = mdir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    (2 to 6).foreach(i => t.append(rows((s"id$i", i.toLong))))
    val after6 = mdir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    // the first commit's manifest survives untouched (same mtime)
    after1.foreach { case (name, mtime) =>
      assert(after6.get(name).contains(mtime), s"manifest $name was rewritten")
    }
    // and version-JSON size is flat-ish in history: the head after 6
    // commits stays within a constant factor of the head after 1
    // (headers + pointers only — inline it would grow ~6x)
    val head = readHead(wh, "m2")
    val perSnapshot = head.length / t.meta.snapshots.size
    assert(perSnapshot < 600, s"per-snapshot header cost $perSnapshot bytes — payload leaked inline?")
  }

  test("payload-mutating rewrites miss the value-keyed cache and get fresh manifests") {
    val wh = freshWarehouse()
    val t = IceliteTable.create(spark, wh, "ns", "m3", schema,
      properties = Map("write.keys" -> "_id"))
    t.append(rows(("a", 1L), ("b", 2L)))
    t.append(rows(("c", 3L)))
    // CoW update prunes touched files out of OLD snapshots — the
    // modified snapshot value must serialize its own (new) manifest
    t.updateWhereCoW(col("_id") === "a", Map("v" -> lit(100L)))
    val t2 = IceliteTable.load(spark, wh, "ns", "m3")
    val got = t2.read().orderBy("_id").collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("a" -> 100L, "b" -> 2L, "c" -> 3L))
  }

  test("removeOrphans sweeps manifests dropped from the head, spares referenced ones") {
    val wh = freshWarehouse()
    val t = IceliteTable.create(spark, wh, "ns", "m4", schema)
    val s1 = t.append(rows(("a", 1L)))
    t.append(rows(("b", 2L)))
    t.append(rows(("c", 3L)))
    t.rollbackTo(s1) // drops b/c snapshots from the head
    val mdir = new java.io.File(s"$wh/ns/m4/metadata/manifests")
    val before = mdir.listFiles().length
    val removed = t.removeOrphans(graceMs = -1L)
    assert(removed >= 2, s"expected the rolled-back manifests to be swept, removed=$removed")
    assert(mdir.listFiles().length < before)
    // the surviving metadata still resolves from a cold load
    val t2 = IceliteTable.load(spark, wh, "ns", "m4")
    assert(t2.read().collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("concurrent writers: manifests stay consistent under commit races") {
    val wh = freshWarehouse()
    IceliteTable.create(spark, wh, "ns", "m6", schema)
    // 4 writer instances × 5 commits race through the claim-CAS loop;
    // each loser re-reads a pointer-carrying head and re-externalizes
    // only its own new snapshot
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        val mine = IceliteTable.load(spark, wh, "ns", "m6")
        (0 until 5).foreach { i =>
          mine.append(rows((s"w$w-$i", (w * 10 + i).toLong)))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val t = IceliteTable.load(spark, wh, "ns", "m6")
    assert(t.meta.snapshots.size == 20)
    assert(t.read().count() == 20)
    // every head snapshot resolves through its manifest on a cold load
    // and the ids are exactly the 20 written (no loss, no duplication)
    val ids = t.read().collect().map(_.getString(0)).toSet
    assert(ids == (for (w <- 0 until 4; i <- 0 until 5) yield s"w$w-$i").toSet)
    // abandoned manifests from lost attempts are sweepable, referenced
    // ones survive; the table still reads afterwards
    t.removeOrphans(graceMs = -1L)
    assert(IceliteTable.load(spark, wh, "ns", "m6").read().count() == 20)
  }

  test("pre-manifest inline metadata still loads (back-compat)") {
    val wh = freshWarehouse()
    val t = IceliteTable.create(spark, wh, "ns", "m5", schema)
    t.append(rows(("a", 1L)))
    // rewrite the head INLINE (the old on-disk shape) and cold-load it
    val fs = new Path(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md = new java.io.File(s"$wh/ns/m5/metadata")
    val headName = md.listFiles().map(_.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .maxBy(n => n.stripPrefix("v").stripSuffix(".json").toLong)
    val inline = TableMeta.toJson(t.meta) // no manifestFor → inline shape
    // write through the Hadoop fs so the local-fs .crc sidecar updates
    val out = fs.create(new Path(s"$wh/ns/m5/metadata/$headName"), true)
    out.write(inline.getBytes("UTF-8")); out.close()
    assert(inline.contains("\"dataFiles\""))
    val t2 = IceliteTable.load(spark, wh, "ns", "m5")
    assert(t2.read().count() == 1)
    // and its NEXT commit externalizes, upgrading the table in place
    t2.append(rows(("b", 2L)))
    assert(readHead(wh, "m5").contains("\"manifest\""))
    assert(IceliteTable.load(spark, wh, "ns", "m5").read().count() == 2)
  }
}
