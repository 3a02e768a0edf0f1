package graft.table

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Column rename/drop evolution with field-ID semantics
  * (IceliteTable.renameColumn / dropColumn): metadata-only ops — no
  * file is rewritten, reads translate names per file epoch, time
  * travel shows the pre-op shape, and anchored columns (keys,
  * partition sources, z-order) are protected.
  */
class IceliteEvolutionSpec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("icelite-evolve").toString

  private val schema3 = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType),
    StructField("note", StringType)))

  private def rows3(name: String, data: (Long, Double, String)*): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      data.map { case (i, v, n) => Row(java.lang.Long.valueOf(i), v, n) }.asJava,
      StructType(schema3.fields.map(f => if (f.name == "note") f.copy(name = name) else f)))
  }

  test("rename: old files read under new name, time travel shows old shape, no rewrite") {
    val t = IceliteTable.create(spark, wh(), "ns", "ev", schema3)
    t.upsert(rows3("note", (1L, 1.0, "a"), (2L, 2.0, "b")), Seq("id"))
    val preRename = t.meta.lastSeq
    val filesBefore = t.meta.liveDataFiles.toSet
    t.renameColumn("note", "comment")
    assert(t.meta.liveDataFiles.toSet == filesBefore) // metadata-only
    t.upsert(rows3("comment", (3L, 3.0, "c")), Seq("id"))
    assert(t.schema.fieldNames.toSeq == Seq("id", "v", "comment"))
    // both epochs under the CURRENT name
    assert(t.read().orderBy("id").collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // time travel: the old shape, old name, pre-rename rows only
    val at = t.readAt(preRename)
    assert(at.schema.fieldNames.toSeq == Seq("id", "v", "note"))
    assert(at.orderBy("id").collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // upserting an epoch-0 key under the new name still LWW-replaces it
    t.upsert(rows3("comment", (1L, 10.0, "a2")), Seq("id"))
    assert(t.read().filter(col("id") === 1L).head().getString(2) == "a2")
  }

  test("initial default: pre-add files serve it, post-add values win, lifecycle cleans up") {
    import org.apache.spark.sql.types.LongType
    val t = IceliteTable.create(spark, wh(), "ns", "defaults", schema3)
    t.append(rows3("note", (1L, 1.0, "a")))
    val preAdd = t.meta.lastSeq
    t.addColumnWithDefault("score", LongType, 42L)
    t.append(spark.createDataFrame(
      java.util.List.of(Row(java.lang.Long.valueOf(2L), 2.0, "b", java.lang.Long.valueOf(9L))),
      t.schema))
    def scores = t.read().orderBy("id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(scores.toSeq == Seq((1L, 42L), (2L, 9L))) // default vs stored
    // time travel before the add: no column at all
    assert(!t.readAt(preAdd).schema.fieldNames.contains("score"))
    // the default follows a rename
    t.renameColumn("score", "points")
    assert(t.read().filter(col("id") === 1L).head().getLong(3) == 42L)
    // ... and dies with a drop: a fresh re-add of the name is null-filled
    t.dropColumn("points")
    t.addColumns(org.apache.spark.sql.types.StructType(Seq(
      StructField("points", LongType))))
    assert(t.read().filter(col("id") === 1L).head().isNullAt(3))
  }

  test("initial default: rollback past the add removes the default with the column") {
    import org.apache.spark.sql.types.LongType
    val t = IceliteTable.create(spark, wh(), "ns", "defroll", schema3)
    t.append(rows3("note", (1L, 1.0, "a")))
    val preAdd = t.meta.lastSeq
    t.addColumnWithDefault("score", LongType, 5L)
    t.rollbackTo(preAdd)
    assert(!t.schema.fieldNames.contains("score"))
    assert(!t.meta.properties.keys.exists(_.startsWith(IceliteTable.DefaultPropPrefix)))
    // re-adding plain after the rollback starts null-filled
    t.addColumns(org.apache.spark.sql.types.StructType(Seq(StructField("score", LongType))))
    assert(t.read().head().isNullAt(3))
  }

  test("chained renames compose: epoch-0 files resolve through every hop") {
    val t = IceliteTable.create(spark, wh(), "ns", "chain", schema3)
    t.append(rows3("note", (1L, 1.0, "x")))
    t.renameColumn("note", "remark")
    t.append(rows3("remark", (2L, 2.0, "y")))
    t.renameColumn("remark", "comment")
    t.append(rows3("comment", (3L, 3.0, "z")))
    assert(t.read().orderBy("id").collect().map(_.getString(2)).toSeq == Seq("x", "y", "z"))
    // s1 append, s2 rename→remark, s3 append: at s3 the name is
    // `remark` and both epoch-0 and epoch-1 rows resolve
    assert(t.readAt(3).schema.fieldNames.contains("remark"))
    assert(t.readAt(3).orderBy("id").collect().map(_.getString(2)).toSeq == Seq("x", "y"))
  }

  test("drop: column hidden without rewrite, time travel resurrects it, compact migrates") {
    val t = IceliteTable.create(spark, wh(), "ns", "drop", schema3)
    t.upsert(rows3("note", (1L, 1.0, "a"), (2L, 2.0, "b")), Seq("id"))
    val preDrop = t.meta.lastSeq
    val filesBefore = t.meta.liveDataFiles.toSet
    t.dropColumn("v")
    assert(t.meta.liveDataFiles.toSet == filesBefore) // metadata-only
    assert(t.schema.fieldNames.toSeq == Seq("id", "note"))
    assert(t.read().orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // time travel BEFORE the drop: the column is back, values intact,
    // at its original position
    val at = t.readAt(preDrop)
    assert(at.schema.fieldNames.toSeq == Seq("id", "v", "note"))
    assert(at.orderBy("id").collect().map(_.getDouble(1)).toSeq == Seq(1.0, 2.0))
    // a full compact rewrites survivors under the current (dropped) shape
    t.compact()
    assert(t.read().schema.fieldNames.toSeq == Seq("id", "note"))
    assert(t.read().count() == 2)
  }

  test("anchored and invalid targets are rejected") {
    val t = IceliteTable.create(spark, wh(), "ns", "guard", schema3,
      partitioning = Seq(graft.config.PartitionConfig("id", "bucket[4]")))
    t.upsert(rows3("note", (1L, 1.0, "a")), Seq("id"))
    intercept[IllegalArgumentException](t.renameColumn("id", "id2")) // key + partition source
    intercept[IllegalArgumentException](t.dropColumn("id"))
    intercept[IllegalArgumentException](t.renameColumn("nope", "x")) // unknown
    intercept[IllegalArgumentException](t.renameColumn("v", "note")) // collision
    intercept[IllegalArgumentException](t.dropColumn("nope"))
  }

  test("changelog survives a rename; cold compaction refuses to cross one") {
    val t = IceliteTable.create(spark, wh(), "ns", "cdc", schema3)
    t.upsert(rows3("note", (1L, 1.0, "a"), (2L, 2.0, "b")), Seq("id")) // s1
    t.renameColumn("note", "comment") // s2 (evolve, no files)
    val s3 = t.upsert(rows3("comment", (1L, 9.0, "a9")), Seq("id")) // s3
    val ch = t.readChanges(0, s3)
      .select("_change_type", "id", "comment").orderBy("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(ch == Seq(
      ("insert", 1L, "a"), ("insert", 2L, "b"),
      ("update_postimage", 1L, "a9"), ("update_preimage", 1L, "a")))
    // cold compaction would stamp current-name files at a pre-rename
    // cutoff (keepHot=2 ⇒ cutoff=s1 < rename@s2) — must refuse and
    // point at full compact
    intercept[IllegalStateException](t.compactCold(keepHotCommits = 2))
    t.compact() // the migration path works...
    assert(t.read().count() == 2)
    assert(t.read().filter(col("id") === 1L).head().getString(2) == "a9")
  }

  test("re-adding a dropped column name does NOT resurrect the dropped data") {
    val t = IceliteTable.create(spark, wh(), "ns", "readd", schema3)
    t.append(rows3("note", (1L, 1.0, "secret"), (2L, 2.0, "hidden")))
    t.dropColumn("note")
    // auto-evolution re-adds the same name (ChangeStreamSync.maybeEvolve
    // does this when source post-images still carry the field)
    t.addColumns(StructType(Seq(StructField("note", StringType))))
    t.append(rows3("note", (3L, 3.0, "fresh")))
    // pre-add files serve NULL for the reborn column — their old bytes
    // under the same name stay dead (Iceberg fresh-field-ID semantics)
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)))).toSeq
    assert(got == Seq((1L, None), (2L, None), (3L, Some("fresh"))))
    // time travel BEFORE the add does not show the reborn column...
    val preAdd = t.readAt(2)
    assert(!preAdd.schema.fieldNames.contains("note"))
    // ...and before the DROP shows the original values
    assert(t.readAt(1).orderBy("id").collect().map(_.getString(2)).toSeq ==
      Seq("secret", "hidden"))
  }

  test("rename then re-add of the from-name: no duplicate read schema, no resurrection") {
    val t = IceliteTable.create(spark, wh(), "ns", "renadd", schema3)
    t.append(rows3("note", (1L, 1.0, "old-a"))) // stores physical column `note`
    t.renameColumn("note", "comment")
    t.addColumns(StructType(Seq(StructField("note", StringType)))) // fresh column, old name
    t.append(rows3("comment", (2L, 2.0, "new-b")).withColumn("note", lit("new-a")))
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(2), Option(r.getString(3)))).toSeq
    // epoch-0 bytes serve the RENAMED column under its new name; the
    // reborn `note` is null there — never bound to the old bytes
    assert(got == Seq((1L, "old-a", None), (2L, "new-b", Some("new-a"))))
  }

  test("fresh first-time add keeps the flat single-scan read (no union), nulls backfill") {
    import org.apache.spark.sql.types._
    val t = IceliteTable.create(spark, wh(), "ns", "freshadd", schema3)
    t.append(rows3("note", (1L, 1.0, "a"), (2L, 2.0, "b")))
    t.addColumns(StructType(Seq(StructField("tier", StringType))))
    t.append(rows3("note", (3L, 3.0, "c")).withColumn("tier", lit("T1")))
    val df = t.read()
    // fresh add = no previous life: pre-add files have no bytes under
    // the name, so schema-fill null is correct and the read stays ONE
    // flat multi-file scan — no per-epoch group split, no Union
    assert(!df.queryExecution.executedPlan.toString.contains("Union"),
      "a first-time column add forced the read off the single-scan fast path")
    assert(df.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("tier")))).toSeq ==
      Seq((1L, None), (2L, None), (3L, Some("T1"))))
    // rollback to before the add (append=1, add=2) still removes the
    // column exactly — fresh adds stay in the op log for this
    t.rollbackTo(1)
    assert(!t.schema.fieldNames.contains("tier"))
  }

  test("rollback removes later-added columns (exact toSeq schema)") {
    val t = IceliteTable.create(spark, wh(), "ns", "rbadd", schema3)
    val s1 = t.append(rows3("note", (1L, 1.0, "a")))
    t.addColumns(StructType(Seq(StructField("extra", DoubleType))))
    t.append(rows3("note", (2L, 2.0, "b")).withColumn("extra", lit(9.9)))
    t.rollbackTo(s1)
    assert(t.schema.fieldNames.toSeq == Seq("id", "v", "note"))
    assert(t.read().count() == 1)
  }

  test("rollback: state, schema ops and seq line; changelog refuses to cross it") {
    val t = IceliteTable.create(spark, wh(), "ns", "rb", schema3)
    val s1 = t.upsert(rows3("note", (1L, 1.0, "a"), (2L, 2.0, "b")), Seq("id"))
    t.renameColumn("note", "comment") // s2
    val s3 = t.upsert(rows3("comment", (1L, 9.0, "a9"), (3L, 3.0, "c")), Seq("id"))
    val rbSeq = t.rollbackTo(s1)
    // state is exactly the s1 state, under the s1 SCHEMA (rename rolled back)
    assert(t.schema.fieldNames.toSeq == Seq("id", "v", "note"))
    assert(t.read().orderBy("id").collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // seqs never reuse: the rollback snapshot continues the line
    assert(rbSeq == s3 + 1 && t.meta.lastSeq == rbSeq)
    val s5 = t.upsert(rows3("note", (4L, 4.0, "d")), Seq("id"))
    assert(s5 == rbSeq + 1 && t.read().count() == 3)
    // a changelog range crossing the rollback is not derivable
    intercept[IllegalStateException](t.readChanges(s1, s5))
    // ...but the post-rollback tail is
    assert(t.readChanges(rbSeq, s5).count() == 1)
    // guards: not-before-head and expired-history rejected
    intercept[IllegalArgumentException](t.rollbackTo(s5))
    t.compact() // collapses history
    intercept[IllegalArgumentException](t.rollbackTo(s1))
  }

  test("widen: int->long metadata-only, mixed epochs read exactly, time travel narrow") {
    import scala.jdk.CollectionConverters._
    val s = StructType(Seq(StructField("id", LongType), StructField("n", IntegerType)))
    val t = IceliteTable.create(spark, wh(), "ns", "evw", s)
    t.append(spark.createDataFrame(
      Seq(Row(1L, java.lang.Integer.valueOf(7)), Row(2L, java.lang.Integer.valueOf(9))).asJava, s))
    val preWiden = t.meta.lastSeq
    val filesBefore = t.meta.liveDataFiles.toSet
    t.widenColumn("n", LongType)
    assert(t.meta.liveDataFiles.toSet == filesBefore, "metadata-only")
    assert(t.meta.schema("n").dataType == LongType)
    // post-widen epoch stores longs beyond int range
    val s2 = StructType(Seq(StructField("id", LongType), StructField("n", LongType)))
    t.append(spark.createDataFrame(
      Seq(Row(3L, java.lang.Long.valueOf(5_000_000_000L))).asJava, s2))
    val out = t.read().orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 7L), (2L, 9L), (3L, 5_000_000_000L)))
    // the widened column aggregates across both vintages
    assert(t.read().agg(sum(col("n"))).collect()(0).getLong(0) == 5_000_000_016L)
    // time travel resurrects the NARROW type with the old values
    assert(t.schemaAt(preWiden)("n").dataType == IntegerType)
    val old = t.readAt(preWiden).orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(old.toSeq == Seq((1L, 7), (2L, 9)))
  }

  test("widen composes with rename across epochs; predicates work on every vintage") {
    import scala.jdk.CollectionConverters._
    val s = StructType(Seq(StructField("id", LongType), StructField("n", IntegerType)))
    val t = IceliteTable.create(spark, wh(), "ns", "evwr", s)
    t.append(spark.createDataFrame(Seq(Row(1L, java.lang.Integer.valueOf(7))).asJava, s))
    t.widenColumn("n", LongType)
    t.renameColumn("n", "m")
    val s2 = StructType(Seq(StructField("id", LongType), StructField("m", LongType)))
    t.append(spark.createDataFrame(
      Seq(Row(2L, java.lang.Long.valueOf(6_000_000_000L))).asJava, s2))
    // rename then widen, the other order, over the SAME table: m -> k
    t.renameColumn("id", "key")
    val out = t.read().filter(col("m") > 5L).orderBy("key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 7L), (2L, 6_000_000_000L)))
    assert(t.read().filter(col("m") > 1_000_000_000L).count() == 1)
  }

  test("nested-field widen: pre-widen epochs rebuild with the cast, composes with nested rename") {
    import scala.jdk.CollectionConverters._
    val st = StructType(Seq(StructField("n", IntegerType), StructField("tag", StringType)))
    val s = StructType(Seq(StructField("id", LongType), StructField("meta", st)))
    val t = IceliteTable.create(spark, wh(), "ns", "evnw", s)
    t.append(spark.createDataFrame(
      Seq(Row(1L, Row(java.lang.Integer.valueOf(7), "a"))).asJava, s))
    t.widenNestedField("meta", "n", LongType)
    t.renameNestedField("meta", "n", "count")
    val st2 = StructType(Seq(StructField("count", LongType), StructField("tag", StringType)))
    val s2 = StructType(Seq(StructField("id", LongType), StructField("meta", st2)))
    t.append(spark.createDataFrame(
      Seq(Row(2L, Row(java.lang.Long.valueOf(7_000_000_000L), "b"))).asJava, s2))
    val out = t.read().orderBy("id").select(col("id"), col("meta.count"), col("meta.tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq((1L, 7L, "a"), (2L, 7_000_000_000L, "b")))
    assert(t.read().agg(sum(col("meta.count"))).collect()(0).getLong(0) == 7_000_000_007L)
    // refusals: narrowing + unknown field
    intercept[IllegalArgumentException](t.widenNestedField("meta", "count", IntegerType))
    intercept[IllegalArgumentException](t.widenNestedField("meta", "nope", LongType))
  }

  test("widen refusals: narrowing, cross-family, anchored columns; comment + DROP NOT NULL") {
    import scala.jdk.CollectionConverters._
    val s = StructType(Seq(
      StructField("id", LongType, nullable = false), StructField("n", IntegerType),
      StructField("d", DoubleType)))
    val t = IceliteTable.create(spark, wh(), "ns", "evref", s,
      properties = Map("graft.delete.key.columns" -> "id"))
    t.append(spark.createDataFrame(
      Seq(Row(java.lang.Long.valueOf(1L), java.lang.Integer.valueOf(7), 1.5)).asJava, s))
    intercept[IllegalArgumentException](t.widenColumn("d", FloatType)) // narrowing
    intercept[IllegalArgumentException](t.widenColumn("n", StringType)) // cross-family
    intercept[IllegalArgumentException](t.widenColumn("id", LongType)) // identity + anchored
    intercept[IllegalArgumentException](t.widenColumn("nope", LongType))
    // metadata-only comment + nullability relaxation
    t.setColumnComment("n", "a counter")
    assert(t.meta.schema("n").getComment().contains("a counter"))
    assert(!t.meta.schema("id").nullable)
    t.relaxNullability("id")
    assert(t.meta.schema("id").nullable)
  }

  test("SET NOT NULL: one-scan proof, dirty refusal, write enforcement, time travel") {
    import scala.jdk.CollectionConverters._
    val s = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val t = IceliteTable.create(spark, wh(), "ns", "evnn", s)
    t.append(spark.createDataFrame(
      Seq(Row(java.lang.Long.valueOf(1L), "a"), Row(java.lang.Long.valueOf(2L), null)).asJava, s))
    val preSeq = t.meta.lastSeq
    // dirty column refuses with the violating count, state untouched
    val e = intercept[IllegalStateException](t.tightenNullability("v"))
    assert(e.getMessage.contains("1 existing row"), e.getMessage)
    assert(t.meta.lastSeq == preSeq && t.meta.schema("v").nullable)
    // clean column flips metadata-only (no data files in the commit)
    t.tightenNullability("id")
    assert(!t.meta.schema("id").nullable)
    assert(t.meta.snapshots.last.operation == "evolve" &&
      t.meta.snapshots.last.recordCount == 0L)
    // enforcement rides the Scala write path's own scan
    val bad = intercept[Exception](t.append(spark.createDataFrame(
      Seq(Row(null, "c")).asJava, s)))
    assert(Option(bad.getMessage).getOrElse(bad.getCause.getMessage)
      .contains("NOT NULL"), bad.toString)
    // the refused batch landed nothing
    assert(t.read().count() == 2)
    // a NULL produced by an UPDATE set-expression also fails fast
    intercept[Exception](t.updateWhere(col("id") === 1L,
      Map("id" -> lit(null).cast(LongType))))
    assert(t.read().filter(col("id").isNull).count() == 0)
    // time travel to a pre-tighten seq still serves the old shape
    assert(t.readAt(preSeq).count() == 2)
    // idempotent: tightening an already-NOT-NULL column is a no-op
    val seqNow = t.meta.lastSeq
    assert(t.tightenNullability("id") == seqNow)
    // unknown column refuses
    intercept[IllegalArgumentException](t.tightenNullability("nope"))
    // after backfilling the NULL, v tightens too
    t.updateWhere(col("v").isNull, Map("v" -> lit("filled")))
    t.tightenNullability("v")
    assert(!t.meta.schema("v").nullable)
  }
}
