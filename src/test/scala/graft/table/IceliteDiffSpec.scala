package graft.table

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Snapshot diff by key (IceliteTable.diffSnapshots): NET change
  * classification between two retained snapshots via one full-outer
  * join of two time-travel reads — multi-hop histories collapse to a
  * single insert/update/delete verdict per key, unchanged keys drop
  * out, and null-valued columns compare null-safely.
  */
class IceliteDiffSpec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("icelite-diff").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType),
    StructField("note", StringType, nullable = true)))

  private def rows(data: (Long, Long, String)*): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      data.map { case (i, v, n) =>
        Row(java.lang.Long.valueOf(i), java.lang.Long.valueOf(v), n)
      }.asJava, schema)
  }

  private def changes(df: DataFrame): Map[Long, (String, Option[Long], Option[Long])] =
    df.select(col("id"), col("change"), col("before.v"), col("after.v"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap

  test("net classification: multi-hop edits collapse; unchanged keys vanish") {
    val t = IceliteTable.create(spark, wh(), "ns", "diff", schema)
    t.upsert(rows((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")), Seq("id"))
    val s1 = t.meta.lastSeq
    // key 1: updated twice -> ONE update row carrying only endpoints
    t.upsert(rows((1L, 11L, "a")), Seq("id"))
    t.upsert(rows((1L, 12L, "a")), Seq("id"))
    // key 2: updated then deleted -> net delete, before = s1 state
    t.upsert(rows((2L, 21L, "b")), Seq("id"))
    t.delete(rows((2L, 0L, "")).select("id"), Seq("id"))
    // key 4: inserted then updated -> net insert carrying final state
    t.upsert(rows((4L, 40L, "d")), Seq("id"))
    t.upsert(rows((4L, 41L, "d")), Seq("id"))
    // key 5: inserted then deleted inside the range -> absent entirely
    t.upsert(rows((5L, 50L, "e")), Seq("id"))
    t.delete(rows((5L, 0L, "")).select("id"), Seq("id"))
    // key 3: untouched -> absent
    val d = changes(t.diffSnapshots(s1, t.meta.lastSeq, Seq("id")))
    assert(d == Map(
      1L -> (("update", Some(10L), Some(12L))),
      2L -> (("delete", Some(20L), None)),
      4L -> (("insert", None, Some(41L)))))
  }

  test("null-safe value compare: null->value and value->null are updates; null->null is not") {
    val t = IceliteTable.create(spark, wh(), "ns", "diffnull", schema)
    t.upsert(rows((1L, 1L, null), (2L, 2L, "x"), (3L, 3L, null)), Seq("id"))
    val s1 = t.meta.lastSeq
    t.upsert(rows((1L, 1L, "now"), (2L, 2L, null), (3L, 3L, null)), Seq("id"))
    val d = t.diffSnapshots(s1, t.meta.lastSeq, Seq("id"))
      .select("id", "change").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(d == Map(1L -> "update", 2L -> "update")) // key 3 null==null drops out
  }

  test("value-identical re-upsert diffs to empty; expired from-seq refuses") {
    val t = IceliteTable.create(spark, wh(), "ns", "diffsame", schema)
    t.upsert(rows((1L, 1L, "a")), Seq("id"))
    val s1 = t.meta.lastSeq
    t.upsert(rows((1L, 1L, "a")), Seq("id")) // new commit, same values
    assert(t.diffSnapshots(s1, t.meta.lastSeq, Seq("id")).isEmpty)
    // compaction collapses history: diffing FROM a pre-rewrite seq must
    // throw (readAt contract), never misreport survivors as inserts
    t.compact()
    val e = intercept[IllegalArgumentException] {
      t.diffSnapshots(s1, t.meta.lastSeq, Seq("id")).collect()
    }
    assert(e.getMessage.contains("not retained"))
  }
}
