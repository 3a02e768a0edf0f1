package graft.table

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Row lineage (IceliteTable.appendWithLineage — Iceberg v3 row
  * lineage over the icelite v2 table layer): commit-assigned globally
  * dense `_row_id`s whose high-water mark advances atomically with the
  * data commit, carried unchanged through copy-on-write rewrites, with
  * `_last_updated_seq` re-stamped on exactly the rows an update
  * modifies.
  */
class IceliteLineageSpec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("icelite-lineage").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType),
    StructField(IceliteTable.RowIdCol, LongType),
    StructField(IceliteTable.LastUpdatedSeqCol, LongType)))

  private def rows(data: (Long, Long)*): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      data.map { case (i, v) =>
        Row(java.lang.Long.valueOf(i), java.lang.Long.valueOf(v))
      }.asJava,
      StructType(schema.fields.take(2)))
  }

  private def lineage(t: IceliteTable): Map[Long, (Long, Long)] =
    t.read().collect().map(r =>
      r.getAs[Long]("id") ->
        ((r.getAs[Long](IceliteTable.RowIdCol),
          r.getAs[Long](IceliteTable.LastUpdatedSeqCol)))).toMap

  test("ids are dense across appends and the high-water mark commits with the data") {
    val t = IceliteTable.create(spark, wh(), "ns", "lin", schema)
    t.appendWithLineage(rows(30L -> 1L, 10L -> 2L, 20L -> 3L), Seq("id"))
    // in-batch order is the orderCols order, not arrival order
    assert(lineage(t) == Map(10L -> ((0L, 1L)), 20L -> ((1L, 1L)), 30L -> ((2L, 1L))))
    assert(t.meta.properties(IceliteTable.NextRowIdProp) == "3")
    t.appendWithLineage(rows(5L -> 4L, 40L -> 5L), Seq("id"))
    // second batch continues at the mark — never reuses an id
    assert(lineage(t) == Map(10L -> ((0L, 1L)), 20L -> ((1L, 1L)), 30L -> ((2L, 1L)),
      5L -> ((3L, 2L)), 40L -> ((4L, 2L))))
    assert(t.meta.properties(IceliteTable.NextRowIdProp) == "5")
  }

  test("copy-on-write rewrite preserves ids and re-stamps only modified rows") {
    val t = IceliteTable.create(spark, wh(), "ns", "lin2", schema)
    t.appendWithLineage(rows((1L to 6L).map(i => i -> i): _*), Seq("id"))
    val before = lineage(t)
    t.updateWhereCoW(pmod(col("id"), lit(2)) === 0, Map("v" -> (col("v") + lit(100L))))
    val after = lineage(t)
    // every id survived the full-file rewrite bit-for-bit
    assert(after.view.mapValues(_._1).toMap == before.view.mapValues(_._1).toMap)
    // the update seq landed on exactly the even ids
    assert(after.collect { case (id, (_, s)) if s == 2L => id }.toSet == Set(2L, 4L, 6L))
    assert(after.collect { case (id, (_, s)) if s == 1L => id }.toSet == Set(1L, 3L, 5L))
    // and the values moved only where stamped
    val vs = t.read().collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
    assert(vs == Map(1L -> 1L, 2L -> 102L, 3L -> 3L, 4L -> 104L, 5L -> 5L, 6L -> 106L))
  }

  test("a multi-partition append numbers densely in key order (range-offset math)") {
    import spark.implicits._
    val t = IceliteTable.create(spark, wh(), "ns", "lin5", schema)
    // enough rows to span many range partitions; shuffled input order so
    // the assignment cannot lean on arrival order
    val n = 5000L
    val in = spark.range(n).select(
        (col("id") * 2654435761L % n).as("id"), col("id").as("v"))
      .repartition(8)
    t.appendWithLineage(in, Seq("id"))
    val got = t.read().select("id", IceliteTable.RowIdCol).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // ids are exactly the rank of the key in ascending order, 0-based
    assert(got.map(_._2).toSeq == got.indices.map(_.toLong))
    assert(t.meta.properties(IceliteTable.NextRowIdProp) == got.length.toString)
  }

  test("lineage append requires the lineage columns in the schema") {
    val bare = StructType(schema.fields.take(2))
    val t = IceliteTable.create(spark, wh(), "ns", "lin3", bare)
    val e = intercept[IllegalArgumentException] {
      t.appendWithLineage(rows(1L -> 1L), Seq("id"))
    }
    assert(e.getMessage.contains(IceliteTable.RowIdCol))
  }

  test("caller-supplied lineage columns are ignored — assignment is the table's") {
    val t = IceliteTable.create(spark, wh(), "ns", "lin4", schema)
    val withFake = rows(7L -> 1L)
      .withColumn(IceliteTable.RowIdCol, lit(999L))
      .withColumn(IceliteTable.LastUpdatedSeqCol, lit(999L))
    t.appendWithLineage(withFake, Seq("id"))
    assert(lineage(t) == Map(7L -> ((0L, 1L))))
  }

  test("non-lineage mutating writes on a lineage-enabled table are rejected") {
    val t = IceliteTable.create(spark, wh(), "ns", "lin_guard", schema)
    t.appendWithLineage(rows(1L -> 1L, 2L -> 2L), Seq("id"))
    // every row-adding path outside appendWithLineage/updateWhereCoW
    // would mint no _row_id — the guard refuses rather than corrupting
    val full = rows(3L -> 3L)
      .withColumn(IceliteTable.RowIdCol, lit(99L))
      .withColumn(IceliteTable.LastUpdatedSeqCol, lit(99L))
    intercept[IllegalArgumentException] { t.append(full) }
    intercept[IllegalArgumentException] { t.upsert(full, Seq("id")) }
    intercept[IllegalArgumentException] {
      t.merge(full, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      t.updateWhere(col("id") === 1L, Map("v" -> lit(9L)))
    }
    // deletes are lineage-safe (no ids minted, no stale stamps left)
    t.deleteWhere(col("id") === 2L)
    assert(lineage(t).keySet == Set(1L))
    // the lineage paths still work after the rejections
    t.appendWithLineage(rows(4L -> 4L), Seq("id"))
    assert(lineage(t)(4L)._1 == 2L)
  }
}
