package graft.table

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Write-time CHECK constraints (IceliteTable.declareConstraint): SQL
  * CHECK semantics (FALSE violates, NULL passes), declare-time
  * validation of schema resolution and existing rows, fail-fast
  * enforcement fused into every ingest write path, and maintenance
  * rewrites exempt.
  */
class IceliteConstraintSpec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("icelite-check").toString

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

  private def violation(body: => Any): Unit = {
    val e = intercept[Exception](body)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("CHECK constraint")), e.toString)
  }

  test("appends and upserts enforce; valid rows flow; NULL passes") {
    val t = IceliteTable.create(spark, wh(), "ns", "ck", schema)
    t.append(rows((1L, 5L, "a")))
    t.declareConstraint("v_pos", "v > 0")
    t.append(rows((2L, 7L, null))) // null note irrelevant, v > 0 holds
    violation(t.append(rows((3L, -1L, "bad"))))
    violation(t.upsert(rows((1L, 0L, "zero")), Seq("id")))
    // nothing from the failed writes is visible
    assert(t.read().count() == 2)
    assert(t.read().filter(col("id") === 1L).head().getLong(1) == 5L)
    // NULL predicate result passes (SQL CHECK): constraint on note
    t.declareConstraint("note_len", "length(note) < 10")
    t.append(rows((4L, 1L, null))) // length(null) is null -> passes
    violation(t.append(rows((5L, 1L, "waaaaaaaay too long"))))
  }

  test("declare validates: unresolvable, non-boolean, and dirty existing rows refuse") {
    val t = IceliteTable.create(spark, wh(), "ns", "ckv", schema)
    t.append(rows((1L, -5L, "a")))
    intercept[Exception](t.declareConstraint("bad_col", "nope > 0"))
    intercept[IllegalArgumentException](t.declareConstraint("not_bool", "v + 1"))
    val e = intercept[IllegalStateException](t.declareConstraint("v_pos", "v > 0"))
    assert(e.getMessage.contains("existing row"))
    assert(t.constraints.isEmpty)
  }

  test("merge and updateWhere enforce on the written images") {
    val t = IceliteTable.create(spark, wh(), "ns", "ckm", schema)
    t.upsert(rows((1L, 5L, "a"), (2L, 6L, "b")), Seq("id"))
    t.declareConstraint("v_pos", "v > 0")
    // merge whose UPDATE SET produces a violating image must fail
    violation(t.merge(rows((1L, 9L, "x")), Seq("id"),
      matchedUpdateSet = Map("v" -> (col("t.v") - lit(100L)))))
    // a valid merge flows
    t.merge(rows((1L, 9L, "x")), Seq("id"),
      matchedUpdateSet = Map("v" -> (col("t.v") + col("s.v"))))
    assert(t.read().filter(col("id") === 1L).head().getLong(1) == 14L)
    violation(t.updateWhere(col("id") === 2L, Map("v" -> lit(-3L))))
    t.updateWhere(col("id") === 2L, Map("v" -> lit(30L)))
    assert(t.read().filter(col("id") === 2L).head().getLong(1) == 30L)
  }

  test("maintenance rewrites are exempt; dropConstraint reopens the gate") {
    val t = IceliteTable.create(spark, wh(), "ns", "ckc", schema)
    t.upsert(rows((1L, 5L, "a"), (2L, 6L, "b")), Seq("id"))
    t.declareConstraint("v_pos", "v > 0")
    t.compact() // validated-at-landing rows rewrite without re-checking
    assert(t.read().count() == 2)
    violation(t.append(rows((3L, -1L, "bad"))))
    t.dropConstraint("v_pos")
    t.append(rows((3L, -1L, "now ok")))
    assert(t.read().count() == 3)
    intercept[IllegalArgumentException](t.dropConstraint("v_pos"))
  }
}
