package graft.table

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Governance policies ([[IceliteTable.declarePolicy]] /
  * [[IceliteTable.readGoverned]]): row-access filtering with
  * deny-by-default NULL polarity, simultaneous pre-mask projection,
  * schema preservation, raw-read isolation, and declare/drop guards.
  */
class IcelitePolicySpec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("icelite-pol").toString

  private def rows(data: (Long, String, java.lang.Long)*): DataFrame = {
    import spark.implicits._
    data.toDF("id", "nm", "v")
  }

  private def mk(w: String): IceliteTable =
    IceliteTable.create(spark, w, "ns", "pol", rows().schema)

  test("row filter hides non-matching AND null-predicate rows; masks replace values") {
    val t = mk(wh())
    t.append(rows((1L, "alice", 10L), (2L, "bob", 99L), (3L, "carol", null)))
    t.declarePolicy("p", rowFilter = Some("v < 50"),
      masks = Map("nm" -> "'***'"))
    val got = t.readGoverned("p").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // v=99 filtered; v=NULL hidden (deny by default); name masked
    assert(got == Set((1L, "***", 10L)))
  }

  test("governed schema is bit-identical to the raw schema; masks cast to the column type") {
    val t = mk(wh())
    t.append(rows((1L, "alice", 10L)))
    t.declarePolicy("p", rowFilter = None, masks = Map("v" -> "0"))
    assert(t.readGoverned("p").schema == t.read().schema)
    assert(t.readGoverned("p").collect().head.getLong(2) == 0L)
  }

  test("masks see the PRE-mask row (simultaneous projection)") {
    val t = mk(wh())
    t.append(rows((7L, "alice", 10L)))
    // nm mask references v, v mask references id — each must see raw values
    t.declarePolicy("p", rowFilter = None,
      masks = Map("nm" -> "CAST(v AS STRING)", "v" -> "id"))
    val r = t.readGoverned("p").collect().head
    assert(r.getString(1) == "10" && r.getLong(2) == 7L)
  }

  test("the raw read is untouched by policies") {
    val t = mk(wh())
    t.append(rows((1L, "alice", 10L), (2L, "bob", 99L)))
    t.declarePolicy("p", rowFilter = Some("v < 50"), masks = Map("nm" -> "'***'"))
    assert(t.read().count() == 2)
    assert(t.read().filter(col("nm") === "alice").count() == 1)
  }

  test("declare validation: non-boolean filter, unknown mask column, empty policy") {
    val t = mk(wh())
    t.append(rows((1L, "alice", 10L)))
    intercept[IllegalArgumentException](
      t.declarePolicy("p", rowFilter = Some("v + 1"), masks = Map.empty))
    intercept[IllegalArgumentException](
      t.declarePolicy("p", rowFilter = None, masks = Map("nope" -> "0")))
    intercept[IllegalArgumentException](
      t.declarePolicy("p", rowFilter = None, masks = Map.empty))
  }

  test("redeclare replaces; drop removes; governed read of a dropped policy refuses") {
    val t = mk(wh())
    t.append(rows((1L, "alice", 10L), (2L, "bob", 99L)))
    t.declarePolicy("p", rowFilter = Some("v < 50"), masks = Map.empty)
    assert(t.readGoverned("p").count() == 1)
    t.declarePolicy("p", rowFilter = Some("v >= 50"), masks = Map.empty)
    assert(t.readGoverned("p").count() == 1)
    assert(t.policies("p")._1.contains("v >= 50"))
    t.dropPolicy("p")
    intercept[IllegalArgumentException](t.readGoverned("p"))
    intercept[IllegalArgumentException](t.dropPolicy("p"))
  }
}
