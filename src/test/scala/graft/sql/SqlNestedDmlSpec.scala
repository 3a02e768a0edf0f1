package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.table.IceliteTable
import graft.util.Scratch

/** Struct-field assignment through SQL DML (`SET s.f = …`): UPDATE,
  * MERGE matched UPDATE, and MERGE BY SOURCE UPDATE all fold the
  * assigned fields into one withField chain over the base column's
  * pre-image ([[SqlDml.fieldPath]] routing).
  */
class SqlNestedDmlSpec extends AnyFunSuite with SparkFixture {

  private lazy val wh: String = {
    val w = Scratch.dir("nested-upd-wh")
    spark.conf.set("spark.sql.catalog.nup", classOf[IceliteCatalog].getName)
    spark.conf.set("spark.sql.catalog.nup.warehouse", w)
    w
  }

  private def mk(name: String, rows: Seq[(Long, (String, Long))]): IceliteTable = {
    import spark.implicits._
    val df = rows.toDF("k", "s")
      .select(col("k"), col("s").cast("struct<f:string,g:bigint>").as("s"))
    val t = IceliteTable.create(spark, wh, "ns", name, df.schema)
    t.append(df)
    t
  }

  private def state(name: String): Seq[(Long, String, Long)] =
    IceliteTable.load(spark, wh, "ns", name).read()
      .select(col("k"), col("s.f"), col("s.g"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq

  test("UPDATE SET s.f mutates one struct field, preserving the rest") {
    mk("t_nup", Seq((1L, ("a", 10L)), (2L, ("b", 20L))))
    spark.sql("UPDATE nup.ns.t_nup SET s.g = s.g + 5 WHERE k = 2")
    assert(state("t_nup") == Seq((1L, "a", 10L), (2L, "b", 25L)))
  }

  test("UPDATE with two struct fields of one column folds into one rewrite") {
    mk("t_nup2", Seq((1L, ("a", 10L))))
    // both expressions must read the PRE-update struct
    spark.sql("UPDATE nup.ns.t_nup2 SET s.f = concat(s.f, cast(s.g as string)), s.g = s.g * 2")
    assert(state("t_nup2") == Seq((1L, "a10", 20L)))
  }

  test("MERGE matched UPDATE SET t.s.g routes as a struct rewrite") {
    import spark.implicits._
    mk("t_nmrg", Seq((1L, ("a", 10L)), (2L, ("b", 20L))))
    Seq((2L, 300L), (9L, 900L)).toDF("k", "add").createOrReplaceTempView("nmrg_src")
    spark.sql(
      """MERGE INTO nup.ns.t_nmrg t USING nmrg_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.s.g = t.s.g + s.add
        |""".stripMargin)
    assert(state("t_nmrg") == Seq((1L, "a", 10L), (2L, "b", 320L)))
  }

  test("MERGE BY SOURCE UPDATE on a struct field flags stale rows in place") {
    import spark.implicits._
    mk("t_nbys", Seq((1L, ("a", 10L)), (2L, ("b", 20L))))
    Seq((1L, 1L)).toDF("k", "x").createOrReplaceTempView("nbys_src")
    spark.sql(
      """MERGE INTO nup.ns.t_nbys t USING nbys_src s ON t.k = s.k
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.s.f = 'stale'
        |""".stripMargin)
    assert(state("t_nbys") == Seq((1L, "a", 10L), (2L, "stale", 20L)))
  }

  test("whole-column plus struct-field assignment to one base refuses") {
    mk("t_nref", Seq((1L, ("a", 10L))))
    val e = intercept[Exception] {
      spark.sql(
        "UPDATE nup.ns.t_nref SET s = named_struct('f', 'x', 'g', 1L), s.g = 2 WHERE k = 1")
    }
    // Spark's own analyzer may reject the conflict first; either way
    // nothing half-applies
    assert(state("t_nref") == Seq((1L, "a", 10L)))
  }
}
