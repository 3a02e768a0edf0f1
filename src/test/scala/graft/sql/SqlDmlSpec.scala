package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.table.IceliteTable
import graft.util.Scratch

/** SQL UPDATE / MERGE INTO routed onto the engine's row-level APIs
  * ([[IceliteDmlRule]]): happy paths, SQL clause-order semantics, and
  * the refusal discipline for unroutable shapes.
  */
class SqlDmlSpec extends AnyFunSuite with SparkFixture {

  private lazy val wh: String = {
    val w = Scratch.dir("sqldml-wh")
    spark.conf.set("spark.sql.catalog.dml", classOf[IceliteCatalog].getName)
    spark.conf.set("spark.sql.catalog.dml.warehouse", w)
    w
  }

  private def mk(name: String, rows: Seq[(Long, String, Long)]): IceliteTable = {
    import spark.implicits._
    val df = rows.toDF("k", "s", "v")
    val t = IceliteTable.create(spark, wh, "ns", name, df.schema)
    if (rows.nonEmpty) t.append(df)
    t
  }

  private def chainMsg(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  private def state(name: String): Seq[(Long, String, Long)] =
    IceliteTable.load(spark, wh, "ns", name).read()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq

  test("UPDATE with WHERE mutates exactly the matching rows in one MoR commit") {
    mk("t_upd", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    spark.sql("UPDATE dml.ns.t_upd SET v = v + 100, s = concat(s, 'x') WHERE k >= 2")
    assert(state("t_upd") == Seq((1L, "a", 10L), (2L, "bx", 120L), (3L, "cx", 130L)))
    val t = IceliteTable.load(spark, wh, "ns", "t_upd")
    assert(t.meta.snapshots.last.operation == "update", "routed through updateWhere")
  }

  test("unqualified UPDATE touches every row; SET expressions see the pre-update row") {
    mk("t_upd_all", Seq((1L, "a", 1L), (2L, "b", 2L)))
    // both assignments read v: each must see the PRE-update value
    spark.sql("UPDATE dml.ns.t_upd_all SET v = v * 10, s = cast(v as string)")
    assert(state("t_upd_all") == Seq((1L, "1", 10L), (2L, "2", 20L)))
  }

  test("MERGE INTO: update + delete + insert with clause-order semantics") {
    import spark.implicits._
    mk("t_mrg", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    Seq((2L, "B", 200L), (3L, "C", 300L), (4L, "D", 400L))
      .toDF("k", "s", "v").createOrReplaceTempView("mrg_src")
    spark.sql(
      """MERGE INTO dml.ns.t_mrg t USING mrg_src s ON t.k = s.k
        |WHEN MATCHED AND s.v > 250 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v + t.v
        |WHEN NOT MATCHED THEN INSERT (k, s, v) VALUES (s.k, s.s, s.v)
        |""".stripMargin)
    assert(state("t_mrg") == Seq((1L, "a", 10L), (2L, "b", 220L), (4L, "D", 400L)))
  }

  test("MERGE UPDATE SET * replaces the whole row with the source image") {
    import spark.implicits._
    mk("t_mrg_star", Seq((1L, "a", 10L), (2L, "b", 20L)))
    Seq((2L, "BB", 222L)).toDF("k", "s", "v").createOrReplaceTempView("mrg_star_src")
    spark.sql(
      """MERGE INTO dml.ns.t_mrg_star t USING mrg_star_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |""".stripMargin)
    assert(state("t_mrg_star") == Seq((1L, "a", 10L), (2L, "BB", 222L)))
  }

  test("MERGE rejects a duplicate-key source as a SQL error") {
    import spark.implicits._
    mk("t_mrg_dup", Seq((1L, "a", 10L)))
    Seq((1L, "x", 1L), (1L, "y", 2L)).toDF("k", "s", "v")
      .createOrReplaceTempView("mrg_dup_src")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO dml.ns.t_mrg_dup t USING mrg_dup_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |""".stripMargin)
    }
    assert(e.getMessage.contains("duplicate keys"), s"got: ${e.getMessage}")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: stale target rows retire or get flagged") {
    import spark.implicits._
    mk("t_bys", Seq((1L, "a", 10L), (2L, "b", 11L), (3L, "c", 12L), (4L, "d", 13L)))
    // source carries keys 1 (match) and 9 (insert); 2,3,4 are stale
    Seq((1L, "a2", 100L), (9L, "i", 90L)).toDF("k", "s", "v")
      .createOrReplaceTempView("bys_src")
    spark.sql(
      """MERGE INTO dml.ns.t_bys t USING bys_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, s, v) VALUES (s.k, s.s, s.v)
        |WHEN NOT MATCHED BY SOURCE AND t.v % 2 = 1 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET s = 'stale'
        |""".stripMargin)
    // k=1 updated; k=9 inserted; k=2 (v=11 odd) and k=4 (13 odd)
    // deleted; k=3 (12 even) flagged by the second BY SOURCE clause
    assert(state("t_bys") == Seq((1L, "a", 100L), (3L, "stale", 12L), (9L, "i", 90L)))
  }

  test("BY SOURCE clause ordering: the first matching clause wins") {
    import spark.implicits._
    mk("t_bys2", Seq((1L, "a", 2L), (2L, "b", 4L)))
    Seq((7L, "x", 70L)).toDF("k", "s", "v").createOrReplaceTempView("bys2_src")
    spark.sql(
      """MERGE INTO dml.ns.t_bys2 t USING bys2_src s ON t.k = s.k
        |WHEN NOT MATCHED BY SOURCE AND t.v = 2 THEN UPDATE SET s = 'first'
        |WHEN NOT MATCHED BY SOURCE THEN DELETE
        |""".stripMargin)
    // row v=2 hits the UPDATE clause FIRST (the later DELETE must not
    // claim it); row v=4 falls through to the DELETE; the insert row
    // is skipped (no NOT MATCHED clause)
    assert(state("t_bys2") == Seq((1L, "first", 2L)))
  }

  test("BY SOURCE all-identity UPDATE is a no-op clause, not an error") {
    import spark.implicits._
    mk("t_bys4", Seq((1L, "a", 10L), (2L, "b", 11L)))
    Seq((1L, "a2", 100L)).toDF("k", "s", "v").createOrReplaceTempView("bys4_src")
    // SET v = v reduces to pure identity after alignment — the clause
    // must apply as a no-op (its rows still consume clause order), and
    // the later DELETE must not claim the rows the no-op matched
    spark.sql(
      """MERGE INTO dml.ns.t_bys4 t USING bys4_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED BY SOURCE AND t.v = 11 THEN UPDATE SET v = v
        |WHEN NOT MATCHED BY SOURCE THEN DELETE
        |""".stripMargin)
    assert(state("t_bys4") == Seq((1L, "a", 100L), (2L, "b", 11L)))
  }

  test("BY SOURCE refusals: source-column references have no row to read") {
    import spark.implicits._
    mk("t_bys3", Seq((1L, "a", 10L)))
    Seq((1L, "x", 1L)).toDF("k", "s", "v").createOrReplaceTempView("bys3_src")
    // Spark's analyzer scopes BY SOURCE clauses to the TARGET side, so
    // a source reference is unresolvable before our rule even runs
    // (SqlDml.qualTargetOnly stays as defense-in-depth for plan-level
    // callers) — either way it must refuse BEFORE any mutation
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO dml.ns.t_bys3 t USING bys3_src src ON t.k = src.k
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = src.v
          |""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.matches("(?s).*(source|cannot be resolved).*"),
      s"got: ${e.getMessage}")
    assert(state("t_bys3") == Seq((1L, "a", 10L)))
  }

  test("unroutable shapes refuse loudly instead of half-applying") {
    import spark.implicits._
    mk("t_refuse", Seq((1L, "a", 10L)))
    Seq((1L, "x", 1L)).toDF("k", "s", "v").createOrReplaceTempView("refuse_src")
    // scalar subquery in UPDATE WHERE (only [NOT] IN routes)
    val e1 = intercept[UnsupportedOperationException] {
      spark.sql(
        "UPDATE dml.ns.t_refuse SET v = 0 WHERE v = (SELECT max(v) FROM refuse_src)")
    }
    assert(e1.getMessage.contains("subquery"))
    // non-equi merge key
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(
        """MERGE INTO dml.ns.t_refuse t USING refuse_src s ON t.k > s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |""".stripMargin)
    }
    assert(e2.getMessage.contains("ON"))
    // computed INSERT value for a KEY column (the classify join runs
    // on raw source keys — rewriting the key would desynchronize it)
    val e3 = intercept[UnsupportedOperationException] {
      spark.sql(
        """MERGE INTO dml.ns.t_refuse t USING refuse_src s ON t.k = s.k
          |WHEN NOT MATCHED THEN INSERT (k, s, v) VALUES (s.k + 1, s.s, s.v)
          |""".stripMargin)
    }
    assert(e3.getMessage.contains("key column"))
    // state untouched by all three refusals
    assert(state("t_refuse") == Seq((1L, "a", 10L)))
  }

  test("UPDATE WHERE key IN (subquery) routes as a coordinate semi-join") {
    import spark.implicits._
    mk("t_insub", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    Seq((1L, 0L), (3L, 0L), (9L, 0L)).toDF("kk", "x").createOrReplaceTempView("insub_src")
    spark.sql(
      "UPDATE dml.ns.t_insub SET v = v + 100 WHERE k IN (SELECT kk FROM insub_src) AND v > 15")
    // k=1 matches the subquery but fails v>15; k=3 takes both; k=9 has no target row
    assert(state("t_insub") == Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 130L)))
  }

  test("UPDATE WHERE key NOT IN (subquery) routes as a coordinate anti-join") {
    import spark.implicits._
    mk("t_notin", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    Seq(2L).toDF("kk").createOrReplaceTempView("notin_src")
    spark.sql("UPDATE dml.ns.t_notin SET s = 'out' WHERE k NOT IN (SELECT kk FROM notin_src)")
    assert(state("t_notin") == Seq((1L, "out", 10L), (2L, "b", 20L), (3L, "out", 30L)))
  }

  test("NOT IN over a subquery containing NULL updates nothing (three-valued SQL)") {
    import spark.implicits._
    mk("t_notin_null", Seq((1L, "a", 10L), (2L, "b", 20L)))
    Seq(Some(2L), None).toDF("kk").createOrReplaceTempView("notin_null_src")
    spark.sql(
      "UPDATE dml.ns.t_notin_null SET s = 'out' WHERE k NOT IN (SELECT kk FROM notin_null_src)")
    assert(state("t_notin_null") == Seq((1L, "a", 10L), (2L, "b", 20L)))
  }

  test("DELETE WHERE key IN / NOT IN (subquery) route as coordinate joins") {
    import spark.implicits._
    mk("t_delsub", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
    Seq(2L, 9L).toDF("kk").createOrReplaceTempView("delsub_src")
    spark.sql("DELETE FROM dml.ns.t_delsub WHERE k IN (SELECT kk FROM delsub_src)")
    assert(state("t_delsub") == Seq((1L, "a", 10L), (3L, "c", 30L), (4L, "d", 40L)))
    Seq(3L).toDF("kk").createOrReplaceTempView("delsub_src2")
    spark.sql(
      "DELETE FROM dml.ns.t_delsub WHERE k NOT IN (SELECT kk FROM delsub_src2) AND v < 40")
    assert(state("t_delsub") == Seq((3L, "c", 30L), (4L, "d", 40L)))
  }

  test("IN (subquery) over a NON-UNIQUE probed column acts row-exactly") {
    import spark.implicits._
    // duplicate v values: the coordinate route must touch exactly the
    // matching rows (a merge-keyed route would trip its unique-key
    // ambiguity guard here)
    mk("t_dupsub", Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 20L), (4L, "d", 10L)))
    Seq(10L).toDF("vv").createOrReplaceTempView("dupsub_src")
    spark.sql(
      "UPDATE dml.ns.t_dupsub SET s = 'hit' WHERE v IN (SELECT vv FROM dupsub_src) AND k >= 2")
    // k=1 matches v but fails k>=2 and MUST survive untouched even
    // though it shares v=10 with mutated rows
    assert(state("t_dupsub") ==
      Seq((1L, "a", 10L), (2L, "hit", 10L), (3L, "c", 20L), (4L, "hit", 10L)))
    spark.sql("DELETE FROM dml.ns.t_dupsub WHERE v IN (SELECT vv FROM dupsub_src) AND k <= 2")
    assert(state("t_dupsub") == Seq((3L, "c", 20L), (4L, "hit", 10L)))
  }

  test("UPDATE may assign the same column it probes with IN (subquery)") {
    import spark.implicits._
    mk("t_selfsub", Seq((1L, "a", 10L), (2L, "b", 20L)))
    Seq(10L).toDF("vv").createOrReplaceTempView("selfsub_src")
    spark.sql("UPDATE dml.ns.t_selfsub SET v = v + 5 WHERE v IN (SELECT vv FROM selfsub_src)")
    assert(state("t_selfsub") == Seq((1L, "a", 15L), (2L, "b", 20L)))
  }

  test("NOT IN over an EMPTY subquery set is TRUE for every row, even NULL keys") {
    import spark.implicits._
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("k", "s")
    val t = IceliteTable.create(spark, wh, "ns", "t_empty_notin", df.schema)
    t.append(df)
    Seq(1L).toDF("kk").filter(col("kk") > 99).createOrReplaceTempView("empty_src")
    spark.sql("DELETE FROM dml.ns.t_empty_notin WHERE k NOT IN (SELECT kk FROM empty_src)")
    // x NOT IN (empty) is plain TRUE (IN over nothing is FALSE, not
    // UNKNOWN) — the NULL-key row must be deleted too
    assert(IceliteTable.load(spark, wh, "ns", "t_empty_notin").read().count() == 0)
  }

  test("NOT IN against a non-empty set leaves NULL-key rows alone (UNKNOWN)") {
    import spark.implicits._
    val df = Seq((Some(1L), "a"), (Some(2L), "b"), (None, "c")).toDF("k", "s")
    val t = IceliteTable.create(spark, wh, "ns", "t_null_notin", df.schema)
    t.append(df)
    Seq(2L).toDF("kk").createOrReplaceTempView("nn_src")
    spark.sql("DELETE FROM dml.ns.t_null_notin WHERE k NOT IN (SELECT kk FROM nn_src)")
    // k=1 deleted (not in set); k=2 kept (in set); k=NULL kept (UNKNOWN)
    val left = IceliteTable.load(spark, wh, "ns", "t_null_notin").read()
      .collect().map(r => Option(r.get(0)).map(_.toString).getOrElse("null")).sorted.toSeq
    assert(left == Seq("2", "null"))
  }

  test("MERGE INSERT with computed values routes as column-level insert overrides") {
    import spark.implicits._
    mk("t_mrg_ins", Seq((1L, "a", 10L)))
    Seq((1L, "m", 100L), (5L, "new", 50L)).toDF("k", "s", "v")
      .createOrReplaceTempView("mrg_ins_src")
    spark.sql(
      """MERGE INTO dml.ns.t_mrg_ins t USING mrg_ins_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, s, v) VALUES (s.k, upper(s.s), s.v * 2 + 1)
        |""".stripMargin)
    // matched row takes the plain update; the insert computes s and v
    assert(state("t_mrg_ins") == Seq((1L, "a", 100L), (5L, "NEW", 101L)))
  }

  test("MERGE INSERT with a partial column list pads the rest with NULL") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    mk("t_mrg_pad", Seq((1L, "a", 10L)))
    Seq((6L, "x", 60L)).toDF("k", "s", "v").createOrReplaceTempView("mrg_pad_src")
    spark.sql(
      """MERGE INTO dml.ns.t_mrg_pad t USING mrg_pad_src s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |""".stripMargin)
    val rows = IceliteTable.load(spark, wh, "ns", "t_mrg_pad").read()
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq((1L, Some("a"), 10L), (6L, None, 60L)))
  }

  test("MERGE WITH SCHEMA EVOLUTION evolves NESTED struct fields too") {
    import spark.implicits._
    val df = Seq((1L, ("a", 10L))).toDF("k", "m")
      .select(col("k"), col("m").cast("struct<f:string,g:bigint>").as("m"))
    val t = IceliteTable.create(spark, wh, "ns", "t_mrg_nevo", df.schema)
    t.append(df)
    // source struct carries an extra field h: the analyzer emits a
    // 2-level AddColumn that alterTable routes to addNestedField
    Seq((1L, ("a2", 20L, 1.5)), (2L, ("b", 30L, 2.5))).toDF("k", "m")
      .select(col("k"), col("m").cast("struct<f:string,g:bigint,h:double>").as("m"))
      .createOrReplaceTempView("mrg_nevo_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO dml.ns.t_mrg_nevo t
        |USING mrg_nevo_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |""".stripMargin)
    val t2 = IceliteTable.load(spark, wh, "ns", "t_mrg_nevo")
    assert(t2.meta.schema.simpleString ==
      "struct<k:bigint,m:struct<f:string,g:bigint,h:double>>")
    val rows = t2.read().select(col("k"), col("m.f"), col("m.g"), col("m.h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(rows == Seq((1L, "a2", 20L, 1.5), (2L, "b", 30L, 2.5)))
  }

  test("MERGE WITH SCHEMA EVOLUTION adds new source columns to the target") {
    import spark.implicits._
    mk("t_mrg_evo", Seq((1L, "a", 10L), (2L, "b", 20L)))
    Seq((2L, "B", 200L, 2.5), (7L, "G", 70L, 7.5)).toDF("k", "s", "v", "w")
      .createOrReplaceTempView("mrg_evo_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO dml.ns.t_mrg_evo t
        |USING mrg_evo_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |""".stripMargin)
    val t = IceliteTable.load(spark, wh, "ns", "t_mrg_evo")
    assert(t.meta.schema.fieldNames.toSeq == Seq("k", "s", "v", "w"),
      "the analyzer's AddColumn evolution landed through alterTable")
    val rows = t.read().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).sorted.toSeq
    // untouched row reads NULL for the evolved column; the matched row
    // takes the full source image; the insert carries the new column
    assert(rows == Seq((1L, "a", 10L, None), (2L, "B", 200L, Some(2.5)),
      (7L, "G", 70L, Some(7.5))))
  }

  test("MERGE INSERT partial column list fills DECLARED defaults, NULL otherwise") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS dml.ns.t_defpad")
    spark.sql(
      "CREATE TABLE dml.ns.t_defpad (k BIGINT, s STRING DEFAULT 'std', v BIGINT)")
    spark.sql("INSERT INTO dml.ns.t_defpad VALUES (1, 'a', 10)")
    Seq((2L, 20L)).toDF("k", "v").createOrReplaceTempView("defpad_src")
    spark.sql(
      """MERGE INTO dml.ns.t_defpad t USING defpad_src s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)""".stripMargin)
    val rows = IceliteTable.load(spark, wh, "ns", "t_defpad").read()
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).sorted.toSeq
    // omitted s takes the declared default; omitted v (no default) pads NULL
    assert(rows == Seq((1L, "a", Some(10L)), (2L, "std", None)))
  }

  test("MERGE matched UPDATE refuses duplicate assignments to one column") {
    import spark.implicits._
    mk("t_dupset", Seq((1L, "a", 10L)))
    Seq((1L, "A", 100L)).toDF("k", "s", "v").createOrReplaceTempView("dupset_src")
    val e = intercept[UnsupportedOperationException](spark.sql(
      """MERGE INTO dml.ns.t_dupset t USING dupset_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v, v = s.v + 1""".stripMargin))
    assert(e.getMessage.contains("multiple assignments"))
    assert(state("t_dupset") == Seq((1L, "a", 10L)))
  }

  test("UPDATE WHERE EXISTS (correlated) routes as a decorrelated semi-join") {
    import spark.implicits._
    mk("t_ex", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    Seq((1L, 5L), (3L, 99L), (3L, 1L), (9L, 50L)).toDF("fk", "q")
      .createOrReplaceTempView("ex_src")
    spark.sql(
      """UPDATE dml.ns.t_ex SET v = v + 100
        |WHERE EXISTS (SELECT 1 FROM ex_src WHERE fk = k AND q > 40)""".stripMargin)
    // k=3 has a q>40 line; k=1's line fails q>40; k=9 has no target row
    assert(state("t_ex") == Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 130L)))
  }

  test("DELETE WHERE NOT EXISTS anti-joins; NULL target keys qualify (UNKNOWN equality)") {
    import spark.implicits._
    val df = Seq((Some(1L), "a", 10L), (Some(2L), "b", 20L), (None, "n", 30L))
      .toDF("k", "s", "v")
    val t = IceliteTable.create(spark, wh, "ns", "t_nex", df.schema)
    t.append(df)
    Seq(1L).toDF("fk").createOrReplaceTempView("nex_src")
    spark.sql("DELETE FROM dml.ns.t_nex WHERE NOT EXISTS (SELECT 1 FROM nex_src WHERE fk = k)")
    // k=1 survives (EXISTS true); k=2 deleted; NULL key deleted —
    // `fk = NULL` is UNKNOWN, so EXISTS is false and NOT EXISTS true
    val left = IceliteTable.load(spark, wh, "ns", "t_nex").read()
      .select("s").collect().map(_.getString(0)).sorted.toSeq
    assert(left == Seq("a"))
  }

  test("correlated IN routes as a (probe, correlation) semi-join") {
    import spark.implicits._
    mk("t_cin", Seq((1L, "F", 10L), (2L, "F", 20L), (3L, "O", 30L)))
    Seq((1L, 50L), (2L, 10L), (3L, 50L)).toDF("fk", "q").createOrReplaceTempView("cin_src")
    // only 'F' rows whose line has q>40 flag: k=1 (F, q=50) yes; k=2
    // (F, q=10) no; k=3 has q>40 but status 'O' does not match 'F'
    spark.sql(
      """UPDATE dml.ns.t_cin SET s = 'X'
        |WHERE s IN (SELECT 'F' FROM cin_src WHERE fk = k AND q > 40)""".stripMargin)
    assert(state("t_cin") == Seq((1L, "X", 10L), (2L, "F", 20L), (3L, "O", 30L)))
  }

  test("uncorrelated EXISTS is a global existence probe") {
    import spark.implicits._
    mk("t_uex", Seq((1L, "a", 10L), (2L, "b", 20L)))
    Seq(42L).toDF("x").createOrReplaceTempView("uex_src")
    spark.sql("UPDATE dml.ns.t_uex SET v = 0 WHERE EXISTS (SELECT 1 FROM uex_src) AND k = 1")
    assert(state("t_uex") == Seq((1L, "a", 0L), (2L, "b", 20L)))
    spark.sql(
      "DELETE FROM dml.ns.t_uex WHERE NOT EXISTS (SELECT 1 FROM uex_src WHERE x > 1000)")
    assert(state("t_uex").isEmpty)
  }

  test("MERGE WITH SCHEMA EVOLUTION widens a narrow target column to the source type") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS dml.ns.t_mwide")
    spark.sql("CREATE TABLE dml.ns.t_mwide (k BIGINT, n INT)")
    spark.sql("INSERT INTO dml.ns.t_mwide VALUES (1, 7)")
    // the source's n is BIGINT with a past-int-range value: Spark's
    // evolution diff requests UpdateColumnType, which lands as a
    // metadata-only widen — pre-merge files read narrow and cast up
    Seq((1L, 5000000000L), (2L, 9L)).toDF("k", "n").createOrReplaceTempView("mwide_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO dml.ns.t_mwide t USING mwide_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET n = s.n
        |WHEN NOT MATCHED THEN INSERT (k, n) VALUES (s.k, s.n)""".stripMargin)
    val t = IceliteTable.load(spark, wh, "ns", "t_mwide")
    assert(t.meta.schema("n").dataType == org.apache.spark.sql.types.LongType)
    assert(t.read().orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 5000000000L), (2L, 9L)))
  }

  test("SET with a correlated aggregate scalar subquery: per-key value, NULL when no group") {
    import spark.implicits._
    // v nullable: a no-group row legitimately becomes NULL (sum over
    // empty); on a NOT NULL column the engine's enforcement refuses
    val df = Seq((1L, "a", Option(10L)), (2L, "b", Option(20L)), (3L, "c", Option(30L)))
      .toDF("k", "s", "v")
    IceliteTable.create(spark, wh, "ns", "t_scal", df.schema).append(df)
    Seq((1L, 5L), (1L, 7L), (3L, 100L)).toDF("fk", "q").createOrReplaceTempView("scal_src")
    spark.sql(
      """UPDATE dml.ns.t_scal
        |SET v = (SELECT CAST(sum(q) AS BIGINT) FROM scal_src WHERE fk = k)
        |WHERE k <= 2""".stripMargin)
    // k=1 sums its two lines; k=2 has NO lines -> sum over empty = NULL
    val rows = IceliteTable.load(spark, wh, "ns", "t_scal").read()
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sorted.toSeq
    assert(rows == Seq((1L, Some(12L)), (2L, None), (3L, Some(30L))))
  }

  test("SET with a correlated count: zero-match rows get 0, not NULL (no count bug)") {
    import spark.implicits._
    mk("t_scnt", Seq((1L, "a", 10L), (2L, "b", 20L)))
    Seq((1L, 5L), (1L, 7L)).toDF("fk", "q").createOrReplaceTempView("scnt_src")
    // the empty-aggregate value is EVALUATED (count over empty = 0),
    // and the scalar composes inside a larger SET expression
    spark.sql(
      """UPDATE dml.ns.t_scnt
        |SET v = v + 100 * (SELECT count(*) FROM scnt_src WHERE fk = k)""".stripMargin)
    assert(state("t_scnt") == Seq((1L, "a", 210L), (2L, "b", 20L)))
  }

  test("SET with a correlated row SELECT: DISTINCT dedupes; multi-row errors only for touched rows") {
    import spark.implicits._
    mk("t_srow", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    Seq((1L, "X"), (1L, "X"), (2L, "Y"), (2L, "Z")).toDF("fk", "tag")
      .createOrReplaceTempView("srow_src")
    // DISTINCT collapses k=1's duplicate 'X'; k=3 has no row -> NULL
    spark.sql(
      """UPDATE dml.ns.t_srow
        |SET s = (SELECT DISTINCT tag FROM srow_src WHERE fk = k)
        |WHERE k <> 2""".stripMargin)
    val rows = IceliteTable.load(spark, wh, "ns", "t_srow").read()
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sorted.toSeq
    assert(rows == Seq((1L, Some("X")), (2L, Some("b")), (3L, None)))
    // k=2 sees two DISTINCT tags: updating it must fail loudly with state untouched
    val e = intercept[Exception](spark.sql(
      """UPDATE dml.ns.t_srow
        |SET s = (SELECT DISTINCT tag FROM srow_src WHERE fk = k)
        |WHERE k = 2""".stripMargin))
    assert(chainMsg(e).contains("more than one row"), chainMsg(e))
    assert(IceliteTable.load(spark, wh, "ns", "t_srow").read()
      .filter(col("k") === 2).collect()(0).getString(1) == "b")
  }

  test("SET with an uncorrelated scalar subquery: one probe; empty -> NULL; >1 row errors") {
    import spark.implicits._
    mk("t_sunc", Seq((1L, "a", 10L), (2L, "b", 20L)))
    Seq(7L).toDF("x").createOrReplaceTempView("sunc_src")
    spark.sql(
      "UPDATE dml.ns.t_sunc SET v = v + (SELECT max(x) FROM sunc_src) WHERE k = 1")
    assert(state("t_sunc") == Seq((1L, "a", 17L), (2L, "b", 20L)))
    Seq(1L, 2L).toDF("x").createOrReplaceTempView("sunc_multi")
    val e = intercept[Exception](spark.sql(
      "UPDATE dml.ns.t_sunc SET v = (SELECT x FROM sunc_multi)"))
    assert(chainMsg(e).contains("more than one row"), chainMsg(e))
    assert(state("t_sunc") == Seq((1L, "a", 17L), (2L, "b", 20L)))
  }

  test("scalar-SET shapes the route cannot express refuse loudly") {
    import spark.implicits._
    mk("t_sref", Seq((1L, "a", 10L)))
    Seq((1L, 5L)).toDF("fk", "q").createOrReplaceTempView("sref_src")
    // GROUP BY inside the scalar subquery
    val e1 = intercept[UnsupportedOperationException](spark.sql(
      """UPDATE dml.ns.t_sref
        |SET v = (SELECT max(q) FROM sref_src WHERE fk = k GROUP BY fk)""".stripMargin))
    assert(e1.getMessage.contains("GROUP BY"), e1.getMessage)
    // combining a scalar SET with a subquery WHERE
    val e2 = intercept[UnsupportedOperationException](spark.sql(
      """UPDATE dml.ns.t_sref
        |SET v = (SELECT max(q) FROM sref_src WHERE fk = k)
        |WHERE k IN (SELECT fk FROM sref_src)""".stripMargin))
    assert(e2.getMessage.contains("subquery WHERE"), e2.getMessage)
    // non-equality correlation inside the scalar subquery
    val e3 = intercept[UnsupportedOperationException](spark.sql(
      """UPDATE dml.ns.t_sref
        |SET v = (SELECT max(q) FROM sref_src WHERE fk > k)""".stripMargin))
    assert(e3.getMessage.contains("equality"), e3.getMessage)
    assert(state("t_sref") == Seq((1L, "a", 10L)))
  }

  test("MERGE matched-UPDATE SET with correlated scalar subqueries") {
    import spark.implicits._
    mk("t_mscal", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    Seq((1L, 100L), (2L, 200L), (4L, 400L)).toDF("k", "mv")
      .createOrReplaceTempView("mscal_src")
    Seq((1L, 7L), (1L, 8L), (4L, 9L)).toDF("fk", "q")
      .createOrReplaceTempView("mscal_lines")
    // correlation on a SOURCE column (mk): k=1 sums its two lines,
    // k=2 has none -> empty-agg value (NULL) -> coalesce fills -1;
    // k=4 inserts (the synthetic scalar columns never leak into it)
    spark.sql(
      """MERGE INTO dml.ns.t_mscal t USING mscal_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = coalesce(
        |  (SELECT CAST(sum(q) AS BIGINT) FROM mscal_lines WHERE fk = s.k), -1)
        |WHEN NOT MATCHED THEN INSERT (k, s, v) VALUES (s.k, 'new', mv)""".stripMargin)
    assert(state("t_mscal") ==
      Seq((1L, "a", 15L), (2L, "b", -1L), (3L, "c", 30L), (4L, "new", 400L)))
    // correlation on a TARGET KEY column: equal to the source key on
    // every matched row, so it routes through the same-named source
    // column; count fills 0 on no-match (evaluated empty aggregate)
    spark.sql(
      """MERGE INTO dml.ns.t_mscal t USING mscal_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET
        |  v = (SELECT count(*) FROM mscal_lines WHERE fk = t.k)""".stripMargin)
    assert(state("t_mscal") ==
      Seq((1L, "a", 2L), (2L, "b", 0L), (3L, "c", 30L), (4L, "new", 1L)))
  }

  test("MERGE SET scalar: row SELECT cardinality error scoped to MATCHED rows; refusals") {
    import spark.implicits._
    mk("t_mscal2", Seq((1L, "a", 10L), (2L, "b", 20L)))
    Seq((2L, 5L), (9L, 6L)).toDF("k", "mv").createOrReplaceTempView("mscal2_src")
    // k=9 never matches a target row: its TWO subquery rows must not
    // fail the statement (the error is scoped to matched rows)
    Seq((9L, 91L), (9L, 92L), (2L, 21L)).toDF("fk", "q")
      .createOrReplaceTempView("mscal2_lines")
    spark.sql(
      """MERGE INTO dml.ns.t_mscal2 t USING mscal2_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET
        |  v = (SELECT CAST(q AS BIGINT) FROM mscal2_lines WHERE fk = s.k)""".stripMargin)
    assert(state("t_mscal2") == Seq((1L, "a", 10L), (2L, "b", 21L)))
    // a MATCHED row with two subquery rows is the SQL cardinality error
    Seq((2L, 21L), (2L, 22L)).toDF("fk", "q")
      .createOrReplaceTempView("mscal2_lines")
    val e0 = intercept[Exception](spark.sql(
      """MERGE INTO dml.ns.t_mscal2 t USING mscal2_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET
        |  v = (SELECT CAST(q AS BIGINT) FROM mscal2_lines WHERE fk = s.k)""".stripMargin))
    assert(chainMsg(e0).contains("more than one row"), chainMsg(e0))
    // correlation on a NON-KEY target column has no source-side image
    val e1 = intercept[UnsupportedOperationException](spark.sql(
      """MERGE INTO dml.ns.t_mscal2 t USING mscal2_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET
        |  v = (SELECT CAST(sum(q) AS BIGINT) FROM mscal2_lines WHERE fk = t.v)""".stripMargin))
    assert(e1.getMessage.contains("target column"), e1.getMessage)
    // non-scalar subqueries inside SET values still refuse
    val e2 = intercept[UnsupportedOperationException](spark.sql(
      """MERGE INTO dml.ns.t_mscal2 t USING mscal2_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET
        |  v = CASE WHEN EXISTS (SELECT 1 FROM mscal2_lines WHERE fk = s.k)
        |      THEN 1 ELSE 0 END""".stripMargin))
    assert(e2.getMessage.contains("scalar"), e2.getMessage)
    // state untouched by every refusal
    assert(state("t_mscal2") == Seq((1L, "a", 10L), (2L, "b", 21L)))
  }

  test("MERGE SET uncorrelated scalar: one global probe rides the merge") {
    import spark.implicits._
    mk("t_mscal3", Seq((1L, "a", 10L)))
    Seq((1L, 0L)).toDF("k", "mv").createOrReplaceTempView("mscal3_src")
    Seq(5L, 3L).toDF("q").createOrReplaceTempView("mscal3_q")
    spark.sql(
      """MERGE INTO dml.ns.t_mscal3 t USING mscal3_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET
        |  v = v + (SELECT CAST(max(q) AS BIGINT) FROM mscal3_q)""".stripMargin)
    assert(state("t_mscal3") == Seq((1L, "a", 15L)))
  }

  test("correlated NOT IN routes with exact three-valued semantics") {
    import spark.implicits._
    // rows: k=1 group {5} (no match -> qualifies), k=2 group {2, NULL}
    // (null poisons -> never qualifies), k=3 group {3} (probe matches
    // -> not qualified), k=4 empty group (qualifies)
    mk("t_notin3", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
    Seq((10L, Option(5L)), (20L, Option(2L)), (20L, Option.empty[Long]),
      (30L, Option(3L))).toDF("gv", "fk").createOrReplaceTempView("notin3_src")
    spark.sql(
      """UPDATE dml.ns.t_notin3 SET s = 'hit'
        |WHERE k NOT IN (SELECT fk FROM notin3_src WHERE gv = v)""".stripMargin)
    assert(state("t_notin3") ==
      Seq((1L, "hit", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "hit", 40L)))
    // a NULL probe qualifies ONLY against an empty group
    val df = Seq((Option(1L), "x", 100L), (Option.empty[Long], "y", 100L),
      (Option.empty[Long], "z", 200L)).toDF("k", "s", "v")
    val t2 = IceliteTable.create(spark, wh, "ns", "t_notin2", df.schema)
    t2.append(df)
    Seq((100L, 9L)).toDF("gv", "fk").createOrReplaceTempView("notin2_src")
    // v=100 group {9}: k=1 not in it -> hit; k=NULL -> UNKNOWN, no hit;
    // v=200 group empty: NOT IN () is TRUE even for a NULL probe -> hit
    spark.sql(
      """UPDATE dml.ns.t_notin2 SET s = 'hit'
        |WHERE k NOT IN (SELECT fk FROM notin2_src WHERE gv = v)""".stripMargin)
    val got = IceliteTable.load(spark, wh, "ns", "t_notin2").read().collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._3, x._1)).toSeq
    assert(got == Seq((-1L, "y", 100L), (1L, "hit", 100L), (-1L, "hit", 200L)))
  }

  test("correlated shapes the join cannot express refuse loudly") {
    import spark.implicits._
    mk("t_exref", Seq((1L, "a", 10L)))
    Seq((1L, 5L)).toDF("fk", "q").createOrReplaceTempView("exref_src")
    // aggregate above the correlation changes existence
    val e2 = intercept[UnsupportedOperationException](spark.sql(
      """UPDATE dml.ns.t_exref SET v = 0
        |WHERE EXISTS (SELECT count(*) FROM exref_src WHERE fk = k HAVING count(*) > 1)
        |""".stripMargin))
    assert(e2.getMessage.contains("not routed") || e2.getMessage.contains("existence"),
      e2.getMessage)
    // non-equality correlation
    val e3 = intercept[UnsupportedOperationException](spark.sql(
      "UPDATE dml.ns.t_exref SET v = 0 WHERE EXISTS (SELECT 1 FROM exref_src WHERE fk > k)"))
    assert(e3.getMessage.contains("equality"), e3.getMessage)
    // state untouched by every refusal
    assert(state("t_exref") == Seq((1L, "a", 10L)))
  }
}
