package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.table.IceliteTable

/** SQL `CALL` maintenance procedures ([[IceliteProcedures]]) through
  * the DSv2 procedure surface: routing, named/default arguments,
  * result rows, unknown-procedure errors, and the governed-catalog
  * refusal.
  */
class IceliteProcedureSpec extends AnyFunSuite with SparkFixture {

  private val Cat = "icelite_proc"
  private lazy val wh: String = {
    val dir = Files.createTempDirectory("icelite-procwh").toString
    spark.conf.set(s"spark.sql.catalog.$Cat", classOf[IceliteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.warehouse", dir)
    dir
  }

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def mkTable(name: String, commits: Int): IceliteTable = {
    val t = IceliteTable.create(spark, wh, "ns", name, schema)
    (1 to commits).foreach { i =>
      import scala.jdk.CollectionConverters._
      t.append(spark.createDataFrame(
        Seq(org.apache.spark.sql.Row(i.toLong, s"v$i")).asJava, schema))
    }
    t
  }

  test("CALL compact bin-packs the file set and returns the rewrite seq") {
    mkTable("c1", 4)
    val seq = spark.sql(s"CALL $Cat.system.compact(table => 'ns.c1')").collect()(0).getLong(0)
    assert(seq == 5)
    val t = IceliteTable.load(spark, wh, "ns", "c1")
    assert(t.meta.snapshots.map(_.operation) == Seq("rewrite"))
    assert(t.read().count() == 4)
  }

  test("CALL expire_snapshots + remove_orphan_files report their counts") {
    mkTable("c2", 5)
    spark.sql(s"CALL $Cat.system.compact(table => 'ns.c2')").collect()
    val expired = spark.sql(
      s"CALL $Cat.system.expire_snapshots(table => 'ns.c2', keep_versions => 1)")
      .collect()(0).getInt(0)
    assert(expired >= 4, s"expected >=4 expired versions, got $expired")
    val swept = spark.sql(
      s"CALL $Cat.system.remove_orphan_files(table => 'ns.c2', grace_ms => 0)")
      .collect()(0).getInt(0)
    assert(swept >= 5, s"expected the 5 pre-compaction commit dirs swept, got $swept")
    assert(IceliteTable.load(spark, wh, "ns", "c2").read().count() == 5)
  }

  test("CALL rollback_to_snapshot; positional args work too") {
    mkTable("c3", 3)
    spark.sql(s"CALL $Cat.system.rollback_to_snapshot('ns.c3', 1)").collect()
    assert(IceliteTable.load(spark, wh, "ns", "c3").read().count() == 1)
  }

  test("CALL consolidate_deletes folds a position delete into DVs") {
    val t = mkTable("c4", 3)
    t.deleteWhere(col("k") === 2L)
    spark.sql(s"CALL $Cat.system.consolidate_deletes(table => 'ns.c4')").collect()
    val t2 = IceliteTable.load(spark, wh, "ns", "c4")
    assert(t2.meta.liveDvFiles.nonEmpty)
    assert(t2.read().orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("CALL declare_sort_order + zordered compact cluster the layout") {
    mkTable("c9", 4)
    spark.sql(s"CALL $Cat.system.declare_sort_order(table => 'ns.c9', columns => 'k')").collect()
    val t = IceliteTable.load(spark, wh, "ns", "c9")
    assert(t.meta.properties.get(IceliteTable.SortOrderProp).contains("k"))
    // explicit z-order through the procedure (single integral dim)
    spark.sql(s"CALL $Cat.system.compact(table => 'ns.c9', zorder_by => 'k')").collect()
    val t2 = IceliteTable.load(spark, wh, "ns", "c9")
    assert(t2.meta.snapshots.map(_.operation) == Seq("rewrite"))
    assert(t2.read().count() == 4)
  }

  test("CALL analyze commits stats for the named columns") {
    mkTable("c5", 2)
    val seq = spark.sql(s"CALL $Cat.system.analyze(table => 'ns.c5', columns => 'k,v')")
      .collect()(0).getLong(0)
    assert(seq == 3)
    val t = IceliteTable.load(spark, wh, "ns", "c5")
    assert(t.meta.snapshots.last.operation == "analyze")
  }

  test("CALL declare_policy + drop_policy govern a principal's SQL reads") {
    mkTable("c7", 1)
    spark.sql(
      s"""CALL $Cat.system.declare_policy(table => 'ns.c7', principal => 'auditor',
         |row_filter => 'k >= 1', masks => 'v:CAST(NULL AS STRING)')""".stripMargin).collect()
    val t = IceliteTable.load(spark, wh, "ns", "c7")
    assert(t.policies.contains("auditor"))
    val gov = t.readGoverned("auditor").collect()
    assert(gov.length == 1 && gov(0).isNullAt(1), "mask did not apply")
    spark.sql(s"CALL $Cat.system.drop_policy('ns.c7', 'auditor')").collect()
    assert(!IceliteTable.load(spark, wh, "ns", "c7").policies.contains("auditor"))
  }

  test("CALL declare_constraint enforces subsequent writes; drop_constraint reopens") {
    val t = mkTable("c8", 1)
    spark.sql(
      s"CALL $Cat.system.declare_constraint(table => 'ns.c8', name => 'k_pos', predicate => 'k > 0')")
      .collect()
    import scala.jdk.CollectionConverters._
    val bad = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(-5L, "bad")).asJava, schema)
    intercept[Exception](IceliteTable.load(spark, wh, "ns", "c8").append(bad))
    spark.sql(s"CALL $Cat.system.drop_constraint('ns.c8', 'k_pos')").collect()
    IceliteTable.load(spark, wh, "ns", "c8").append(bad) // now lands
    assert(IceliteTable.load(spark, wh, "ns", "c8").read().count() == 2)
  }

  // Spark wraps loadProcedure failures in FAILED_TO_LOAD_ROUTINE — the
  // real message rides the cause chain
  private def chain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")

  test("CALL evolve_partitioning changes the spec for future writes; old files keep theirs") {
    val t = mkTable("c_pevo", 2)
    spark.sql(
      s"CALL $Cat.system.evolve_partitioning(table => 'ns.c_pevo', spec => 'k:bucket[4],v')")
      .collect()
    val t2 = IceliteTable.load(spark, wh, "ns", "c_pevo")
    assert(t2.meta.partitioning.map(p => p.field -> p.transform) ==
      Seq("k" -> "bucket[4]", "v" -> "identity"))
    import scala.jdk.CollectionConverters._
    t2.append(spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(9L, "v9")).asJava, schema))
    // mixed-spec read: pre-evolution files + the new bucketed file
    assert(IceliteTable.load(spark, wh, "ns", "c_pevo").read().count() == 3)
    val bad = intercept[Exception] {
      spark.sql(
        s"CALL $Cat.system.evolve_partitioning(table => 'ns.c_pevo', spec => 'k:moth')")
        .collect()
    }
    assert(bad.getMessage.contains("transform"), s"got: ${bad.getMessage}")
    // an empty/whitespace spec refuses (a typo must not silently
    // unpartition); the explicit 'none' keyword opts in
    val empty = intercept[Exception] {
      spark.sql(
        s"CALL $Cat.system.evolve_partitioning(table => 'ns.c_pevo', spec => '  ')").collect()
    }
    assert(chain(empty).contains("pass 'none' explicitly"), s"got: ${chain(empty)}")
    assert(IceliteTable.load(spark, wh, "ns", "c_pevo")
      .meta.partitioning.nonEmpty, "refusal must not commit")
    spark.sql(
      s"CALL $Cat.system.evolve_partitioning(table => 'ns.c_pevo', spec => 'none')").collect()
    assert(IceliteTable.load(spark, wh, "ns", "c_pevo").meta.partitioning.isEmpty)
  }

  test("unknown procedure and wrong namespace surface clear errors") {
    wh // force catalog registration
    val e1 = intercept[Exception](spark.sql(s"CALL $Cat.system.no_such_proc('ns.t')").collect())
    assert(chain(e1).contains("unknown procedure"))
    val e2 = intercept[Exception](spark.sql(s"CALL $Cat.other.compact('ns.t')").collect())
    assert(chain(e2).contains("system"))
  }

  test("CALL ref procedures: branch lifecycle through SQL incl. publish") {
    val t = mkTable("c10", 2)
    spark.sql(s"CALL $Cat.system.create_tag(table => 'ns.c10', name => 'v1', seq => 1)")
    spark.sql(s"CALL $Cat.system.create_branch(table => 'ns.c10', name => 'dev')")
    // branch writes stay on the Scala API (staged data needs a frame);
    // the SQL lifecycle around them is create → publish → fast_forward → drop
    import scala.jdk.CollectionConverters._
    t.appendToBranch("dev", spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(9L, "v9")).asJava, schema))
    assert(t.read().count() == 2, "staged branch write must not surface on main")
    // the SQL audit step: `t$ref(name)` reads the ref's chain incl.
    // staged commits, while the plain table name keeps serving main
    assert(spark.sql(s"SELECT count(*) AS n FROM $Cat.ns.`c10$$ref(dev)`")
      .collect()(0).getLong(0) == 3)
    assert(spark.sql(s"SELECT count(*) AS n FROM $Cat.ns.c10")
      .collect()(0).getLong(0) == 2)
    val pub = spark.sql(s"CALL $Cat.system.publish_branch(table => 'ns.c10', name => 'dev')")
      .collect()(0).getLong(0)
    val t2 = IceliteTable.load(spark, wh, "ns", "c10")
    assert(t2.read().count() == 3)
    assert(t2.refs("dev") == ("branch", pub))
    spark.sql(s"CALL $Cat.system.fast_forward(table => 'ns.c10', name => 'dev')")
    val e = intercept[Exception](
      spark.sql(s"CALL $Cat.system.fast_forward(table => 'ns.c10', name => 'v1')").collect())
    assert(e.getMessage.contains("tag") || e.getMessage.toLowerCase.contains("immutable"))
    spark.sql(s"CALL $Cat.system.drop_ref(table => 'ns.c10', name => 'v1')")
    assert(!IceliteTable.load(spark, wh, "ns", "c10").refs.contains("v1"))
  }

  test("a governed catalog refuses CALL (read-only role)") {
    mkTable("c6", 1).declarePolicy("analyst", Some("k > 0"), Map.empty)
    spark.conf.set(s"spark.sql.catalog.${Cat}_gov", classOf[IceliteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.${Cat}_gov.warehouse", wh)
    spark.conf.set(s"spark.sql.catalog.${Cat}_gov.principal", "analyst")
    val e = intercept[Exception](
      spark.sql(s"CALL ${Cat}_gov.system.compact(table => 'ns.c6')").collect())
    assert(chain(e).contains("governed"))
  }
}
