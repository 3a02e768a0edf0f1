package graft.sql

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.table.IceliteTable

/** SQL DDL/write surface through the DSv2 catalog: PARTITIONED BY
  * transform mapping, CTAS, and INSERT OVERWRITE (atomic full replace).
  */
class IceliteSqlWriteSpec extends AnyFunSuite with SparkFixture {

  private val Cat = "icelite_w"
  private lazy val wh: String = {
    val dir = Files.createTempDirectory("icelite-sqlw").toString
    spark.conf.set(s"spark.sql.catalog.$Cat", classOf[IceliteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.warehouse", dir)
    dir
  }

  test("CREATE TABLE ... PARTITIONED BY maps identity and named transforms") {
    wh // register the catalog before the first spark.sql touches it
    spark.sql(
      s"""CREATE TABLE $Cat.ns.pt1 (id BIGINT, region STRING, ts TIMESTAMP)
         |PARTITIONED BY (region, days(ts), bucket(4, id))""".stripMargin)
    val t = IceliteTable.load(spark, wh, "ns", "pt1")
    assert(t.meta.partitioning.map(p => p.field -> p.transform) ==
      Seq("region" -> "identity", "ts" -> "day", "id" -> "bucket[4]"))
    spark.sql(s"INSERT INTO $Cat.ns.pt1 VALUES (1, 'emea', TIMESTAMP'2024-03-05 00:00:00')")
    assert(spark.sql(s"SELECT region FROM $Cat.ns.pt1").collect().map(_.getString(0)).toSeq == Seq("emea"))
    // an unsupported transform is refused at create time
    val e = intercept[Exception](
      spark.sql(s"CREATE TABLE $Cat.ns.ptbad (id BIGINT) PARTITIONED BY (truncate(3, id))"))
    assert(e.getMessage.contains("transform"))
  }

  test("CTAS creates and loads in one statement") {
    wh
    spark.range(5).selectExpr("id", "concat('v', id) AS v").createOrReplaceTempView("ctas_src")
    spark.sql(s"CREATE TABLE $Cat.ns.ctas1 AS SELECT * FROM ctas_src")
    assert(spark.sql(s"SELECT count(*) FROM $Cat.ns.ctas1").collect()(0).getLong(0) == 5)
    assert(IceliteTable.load(spark, wh, "ns", "ctas1").meta.snapshots.map(_.operation) == Seq("append"))
  }

  test("INSERT OVERWRITE replaces the table in one atomic rewrite commit") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.ovw1 (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $Cat.ns.ovw1 VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $Cat.ns.ovw1 VALUES (3, 'c')")
    spark.sql(s"INSERT OVERWRITE $Cat.ns.ovw1 VALUES (9, 'z')")
    val got = spark.sql(s"SELECT id, v FROM $Cat.ns.ovw1").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((9L, "z")))
    val t = IceliteTable.load(spark, wh, "ns", "ovw1")
    assert(t.meta.snapshots.map(_.operation) == Seq("rewrite-overwrite"))
    // collapsed history refuses time travel below the overwrite
    val e = intercept[IllegalArgumentException](t.readAt(1).collect())
    assert(e.getMessage.contains("not retained"))
  }

  test("TRUNCATE TABLE commits a real truncate, not a table-sized position delete") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.tr1 (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $Cat.ns.tr1 VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"TRUNCATE TABLE $Cat.ns.tr1")
    val t = IceliteTable.load(spark, wh, "ns", "tr1")
    assert(t.read().count() == 0)
    assert(t.meta.snapshots.map(_.operation) == Seq("truncate"))
    assert(t.meta.livePosDeleteFiles.isEmpty, "truncate fell back to a position delete")
    // SHOW PROCEDURES lists the system namespace (DSv2 surface sanity)
    val procs = spark.sql(s"SHOW PROCEDURES IN $Cat.`system`").collect().map(_.toString)
    assert(procs.exists(_.contains("compact")), s"missing compact in $procs")
  }

  test("SET/UNSET TBLPROPERTIES commit user metadata; engine-managed keys refuse") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.props1 (id BIGINT)")
    spark.sql(s"ALTER TABLE $Cat.ns.props1 SET TBLPROPERTIES ('team' = 'ops', 'tag' = 'gold')")
    val props = spark.sql(s"SHOW TBLPROPERTIES $Cat.ns.props1").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("team").contains("ops") && props.get("tag").contains("gold"))
    spark.sql(s"ALTER TABLE $Cat.ns.props1 UNSET TBLPROPERTIES ('tag')")
    val t = IceliteTable.load(spark, wh, "ns", "props1")
    assert(t.meta.properties.get("team").contains("ops") && !t.meta.properties.contains("tag"))
    assert(t.meta.snapshots.map(_.operation) == Seq("properties", "properties"))
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $Cat.ns.props1 SET TBLPROPERTIES ('graft.schema.oplog' = '[]')"))
    assert(e.getMessage.contains("engine-managed"))
  }

  test("ALTER ADD COLUMN with DEFAULT: pre-add rows serve the literal through SQL") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.def1 (id BIGINT)")
    spark.sql(s"INSERT INTO $Cat.ns.def1 VALUES (1), (2)")
    spark.sql(s"ALTER TABLE $Cat.ns.def1 ADD COLUMN grade STRING DEFAULT 'bronze'")
    spark.sql(s"INSERT INTO $Cat.ns.def1 VALUES (3, 'gold')")
    val got = spark.sql(s"SELECT id, grade FROM $Cat.ns.def1 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "bronze"), (2L, "bronze"), (3L, "gold")))
  }

  test("CREATE TABLE with inline DEFAULT: omitted columns fill the literal") {
    wh
    spark.sql(
      s"CREATE TABLE $Cat.ns.def2 (id BIGINT, g STRING DEFAULT 'x', n BIGINT DEFAULT 5)")
    // INSERT omitting defaulted columns fills the declared literals;
    // the DEFAULT keyword works too
    spark.sql(s"INSERT INTO $Cat.ns.def2 (id) VALUES (1)")
    spark.sql(s"INSERT INTO $Cat.ns.def2 VALUES (2, 'y', DEFAULT)")
    spark.sql(s"INSERT INTO $Cat.ns.def2 VALUES (3, 'z', 9)")
    val got = spark.sql(s"SELECT id, g, n FROM $Cat.ns.def2 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "x", 5L), (2L, "y", 5L), (3L, "z", 9L)))
    // the default survives a catalog round trip (property-derived)
    val t = IceliteTable.load(spark, wh, "ns", "def2")
    assert(t.meta.properties(IceliteTable.DefaultPropPrefix + "g") == "string:x")
    // a NON-literal default refuses loudly at create
    val e = intercept[Exception](
      spark.sql(s"CREATE TABLE $Cat.ns.def3 (id BIGINT, r DOUBLE DEFAULT rand())"))
    assert(e.getMessage.toLowerCase.contains("default"), s"got: ${e.getMessage}")
  }

  test("CREATE OR REPLACE TABLE AS SELECT replaces schema and content") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.rep1 (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $Cat.ns.rep1 VALUES (1, 'a')")
    spark.range(3).selectExpr("id AS k", "id * 10 AS tens").createOrReplaceTempView("rtas_src")
    spark.sql(s"CREATE OR REPLACE TABLE $Cat.ns.rep1 AS SELECT * FROM rtas_src")
    val t = IceliteTable.load(spark, wh, "ns", "rep1")
    assert(t.schema.fieldNames.toSeq == Seq("k", "tens"))
    assert(spark.sql(s"SELECT sum(tens) FROM $Cat.ns.rep1").collect()(0).getLong(0) == 30)
  }

  test("INSERT OVERWRITE on a partitioned table is a full static replace") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.ovw2 (id BIGINT, pt STRING) PARTITIONED BY (pt)")
    spark.sql(s"INSERT INTO $Cat.ns.ovw2 VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT OVERWRITE $Cat.ns.ovw2 VALUES (9, 'a')")
    assert(spark.sql(s"SELECT id, pt FROM $Cat.ns.ovw2").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((9L, "a")))
  }

  test("INSERT OVERWRITE PARTITION (static) replaces exactly the named partition") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.ovw3 (id BIGINT, pt STRING) PARTITIONED BY (pt)")
    spark.sql(s"INSERT INTO $Cat.ns.ovw3 VALUES (1, 'a'), (2, 'b'), (3, 'b')")
    spark.sql(s"INSERT OVERWRITE $Cat.ns.ovw3 PARTITION (pt = 'b') SELECT 9")
    assert(spark.sql(s"SELECT id, pt FROM $Cat.ns.ovw3 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (9L, "b")))
    // an EMPTY static overwrite CLEARS the named partition (the other
    // partition is untouched) — the Hive/Iceberg static contract
    spark.sql(
      s"INSERT OVERWRITE $Cat.ns.ovw3 PARTITION (pt = 'b') SELECT id FROM $Cat.ns.ovw3 WHERE false")
    assert(spark.sql(s"SELECT id, pt FROM $Cat.ns.ovw3").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
  }

  test("dynamic INSERT OVERWRITE replaces only the batch's partition values") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.ovw4 (id BIGINT, pt STRING) PARTITIONED BY (pt)")
    spark.sql(s"INSERT INTO $Cat.ns.ovw4 VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(s"INSERT OVERWRITE $Cat.ns.ovw4 VALUES (8, 'a'), (9, 'c')")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // 'a' and 'c' replaced by the batch; 'b' untouched
    assert(spark.sql(s"SELECT id, pt FROM $Cat.ns.ovw4 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "b"), (8L, "a"), (9L, "c")))
  }

  test("dynamic INSERT OVERWRITE with an empty batch is the standard no-op") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.ovw6 (id BIGINT, pt STRING) PARTITIONED BY (pt)")
    spark.sql(s"INSERT INTO $Cat.ns.ovw6 VALUES (1, 'a')")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // zero rows name zero partitions to replace (the backfill job whose
    // corrected batch is empty) — must succeed and change nothing
    try spark.sql(s"INSERT OVERWRITE $Cat.ns.ovw6 SELECT id, pt FROM $Cat.ns.ovw6 WHERE false")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    assert(spark.sql(s"SELECT id, pt FROM $Cat.ns.ovw6").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
  }

  test("SQL INSERT into an identity-partitioned table lands partition-clustered files") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.clus (id BIGINT, pt STRING) PARTITIONED BY (pt)")
    // a deliberately multi-task source (8 partitions, 3 partition values)
    spark.range(0, 3000).selectExpr("id", "concat('p', id % 3) AS pt")
      .repartition(8).createOrReplaceTempView("clus_src")
    // the ENGINE owns the clustering exchange (writeDataFiles hash-
    // repartitions on the partition columns): Spark's
    // RequiresDistributionAndOrdering never reaches a V1 write —
    // AppendDataExecV1 executes the original analyzedQuery, so the
    // r18 declare-and-skip design silently wrote ~8 pt-interleaved
    // files on any batch past the small-file path (this spec's old
    // 3000-row fixture masked it: small batches coalesce to 1 file)
    spark.sql(s"INSERT INTO $Cat.ns.clus SELECT * FROM clus_src")
    val t = IceliteTable.load(spark, wh, "ns", "clus")
    val files = t.meta.snapshots.last.dataFiles
    assert(files.size <= 3, s"expected <= 3 files (3 partition values), got ${files.size}")
    assert(spark.sql(s"SELECT count(DISTINCT pt) FROM $Cat.ns.clus")
      .collect()(0).getLong(0) == 3)
    // the BIG-batch path (past isSmallBatch): 8 source tasks must
    // still land <= 3 value-clustered files, one exchange on pt
    spark.range(0, 8000000).selectExpr("id", "concat('p', id % 3) AS pt")
      .repartition(8, org.apache.spark.sql.functions.col("id"))
      .createOrReplaceTempView("clus_big_src")
    spark.sql(s"INSERT INTO $Cat.ns.clus SELECT * FROM clus_big_src")
    t.refresh()
    val bigFiles = t.meta.snapshots.last.dataFiles
    assert(bigFiles.size <= 3,
      s"big multi-task INSERT wrote ${bigFiles.size} files (expected <= 3 clustered)")
    // derived transforms keep the engine-side repartition (Spark would
    // need a FunctionCatalog to resolve the cluster expressions) and
    // still avoid the small-file blowup
    spark.sql(s"CREATE TABLE $Cat.ns.clus2 (id BIGINT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
    spark.range(0, 1000)
      .selectExpr("id", "timestampadd(DAY, CAST(id % 2 AS INT), TIMESTAMP'2024-03-05 00:00:00') AS ts")
      .repartition(8).createOrReplaceTempView("clus2_src")
    spark.sql(s"INSERT INTO $Cat.ns.clus2 SELECT * FROM clus2_src")
    val t2 = IceliteTable.load(spark, wh, "ns", "clus2")
    assert(t2.meta.snapshots.last.dataFiles.size <= 2,
      s"expected <= 2 files (2 day values), got ${t2.meta.snapshots.last.dataFiles.size}")
  }

  test("REPLACE WHERE on a non-partition predicate: one atomic pos-delete + append commit") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.rw (id BIGINT, grp STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $Cat.ns.rw VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40)")
    // reload the 'a' slice plus one outside-the-predicate row: SQL
    // OverwriteByExpression semantics — delete matching, insert batch
    spark.sql(
      s"INSERT INTO $Cat.ns.rw REPLACE WHERE grp = 'a' VALUES (10,'a',100),(11,'c',110)")
    val rows = spark.sql(s"SELECT id, grp, v FROM $Cat.ns.rw ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((3L, "b", 30L), (4L, "b", 40L),
      (10L, "a", 100L), (11L, "c", 110L)))
    // ONE commit: pos-deletes + data files in the same snapshot, no
    // data file rewritten
    val t = IceliteTable.load(spark, wh, "ns", "rw")
    val last = t.meta.snapshots.last
    assert(last.operation == "overwrite-where")
    assert(last.posDeleteFiles.nonEmpty && last.dataFiles.nonEmpty)
    assert(t.meta.snapshots.head.dataFiles.forall(t.meta.liveDataFiles.contains))
    // a range predicate routes too (what the partition route refuses)
    spark.sql(s"INSERT INTO $Cat.ns.rw REPLACE WHERE v >= 100 VALUES (20,'z',5)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $Cat.ns.rw WHERE v >= 100")
      .collect()(0).getLong(0) == 0)
    assert(spark.sql(s"SELECT count(*) AS n FROM $Cat.ns.rw").collect()(0).getLong(0) == 3)
    // changelog ranges crossing an overwrite refuse, like every overwrite
    val e = intercept[Exception](t.readChanges(0, t.meta.lastSeq).collect())
    assert(e.getMessage.contains("overwrite"), e.getMessage)
  }

  test("range filter on the partition column: OVERWRITE+REPLACE syntax refuses, bare REPLACE WHERE routes") {
    wh
    spark.sql(s"CREATE TABLE $Cat.ns.ovw5 (id BIGINT, pt BIGINT) PARTITIONED BY (pt)")
    spark.sql(s"INSERT INTO $Cat.ns.ovw5 VALUES (1, 10), (2, 20)")
    // the combined INSERT OVERWRITE ... REPLACE WHERE form is rejected
    // (Spark's parser), state untouched
    val e = intercept[Exception](
      spark.sql(s"INSERT OVERWRITE $Cat.ns.ovw5 REPLACE WHERE pt > 5 VALUES (9, 10)"))
    assert(e.getMessage.contains("REPLACE"), s"got: ${e.getMessage}")
    assert(spark.sql(s"SELECT count(*) FROM $Cat.ns.ovw5").collect()(0).getLong(0) == 2)
    // a bare REPLACE WHERE range on the partition column routes as the
    // general atomic pos-delete + append (the partition route keeps
    // its metadata-only equality/IN discipline)
    spark.sql(s"INSERT INTO $Cat.ns.ovw5 REPLACE WHERE pt > 15 VALUES (9, 30)")
    val rows = spark.sql(s"SELECT id, pt FROM $Cat.ns.ovw5 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 10L), (9L, 30L)))
  }
}
