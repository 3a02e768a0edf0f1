package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.GraftQuery
import graft.Tables.t
import graft.streaming.ChangelogFeed
import graft.table.IceliteTable

/** Oracle-gated queries for the SQL/DSv2 surface ([[IceliteCatalog]])
  * and the native changelog stream ([[IceliteChangelogSourceProvider]])
  * — the two integration seams a reference user hits first: "can my
  * query engine see the synced table?" and "can I subscribe to its
  * changes without an export hop?" (reference `docs/design.md:291-299`).
  */
object SqlSurface {

  /** Catalog name the gated queries register. One warehouse per JVM:
    * Spark caches a catalog INSTANCE per name at first use, so the
    * warehouse option must be stable for the session; fixtures get
    * fresh table dirs under it per run instead.
    */
  private val CatName = "icelite_g"
  private lazy val catWarehouse: String = graft.util.Scratch.dir("sql-catalog-wh")

  private def registerCatalog(spark: SparkSession): String = {
    spark.conf.set(s"spark.sql.catalog.$CatName", classOf[IceliteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$CatName.warehouse", catWarehouse)
    catWarehouse
  }

  /** Drop-then-create: reruns in one JVM (bench two-pass, DevTime)
    * rebuild the fixture under the same catalog-stable warehouse.
    */
  private def freshTable(spark: SparkSession, wh: String, ns: String,
      name: String, schema: StructType,
      partitioning: Seq[graft.config.PartitionConfig] = Nil): IceliteTable = {
    val p = new Path(s"$wh/$ns/$name")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    IceliteTable.create(spark, wh, ns, name, schema, partitioning = partitioning)
  }

  // ------------------------------------------------------- table_sql_read

  /** The full MoR read contract exercised PURELY through `spark.sql`
    * on a registered catalog identifier: equality deletes
    * ([[IceliteTable.applyChanges]]), position deletes
    * ([[IceliteTable.deleteWhere]]), and schema evolution (a column
    * added mid-history, null for pre-add rows) all land in the
    * fixture, then ONE SQL statement aggregates the surviving state —
    * with a WHERE predicate that pushes through the DSv2 scan into
    * the parquet files under the delete-merge joins
    * ([[IceliteScanBuilder]]; `IceliteCatalogSpec` pins the pushdown).
    * The oracle recomputes the same survivors relationally.
    */
  def tableSqlRead(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(23)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_sql", src.schema)
    // epoch 1: odd keys, pre-evolution
    table.append(src.filter(pmod(col("o_orderkey"), lit(2)) === 1))
    // evolution commit: note column added, then epoch-2 rows carry it
    table.addColumns(StructType(Seq(StructField("note", StringType))))
    val t2 = IceliteTable.load(spark, wh, "analytics", "orders_sql")
    t2.append(src.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .withColumn("note", concat(lit("n"), col("o_orderkey"))))
    // equality deletes (CDC path) + position deletes (coordinate path)
    t2.applyChanges(
      upserts = src.limit(0).withColumn("note", lit(null).cast("string")),
      deleteKeys = src.filter(pmod(col("o_orderkey"), lit(7)) === 0).select("o_orderkey"),
      keyCols = Seq("o_orderkey"))
    t2.deleteWhere(pmod(col("o_orderkey"), lit(5)) === 0)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents,
         |  count(note) AS n_notes
         |FROM $CatName.analytics.orders_sql
         |WHERE cents > 500000
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlReadOracle =
    """WITH state AS (
      |  SELECT o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 'n' || CAST(o_orderkey AS VARCHAR) END AS note
      |  FROM orders
      |  WHERE o_orderkey % 23 = 0 AND o_orderkey % 7 <> 0 AND o_orderkey % 5 <> 0)
      |SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  count(note) AS n_notes
      |FROM state WHERE cents > 500000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------------ table_sql_write

  /** SQL WRITE + TIME TRAVEL through the catalog: `INSERT INTO` lands
    * a third commit via the [[org.apache.spark.sql.connector.write.V1Write]]
    * fallback → [[IceliteTable.append]], and the report reads THREE
    * points of the same table purely in SQL — `VERSION AS OF 1` (the
    * first commit), `TIMESTAMP AS OF` is exercised in the spec, and
    * the current state including the inserted rows — proving commit
    * isolation is visible to the SQL surface, not just the Scala API.
    */
  def tableSqlWrite(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(29)) === 0)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_sqlw", src.schema)
    table.append(src.filter(pmod(col("o_orderkey"), lit(3)) === 0)) // seq 1
    table.append(src.filter(pmod(col("o_orderkey"), lit(3)) === 1)) // seq 2
    src.filter(pmod(col("o_orderkey"), lit(3)) === 2).createOrReplaceTempView("sqlw_batch3")
    spark.sql(s"INSERT INTO $CatName.analytics.orders_sqlw SELECT * FROM sqlw_batch3") // seq 3
    spark.sql(
      s"""SELECT snap, n_rows, sum_cents FROM (
         |  SELECT 'v1' AS snap, count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents
         |  FROM $CatName.analytics.orders_sqlw VERSION AS OF 1
         |  UNION ALL
         |  SELECT 'cur' AS snap, count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents
         |  FROM $CatName.analytics.orders_sqlw
         |) ORDER BY snap""".stripMargin)
  }

  private val tableSqlWriteOracle =
    """WITH sub AS (
      |  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 29 = 0)
      |SELECT snap, n_rows, sum_cents FROM (
      |  SELECT 'v1' AS snap, count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents
      |  FROM sub WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT 'cur' AS snap, count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents
      |  FROM sub
      |) ORDER BY snap""".stripMargin

  // ------------------------------------------------------ table_sql_update

  /** SQL row-level UPDATE through the catalog ([[IceliteDmlRule]] →
    * [[IceliteTable.updateWhere]]): one `spark.sql("UPDATE …")`
    * statement mutates exactly the predicate's rows in one MoR commit
    * (old images position-deleted, mutated images appended — zero
    * file rewrites), then one SQL aggregate reads the surviving
    * state. The SET expression reads the PRE-update row (standard
    * UPDATE semantics), which the oracle recomputes relationally.
    */
  def tableSqlUpdate(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(31)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_sqlu", src.schema)
    table.append(src)
    spark.sql(
      s"""UPDATE $CatName.analytics.orders_sqlu
         |SET cents = cents * 2 + 7, o_orderstatus = concat(o_orderstatus, '+')
         |WHERE o_orderkey % 3 = 0 AND cents > 250000""".stripMargin)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $CatName.analytics.orders_sqlu
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlUpdateOracle =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 31 = 0),
      |state AS (
      |  SELECT
      |    CASE WHEN o_orderkey % 3 = 0 AND cents > 250000
      |         THEN o_orderstatus || '+' ELSE o_orderstatus END AS o_orderstatus,
      |    CASE WHEN o_orderkey % 3 = 0 AND cents > 250000
      |         THEN cents * 2 + 7 ELSE cents END AS cents
      |  FROM base)
      |SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM state GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------- table_partition_evolution

  /** Partition-spec evolution through SQL (`CALL system
    * .evolve_partitioning`) — Iceberg's headline metadata trick: the
    * spec change is one metadata commit, existing files KEEP their old
    * layout, new writes land under the new spec, and one scan reads
    * (and prunes) both vintages. The fixture writes odd keys under
    * `month(o_orderdate)`, evolves to `bucket[8](o_orderkey)` +
    * identity status, writes even keys, then runs a date-filtered
    * aggregate across the mixed-spec file set; the oracle recomputes
    * it relationally (content must be layout-independent). At 100 TB
    * this is how a table repartitions without rewriting history.
    */
  def tablePartitionEvolution(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(13)) === 0)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_pevo", src.schema,
      partitioning = Seq(graft.config.PartitionConfig("o_orderdate", "month")))
    table.append(src.filter(pmod(col("o_orderkey"), lit(2)) === 1))
    spark.sql(
      s"""CALL $CatName.system.evolve_partitioning(
         |  table => 'analytics.orders_pevo',
         |  spec => 'o_orderkey:bucket[8],o_orderstatus')""".stripMargin).collect()
    IceliteTable.load(spark, wh, "analytics", "orders_pevo")
      .append(src.filter(pmod(col("o_orderkey"), lit(2)) === 0))
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $CatName.analytics.orders_pevo
         |WHERE o_orderdate >= DATE'1994-01-01' AND o_orderdate < DATE'1996-01-01'
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tablePartitionEvolutionOracle =
    """WITH sub AS (
      |  SELECT o_orderkey, o_orderdate, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 13 = 0)
      |SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM sub
      |WHERE o_orderdate >= DATE '1994-01-01' AND o_orderdate < DATE '1996-01-01'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ----------------------------------------------- table_sql_update_nested

  /** Struct-field UPDATE through SQL (`SET meta.cents = …`): the
    * translator folds the assigned fields into one withField chain
    * over the base column's pre-image ([[SqlDml]] fieldPath routing),
    * so one MoR commit rewrites exactly the matching rows with
    * untouched fields preserved. Both SET expressions read the
    * PRE-update struct; the oracle recomputes the same state
    * relationally on flattened columns.
    */
  def tableSqlUpdateNested(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(59)) === 0)
      .select(col("o_orderkey"),
        struct(col("o_orderstatus").as("status"),
          floor(col("o_totalprice") * 100).cast("long").as("cents")).as("meta"))
    val table = freshTable(spark, wh, "analytics", "orders_sqlnu", src.schema)
    table.append(src)
    spark.sql(
      s"""UPDATE $CatName.analytics.orders_sqlnu
         |SET meta.cents = meta.cents * 2 + 7, meta.status = concat(meta.status, '+')
         |WHERE o_orderkey % 3 = 0 AND meta.cents > 250000""".stripMargin)
    spark.sql(
      s"""SELECT meta.status AS status, count(*) AS n_rows,
         |  CAST(sum(meta.cents) AS BIGINT) AS sum_cents
         |FROM $CatName.analytics.orders_sqlnu
         |GROUP BY meta.status ORDER BY status""".stripMargin)
  }

  private val tableSqlUpdateNestedOracle =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus AS status,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 59 = 0),
      |state AS (
      |  SELECT
      |    CASE WHEN o_orderkey % 3 = 0 AND cents > 250000
      |         THEN status || '+' ELSE status END AS status,
      |    CASE WHEN o_orderkey % 3 = 0 AND cents > 250000
      |         THEN cents * 2 + 7 ELSE cents END AS cents
      |  FROM base)
      |SELECT status, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM state GROUP BY status ORDER BY status""".stripMargin

  // ------------------------------------------- table_sql_dml_subquery

  /** `UPDATE … WHERE key IN (subquery)` and `DELETE … WHERE key NOT
    * IN (subquery)` — the subquery-predicate DML a SQL user writes
    * daily, routed as ONE coordinate-based commit per statement
    * ([[IceliteSubqueryDmlCommand]]): the visible MoR view
    * semi/anti-joins the subquery's distinct key set and the matching
    * rows land by physical (file, pos) coordinates — the same
    * position-delete shape as plain predicate UPDATE/DELETE, so
    * duplicate probed values, NULL keys, and assigning the probed
    * column itself all work row-exactly. SQL three-valued semantics
    * hold (a NULL in the set makes NOT IN update nothing; NOT IN over
    * an EMPTY set is TRUE for every row). The oracle recomputes both
    * statements relationally in DuckDB.
    */
  def tableSqlDmlSubquery(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(29)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_sqlsub", src.schema)
    table.append(src)
    t(spark, dir, "lineitem").createOrReplaceTempView("sqlsub_li")
    spark.sql(
      s"""UPDATE $CatName.analytics.orders_sqlsub SET cents = cents + 1000
         |WHERE o_orderkey IN (SELECT l_orderkey FROM sqlsub_li WHERE l_quantity > 45)""".stripMargin)
    spark.sql(
      s"""DELETE FROM $CatName.analytics.orders_sqlsub
         |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM sqlsub_li WHERE l_quantity > 47)
         |  AND cents % 2 = 0""".stripMargin)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $CatName.analytics.orders_sqlsub
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlDmlSubqueryOracle =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 29 = 0),
      |upd AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
      |         THEN cents + 1000 ELSE cents END AS cents
      |  FROM base),
      |fin AS (
      |  SELECT * FROM upd
      |  WHERE NOT (o_orderkey NOT IN
      |      (SELECT l_orderkey FROM lineitem WHERE l_quantity > 47)
      |    AND cents % 2 = 0))
      |SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------- table_sql_changes

  /** Batch SQL access to the changelog (VERDICT r17 #4 — Iceberg's
    * `table_changes` shape): a SQL-only consumer runs a one-shot CDC
    * reconciliation without leaving SQL via the `$changes(from,to)`
    * metadata selector — served through the same distributed V1Scan
    * path as every read (a CALL procedure would collect to the
    * driver: Spark's `InvokeProcedures` accepts only `LocalScan`).
    * The fixture is `table_changes`' exact commit history — append,
    * keyed upsert (pre/post images), keyed delete, position delete
    * resolved to pre-images — and the oracle is the same relational
    * reconstruction, so the SQL surface is gated against the
    * already-proven Scala `readChanges` semantics.
    */
  def tableSqlChanges(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(11)) === 0)
      .select(lpad(col("o_orderkey").cast("string"), 12, "0").as("_id"),
        col("o_orderkey"), col("o_totalprice"))
    val table = freshTable(spark, wh, "analytics", "orders_cdcsql", src.schema)
    table.append(src) // s1
    table.upsert(src // s2: price bump on every third key
      .filter(pmod(col("o_orderkey"), lit(3)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0), Seq("_id"))
    table.delete(src // s3: delete every fifth key (some freshly updated)
      .filter(pmod(col("o_orderkey"), lit(5)) === 0).select("_id"), Seq("_id"))
    // s4: POSITION delete (physical rows, no key events) — resolved
    // back to exact pre-images by the changelog
    table.deleteWhere(pmod(col("o_orderkey"), lit(7)) === 0)
    spark.sql(
      s"""SELECT _change_type, _commit_seq, _id, o_totalprice
         |FROM $CatName.analytics.`orders_cdcsql$$changes(1,4)`
         |ORDER BY _commit_seq, _change_type, _id""".stripMargin)
  }

  private val tableSqlChangesOracle =
    """WITH sub AS (
      |  SELECT lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS id,
      |         o_orderkey AS k, o_totalprice AS price
      |  FROM orders WHERE o_orderkey % 11 = 0)
      |SELECT * FROM (
      |  SELECT 'update_preimage' AS _change_type, CAST(2 AS BIGINT) AS _commit_seq,
      |         id AS _id, price AS o_totalprice FROM sub WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT 'update_postimage', CAST(2 AS BIGINT), id, price + 10.0
      |  FROM sub WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT 'delete', CAST(3 AS BIGINT), id,
      |         CASE WHEN k % 3 = 0 THEN price + 10.0 ELSE price END
      |  FROM sub WHERE k % 5 = 0
      |  UNION ALL
      |  SELECT 'delete', CAST(4 AS BIGINT), id,
      |         CASE WHEN k % 3 = 0 THEN price + 10.0 ELSE price END
      |  FROM sub WHERE k % 7 = 0 AND k % 5 <> 0
      |) ORDER BY _commit_seq, _change_type, _id""".stripMargin

  // --------------------------------------------- table_sql_dml_exists

  /** Correlated-subquery DML: `UPDATE … WHERE EXISTS (…)`, `UPDATE …
    * WHERE col IN (correlated subquery)`, and `DELETE … WHERE NOT
    * EXISTS (…)` — routed by [[SqlDml]] onto the same coordinate
    * engine as the uncorrelated IN route: the correlated equality
    * conjuncts are pulled out of the subquery's WHERE as semi/anti-
    * join keys ([[IceliteCorrelatedDmlCommand]]), so each statement
    * is ONE distributed join + ONE MoR commit — no per-row subquery
    * re-execution. NOT EXISTS anti-join semantics are exact for NULL
    * keys (UNKNOWN equality → EXISTS false → row qualifies). The
    * oracle runs the identical statements' algebra in DuckDB.
    */
  def tableSqlDmlExists(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(31)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_sqlex", src.schema)
    table.append(src)
    t(spark, dir, "lineitem").createOrReplaceTempView("sqlex_li")
    // correlated EXISTS: bump orders that have a heavy line
    spark.sql(
      s"""UPDATE $CatName.analytics.orders_sqlex SET cents = cents + 7
         |WHERE EXISTS (SELECT 1 FROM sqlex_li
         |              WHERE l_orderkey = o_orderkey AND l_quantity > 44)""".stripMargin)
    // correlated IN: flag 'F' orders that ALSO have a qty>48 line
    spark.sql(
      s"""UPDATE $CatName.analytics.orders_sqlex SET o_orderstatus = 'X'
         |WHERE o_orderstatus IN (SELECT 'F' FROM sqlex_li
         |                        WHERE l_orderkey = o_orderkey AND l_quantity > 48)""".stripMargin)
    // NOT EXISTS: retire every third-cent order with no heavy line
    spark.sql(
      s"""DELETE FROM $CatName.analytics.orders_sqlex
         |WHERE NOT EXISTS (SELECT 1 FROM sqlex_li
         |                  WHERE l_orderkey = o_orderkey AND l_quantity > 46)
         |  AND cents % 3 = 0""".stripMargin)
    // correlated NOT IN (r19 — the two-pass route): dock orders whose
    // status is NOT among their own heavy lines' return flags; the
    // subquery's NULLIF plants NULL values in some groups, which the
    // three-valued semantics must treat as never-qualifying
    spark.sql(
      s"""UPDATE $CatName.analytics.orders_sqlex SET cents = cents - 5
         |WHERE o_orderstatus NOT IN (SELECT nullif(l_returnflag, 'N') FROM sqlex_li
         |                            WHERE l_orderkey = o_orderkey AND l_quantity > 47)""".stripMargin)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $CatName.analytics.orders_sqlex
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlDmlExistsOracle =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 31 = 0),
      |upd1 AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN EXISTS (SELECT 1 FROM lineitem
      |                      WHERE l_orderkey = base.o_orderkey AND l_quantity > 44)
      |         THEN cents + 7 ELSE cents END AS cents
      |  FROM base),
      |upd2 AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderstatus IN (SELECT 'F' FROM lineitem
      |                                WHERE l_orderkey = upd1.o_orderkey AND l_quantity > 48)
      |         THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |    cents
      |  FROM upd1),
      |fin AS (
      |  SELECT * FROM upd2
      |  WHERE NOT (NOT EXISTS (SELECT 1 FROM lineitem
      |                         WHERE l_orderkey = upd2.o_orderkey AND l_quantity > 46)
      |    AND cents % 3 = 0)),
      |upd3 AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderstatus NOT IN (SELECT nullif(l_returnflag, 'N') FROM lineitem
      |                                    WHERE l_orderkey = fin.o_orderkey AND l_quantity > 47)
      |         THEN cents - 5 ELSE cents END AS cents
      |  FROM fin)
      |SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM upd3 GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // --------------------------------------------- table_sql_replace_where

  /** Arbitrary-predicate `INSERT INTO … REPLACE WHERE` (Delta's
    * replaceWhere backfill idiom → [[IceliteTable.replaceWhere]]):
    * one atomic commit position-deletes every row matching a
    * multi-conjunct non-partition predicate and appends the corrected
    * batch — no file rewritten, SQL OverwriteByExpression semantics
    * (the batch is NOT forced to satisfy the predicate, so surviving
    * narrow-F rows coexist with their re-loaded images exactly as the
    * oracle computes).
    */
  def tableSqlReplaceWhere(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(17)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_rw", src.schema)
    table.append(src)
    src.filter(col("o_orderstatus") === "F")
      .withColumn("cents", col("cents") + 5L)
      .createOrReplaceTempView("rw_src")
    spark.sql(
      s"""INSERT INTO $CatName.analytics.orders_rw
         |REPLACE WHERE o_orderstatus = 'F' AND cents > 20000000
         |SELECT * FROM rw_src""".stripMargin)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $CatName.analytics.orders_rw
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlReplaceWhereOracle =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 17 = 0),
      |kept AS (
      |  SELECT * FROM base
      |  WHERE NOT (o_orderstatus = 'F' AND cents > 20000000)),
      |ins AS (
      |  SELECT o_orderkey, o_orderstatus, cents + 5 AS cents
      |  FROM base WHERE o_orderstatus = 'F'),
      |fin AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      |SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------- table_sql_widen

  /** Metadata-only type widening through SQL (`ALTER TABLE … ALTER
    * COLUMN … TYPE BIGINT` → [[IceliteTable.widenColumn]], Iceberg's
    * type promotion): epoch-1 files store INT, the widen commits
    * without rewriting a byte, epoch-2 rows land values past the int
    * range, and one aggregate + predicate reads BOTH vintages exactly
    * (pre-widen files read natively narrow and cast up in the
    * projection). Then the OTHER direction of column-contract
    * evolution: `ALTER COLUMN … SET NOT NULL`
    * ([[IceliteTable.tightenNullability]], parser-routed around
    * Spark's blanket v2 refusal) runs its one-scan proof over both
    * vintages, a NULL insert against the tightened contract must
    * refuse (the query fails loudly if it does not), and a valid
    * epoch-3 batch still lands through it. The oracle recomputes all
    * three epochs under BIGINT.
    */
  def tableSqlWiden(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(13)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice")).cast("int").as("points"))
    val table = freshTable(spark, wh, "analytics", "orders_widen", src.schema)
    table.append(src.filter(pmod(col("o_orderkey"), lit(2)) === 1)) // epoch 1: INT
    spark.sql(
      s"ALTER TABLE $CatName.analytics.orders_widen ALTER COLUMN points TYPE BIGINT")
    src.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .withColumn("points", col("points").cast("long") * 100000L)
      .createOrReplaceTempView("widen_src") // epoch 2: past the int range
    spark.sql(
      s"INSERT INTO $CatName.analytics.orders_widen SELECT * FROM widen_src")
    // SET NOT NULL: one-scan proof over both vintages, then the flip
    spark.sql(
      s"ALTER TABLE $CatName.analytics.orders_widen ALTER COLUMN points SET NOT NULL")
    // enforcement is live: a NULL write must refuse and land nothing
    val refused =
      try { spark.sql(s"INSERT INTO $CatName.analytics.orders_widen VALUES (0, 'X', NULL)"); false }
      catch { case _: Exception => true }
    require(refused, "NULL insert into a SET NOT NULL column did not refuse")
    // a valid epoch-3 batch still lands through the tightened contract
    spark.sql(
      s"""INSERT INTO $CatName.analytics.orders_widen
         |SELECT o_orderkey, o_orderstatus, points + 1 FROM widen_src""".stripMargin)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(points) AS BIGINT) AS sum_points,
         |  CAST(max(points) AS BIGINT) AS max_points
         |FROM $CatName.analytics.orders_widen
         |WHERE points > 1000
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlWidenOracle =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice) AS INTEGER) AS points
      |  FROM orders WHERE o_orderkey % 13 = 0),
      |all_rows AS (
      |  SELECT o_orderstatus, CAST(points AS BIGINT) AS points
      |  FROM base WHERE o_orderkey % 2 = 1
      |  UNION ALL
      |  SELECT o_orderstatus, CAST(points AS BIGINT) * 100000
      |  FROM base WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT o_orderstatus, CAST(points AS BIGINT) * 100000 + 1
      |  FROM base WHERE o_orderkey % 2 = 0)
      |SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(points) AS BIGINT) AS sum_points,
      |  CAST(max(points) AS BIGINT) AS max_points
      |FROM all_rows WHERE points > 1000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // --------------------------------------------- table_sql_update_scalar

  /** Scalar subqueries in UPDATE SET ([[SqlDml]] →
    * [[IceliteScalarSetUpdateCommand]]): a correlated COUNT (the
    * empty-input value is EVALUATED, so zero-match rows get 0, not
    * NULL — no decorrelation count bug), a correlated SUM composed
    * inside a larger SET expression (`cents + coalesce((SELECT …),
    * 0)`), a correlated DISTINCT row SELECT (NULL where no row
    * qualifies), and an uncorrelated global probe — each statement
    * ONE distributed outer join + ONE coordinate MoR commit. The
    * oracle runs the identical per-row algebra natively in DuckDB.
    */
  def tableSqlUpdateScalar(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(29)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        lit(null).cast("long").as("n_heavy"))
    val table = freshTable(spark, wh, "analytics", "orders_scalar", src.schema)
    table.append(src)
    t(spark, dir, "lineitem").createOrReplaceTempView("scalar_li")
    // correlated aggregates: count fills 0 on no-match; the sum
    // composes inside coalesce + arithmetic around the subquery
    spark.sql(
      s"""UPDATE $CatName.analytics.orders_scalar SET
         |  n_heavy = (SELECT count(*) FROM scalar_li
         |             WHERE l_orderkey = o_orderkey AND l_quantity > 45),
         |  cents = cents + coalesce(
         |    (SELECT CAST(sum(l_quantity) AS BIGINT) FROM scalar_li
         |     WHERE l_orderkey = o_orderkey AND l_quantity > 45), 0)
         |WHERE o_orderstatus <> 'P'""".stripMargin)
    // correlated DISTINCT row SELECT: NULL where no line qualifies
    spark.sql(
      s"""UPDATE $CatName.analytics.orders_scalar
         |SET o_orderstatus = (SELECT DISTINCT 'H' FROM scalar_li
         |                     WHERE l_orderkey = o_orderkey AND l_quantity > 49)
         |WHERE o_orderstatus = 'F'""".stripMargin)
    // uncorrelated scalar: one global probe
    spark.sql(
      s"""UPDATE $CatName.analytics.orders_scalar
         |SET cents = cents - (SELECT CAST(min(l_orderkey) AS BIGINT)
         |                     FROM scalar_li WHERE l_quantity > 49.5)
         |WHERE o_orderstatus = 'O'""".stripMargin)
    spark.sql(
      s"""SELECT coalesce(o_orderstatus, 'none') AS status, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents,
         |  CAST(sum(n_heavy) AS BIGINT) AS sum_heavy
         |FROM $CatName.analytics.orders_scalar
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  private val tableSqlUpdateScalarOracle =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(NULL AS BIGINT) AS n_heavy
      |  FROM orders WHERE o_orderkey % 29 = 0),
      |upd1 AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderstatus <> 'P'
      |      THEN cents + coalesce((SELECT CAST(sum(l_quantity) AS BIGINT) FROM lineitem
      |                             WHERE l_orderkey = base.o_orderkey AND l_quantity > 45), 0)
      |      ELSE cents END AS cents,
      |    CASE WHEN o_orderstatus <> 'P'
      |      THEN (SELECT count(*) FROM lineitem
      |            WHERE l_orderkey = base.o_orderkey AND l_quantity > 45)
      |      ELSE n_heavy END AS n_heavy
      |  FROM base),
      |upd2 AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderstatus = 'F'
      |      THEN (SELECT DISTINCT 'H' FROM lineitem
      |            WHERE l_orderkey = upd1.o_orderkey AND l_quantity > 49)
      |      ELSE o_orderstatus END AS o_orderstatus,
      |    cents, n_heavy
      |  FROM upd1),
      |upd3 AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderstatus = 'O'
      |      THEN cents - (SELECT CAST(min(l_orderkey) AS BIGINT) FROM lineitem
      |                    WHERE l_quantity > 49.5)
      |      ELSE cents END AS cents, n_heavy
      |  FROM upd2)
      |SELECT coalesce(o_orderstatus, 'none') AS status, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  CAST(sum(n_heavy) AS BIGINT) AS sum_heavy
      |FROM upd3 GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------- table_sql_merge

  /** SQL MERGE INTO through the catalog ([[IceliteDmlRule]] →
    * [[IceliteTable.merge]]): delete/update/insert clauses with SQL
    * first-match-wins ordering land as ONE classify-then-commit merge
    * (key-range-pruned target scan, ambiguity-guarded source), then
    * one SQL aggregate reads the converged state. The oracle
    * recomputes the merge relationally: matched-and-not-deleted rows
    * updated, unmatched source rows inserted.
    */
  def tableSqlMerge(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val sub = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(37)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_sqlm", sub.schema)
    table.append(sub.filter(pmod(col("o_orderkey"), lit(2)) === 1)) // odd keys
    sub.select(col("o_orderkey"), col("o_orderstatus"),
        (col("cents") + 11).as("cents"))
      .createOrReplaceTempView("sqlm_src")
    spark.sql(
      s"""MERGE INTO $CatName.analytics.orders_sqlm t USING sqlm_src s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED AND s.cents % 5 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET cents = s.cents + t.cents
         |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, cents)
         |  VALUES (s.o_orderkey, s.o_orderstatus, s.cents)""".stripMargin)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $CatName.analytics.orders_sqlm
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlMergeOracle =
    """WITH sub AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 37 = 0),
      |tgt AS (SELECT * FROM sub WHERE o_orderkey % 2 = 1),
      |srcv AS (SELECT o_orderkey, o_orderstatus, cents + 11 AS cents FROM sub),
      |state AS (
      |  SELECT t.o_orderkey, t.o_orderstatus, s.cents + t.cents AS cents
      |  FROM tgt t JOIN srcv s ON t.o_orderkey = s.o_orderkey
      |  WHERE NOT (s.cents % 5 = 0)
      |  UNION ALL
      |  SELECT s.o_orderkey, s.o_orderstatus, s.cents
      |  FROM srcv s LEFT JOIN tgt t ON t.o_orderkey = s.o_orderkey
      |  WHERE t.o_orderkey IS NULL)
      |SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM state GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // --------------------------------------------- table_sql_merge_by_source

  /** SQL MERGE with the `WHEN NOT MATCHED BY SOURCE` family — the
    * SCD/sync idiom (make the target mirror the source, retiring
    * source-absent rows): matched rows update, source-only rows
    * insert, and target rows NO source row matched either delete
    * (stale beyond a threshold) or get flagged, with SQL
    * first-match-wins ordering between the two BY SOURCE clauses. One
    * classify-then-commit merge over the full MoR target scan (the
    * clause's inherent cost — a source-absent row can live in any
    * file); the oracle recomputes all four row fates relationally.
    */
  def tableSqlMergeBySource(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val sub = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(43)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_sqlbs", sub.schema)
    table.append(sub.filter(pmod(col("o_orderkey"), lit(2)) === 1)) // target: odd keys
    // source: keys ≡ 0 (mod 3) — odd ones match (update), even ones are
    // new (insert), and odd non-multiples of 3 went stale on the target
    // (retire or flag via BY SOURCE)
    sub.filter(pmod(col("o_orderkey"), lit(3)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), (col("cents") + 7).as("cents"))
      .createOrReplaceTempView("sqlbs_src")
    spark.sql(
      s"""MERGE INTO $CatName.analytics.orders_sqlbs t USING sqlbs_src s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET cents = s.cents
         |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, cents)
         |  VALUES (s.o_orderkey, s.o_orderstatus, s.cents)
         |WHEN NOT MATCHED BY SOURCE AND t.cents % 2 = 0 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET o_orderstatus = 'X'""".stripMargin)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $CatName.analytics.orders_sqlbs
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlMergeBySourceOracle =
    """WITH sub AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 43 = 0),
      |tgt AS (SELECT * FROM sub WHERE o_orderkey % 2 = 1),
      |srcv AS (
      |  SELECT o_orderkey, o_orderstatus, cents + 7 AS cents
      |  FROM sub WHERE o_orderkey % 3 = 0),
      |state AS (
      |  SELECT t.o_orderkey, t.o_orderstatus, s.cents
      |  FROM tgt t JOIN srcv s ON t.o_orderkey = s.o_orderkey
      |  UNION ALL
      |  SELECT s.o_orderkey, s.o_orderstatus, s.cents
      |  FROM srcv s LEFT JOIN tgt t ON t.o_orderkey = s.o_orderkey
      |  WHERE t.o_orderkey IS NULL
      |  UNION ALL
      |  SELECT t.o_orderkey, 'X' AS o_orderstatus, t.cents
      |  FROM tgt t LEFT JOIN srcv s ON t.o_orderkey = s.o_orderkey
      |  WHERE s.o_orderkey IS NULL AND NOT (t.cents % 2 = 0))
      |SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM state GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------ table_sql_merge_evolve

  /** `MERGE WITH SCHEMA EVOLUTION` + computed INSERT values — the two
    * remaining SQL MERGE shapes: the catalog advertises
    * AUTOMATIC_SCHEMA_EVOLUTION, so the analyzer diffs source vs
    * target and commits the AddColumn evolution through alterTable
    * BEFORE the merge routes (new source column `disc` becomes real
    * schema evolution; untouched target rows read NULL for it), and
    * the INSERT clause computes non-key values as column-level insert
    * overrides ([[IceliteTable.merge]] `notMatchedInsertSet`). The
    * oracle recomputes all three row fates — updated, untouched
    * (NULL disc), computed-insert — relationally.
    */
  def tableSqlMergeEvolve(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val sub = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(47)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_sqlme", sub.schema)
    table.append(sub.filter(pmod(col("o_orderkey"), lit(2)) === 1)) // target: odd keys
    // source: keys ≡ 0 (mod 3), carrying a column the target lacks
    // (disc is an exact binary fraction so double sums hash-match)
    sub.filter(pmod(col("o_orderkey"), lit(3)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), (col("cents") + 5).as("cents"),
        (pmod(col("o_orderkey"), lit(7)).cast("double") * 0.5).as("disc"))
      .createOrReplaceTempView("sqlme_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $CatName.analytics.orders_sqlme t
         |USING sqlme_src s ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, cents, disc)
         |  VALUES (s.o_orderkey, concat(s.o_orderstatus, '!'), s.cents * 2 + 1, s.disc)""".stripMargin)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents, sum(disc) AS sum_disc
         |FROM $CatName.analytics.orders_sqlme
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlMergeEvolveOracle =
    """WITH sub AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 47 = 0),
      |tgt AS (SELECT * FROM sub WHERE o_orderkey % 2 = 1),
      |srcv AS (
      |  SELECT o_orderkey, o_orderstatus, cents + 5 AS cents,
      |    CAST(o_orderkey % 7 AS DOUBLE) * 0.5 AS disc
      |  FROM sub WHERE o_orderkey % 3 = 0),
      |state AS (
      |  SELECT s.o_orderkey, s.o_orderstatus, s.cents, s.disc
      |  FROM tgt t JOIN srcv s ON t.o_orderkey = s.o_orderkey
      |  UNION ALL
      |  SELECT t.o_orderkey, t.o_orderstatus, t.cents, CAST(NULL AS DOUBLE) AS disc
      |  FROM tgt t LEFT JOIN srcv s ON t.o_orderkey = s.o_orderkey
      |  WHERE s.o_orderkey IS NULL
      |  UNION ALL
      |  SELECT s.o_orderkey, s.o_orderstatus || '!', s.cents * 2 + 1, s.disc
      |  FROM srcv s LEFT JOIN tgt t ON t.o_orderkey = s.o_orderkey
      |  WHERE t.o_orderkey IS NULL)
      |SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents, sum(disc) AS sum_disc
      |FROM state GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------- table_stream_native

  /** CDC replication through the NATIVE streaming source — the
    * [[graft.operators.SyncQueries.tableReplicaSync]] round-trip with
    * the parquet-export hop deleted: the consumer `readStream`s the
    * source table's own commit log (`format("icelite-changelog")`,
    * offsets = commit seqs) and applies each micro-batch to the
    * replica with the SAME LWW apply ([[ChangelogFeed.applyChangeBatch]]).
    * Two drains against one checkpoint prove resume: the first ships
    * the full-insert commit, the second resumes at seq 1 and ships
    * exactly the resolved update+delete commit. At 100 TB this is the
    * zero-copy CDC subscription — per-commit deltas derived from table
    * metadata + stat-pruned file reads, never an exported duplicate of
    * the change volume. Same oracle as the feed-dir replication: the
    * transport changed, the converged state must not.
    */
  def tableStreamNative(spark: SparkSession, dir: String): DataFrame = {
    val wh = graft.util.Scratch.dir("native-stream-wh")
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(41)) === 0)
      .select(lpad(col("o_orderkey").cast("string"), 12, "0").as("_id"),
        col("o_orderkey"), col("o_totalprice"))
      .persist()
    try {
      val source = IceliteTable.create(spark, wh, "analytics", "orders_nsrc", src.schema)
      val replica = IceliteTable.create(spark, wh, "analytics", "orders_nrep",
        ChangelogFeed.replicaSchema(src.schema))
      val ck = graft.util.Scratch.dir("native-stream-ck")
      def drain(): Unit = ChangelogFeed.replicateStream(
        spark.readStream.format("icelite-changelog")
          .option("warehouse", wh).option("namespace", "analytics")
          .option("table", "orders_nsrc").load(),
        src.schema.fieldNames.toSeq, replica, Seq("_id"), ck)
      source.append(src) // s1: full insert
      drain()
      val ups = src
        .filter(pmod(col("o_orderkey"), lit(2)) === 0 && pmod(col("o_orderkey"), lit(4)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(3)) === 0, col("o_totalprice") + 6.0)
            .otherwise(col("o_totalprice") + 1.0))
      val dels = src.filter(pmod(col("o_orderkey"), lit(4)) === 0).select("_id")
      source.applyChanges(ups, ups.select("_id").union(dels), Seq("_id")) // s2
      drain() // resumes at seq 1: exactly s2
      ChangelogFeed.replicaState(replica)
        .select(col("_id"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("_id")
    } finally src.unpersist()
  }

  private val tableStreamNativeOracle =
    """WITH sub AS (
      |  SELECT lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS _id,
      |         o_orderkey, o_totalprice
      |  FROM orders WHERE o_orderkey % 41 = 0)
      |SELECT _id, o_orderkey,
      |  o_totalprice
      |    + CASE WHEN o_orderkey % 2 = 0 AND o_orderkey % 4 <> 0
      |           THEN CASE WHEN o_orderkey % 3 = 0 THEN 6.0 ELSE 1.0 END
      |           ELSE 0.0 END
      |  AS o_totalprice
      |FROM sub WHERE o_orderkey % 4 <> 0
      |ORDER BY _id""".stripMargin

  // -------------------------------------------------- table_stream_sink

  /** CDC replication as PURE stream composition — `readStream
    * .format("icelite-changelog")` piped straight into `writeStream
    * .format("icelite").mode=changelog` ([[IceliteSinkProvider]]),
    * zero driver code between source and sink: the sink applies each
    * micro-batch with the same guarded LWW merge every other consumer
    * uses. Two drains against one checkpoint prove source resume AND
    * sink idempotence together. This is the deployment shape of the
    * reference's end-to-end loop (capture → apply → commit) with both
    * halves native.
    */
  def tableStreamSink(spark: SparkSession, dir: String): DataFrame = {
    val wh = graft.util.Scratch.dir("sink-stream-wh")
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(43)) === 0)
      .select(lpad(col("o_orderkey").cast("string"), 12, "0").as("_id"),
        col("o_orderkey"), col("o_totalprice"))
      .persist()
    try {
      val source = IceliteTable.create(spark, wh, "analytics", "orders_ksrc", src.schema)
      val replica = IceliteTable.create(spark, wh, "analytics", "orders_krep",
        ChangelogFeed.replicaSchema(src.schema))
      val ck = graft.util.Scratch.dir("sink-stream-ck")
      def drain(): Unit = {
        val q = spark.readStream.format("icelite-changelog")
          .option("warehouse", wh).option("namespace", "analytics")
          .option("table", "orders_ksrc").load()
          .writeStream.format("icelite")
          .option("warehouse", wh).option("namespace", "analytics")
          .option("table", "orders_krep")
          .option("mode", "changelog").option("keys", "_id")
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      source.append(src) // s1: full insert
      drain()
      val ups = src
        .filter(pmod(col("o_orderkey"), lit(2)) === 0 && pmod(col("o_orderkey"), lit(4)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(3)) === 0, col("o_totalprice") + 6.0)
            .otherwise(col("o_totalprice") + 1.0))
      val dels = src.filter(pmod(col("o_orderkey"), lit(4)) === 0).select("_id")
      source.applyChanges(ups, ups.select("_id").union(dels), Seq("_id")) // s2
      drain()
      // the sink committed through its own table handle — re-probe the
      // published head before reading the converged state
      replica.refresh()
      ChangelogFeed.replicaState(replica)
        .select(col("_id"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("_id")
    } finally src.unpersist()
  }

  private val tableStreamSinkOracle =
    """WITH sub AS (
      |  SELECT lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS _id,
      |         o_orderkey, o_totalprice
      |  FROM orders WHERE o_orderkey % 43 = 0)
      |SELECT _id, o_orderkey,
      |  o_totalprice
      |    + CASE WHEN o_orderkey % 2 = 0 AND o_orderkey % 4 <> 0
      |           THEN CASE WHEN o_orderkey % 3 = 0 THEN 6.0 ELSE 1.0 END
      |           ELSE 0.0 END
      |  AS o_totalprice
      |FROM sub WHERE o_orderkey % 4 <> 0
      |ORDER BY _id""".stripMargin

  // --------------------------------------------------- table_stream_agg

  /** STREAMING AGGREGATION SERVED FROM AN ICELITE TABLE — the
    * continuous-rollup deployment: a file stream of event batches
    * feeds a stateful per-type aggregate whose Update-mode output
    * UPSERTS into an icelite table through the native sink, so the
    * table always holds the current rollup and any engine can read it
    * mid-stream. Two landing waves with two AvailableNow drains prove
    * the state store RESUMES (wave-2 counts accumulate onto wave-1
    * state, not restart from zero) and the sink's keyed upsert
    * converges. Exact integer cents so the oracle is bit-stable.
    */
  def tableStreamAgg(spark: SparkSession, dir: String): DataFrame = {
    val wh = graft.util.Scratch.dir("stream-agg-wh")
    val landing = graft.util.Scratch.dir("stream-agg-landing")
    val ck = graft.util.Scratch.dir("stream-agg-ck")
    val ev = t(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_events", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sum_cents", org.apache.spark.sql.types.LongType)))
    val table = IceliteTable.create(spark, wh, "analytics", "event_rollup", outSchema)
    def drain(): Unit = {
      val q = spark.readStream.schema(ev.schema).parquet(s"$landing/*")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
        .writeStream.format("icelite")
        .option("warehouse", wh).option("namespace", "analytics")
        .option("table", "event_rollup")
        .option("mode", "upsert").option("keys", "event_type")
        .option("checkpointLocation", ck)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    ev.filter(pmod(col("event_id"), lit(2)) === 0).write.parquet(s"$landing/w1")
    drain()
    ev.filter(pmod(col("event_id"), lit(2)) === 1).write.parquet(s"$landing/w2")
    drain() // state resumes: wave-2 accumulates onto wave-1 counts
    IceliteTable.load(spark, wh, "analytics", "event_rollup").read()
      .orderBy("event_type")
  }

  private val tableStreamAggOracle =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------- table_sql_maintenance

  /** The whole maintenance lifecycle driven PURELY through SQL `CALL`
    * ([[IceliteProcedures]], Spark 4.1 DSv2 procedures — the Iceberg
    * stored-procedure surface): a fragmented table (3 append commits +
    * a position delete) is consolidated to deletion vectors, compacted
    * to one clean file set, its history expired, and its orphans swept
    * — four `CALL <cat>.system.<proc>(…)` statements — then ONE SQL
    * SELECT reads the surviving state. The oracle recomputes the
    * survivors relationally: if any CALL corrupted, dropped, or
    * resurrected a row, the hash gate fails. Each CALL's one-row
    * result (commit seq / counts) is asserted in-fixture so a
    * procedure that silently no-ops also fails.
    */
  def tableSqlMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(31)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_maint", src.schema)
    table.append(src.filter(pmod(col("o_orderkey"), lit(3)) === 0)) // seq 1
    table.append(src.filter(pmod(col("o_orderkey"), lit(3)) === 1)) // seq 2
    table.append(src.filter(pmod(col("o_orderkey"), lit(3)) === 2)) // seq 3
    table.deleteWhere(pmod(col("o_orderkey"), lit(5)) === 0)        // seq 4 (pos-delete)
    def call(stmt: String): org.apache.spark.sql.Row =
      spark.sql(s"CALL $CatName.system.$stmt").collect()(0)
    val dvSeq = call("consolidate_deletes(table => 'analytics.orders_maint')").getLong(0)
    require(dvSeq == 5, s"consolidate_deletes committed seq $dvSeq, expected 5")
    val compactSeq = call("compact(table => 'analytics.orders_maint')").getLong(0)
    require(compactSeq == 6, s"compact committed seq $compactSeq, expected 6")
    val expired = call("expire_snapshots(table => 'analytics.orders_maint', keep_versions => 2)").getInt(0)
    require(expired > 0, "expire_snapshots removed no metadata versions")
    val swept = call("remove_orphan_files(table => 'analytics.orders_maint', grace_ms => 0)").getInt(0)
    require(swept > 0, "remove_orphan_files swept nothing after a full-table compaction")
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $CatName.analytics.orders_maint
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlMaintenanceOracle =
    """SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders
      |WHERE o_orderkey % 31 = 0 AND o_orderkey % 5 <> 0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // --------------------------------------------------- table_sql_overwrite

  /** Partitioned DDL + the idempotent-reload shape, all in SQL: a table
    * is CREATEd with `PARTITIONED BY` through the catalog (transform
    * mapping in [[IceliteCatalog.createTable]]), loaded with a first
    * (partial, stale-valued) wave, then `INSERT OVERWRITE` lands the
    * full corrected recompute as ONE atomic `rewrite-overwrite` commit
    * ([[graft.table.IceliteTable.overwriteAll]]) — re-running a load
    * replaces, never duplicates. The oracle recomputes the corrected
    * state directly: any leak of wave-1 rows (duplicate or stale
    * value) fails the hash gate.
    */
  def tableSqlOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val p = new Path(s"$wh/analytics/orders_ovw")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.sql(
      s"""CREATE TABLE $CatName.analytics.orders_ovw
         |(o_orderkey BIGINT, o_orderstatus STRING, cents BIGINT)
         |PARTITIONED BY (o_orderstatus)""".stripMargin)
    t(spark, dir, "orders").filter(pmod(col("o_orderkey"), lit(37)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .createOrReplaceTempView("ovw_src")
    // wave 1: a partial load with STALE values (cents off by one)
    spark.sql(
      s"""INSERT INTO $CatName.analytics.orders_ovw
         |SELECT o_orderkey, o_orderstatus, cents + 1 FROM ovw_src
         |WHERE o_orderkey % 2 = 0""".stripMargin)
    // the corrected full recompute replaces everything atomically
    spark.sql(
      s"""INSERT OVERWRITE $CatName.analytics.orders_ovw
         |SELECT o_orderkey, o_orderstatus, cents FROM ovw_src""".stripMargin)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $CatName.analytics.orders_ovw
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlOverwriteOracle =
    """SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders WHERE o_orderkey % 37 = 0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------ table_sql_overwrite_dynamic

  /** Partition-scoped `INSERT OVERWRITE` purely through SQL — the
    * daily-backfill shape: a DYNAMIC overwrite (partitionOverwriteMode
    * = dynamic, [[IceliteDmlRule]] → [[IceliteTable.overwritePartitions]])
    * re-loads exactly the partition values the corrected batch carries,
    * and a STATIC `PARTITION (col = v)` overwrite (the
    * OverwriteByExpression filter route) replaces one named partition —
    * every untouched partition survives both, byte-for-byte. File
    * classification is metadata-only (partition-column min/max from the
    * manifests), so at 100 TB a one-day reload touches ~1 partition of
    * files, never the table. The oracle recomputes the final state per
    * partition.
    */
  def tableSqlOverwriteDynamic(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val p = new Path(s"$wh/analytics/orders_ovwd")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.sql(
      s"""CREATE TABLE $CatName.analytics.orders_ovwd
         |(o_orderkey BIGINT, o_orderstatus STRING, cents BIGINT)
         |PARTITIONED BY (o_orderstatus)""".stripMargin)
    t(spark, dir, "orders").filter(pmod(col("o_orderkey"), lit(37)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .createOrReplaceTempView("ovwd_src")
    // full load with STALE values (cents off by one) in every partition
    spark.sql(
      s"""INSERT INTO $CatName.analytics.orders_ovwd
         |SELECT o_orderkey, o_orderstatus, cents + 1 FROM ovwd_src""".stripMargin)
    // dynamic reload: the corrected batch carries ONLY partition 'F' —
    // exactly that partition is replaced, 'O' and 'P' stay stale
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(
      s"""INSERT OVERWRITE $CatName.analytics.orders_ovwd
         |SELECT o_orderkey, o_orderstatus, cents FROM ovwd_src
         |WHERE o_orderstatus = 'F'""".stripMargin)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // static reload of ONE named partition (filter route, default mode):
    // 'O' gets its corrected rows; 'P' remains the only stale partition
    spark.sql(
      s"""INSERT OVERWRITE $CatName.analytics.orders_ovwd PARTITION (o_orderstatus = 'O')
         |SELECT o_orderkey, cents FROM ovwd_src WHERE o_orderstatus = 'O'""".stripMargin)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $CatName.analytics.orders_ovwd
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  private val tableSqlOverwriteDynamicOracle =
    """WITH src AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 37 = 0)
      |SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN o_orderstatus IN ('F', 'O') THEN cents
      |                ELSE cents + 1 END) AS BIGINT) AS sum_cents
      |FROM src GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------- table_sql_create_default

  /** Inline column DEFAULTs declared AT CREATE and served end to end
    * through SQL: `CREATE TABLE … DEFAULT <lit>` persists the literal
    * as the column's default property, the DSv2 schema re-exposes it
    * as analyzer metadata, and INSERTs that omit the column (or write
    * the `DEFAULT` keyword) fill the literal — plus the ALTER-time
    * initial-default evolution on the same table (pre-add rows serve
    * the later default from metadata, zero data IO). The oracle
    * recomputes every fill relationally.
    */
  def tableSqlCreateDefault(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val p = new Path(s"$wh/analytics/orders_cdef")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.sql(
      s"""CREATE TABLE $CatName.analytics.orders_cdef
         |(o_orderkey BIGINT, tier STRING DEFAULT 'std', boost BIGINT DEFAULT 3)""".stripMargin)
    t(spark, dir, "orders").filter(pmod(col("o_orderkey"), lit(53)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .createOrReplaceTempView("cdef_src")
    // odd keys omit BOTH defaulted columns; even keys write tier but
    // take boost via the DEFAULT keyword
    spark.sql(
      s"""INSERT INTO $CatName.analytics.orders_cdef (o_orderkey)
         |SELECT o_orderkey FROM cdef_src WHERE o_orderkey % 2 = 1""".stripMargin)
    spark.sql(
      s"""INSERT INTO $CatName.analytics.orders_cdef
         |SELECT o_orderkey, o_orderstatus, DEFAULT FROM cdef_src
         |WHERE o_orderkey % 2 = 0""".stripMargin)
    // ALTER-time default on the same table: pre-add rows serve it
    spark.sql(
      s"ALTER TABLE $CatName.analytics.orders_cdef ADD COLUMN grade STRING DEFAULT 'bronze'")
    spark.sql(
      s"""SELECT tier, grade, count(*) AS n_rows,
         |  CAST(sum(boost) AS BIGINT) AS sum_boost
         |FROM $CatName.analytics.orders_cdef
         |GROUP BY tier, grade ORDER BY tier, grade""".stripMargin)
  }

  private val tableSqlCreateDefaultOracle =
    """WITH src AS (
      |  SELECT o_orderkey, o_orderstatus
      |  FROM orders WHERE o_orderkey % 53 = 0),
      |state AS (
      |  SELECT CASE WHEN o_orderkey % 2 = 1 THEN 'std' ELSE o_orderstatus END AS tier,
      |    'bronze' AS grade, CAST(3 AS BIGINT) AS boost
      |  FROM src)
      |SELECT tier, grade, count(*) AS n_rows,
      |  CAST(sum(boost) AS BIGINT) AS sum_boost
      |FROM state GROUP BY tier, grade ORDER BY tier, grade""".stripMargin

  // ------------------------------------------------------ table_sql_view

  /** Persistent SQL views over a MoR table, end to end in SQL: the
    * fixture lands appends + equality deletes + position deletes,
    * `CREATE VIEW` stores a projection with a computed column and an
    * alias list ([[IceliteViewParser]]/[[IceliteViewRule]] — Spark
    * 4.1 ships the ViewCatalog API with no analyzer path, so this is
    * graft's own surface), a SECOND view nests the first (recursion +
    * context capture), and the report aggregates through the nested
    * view with a predicate that pushes through BOTH inlinings into
    * the parquet scan. The oracle recomputes the survivors
    * relationally — views must be pure analysis-time metadata, so
    * the result matches the hand-written query exactly.
    */
  def tableSqlView(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val src = t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(19)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val table = freshTable(spark, wh, "analytics", "orders_vw", src.schema)
    table.append(src)
    // MoR state under the view: equality deletes + position deletes
    table.applyChanges(
      upserts = src.limit(0),
      deleteKeys = src.filter(pmod(col("o_orderkey"), lit(3)) === 0).select("o_orderkey"),
      keyCols = Seq("o_orderkey"))
    table.deleteWhere(pmod(col("o_orderkey"), lit(5)) === 0)
    spark.sql(s"DROP VIEW IF EXISTS $CatName.analytics.v_orders")
    spark.sql(s"DROP VIEW IF EXISTS $CatName.analytics.v_tiers")
    spark.sql(
      s"""CREATE VIEW $CatName.analytics.v_orders (okey, status, kilocents) AS
         |SELECT o_orderkey, o_orderstatus, cents DIV 1000
         |FROM $CatName.analytics.orders_vw""".stripMargin)
    // nested view with its own filter; created from a different
    // current namespace to prove context capture is per-view
    spark.sql(
      s"""CREATE VIEW $CatName.analytics.v_tiers AS
         |SELECT status, kilocents,
         |  CASE WHEN kilocents >= 2000 THEN 'big' ELSE 'small' END AS tier
         |FROM $CatName.analytics.v_orders WHERE okey % 2 = 1""".stripMargin)
    spark.sql(
      s"""SELECT status, tier, count(*) AS n_rows,
         |  CAST(sum(kilocents) AS BIGINT) AS sum_kc
         |FROM $CatName.analytics.v_tiers
         |WHERE kilocents > 500
         |GROUP BY status, tier ORDER BY status, tier""".stripMargin)
  }

  private val tableSqlViewOracle =
    """WITH state AS (
      |  SELECT o_orderkey AS okey, o_orderstatus AS status,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) // 1000 AS kilocents
      |  FROM orders
      |  WHERE o_orderkey % 19 = 0 AND o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0),
      |tiers AS (
      |  SELECT status, kilocents,
      |    CASE WHEN kilocents >= 2000 THEN 'big' ELSE 'small' END AS tier
      |  FROM state WHERE okey % 2 = 1)
      |SELECT status, tier, count(*) AS n_rows,
      |  CAST(sum(kilocents) AS BIGINT) AS sum_kc
      |FROM tiers WHERE kilocents > 500
      |GROUP BY status, tier ORDER BY status, tier""".stripMargin

  // --------------------------------------------- table_sql_view_governed

  /** The analyst-facing governed-view composition, end to end: a
    * persistent view DEFINED OVER the governed catalog's identifiers
    * (the stored creation context pins the principal's projection —
    * [[IceliteViewRule]] re-resolves every referenced table through
    * the view's stored catalog, so row-filter + column-mask policies
    * apply UNDER the view and it cannot launder governed data), with
    * column COMMENTs and TBLPROPERTIES that must round-trip through
    * `DESCRIBE EXTENDED` (including an `ALTER VIEW … SET
    * TBLPROPERTIES` update), view DDL REFUSED on the governed catalog
    * (read-only role), and DML THROUGH the view refused on any
    * catalog — each contract require()d inside the query, so a
    * regression fails the gate. The report aggregates through the
    * view: the oracle recomputes filter + masks natively, and
    * `n_names = 1` certifies the name column really was redacted.
    */
  def tableSqlViewGoverned(spark: SparkSession, dir: String): DataFrame = {
    val wh = registerCatalog(spark)
    val gov = "icelite_gvq"
    spark.conf.set(s"spark.sql.catalog.$gov", classOf[IceliteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$gov.warehouse", wh)
    spark.conf.set(s"spark.sql.catalog.$gov.principal", "analyst")
    val base = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    val table = freshTable(spark, wh, "analytics", "customer_vgov", base.schema)
    table.append(base)
    table.declarePolicy("analyst",
      rowFilter = Some("c_nationkey < 13"),
      masks = Map(
        "c_name" -> "'***'",
        "c_acctbal" -> "CAST(floor(c_acctbal / 100) * 100 AS DOUBLE)"))
    spark.sql(s"DROP VIEW IF EXISTS $CatName.analytics.v_cust_gov")
    spark.sql(
      s"""CREATE VIEW $CatName.analytics.v_cust_gov (
         |  seg COMMENT 'market segment', name, bal COMMENT 'bucketed balance')
         |COMMENT 'analyst-scoped customers'
         |TBLPROPERTIES ('owner' = 'analytics', 'tier' = 'silver') AS
         |SELECT c_mktsegment, c_name, c_acctbal
         |FROM $gov.analytics.customer_vgov WHERE c_custkey % 2 = 1""".stripMargin)
    spark.sql(
      s"ALTER VIEW $CatName.analytics.v_cust_gov SET TBLPROPERTIES ('tier' = 'gold')")
    val desc = spark.sql(s"DESCRIBE EXTENDED $CatName.analytics.v_cust_gov").collect()
    require(desc.exists(r => r.getString(0) == "seg" &&
      r.getString(2) == "market segment"), "column comment lost in DESCRIBE")
    require(desc.exists(r => r.getString(0) == "bal" &&
      r.getString(2) == "bucketed balance"), "column comment lost in DESCRIBE")
    require(desc.exists(r => r.getString(0) == "View Property: owner" &&
      r.getString(1) == "analytics"), "TBLPROPERTIES lost in DESCRIBE")
    require(desc.exists(r => r.getString(0) == "View Property: tier" &&
      r.getString(1) == "gold"), "ALTER VIEW SET TBLPROPERTIES did not land")
    val ddlRefused =
      try { spark.sql(s"CREATE VIEW $gov.analytics.v_hack AS SELECT 1 AS one"); false }
      catch { case _: Exception => true }
    require(ddlRefused, "governed-catalog view DDL must refuse")
    val dmlRefused =
      try { spark.sql(s"UPDATE $CatName.analytics.v_cust_gov SET bal = 0"); false }
      catch { case _: Exception => true }
    require(dmlRefused, "DML through a view must refuse")
    spark.sql(
      s"""SELECT seg, count(*) AS n_rows,
         |  CAST(sum(CAST(bal AS DECIMAL(27,2))) AS DOUBLE) AS bal_bucket_sum,
         |  count(DISTINCT name) AS n_names
         |FROM $CatName.analytics.v_cust_gov
         |GROUP BY seg ORDER BY seg""".stripMargin)
  }

  private val tableSqlViewGovernedOracle =
    """SELECT c_mktsegment AS seg, count(*) AS n_rows,
      |  CAST(sum(CAST(floor(c_acctbal / 100) * 100 AS DECIMAL(27,2))) AS DOUBLE)
      |    AS bal_bucket_sum,
      |  CAST(1 AS BIGINT) AS n_names
      |FROM customer WHERE c_custkey % 2 = 1 AND c_nationkey < 13
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------- registry

  def all: Seq[GraftQuery] = Seq(
    GraftQuery("table_sql_view_governed", tableSqlViewGoverned _,
      Some(tableSqlViewGovernedOracle),
      "governed catalog read THROUGH a persistent view: policies apply under it, DDL/DML refusals, COMMENT + TBLPROPERTIES round-trip"),
    GraftQuery("table_sql_read", tableSqlRead _, Some(tableSqlReadOracle),
      "MoR read (equality+pos deletes, schema evolution) purely via spark.sql on a DSv2 catalog"),
    GraftQuery("table_sql_write", tableSqlWrite _, Some(tableSqlWriteOracle),
      "INSERT INTO + VERSION AS OF time travel through the DSv2 catalog"),
    GraftQuery("table_sql_update", tableSqlUpdate _, Some(tableSqlUpdateOracle),
      "SQL UPDATE routed onto the MoR updateWhere commit via the analyzer rule"),
    GraftQuery("table_sql_update_nested", tableSqlUpdateNested _,
      Some(tableSqlUpdateNestedOracle),
      "struct-field UPDATE (SET meta.f = expr): withField fold over the pre-image, one MoR commit"),
    GraftQuery("table_sql_dml_subquery", tableSqlDmlSubquery _,
      Some(tableSqlDmlSubqueryOracle),
      "UPDATE WHERE key IN (subquery) + DELETE WHERE key NOT IN (subquery): coordinate semi/anti-join commits"),
    GraftQuery("table_sql_merge", tableSqlMerge _, Some(tableSqlMergeOracle),
      "SQL MERGE INTO (delete/update/insert, clause-order semantics) onto IceliteTable.merge"),
    GraftQuery("table_sql_merge_by_source", tableSqlMergeBySource _,
      Some(tableSqlMergeBySourceOracle),
      "MERGE WHEN NOT MATCHED BY SOURCE: retire/flag target rows absent from the source (SCD sync)"),
    GraftQuery("table_sql_merge_evolve", tableSqlMergeEvolve _,
      Some(tableSqlMergeEvolveOracle),
      "MERGE WITH SCHEMA EVOLUTION (analyzer-driven AddColumn) + computed INSERT value overrides"),
    GraftQuery("table_stream_native", tableStreamNative _, Some(tableStreamNativeOracle),
      "CDC replication via the native icelite-changelog streaming source (no export hop)"),
    GraftQuery("table_stream_sink", tableStreamSink _, Some(tableStreamSinkOracle),
      "pure readStream->writeStream CDC: native source piped into the icelite sink"),
    GraftQuery("table_stream_agg", tableStreamAgg _, Some(tableStreamAggOracle),
      "stateful streaming rollup upserted into icelite via the sink; state resumes across drains"),
    GraftQuery("table_partition_evolution", tablePartitionEvolution _,
      Some(tablePartitionEvolutionOracle),
      "CALL evolve_partitioning: metadata-only spec change, one scan reads+prunes both file vintages"),
    GraftQuery("table_sql_maintenance", tableSqlMaintenance _, Some(tableSqlMaintenanceOracle),
      "full maintenance lifecycle via SQL CALL procedures: consolidate_deletes, compact, expire, sweep orphans"),
    GraftQuery("table_sql_overwrite", tableSqlOverwrite _, Some(tableSqlOverwriteOracle),
      "PARTITIONED BY DDL + INSERT OVERWRITE: atomic full replace, idempotent reload via SQL"),
    GraftQuery("table_sql_overwrite_dynamic", tableSqlOverwriteDynamic _,
      Some(tableSqlOverwriteDynamicOracle),
      "partition-scoped INSERT OVERWRITE via SQL: dynamic batch-derived reload + static PARTITION(v)"),
    GraftQuery("table_sql_create_default", tableSqlCreateDefault _,
      Some(tableSqlCreateDefaultOracle),
      "CREATE TABLE inline column DEFAULTs: omitted-column INSERT fill + DEFAULT keyword + ALTER default"),
    GraftQuery("table_sql_view", tableSqlView _, Some(tableSqlViewOracle),
      "persistent CREATE VIEW over a MoR table: nested views, alias list, pushdown through the inlining"),
    GraftQuery("table_sql_dml_exists", tableSqlDmlExists _, Some(tableSqlDmlExistsOracle),
      "correlated EXISTS / IN and NOT EXISTS DML: decorrelated semi/anti-join coordinate commits"),
    GraftQuery("table_sql_changes", tableSqlChanges _, Some(tableSqlChangesOracle),
      "batch SQL changelog via the $changes(from,to) selector: one-shot CDC reconciliation in SQL"),
    GraftQuery("table_sql_update_scalar", tableSqlUpdateScalar _,
      Some(tableSqlUpdateScalarOracle),
      "scalar subqueries in UPDATE SET: correlated count/sum, DISTINCT row select, uncorrelated probe"),
    GraftQuery("table_sql_widen", tableSqlWiden _, Some(tableSqlWidenOracle),
      "metadata-only ALTER COLUMN TYPE widening: mixed INT/BIGINT epochs aggregate exactly"),
    GraftQuery("table_sql_replace_where", tableSqlReplaceWhere _,
      Some(tableSqlReplaceWhereOracle),
      "arbitrary-predicate REPLACE WHERE backfill: one atomic pos-delete + append commit"))
}
