package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.Tables.t

/** General relational operator surface (SURVEY.md §2.4): aggregations,
  * joins (broadcast/shuffle, semi/anti), windows, sorts, limits, set ops,
  * string/date/JSON functions — expressed DataFrame-first so Catalyst
  * handles pushdown, pruning, partial aggregation and join selection.
  *
  * Cross-engine determinism rules (DuckDB oracle hash-matches bit-exact):
  *  - any aggregate over floating point goes through exact decimal
  *    arithmetic (associative ⇒ independent of Spark partitioning) and
  *    is cast back to double once at the end;
  *  - every query output carries a total ORDER BY;
  *  - integer widths aligned (DuckDB count/sum cast to BIGINT, year/
  *    month/row_number cast to INTEGER where Spark yields int).
  *
  * Scale notes per query are in the Scaladoc of each def: at 100 TB the
  * dimension tables (region/nation/part/supplier/customer) stay
  * broadcast-able or bucket-joined; fact-fact joins shuffle on their join
  * key which is also the natural bucketing key.
  */
object Relational {

  /** sum(double) made partitioning-independent: exact decimal sum, then
    * one deterministic decimal→double conversion. Decimal agg is still
    * codegen'd hash-agg with partial aggregation (map-side combine).
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(27,$scale)")).cast("double")

  def davg(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(27,$scale)")).cast("double") / count(c)

  /** Oracle-side rendering of [[dsum]]. */
  private def osum(expr: String, scale: Int = 4): String =
    s"CAST(sum(CAST($expr AS DECIMAL(27,$scale))) AS DOUBLE)"

  private def oavg(expr: String, scale: Int = 4): String =
    s"${osum(expr, scale)} / count($expr)"

  // ---------------------------------------------------------------- Q1
  /** Wide hash aggregation (TPC-H Q1 shape). Scale: pure map-side
    * partial agg + tiny shuffle (6 groups); filter + 7-column projection
    * push into the parquet scan.
    */
  def aggPricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6)
          .as("sum_charge"),
        davg(col("l_quantity"), 2).as("avg_qty"),
        davg(col("l_extendedprice"), 2).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val aggPricingSummaryOracle =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${osum("l_quantity", 2)} AS sum_qty,
       |  ${osum("l_extendedprice", 2)} AS sum_base_price,
       |  ${osum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${osum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
       |  ${oavg("l_quantity", 2)} AS avg_qty,
       |  ${oavg("l_extendedprice", 2)} AS avg_price,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- Q6
  /** Selective filter + global agg (TPC-H Q6 shape). Scale: all three
    * predicates and the 2-column projection push to the parquet reader;
    * single-row result, no shuffle beyond partial agg merge.
    */
  def filterRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.04, 0.08) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  private val filterRevenueOracle =
    s"""SELECT ${osum("l_extendedprice * l_discount")} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24""".stripMargin

  // ------------------------------------------------------ broadcast join
  /** Fact ⋈ small dim with an explicit broadcast hint. Scale: `part` is
    * O(SF·200k) rows — broadcastable far beyond the 10 MB default; no
    * shuffle of the fact side, agg shuffles only 25 brand groups.
    */
  def joinBroadcastDim(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_extendedprice"), 2).as("brand_revenue"),
        count(lit(1)).as("n_items"),
        davg(col("l_quantity"), 2).as("avg_qty"))
      .orderBy("p_brand")

  private val joinBroadcastDimOracle =
    s"""SELECT p_brand,
       |  ${osum("l_extendedprice", 2)} AS brand_revenue,
       |  count(*) AS n_items,
       |  ${oavg("l_quantity", 2)} AS avg_qty
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ------------------------------------------------------- multiway join
  /** 3-way join + agg + top-k (TPC-H Q3 shape). Scale: customer is the
    * small side (broadcast); orders⋈lineitem is the fact-fact join and
    * shuffles on orderkey — the natural bucketing key for both tables;
    * top-10 is TakeOrderedAndProject (no global sort materialization).
    */
  def joinShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("timestamp")
    t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cutoff)
      .join(t(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > cutoff)
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  private val joinShippingPriorityOracle =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  ${osum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-06-01'
       |  AND l_shipdate > TIMESTAMP '1998-06-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ------------------------------------------------------------ semi join
  /** Left-semi join (EXISTS shape, SURVEY R2/R3 key-join family). Scale:
    * semi-join avoids materializing the probe side's payload; shuffles on
    * orderkey only, or broadcasts the filtered key set when selective.
    */
  def joinSemi(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem").filter(col("l_quantity") >= 48).select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")

  private val joinSemiOracle =
    """SELECT o_orderkey, o_totalprice, o_orderstatus
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------ anti join
  /** Left-anti join (NOT EXISTS; the reference's MoR delete-application
    * shape, SURVEY R2/R3: data LEFT ANTI deletes on `_id`).
    */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders").filter(col("o_totalprice") > 450000).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  private val joinAntiOracle =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------ full outer join

  /** FULL OUTER join — the reconciliation shape (two feeds of the same
    * entity space, rows present on either side survive with nulls on
    * the absent side): high-value customers against big-spender order
    * aggregates, both sides restricted so each contributes unmatched
    * rows. Null-key rows cannot arise (keys are table PKs), so the
    * join stays a plain shuffled equi-join; the aggregate side reduces
    * BEFORE joining (per-key hash-agg, map-side combined) — at 100 TB
    * the join moves one row per key per side, never raw orders.
    */
  def joinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big"), dsum(col("o_totalprice"), 2).as("big_rev"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(col("c_custkey"), col("c_mktsegment"), col("o_custkey"),
        col("n_big"), col("big_rev"))
      .orderBy(coalesce(col("c_custkey"), col("o_custkey")),
        col("c_custkey").isNull)
  }

  private val joinFullOuterOracle =
    """WITH c AS (
      |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000),
      |o AS (
      |  SELECT o_custkey, count(*) AS n_big,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS big_rev
      |  FROM orders WHERE o_totalprice > 400000 GROUP BY 1)
      |SELECT c_custkey, c_mktsegment, o_custkey, n_big, big_rev
      |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
      |ORDER BY coalesce(c_custkey, o_custkey), c_custkey IS NULL""".stripMargin

  // ------------------------------------------------- window: top-k/group
  /** row_number window: top-3 orders per customer. Scale: single shuffle
    * on the partition key; no global sort. rank cast to int on both sides.
    */
  def windowTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  private val windowTopkPerGroupOracle =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ------------------------------------------------------ window: lag/lead
  /** lag/lead over a deterministic per-customer order; elementwise double
    * arithmetic only (no fp accumulation), so bit-exact cross-engine.
    */
  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("delta_prev", col("o_totalprice") - col("prev_price"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("prev_price"), col("next_price"), col("delta_prev"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val windowLagOracle =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  o_totalprice - lag(o_totalprice) OVER w AS delta_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ------------------------------------------------- window: running sum
  /** Cumulative sum per key. Decimal accumulation ⇒ independent of the
    * engines' window-agg algorithms (DuckDB segment tree vs Spark
    * running agg) — exact, then one cast to double.
    */
  def windowRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "orders")
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(27,2)")).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val windowRunningSumOracle =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // --------------------------------------------------------- distinct agg
  /** count(distinct) per group (SURVEY "Distinct/approx" row). Scale:
    * Spark expands distinct aggs into a two-phase partial/final plan.
    */
  def distinctCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  private val distinctCountOracle =
    """SELECT o_orderstatus,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  count(DISTINCT o_orderpriority) AS n_priorities,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------- set ops
  /** INTERSECT / EXCEPT with set semantics (SURVEY "Set ops" row; the
    * union-schema/append semantics family). Tagged into one result.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val rich = t(spark, dir, "customer").filter(col("c_acctbal") > 7000)
      .select(col("c_custkey").as("custkey"))
    val bigSpenders = t(spark, dir, "orders").filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey"))
    rich.intersect(bigSpenders).withColumn("op", lit("intersect"))
      .unionByName(rich.except(bigSpenders).withColumn("op", lit("except")))
      .select(col("op"), col("custkey"))
      .orderBy("op", "custkey")
  }

  private val setOpsOracle =
    """WITH rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000),
      |     big  AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000)
      |SELECT 'intersect' AS op, custkey FROM (SELECT custkey FROM rich INTERSECT SELECT custkey FROM big) a
      |UNION ALL
      |SELECT 'except' AS op, custkey FROM (SELECT custkey FROM rich EXCEPT SELECT custkey FROM big) b
      |ORDER BY op, custkey""".stripMargin

  // ------------------------------------------------------- global top-k
  /** Global ORDER BY + LIMIT → TakeOrderedAndProject (per-partition
    * top-k then k-way merge on the driver; no full sort at 100 TB).
    */
  def sortLimitGlobal(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private val sortLimitGlobalOracle =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // ------------------------------------------------------ string functions
  /** String function surface (SURVEY "String functions"): case, substring,
    * length, concat, regexp. Pure elementwise → whole-stage codegen.
    */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        split(col("p_type"), " ").getItem(0).as("type_head"))
      .orderBy("p_partkey")

  private val stringFuncsOracle =
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_upper,
      |  substring(p_name, 1, 8) AS name_prefix,
      |  CAST(length(p_name) AS INTEGER) AS name_len,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
      |  split_part(p_type, ' ', 1) AS type_head
      |FROM part ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------- date functions
  /** Date/time surface (SURVEY T6 partition transforms: year/month/day/
    * hour/date_trunc are exactly the partition-derivation functions).
    */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice"), 2).as("revenue"),
        min(date_trunc("month", col("o_orderdate"))).as("first_month"))
      .orderBy("yr", "qtr")

  private val dateFuncsOracle =
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       |  count(*) AS n_orders,
       |  ${osum("o_totalprice", 2)} AS revenue,
       |  CAST(min(date_trunc('month', o_orderdate)) AS TIMESTAMP) AS first_month
       |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin

  // -------------------------------------------------------- JSON functions
  /** JSON extraction (SURVEY "JSON functions": resume-token/conflict
    * promotion family) over the events.props JSON column.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k_val")).as("k_sum"),
        davg(col("k_val"), 0).as("k_avg"))
      .orderBy("event_type")

  private val jsonExtractOracle =
    s"""SELECT event_type, count(*) AS n_events,
       |  CAST(sum(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS BIGINT) AS k_sum,
       |  ${oavg("CAST(json_extract_string(props, '" + "$" + ".k') AS INTEGER)", 0)} AS k_avg
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------- rollup
  /** ROLLUP hierarchy agg (SURVEY "Grouping sets/cube/rollup"). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity"), 2).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  private val rollupAggOracle =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n_items,
       |  ${osum("l_quantity", 2)} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- cube
  /** CUBE agg over orders dimensions. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  private val cubeAggOracle =
    s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       |  ${osum("o_totalprice", 2)} AS revenue
       |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // ---------------------------------------------------- conditional agg
  /** CASE-WHEN pivot-style conditional aggregation. */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"),
        dsum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0), 2)
          .as("rev_f"))
      .orderBy("o_orderpriority")

  private val conditionalAggOracle =
    s"""SELECT o_orderpriority,
       |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
       |  ${osum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END", 2)} AS rev_f
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------- scalar "subquery"
  /** Scalar aggregate reused as a filter (customers above global average
    * balance). Spark-first: the 1-row aggregate is broadcast and
    * cross-joined — no driver round-trip, still one scan of customer.
    */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val threshold = c.agg(davg(col("c_acctbal"), 2).as("avg_bal"))
    c.crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("avg_bal"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  private val scalarSubqueryOracle =
    s"""SELECT c_custkey, c_name, c_acctbal FROM customer
       |WHERE c_acctbal > (SELECT ${oavg("c_acctbal", 2)} FROM customer)
       |ORDER BY c_custkey""".stripMargin

  /** NOT IN's three-valued null semantics — the anti-join variant
    * `Dataset.join(..., "left_anti")` deliberately is NOT: one NULL in
    * the subquery poisons EVERY non-matching row (x NOT IN S is
    * UNKNOWN, never TRUE, when S contains NULL), while NOT EXISTS
    * ignores the null row entirely. The three counts pin all cases:
    * clean NOT IN = the true anti count, poisoned NOT IN = 0, poisoned
    * NOT EXISTS = the anti count again. Catalyst plans the single-key
    * NOT IN as a broadcast null-aware anti join (one pass, no
    * per-row subquery execution) — the plan shape that makes the
    * correct semantics affordable at 100 TB.
    */
  def joinNotIn(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("naaj_customer")
    t(spark, dir, "orders").createOrReplaceTempView("naaj_orders")
    spark.sql(s"""
      |WITH sub AS (
      |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
      |  FROM naaj_orders)
      |SELECT
      |  (SELECT count(*) FROM naaj_customer
      |   WHERE c_custkey NOT IN (SELECT o_custkey FROM naaj_orders)) AS n_not_in,
      |  (SELECT count(*) FROM naaj_customer
      |   WHERE c_custkey NOT IN (SELECT k FROM sub)) AS n_not_in_poisoned,
      |  (SELECT count(*) FROM naaj_customer c
      |   WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c.c_custkey)) AS n_not_exists_poisoned
      |""".stripMargin)
  }

  private val joinNotInOracle =
    """WITH sub AS (
      |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
      |  FROM orders)
      |SELECT
      |  (SELECT count(*) FROM customer
      |   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS n_not_in,
      |  (SELECT count(*) FROM customer
      |   WHERE c_custkey NOT IN (SELECT k FROM sub)) AS n_not_in_poisoned,
      |  (SELECT count(*) FROM customer c
      |   WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c.c_custkey)) AS n_not_exists_poisoned""".stripMargin

  // ------------------------------------------------- last-writer-wins
  /** The reference's upsert semantics (SURVEY R1): latest version per key
    * via row_number over (key ORDER BY version DESC) = 1 — exactly the
    * dedup the design doc prescribes for at-least-once replay
    * (reference docs/design.md:339-348). Here: latest event per user.
    */
  def lastWriterWins(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(desc("ts"), desc("event_id"))
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts"))
      .orderBy("user_id")
  }

  private val lastWriterWinsOracle =
    """SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ------------------------------------------------- approx distinct

  /** KMV sketch size (shared by [[approxDistinct]] and [[kmvDistinct]];
    * declared before both so the oracle-string vals see it initialized).
    */
  val KmvK = 256

  /** Approximate distinct over TWO key columns per group (SURVEY
    * "Distinct/approx" row). Built on the portable KMV estimator
    * ([[graft.functions.KmvSketchAgg]]) instead of Spark's native
    * HLL (`approx_count_distinct`): HLL's register layout is
    * engine-specific, so an HLL result can never value-gate against
    * DuckDB — KMV's sketch (k smallest portable hashes) and integer
    * estimate are bit-identical cross-engine, which turns the one
    * rows-only query in the suite into a real hash-gated one. Same
    * scale shape as HLL: partial sketches build map-side and merge
    * associatively, ≤ k longs per (group, column) cross the shuffle.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        graft.functions.KmvSketchAgg
          .kmvSketch(Dedup.phash(col("l_orderkey").cast("string")), KmvK).as("ko"),
        graft.functions.KmvSketchAgg
          .kmvSketch(Dedup.phash(col("l_partkey").cast("string")), KmvK).as("kp"))
      .select(col("l_returnflag"),
        col("ko.distinct_estimate").as("approx_orders"),
        col("kp.distinct_estimate").as("approx_parts"))
      .orderBy("l_returnflag")

  private val approxDistinctOracle = {
    def est(colSql: String, a: String) =
      s"""${a}_h AS (
         |  SELECT DISTINCT l_returnflag,
         |    ${graft.operators.Dedup.phashSql(colSql)} AS h
         |  FROM lineitem),
         |${a}_r AS (
         |  SELECT l_returnflag, h,
         |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
         |  FROM ${a}_h),
         |${a}_k AS (
         |  SELECT l_returnflag, count(*) AS n, max(h) AS hk
         |  FROM ${a}_r WHERE rn <= $KmvK GROUP BY 1)""".stripMargin
    def estimate(a: String) =
      s"CAST(CASE WHEN $a.n < $KmvK THEN $a.n ELSE ${(KmvK - 1).toLong * 4294967296L} // $a.hk END AS BIGINT)"
    s"""WITH ${est("CAST(l_orderkey AS VARCHAR)", "o")},
       |${est("CAST(l_partkey AS VARCHAR)", "p")}
       |SELECT o_k.l_returnflag,
       |  ${estimate("o_k")} AS approx_orders,
       |  ${estimate("p_k")} AS approx_parts
       |FROM o_k JOIN p_k USING (l_returnflag)
       |ORDER BY l_returnflag""".stripMargin
  }

  /** KMV (k-minimum-values) distinct sketch with a REAL value oracle:
    * the sketch is the [[KmvK]] smallest md5-derived 32-bit hashes per
    * group and the estimate is pure integer arithmetic
    * ((k-1)·2³² div h_k), so both engines materialize the identical
    * sketch and the identical estimate — unlike HLL, whose register
    * layout is engine-specific. This is the portable-sketch answer to
    * the one rows-only row in the suite.
    *
    * Runs through the native Catalyst aggregate
    * ([[graft.functions.KmvSketchAgg]], a `TypedImperativeAggregate`):
    * partial sketches build map-side and merge associatively, so the
    * shuffle carries ≤ k longs per group instead of every distinct
    * hash — the windowed SQL formulation the DuckDB oracle runs is the
    * same math with the generic operators.
    */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(graft.functions.KmvSketchAgg
        .kmvSketch(Dedup.phash(col("l_orderkey").cast("string")), KmvK).as("kmv"))
      .select(col("l_returnflag"),
        col("kmv.distinct_estimate").as("distinct_estimate"),
        col("kmv.sketch_size").as("sketch_size"))
      .orderBy("l_returnflag")

  private val kmvDistinctOracle =
    s"""WITH h AS (
       |  SELECT DISTINCT l_returnflag,
       |    ${graft.operators.Dedup.phashSql("CAST(l_orderkey AS VARCHAR)")} AS h
       |  FROM lineitem),
       |r AS (
       |  SELECT l_returnflag, h,
       |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
       |  FROM h),
       |k AS (
       |  SELECT l_returnflag, count(*) AS n, max(h) AS hk
       |  FROM r WHERE rn <= ${Relational.KmvK} GROUP BY 1)
       |SELECT l_returnflag,
       |  CAST(CASE WHEN n < ${Relational.KmvK} THEN n
       |       ELSE ${(Relational.KmvK - 1).toLong * 4294967296L} // hk END AS BIGINT)
       |    AS distinct_estimate,
       |  CAST(n AS BIGINT) AS sketch_size
       |FROM k ORDER BY l_returnflag""".stripMargin

  /** KMV sketch ALGEBRA — what a mergeable sketch exists for: the
    * per-source vocabulary sketches (built once by the native
    * [[graft.functions.KmvSketchAgg]], ≤ k longs each through the
    * shuffle) are COMBINED pairwise to estimate union cardinality,
    * Jaccard similarity, and intersection cardinality of any two
    * sources' vocabularies — without ever joining the underlying
    * corpora. Union sketch = k smallest of the merged minima; the
    * union's sample that appears in BOTH input sketches estimates
    * Jaccard (the classic KMV estimator); intersection =
    * J × union-estimate in pure integer arithmetic.
    *
    * Scale: one corpus scan builds S sketches (S = #segments/sources);
    * the pairwise combine touches S² sketch ROWS of k longs — at 100 TB
    * the corpora never move, only the sketches do (the same reason
    * engines persist theta/KMV sketches per partition and merge at
    * query time). Every estimate is integer/array arithmetic on the
    * portable hash, so the oracle reproduces it bit-for-bit.
    */
  def kmvSetAlgebra(spark: SparkSession, dir: String): DataFrame =
    kmvCombine(SketchIndex.sketches(spark, dir))

  private[operators] def kmvSetAlgebraOn(docs: DataFrame): DataFrame =
    kmvCombine(SketchIndex.sketchOf(docs))

  /** Pairwise sketch combine over `sk(source, vals)` rows — the
    * query-time half; the sketches themselves come from the persisted
    * ingest-time [[SketchIndex]] (or an inline twin in specs).
    */
  private[operators] def kmvCombine(sk: DataFrame): DataFrame = {
    val unionEstLit = (KmvK - 1).toLong * graft.functions.KmvSketchAgg.HashDomain
    sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .withColumn("uni", slice(array_sort(array_union(col("a.vals"), col("b.vals"))), 1, KmvK))
      .withColumn("ku", size(col("uni")).cast("long"))
      .withColumn("kth", element_at(col("uni"), size(col("uni"))))
      .withColumn("union_estimate",
        when(col("ku") < KmvK, col("ku")).otherwise(expr(s"${unionEstLit}L DIV kth")))
      .withColumn("inter_sample",
        size(filter(col("uni"), h =>
          array_contains(col("a.vals"), h) && array_contains(col("b.vals"), h)))
          .cast("long"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("ku").as("union_sketch_size"), col("union_estimate"), col("inter_sample"),
        round(col("inter_sample").cast("double") / col("ku"), 12).as("jaccard_est"),
        expr("inter_sample * union_estimate DIV ku").as("intersection_estimate"))
      .orderBy("source_a", "source_b")
  }

  private val kmvSetAlgebraOracle = {
    val unionEstLit = (KmvK - 1).toLong * graft.functions.KmvSketchAgg.HashDomain
    val unionEstSql = s"CASE WHEN ku < $KmvK THEN ku ELSE $unionEstLit // kth END"
    s"""WITH wrds AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
       |h AS (
       |  SELECT DISTINCT source, ${graft.operators.Dedup.phashSql("w")} AS h
       |  FROM wrds WHERE len(w) > 0),
       |r AS (
       |  SELECT source, h,
       |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |  FROM h),
       |sk AS (SELECT source, h FROM r WHERE rn <= $KmvK),
       |srcs AS (SELECT DISTINCT source FROM sk),
       |pr AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |uh AS (
       |  SELECT pr.sa, pr.sb, s.h FROM pr JOIN sk s ON s.source = pr.sa
       |  UNION
       |  SELECT pr.sa, pr.sb, s.h FROM pr JOIN sk s ON s.source = pr.sb),
       |ur AS (
       |  SELECT sa, sb, h,
       |    row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
       |  FROM uh),
       |uk AS (SELECT sa, sb, h FROM ur WHERE rn <= $KmvK),
       |ust AS (SELECT sa, sb, count(*) AS ku, max(h) AS kth FROM uk GROUP BY 1, 2),
       |inter AS (
       |  SELECT u.sa, u.sb, count(*) AS inter_sample
       |  FROM uk u
       |  JOIN sk x ON x.source = u.sa AND x.h = u.h
       |  JOIN sk y ON y.source = u.sb AND y.h = u.h
       |  GROUP BY 1, 2)
       |SELECT sa AS source_a, sb AS source_b,
       |  CAST(ku AS BIGINT) AS union_sketch_size,
       |  CAST($unionEstSql AS BIGINT) AS union_estimate,
       |  CAST(coalesce(inter_sample, 0) AS BIGINT) AS inter_sample,
       |  round(CAST(coalesce(inter_sample, 0) AS DOUBLE) / ku, 12) AS jaccard_est,
       |  CAST(coalesce(inter_sample, 0) * ($unionEstSql) // ku AS BIGINT)
       |    AS intersection_estimate
       |FROM ust LEFT JOIN inter USING (sa, sb)
       |ORDER BY source_a, source_b""".stripMargin
  }

  // ---------------------------------------- native top-k-per-group

  /** Top-3 orders by price per priority through the CUSTOM whole-stage
    * operator ([[graft.plans.TopKPerGroup]]: logical node → planner
    * strategy → partial/final bounded-heap physical plan). Shuffles at
    * most k·groups rows per input partition and never sorts — the
    * `row_number` window twin (the oracle) shuffles and sorts every
    * row. The (price desc, orderkey asc) order is total, so both
    * formulations select the identical row set.
    */
  def topkPerGroupNative(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    graft.plans.TopKPerGroup(
        o, Seq("o_orderpriority"), Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
      .orderBy("o_orderpriority", "o_orderkey")
  }

  private val topkPerGroupNativeOracle =
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_orderpriority, o_orderkey""".stripMargin

  // ---------------------------------------------------------- registry

  // ----------------------------------------------- co-occurrence pairs

  /** Top co-purchased part pairs (the market-basket / recommender
    * primitive): a SELF-join of lineitem on its order key pairs items
    * of the same basket — bounded per order by basket width, so pair
    * volume is Σ|basket|², never |lineitem|² — then one hash-agg on
    * the (a, b) pair and a TakeOrdered top-20 (per-partition top-k +
    * driver merge, no global sort). The `a < b` canonical ordering
    * counts each unordered pair once.
    */
  def copurchasePairs(spark: SparkSession, dir: String): DataFrame =
    // the canonical u < v slice of the persisted co-purchase graph
    // ([[EdgeIndex]]) IS the weighted pair table — the query is a
    // filter + TakeOrdered over the index, no lineitem self-join
    EdgeIndex.edges(spark, dir).filter(col("u") < col("v"))
      .select(col("u").as("part_a"), col("v").as("part_b"), col("w").as("cnt"))
      .orderBy(desc("cnt"), asc("part_a"), asc("part_b"))
      .limit(20)

  private val copurchasePairsOracle =
    """SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS cnt
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2
      |ORDER BY cnt DESC, part_a, part_b LIMIT 20""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("copurchase_pairs", copurchasePairs _, Some(copurchasePairsOracle),
      "market-basket co-occurrence: basket-bounded self-join + top-20 pair counts"),
    GraftQuery("agg_pricing_summary", aggPricingSummary _, Some(aggPricingSummaryOracle),
      "TPC-H Q1-shape wide hash aggregation"),
    GraftQuery("filter_agg_revenue", filterRevenue _, Some(filterRevenueOracle),
      "selective filter pushdown + global agg (Q6 shape)"),
    GraftQuery("join_broadcast_dim", joinBroadcastDim _, Some(joinBroadcastDimOracle),
      "fact ⋈ broadcast dim + agg"),
    GraftQuery("join_shipping_priority", joinShippingPriority _, Some(joinShippingPriorityOracle),
      "3-way join + agg + top-k (Q3 shape)"),
    GraftQuery("join_semi", joinSemi _, Some(joinSemiOracle), "left-semi (EXISTS)"),
    GraftQuery("join_anti", joinAnti _, Some(joinAntiOracle), "left-anti (NOT EXISTS / MoR delete)"),
    GraftQuery("join_full_outer", joinFullOuter _, Some(joinFullOuterOracle),
      "full outer reconciliation join: pre-aggregated order side, unmatched rows both ways"),
    GraftQuery("window_topk_per_group", windowTopkPerGroup _, Some(windowTopkPerGroupOracle),
      "row_number top-k per group"),
    GraftQuery("window_lag_lead", windowLag _, Some(windowLagOracle), "lag/lead offsets"),
    GraftQuery("window_running_sum", windowRunningSum _, Some(windowRunningSumOracle),
      "cumulative sum per key"),
    GraftQuery("distinct_count", distinctCount _, Some(distinctCountOracle),
      "multi count(distinct) per group"),
    GraftQuery("set_ops", setOps _, Some(setOpsOracle), "INTERSECT/EXCEPT tagged union"),
    GraftQuery("sort_limit_global", sortLimitGlobal _, Some(sortLimitGlobalOracle),
      "global top-k (TakeOrderedAndProject)"),
    GraftQuery("string_funcs", stringFuncs _, Some(stringFuncsOracle), "string function surface"),
    GraftQuery("date_funcs", dateFuncs _, Some(dateFuncsOracle), "date/time + partition transforms"),
    GraftQuery("json_extract", jsonExtract _, Some(jsonExtractOracle), "JSON field extraction + agg"),
    GraftQuery("rollup_agg", rollupAgg _, Some(rollupAggOracle), "ROLLUP"),
    GraftQuery("cube_agg", cubeAgg _, Some(cubeAggOracle), "CUBE"),
    GraftQuery("conditional_agg", conditionalAgg _, Some(conditionalAggOracle),
      "CASE-WHEN pivot aggregation"),
    GraftQuery("join_not_in", joinNotIn _, Some(joinNotInOracle),
      "NOT IN three-valued null semantics as a broadcast null-aware anti join, vs NOT EXISTS"),
    GraftQuery("scalar_subquery", scalarSubquery _, Some(scalarSubqueryOracle),
      "scalar aggregate as broadcast filter"),
    GraftQuery("last_writer_wins", lastWriterWins _, Some(lastWriterWinsOracle),
      "upsert/dedup semantics (reference R1/R4)"),
    GraftQuery("approx_distinct", approxDistinct _, Some(approxDistinctOracle),
      "two-column approximate distinct per group (portable KMV estimate)"),
    GraftQuery("kmv_distinct", kmvDistinct _, Some(kmvDistinctOracle),
      "KMV distinct sketch (portable: identical sketch + integer estimate cross-engine)"),
    GraftQuery("kmv_set_algebra", kmvSetAlgebra _, Some(kmvSetAlgebraOracle),
      "sketch algebra: pairwise union/Jaccard/intersection estimates from merged per-source KMV sketches"),
    GraftQuery("topk_per_group_native", topkPerGroupNative _, Some(topkPerGroupNativeOracle),
      "custom LogicalPlan+Strategy+SparkPlan bounded-heap top-k (partial/final, no sort)")
  )
}
