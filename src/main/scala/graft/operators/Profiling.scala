package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables.t

/** Data-quality profiling — the first thing an engineer runs against a
  * new 100 TB table, and the recurring health check a pipeline runs on
  * every ingest batch: per-column cardinality/null profile and
  * statistical outlier detection.
  *
  * Scale notes:
  *   - [[profileColumns]] is ONE scan: each row explodes into C
  *     (column, stringified value) pairs and a single two-phase
  *     hash-agg chain computes every column's profile together —
  *     shuffle volume is the distinct-value count, the same cost
  *     Spark's own multi-`countDistinct` Expand rewrite pays, but
  *     with C driven by data, not by a fixed agg list. Distinct/null
  *     counts are rendering-independent (stringification is injective
  *     per engine and the strings never cross engines), which is what
  *     makes the oracle comparable for double/timestamp columns too.
  *   - [[outlierOrders]] derives mean and variance from exact decimal
  *     sums (sum x, sum x² — both map-side partial-aggregated), so the
  *     z-scores are bit-identical cross-engine: a pruned stats pass,
  *     one broadcast 1-row stats join, then a scan-local filter pass —
  *     the minimal two-pass shape of global z-scoring; no sort until
  *     the tiny outlier set.
  */
object Profiling {

  // ------------------------------------------------ column profiling

  val ProfiledColumns: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate")

  /** Per-column profile of `lineitem` — row count, null count, exact
    * distinct count — computed for all columns in one pass via an
    * unpivot (explode of (name, value) structs) + hash aggregation.
    */
  def profileColumns(spark: SparkSession, dir: String): DataFrame = {
    val pairs = t(spark, dir, "lineitem")
      .select(explode(array(ProfiledColumns.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
    pairs.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("v"))).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"))
      .orderBy("col_name")
  }

  private val profileColumnsOracle: String =
    ProfiledColumns.sorted.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  // ---------------------------------------------- z-score outliers

  /** The fixture's prices are uniform, which bounds |z| at √3 ≈ 1.732
    * — a textbook 3σ cut would be vacuously empty on ANY scale factor,
    * so the dial sits just inside the bound and flags the ~2% tails.
    */
  val ZThreshold = 1.7

  /** Orders whose total price is a > [[ZThreshold]]σ outlier. Mean and
    * variance come
    * from exact decimal Σx and Σx² (single IEEE division each), and
    * each z-score is one subtraction + one division of those exact
    * quantities — deterministic cross-engine, no libm beyond sqrt
    * (IEEE-754 correctly rounded in both engines). Global z-scoring is
    * inherently two-pass — a pruned stats scan, then a scan-local
    * filter against the broadcast 1-row stats — and both passes read
    * only the two needed columns.
    */
  def outlierOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    // (19,4) operands: Spark's product type under allowPrecisionLoss
    // is decimal(38,7) (scale 8 exceeds the 38-digit budget, so the
    // exact product is HALF_UP-rounded at scale 7); the oracle CASTs
    // its exact decimal(38,8) product to (38,7) so both engines round
    // identically even if a future fixture carries >2-decimal prices.
    // Precision 19 also forces DuckDB's int128 decimal path.
    val stats = o.agg(
      count(lit(1)).as("n"),
      sum(col("o_totalprice").cast("decimal(19,4)")).as("s1"),
      sum(col("o_totalprice").cast("decimal(19,4)") *
        col("o_totalprice").cast("decimal(19,4)")).as("s2"))
      .select(
        (col("s1").cast("double") / col("n")).as("mean"),
        sqrt(col("s2").cast("double") / col("n") -
          (col("s1").cast("double") / col("n")) * (col("s1").cast("double") / col("n")))
          .as("std"))
    o.crossJoin(broadcast(stats))
      .select(col("o_orderkey"), col("o_totalprice"),
        round((col("o_totalprice") - col("mean")) / col("std"), 12).as("z"))
      .filter(abs(col("z")) > ZThreshold)
      .orderBy("o_orderkey")
  }

  private val outlierOrdersOracle: String =
    s"""WITH stats AS (
       |  SELECT count(*) AS n,
       |    sum(CAST(o_totalprice AS DECIMAL(19,4))) AS s1,
       |    sum(CAST(CAST(o_totalprice AS DECIMAL(19,4)) *
       |             CAST(o_totalprice AS DECIMAL(19,4)) AS DECIMAL(38,7))) AS s2
       |  FROM orders),
       |ms AS (
       |  SELECT CAST(s1 AS DOUBLE) / n AS mean,
       |    sqrt(CAST(s2 AS DOUBLE) / n -
       |      (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS std
       |  FROM stats)
       |SELECT o_orderkey, o_totalprice,
       |  round((o_totalprice - mean) / std, 12) AS z
       |FROM orders CROSS JOIN ms
       |WHERE abs(round((o_totalprice - mean) / std, 12)) > $ZThreshold
       |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------- registry

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("profile_columns", profileColumns _, Some(profileColumnsOracle),
      "one-pass per-column profile of lineitem (rows / nulls / exact distinct)"),
    GraftQuery("outlier_orders", outlierOrders _, Some(outlierOrdersOracle),
      "z-score price outliers from exact-decimal mean/variance"))
}
