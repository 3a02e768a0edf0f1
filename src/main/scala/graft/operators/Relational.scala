package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** General relational operator surface (SURVEY.md §2.4): aggregations,
  * joins (broadcast/shuffle, semi/anti), windows, sorts, limits, set ops,
  * string/date/JSON functions — expressed DataFrame-first so Catalyst
  * handles pushdown, pruning, partial aggregation and join selection.
  *
  * Cross-engine determinism rule: any aggregate over a floating-point
  * column goes through exact decimal arithmetic (associative, so the
  * result is independent of Spark's partitioning) and is cast back to
  * double at the end. DuckDB oracles use the same construction, giving
  * bit-identical hashes.
  */
object Relational {

  /** sum(double) made partitioning-independent: exact decimal sum, then
    * one deterministic decimal→double conversion.
    */
  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(27,$scale)")).cast("double")

  private def davg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(s"decimal(27,$scale)")).cast("double") / count(c))

  /** Q1-style pricing summary: wide hash aggregation with partial/final
    * (map-side combine) for free; deterministic decimal sums.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
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

  def q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
