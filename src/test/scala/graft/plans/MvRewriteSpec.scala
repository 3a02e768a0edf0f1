package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Transparent MV rewrite (graft.plans.MvRewrite): the rule answers a
  * subsumed fact aggregate from the rollup (fact scan ABSENT from the
  * optimized plan, values identical to the direct computation), and
  * DECLINES — leaving the fact plan untouched — for every shape the
  * partials cannot derive: filters below the aggregate, distinct
  * aggregates, non-registered aggregate arguments, non-subset groups.
  */
class MvRewriteSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def fact = graft.operators.SyncQueries.mvRewriteFact(spark, dir)

  private lazy val registered: Unit = {
    val mvDir = graft.util.Scratch.dir("mv-spec")
    val partials = Seq(
      sum(col("qty_cents")).as("sum_qty_cents"),
      sum(col("price_cents")).as("sum_price_cents"),
      count(lit(1)).as("n_rows"),
      max(col("price_cents")).as("max_price_cents"))
    fact.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(partials.head, partials.tail: _*)
      .write.mode("overwrite").parquet(s"$mvDir/mv")
    MvRewrite.register(spark, "spec_mv", fact,
      Seq("l_returnflag", "l_linestatus"),
      partials, spark.read.parquet(s"$mvDir/mv"))
  }

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("subsumed aggregate is answered from the MV, bit-identical to the fact computation") {
    registered
    val q = fact.groupBy(col("l_returnflag"))
      .agg(sum(col("qty_cents")).as("sq"), count(lit(1)).as("n"),
        max(col("price_cents")).as("mx"))
      .orderBy("l_returnflag")
    val plan = optimized(q)
    // the fact Relation prints all lineitem columns; the MV relation
    // prints the partial columns — presence/absence is the detector
    assert(!plan.contains("l_orderkey"), s"fact scan survived the rewrite:\n$plan")
    assert(plan.contains("sum_qty_cents"), s"MV relation absent:\n$plan")
    // ground truth from the fact table WITHOUT the rule's help: distinct
    // aggregates always decline, so max(qty) forces the fact path — use
    // a fresh plain aggregate on a throwaway session-independent frame
    val direct = graft.Tables.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(floor(col("l_quantity") * 100).cast("long")).as("sq"),
        count(lit(1)).as("n"),
        max(floor(col("l_extendedprice") * 100).cast("long")).as("mx"))
      .orderBy("l_returnflag")
    assert(q.collect().toSeq == direct.collect().toSeq)
  }

  test("full-group query (groups == MV groups) also rewrites") {
    registered
    val q = fact.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("price_cents")).as("sp"))
    assert(!optimized(q).contains("l_orderkey"))
  }

  test("global aggregate (no groups) rewrites to an MV fold") {
    registered
    val q = fact.agg(sum(col("qty_cents")).as("sq"), count(lit(1)).as("n"))
    val plan = optimized(q)
    assert(!plan.contains("l_orderkey"), plan)
    val direct = graft.Tables.t(spark, dir, "lineitem")
      .agg(sum(floor(col("l_quantity") * 100).cast("long")).as("sq"),
        count(lit(1)).as("n"))
    assert(q.collect().toSeq == direct.collect().toSeq)
  }

  test("declines: filter below the aggregate") {
    registered
    val q = fact.filter(col("l_returnflag") === "R").groupBy(col("l_linestatus"))
      .agg(sum(col("qty_cents")).as("sq"))
    assert(optimized(q).contains("l_orderkey"), "filtered agg must not rewrite")
  }

  test("declines: distinct aggregate") {
    registered
    val q = fact.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("qty_cents")).as("nd"))
    assert(optimized(q).contains("l_orderkey"), "distinct agg must not rewrite")
  }

  test("declines: aggregate argument the partials do not store") {
    registered
    val q = fact.groupBy(col("l_returnflag"))
      .agg(sum(col("qty_cents") + col("price_cents")).as("s2"))
    assert(optimized(q).contains("l_orderkey"), "underivable sum must not rewrite")
  }

  test("declines: group outside the MV's group set") {
    registered
    val q = fact.groupBy(col("qty_cents")).agg(count(lit(1)).as("n"))
    assert(optimized(q).contains("l_orderkey"), "non-subset group must not rewrite")
  }

  test("min over a stored max-only column declines; stored kinds must match") {
    registered
    val q = fact.groupBy(col("l_returnflag")).agg(min(col("price_cents")).as("mn"))
    assert(optimized(q).contains("l_orderkey"), "min has no registered partial")
  }
}
