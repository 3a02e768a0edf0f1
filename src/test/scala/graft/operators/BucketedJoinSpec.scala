package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Co-located join via bucketing (SURVEY §2.4 join family / the
  * "pre-partitioning for co-located joins" scale lever): two tables
  * bucketed on the join key join WITHOUT a shuffle exchange on either
  * side — at 100 TB this is the difference between a full-network
  * shuffle of the fact table per join and none.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkFixture {

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val wh = Files.createTempDirectory("bucket-wh") // tables take explicit paths
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    // bucket-aligned join + agg on the bucket key: zero shuffles
    assert(shuffles.isEmpty, s"expected no shuffle, got:\n$plan")

    // and the result matches the plain (shuffled) join
    val expected = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
    assert(joined.orderBy("o_orderkey").collect().toSeq ==
      expected.orderBy("o_orderkey").collect().toSeq)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
