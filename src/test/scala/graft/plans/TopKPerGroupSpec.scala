package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Custom bounded-heap top-k operator: agreement with the row_number
  * window formulation (including nulls and ties), plan shape (partial +
  * final around one exchange), and edge cases (groups smaller than k,
  * k = 1).
  */
class TopKPerGroupSpec extends AnyFunSuite with SparkFixture {

  test("matches the row_number window formulation on real data") {
    val dir = "/root/testdata/sf0.001"
    val native = graft.operators.Relational.topkPerGroupNative(spark, dir)
      .collect().map(_.toSeq).toSeq
    val o = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val windowed = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy("o_orderpriority", "o_orderkey")
      .collect().map(_.toSeq).toSeq
    assert(native == windowed)
  }

  test("plans as partial + final heap passes with the shuffle between them") {
    import spark.implicits._
    val d = (1 to 100).map(i => (i % 5, i)).toDF("g", "v")
    val p = TopKPerGroup(d, Seq("g"), Seq(("v", true)), 3)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("TopKPerGroup (partial)"))
    assert(p.contains("TopKPerGroup (final)"))
    assert(p.contains("Exchange"))
  }

  test("groups smaller than k pass through whole; k=1 picks the single best") {
    import spark.implicits._
    val d = Seq((1, 10), (1, 20), (2, 5)).toDF("g", "v").repartition(4)
    val top2 = TopKPerGroup(d, Seq("g"), Seq(("v", true)), 2)
      .orderBy("g", "v").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(top2 == Seq((1, 10), (1, 20), (2, 5)))
    val top1 = TopKPerGroup(d, Seq("g"), Seq(("v", true)), 1)
      .orderBy("g").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(top1 == Seq((1, 20), (2, 5)))
  }

  test("float group keys canonicalize -0.0/0.0 like the window formulation") {
    import spark.implicits._
    val d = Seq((0.0d, 1), (-0.0d, 2), (1.5d, 3)).toDF("g", "v").repartition(3)
    val native = TopKPerGroup(d, Seq("g"), Seq(("v", true)), 5)
      .select(col("v")).orderBy("v").collect().map(_.getInt(0)).toSeq
    assert(native == Seq(1, 2, 3)) // both zeros land in ONE group of two rows
    val groups = TopKPerGroup(d, Seq("g"), Seq(("v", true)), 1).count()
    assert(groups == 2) // {0.0,-0.0} merged, {1.5} — k=1 keeps one row each
  }

  test("empty input yields empty output (no per-partition state leaks)") {
    import spark.implicits._
    val d = Seq.empty[(Int, Int)].toDF("g", "v").repartition(3)
    assert(TopKPerGroup(d, Seq("g"), Seq(("v", true)), 3).count() == 0)
  }

  test("null order values follow the same default null ordering as the window twin") {
    import spark.implicits._
    val d = Seq((1, Some(3)), (1, None), (1, Some(7)), (2, None), (2, Some(1)))
      .toDF("g", "v").repartition(3)
    val native = TopKPerGroup(d, Seq("g"), Seq(("v", false)), 2)
      .orderBy("g", "v").collect().map(_.toSeq).toSeq
    val w = Window.partitionBy("g").orderBy(asc("v"))
    val windowed = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn").orderBy("g", "v")
      .collect().map(_.toSeq).toSeq
    assert(native == windowed)
  }
}
