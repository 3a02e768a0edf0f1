package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Native vector kernels: values, codegen/interpreted agreement with
  * the HOF formulation, null handling, and the SQL registration path.
  */
class VecExpressionsSpec extends AnyFunSuite with SparkFixture {

  import VecExpressions._

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.5f, -1.5f, 2.5f), Array(-2.0f, 0.25f, 8.0f)),
      (3L, null.asInstanceOf[Array[Float]], Array(1.0f, 1.0f, 1.0f)))
      .toDF("id", "a", "b")
  }

  test("floatDot / floatNormSq values and null propagation") {
    val rows = df.select(col("id"), floatDot(col("a"), col("b")).as("dot"),
      floatNormSq(col("b")).as("nsq")).orderBy("id").collect()
    assert(rows(0).getDouble(1) == 1.0 * 4 + 2 * 5 + 3 * 6)
    assert(rows(0).getDouble(2) == 16.0 + 25 + 36)
    assert(rows(1).getDouble(1) == 0.5 * -2.0 + -1.5 * 0.25 + 2.5 * 8.0)
    assert(rows(2).isNullAt(1)) // null input → null out
  }

  test("kernel agrees bit-exactly with the zip_with/aggregate double fold") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val mismatches = e.select(
      floatDot(col("embedding"), col("embedding")).as("native"), hof.as("interp"))
      .filter(col("native") =!= col("interp")).count()
    assert(mismatches == 0)
  }

  test("SQL registration: float_dot / float_norm_sq callable from spark.sql") {
    registerSql(spark)
    val r = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "float_norm_sq(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n")
      .collect().head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 25.0)
  }

  test("type check rejects non-float arrays instead of silently misreading bytes") {
    registerSql(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT float_dot(array(1.0, 2.0), array(3.0, 4.0))").collect()
    }
    assert(e.getMessage.contains("array<float>"))
  }

  test("null elements poison the result, matching the zip_with formulation") {
    import spark.implicits._
    val df = Seq((Array[java.lang.Float](1.0f, null, 3.0f), Array[java.lang.Float](1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
    val r = df.select(floatDot(col("a"), col("b")).as("d"), floatNormSq(col("a")).as("n")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("extension class exposes the same builders") {
    assert(GraftExtensions.functions.map(_._1.funcName).toSet ==
      Set("float_dot", "float_norm_sq", "kmv_sketch", "misra_gries", "bloom_build"))
    val dot = GraftExtensions.functions.find(_._1.funcName == "float_dot").get._3
    val expr = dot(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0f, 2.0f)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(2.0f, 3.0f))))
    assert(expr.eval(null) == 8.0)
  }
}
