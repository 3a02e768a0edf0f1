package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Scale behavior of the 2-pass quantile selection (VERDICT r10 #1):
  * the driver-collected sample must be bounded by a constant target
  * independent of n, and every degenerate path (empty sample,
  * duplicate-heavy window, tiny input) must still return the exact
  * order statistic.
  */
class QuantileSelectSpec extends AnyFunSuite with SparkFixture {

  private def synth(n: Long) = {
    import spark.implicits._
    spark.range(n)
      .select((col("id") * 2 + 1).cast("double").as("x"),
        concat(lit("r"), col("id")).as("rk"))
  }

  private def exactDisc(n: Long, q: Double): Double = {
    val r = math.max(1L, math.ceil(q * n).toLong)
    (r - 1) * 2 + 1 // r-th smallest of {1,3,5,...}
  }

  test("sample modulus bounds the expected sample by a constant for any n") {
    val target = RelationalExt.QuantileSampleTarget
    // from sf0.01 row counts up to 100 TB-scale row counts: expected
    // sample n/modulus never exceeds ~target (the r10 2% fraction gave
    // 2e10 at n=1e12 — a driver OOM)
    Seq(60000L, 600000L, 5000000L, 1000000000L, 1000000000000L, 1000000000000000L)
      .foreach { n =>
        val m = RelationalExt.quantileSampleModulus(n)
        val expected = n / m
        assert(expected <= target, s"n=$n expected sample $expected > $target")
      }
    assert(RelationalExt.quantileSampleModulus(1000000000000L) === 10000000L)
  }

  test("driver sample size plateaus across a 10x input growth past the knee") {
    val qs = Seq(0.5, 0.9)
    val small = 2000000L // modulus floor regime: sample ~ n/50 = 40k
    RelationalExt.quantileSelectOn(spark, synth(small), qs).collect()
    val sSmall = RelationalExt.lastQuantileSampleSize
    val big = 20000000L // 10x, past the knee: modulus 200, sample ~ 100k
    val res = RelationalExt.quantileSelectOn(spark, synth(big), qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sBig = RelationalExt.lastQuantileSampleSize
    val cap = RelationalExt.QuantileSampleTarget * 2
    assert(sSmall > 0 && sSmall <= cap, s"small sample $sSmall")
    assert(sBig > 0 && sBig <= cap, s"big sample $sBig")
    // 10x the rows, sample grew ~2.5x to the plateau — NOT 10x
    assert(sBig < sSmall * 4, s"sample grew linearly with n: $sSmall -> $sBig")
    qs.foreach { q => assert(res(q) === exactDisc(big, q)) }
  }

  test("tiny input (sample likely empty) still exact via bisection") {
    val qs = Seq(0.5, 0.99)
    val res = RelationalExt.quantileSelectOn(spark, synth(7L), qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    qs.foreach { q => assert(res(q) === exactDisc(7L, q)) }
  }

  test("duplicate-heavy input reroutes an over-cap window to bisection, stays exact") {
    import spark.implicits._
    // 100k rows, 99% identical value: the bracket window around the
    // median IS ~corpus-sized. With the cap shrunk below it, the
    // counted guard must reroute to bisection instead of collecting
    // the whole corpus — and the answer must still be exact.
    val n = 100000L
    val df = spark.range(n)
      .select(when(col("id") % 100 === 0, col("id").cast("double"))
        .otherwise(lit(42.0)).as("x"),
        concat(lit("d"), col("id")).as("rk"))
    val prevCap = RelationalExt.QuantileWindowCap
    try {
      RelationalExt.QuantileWindowCap = 1000L
      val res = RelationalExt.quantileSelectOn(spark, df, Seq(0.5))
        .collect().head.getDouble(1)
      assert(res === 42.0)
    } finally RelationalExt.QuantileWindowCap = prevCap
    val bis = RelationalExt.selectByBisection(
      df.select(col("x")), math.ceil(0.5 * n).toLong)
    assert(bis === 42.0)
  }

  test("bisection selects exact ranks incl. extremes") {
    val df = synth(999L).select(col("x"))
    assert(RelationalExt.selectByBisection(df, 1L) === 1.0)
    assert(RelationalExt.selectByBisection(df, 999L) === 1997.0)
    assert(RelationalExt.selectByBisection(df, 500L) === 999.0)
  }

  test("grouped selection matches per-group sort-based quantile_disc") {
    import spark.implicits._
    val n = 30000L
    val df = spark.range(n).select(
      concat(lit("g"), pmod(col("id"), lit(3))).as("g"),
      (col("id") * 7 % 10007).cast("double").as("x"),
      concat(lit("k"), col("id")).as("rk"))
    val qs = Seq(0.5, 0.9)
    val got = RelationalExt.quantileSelectGroupedOn(spark, df, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // oracle: exact per-group sort
    val byG = df.select(col("g"), col("x")).collect()
      .groupBy(_.getString(0)).map { case (g, rows) => g -> rows.map(_.getDouble(1)).sorted }
    byG.foreach { case (g, xs) =>
      qs.foreach { q =>
        val r = math.max(1L, math.ceil(q * xs.length).toLong)
        assert(got((g, q)) === xs((r - 1).toInt), s"group $g q=$q")
      }
    }
  }
}
