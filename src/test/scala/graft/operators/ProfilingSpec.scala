package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, SparkEntry}

/** Profiling operators: the one-pass claim of the column profiler and
  * the non-vacuous outlier dial are scale properties, not value
  * properties — the oracle gate can't see them, so they're pinned here.
  */
class ProfilingSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("profile_columns covers every listed column in ONE table scan") {
    val df = SparkEntry.queries("profile_columns")(spark, dir)
    // string count, not collect: AQE hides the subtree from collect()
    val pe = df.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(pe).size
    assert(scans == 1, s"expected 1 lineitem scan, got $scans:\n$pe")

    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Profiling.ProfiledColumns.sorted)
    // lineitem fixture has no nulls; distinct counts must be positive
    // and bounded by the row count
    rows.foreach { r =>
      val (n, nulls, distinct) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nulls == 0L)
      assert(distinct >= 1L && distinct <= n)
    }
    // flag columns really are low-cardinality; keys are high
    val byName = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byName("l_returnflag") <= 5L)
    assert(byName("l_orderkey") > 100L)
  }

  test("outlier_orders flags a small non-empty tail with |z| in (1.7, sqrt(3)]") {
    val df = SparkEntry.queries("outlier_orders")(spark, dir)
    val n = graft.Tables.t(spark, dir, "orders").count()
    val rows = df.collect()
    assert(rows.nonEmpty, "uniform-price fixture must flag the ~2% tails")
    assert(rows.length < n / 10, s"dial too loose: ${rows.length} of $n flagged")
    rows.foreach { r =>
      val z = math.abs(r.getDouble(2))
      assert(z > Profiling.ZThreshold && z < 1.7321)
    }
  }

  test("profile_correlations matches Spark's built-in corr within rounding; |r| <= 1") {
    val rows = SparkEntry.queries("profile_correlations")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(rows.size == Profiling.CorrColumns.length * (Profiling.CorrColumns.length - 1) / 2)
    val li = graft.Tables.t(spark, dir, "lineitem")
    rows.foreach { case ((a, b), r) =>
      assert(math.abs(r) <= 1.0 + 1e-12)
      val ref = li.agg(org.apache.spark.sql.functions.corr(a, b)).collect()(0).getDouble(0)
      assert(math.abs(r - ref) < 1e-6, s"$a/$b: exact-decimal $r vs built-in $ref")
    }
  }

  test("regress_price matches Spark's built-in covariance/variance within rounding; r2 in [0, 1]") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = Profiling.regressPrice(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.nonEmpty)
    val ref = graft.Tables.t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(covar_pop(col("l_quantity"), col("l_extendedprice")).as("cov"),
        var_pop(col("l_quantity")).as("vx"),
        avg(col("l_quantity")).as("mx"), avg(col("l_extendedprice")).as("my"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1) / r.getDouble(2),
        r.getDouble(4) - r.getDouble(1) / r.getDouble(2) * r.getDouble(3)))).toMap
    out.foreach { case (g, (slope, intercept, r2)) =>
      assert(math.abs(slope - ref(g)._1) < 1e-6, s"$g slope")
      assert(math.abs(intercept - ref(g)._2) < 1e-3, s"$g intercept")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12)
    }
  }

  test("FD discovery: sub-k screen is exact, so screened ⇔ the true FD and verification always confirms") {
    import spark.implicits._
    // planted dependencies over the five screened columns:
    //   o_custkey unique        → determines everything
    //   status ↔ priority       bijection (both directions hold)
    //   priority → prio_class   holds (p1,p2 → q1; p3 → q2); reverse fails
    //   o_year constant         → determined by everything, determines nothing
    val src = Seq(
      ("c1", "s1", "p1", "q1", "y1"), ("c2", "s1", "p1", "q1", "y1"),
      ("c3", "s2", "p2", "q1", "y1"), ("c4", "s2", "p2", "q1", "y1"),
      ("c5", "s3", "p3", "q2", "y1"), ("c6", "s3", "p3", "q2", "y1"))
      .toDF(Profiling.FdColumns: _*)
    val truth = {
      val rows = src.collect().map(_.toSeq.map(_.toString))
      val idx = Profiling.FdColumns.zipWithIndex.toMap
      (a: String, b: String) =>
        rows.groupBy(r => r(idx(a))).values.forall(_.map(r => r(idx(b))).distinct.size == 1)
    }
    val out = Profiling.profileFdsOn(spark, src).collect()
    assert(out.length == Profiling.FdColumns.size * (Profiling.FdColumns.size - 1))
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (scr, holds) = (r.getBoolean(4), if (r.isNullAt(7)) None else Some(r.getBoolean(7)))
      // every ndv here is far below k, so the sketch estimates are
      // EXACT → the screen equals the true FD test, and the exact
      // verification can only confirm
      assert(scr == truth(a, b), s"screen wrong for $a -> $b")
      assert(holds == (if (truth(a, b)) Some(true) else None), s"verdict wrong for $a -> $b")
    }
  }
}
