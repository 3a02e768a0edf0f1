package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables.t
import graft.functions.BloomFilterFns
import Relational.dsum

/** Second tranche of the classic relational checklist (SURVEY §2.4):
  * GROUPING SETS, pivot, array-function and math-function surfaces.
  * Cross-engine rules are the same as [[Relational]]: decimal-exact
  * fp aggregation, total ordering, aligned integer widths, and only
  * IEEE-deterministic scalar math (no libm-dependent exp/ln whose
  * last-bit behavior differs between engines).
  */
object RelationalExt {

  // ------------------------------------------------------ grouping sets
  /** Explicit GROUPING SETS — the general form of cube/rollup (SURVEY
    * "Grouping sets" row); per-status, per-priority and grand-total
    * groups in one pass over orders (Spark expands to a single Expand +
    * hash-agg, no extra scans).
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  private val groupingSetsOracle =
    """SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // -------------------------------------------------------------- pivot
  /** Relational pivot via the DataFrame `pivot` API with explicit pivot
    * values (explicit values keep the plan one-pass; omitting them
    * costs a distinct-collect planning pass — never do that at scale).
    */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum(col("o_totalprice"), 2))
      .select(col("o_orderpriority"),
        col("F").as("rev_f"), col("O").as("rev_o"), col("P").as("rev_p"))
      .orderBy("o_orderpriority")

  private val pivotAggOracle =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE) AS rev_f,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE) AS rev_o,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE) AS rev_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------ unpivot

  /** UNPIVOT (melt) — [[pivotAgg]]'s inverse reshape: a wide one-row-
    * per-group measure frame unfolds into (group, measure, value)
    * long form, the shape metric stores and chart layers consume.
    * Runs AFTER the aggregation, so the expand operator touches
    * |groups| rows, not the corpus — at 100 TB the melt is free; the
    * one hash-agg shuffle beneath it is the whole query's cost. Uses
    * Spark's native `unpivot` (an `Expand` node, scan-local, no
    * shuffle of its own) against DuckDB's standard UNPIVOT clause.
    */
  def unpivotWide(spark: SparkSession, dir: String): DataFrame = {
    val wide = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_price"),
        dsum(col("l_discount"), 2).as("sum_disc"))
    wide.unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy("l_returnflag", "measure")
  }

  private val unpivotWideOracle =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price,
      |    CAST(sum(CAST(l_discount AS DECIMAL(27,2))) AS DOUBLE) AS sum_disc
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, measure, value
      |FROM wide UNPIVOT (value FOR measure IN (sum_qty, sum_price, sum_disc))
      |ORDER BY l_returnflag, measure""".stripMargin

  // -------------------------------------------------------- array funcs
  /** Array-function surface (SURVEY "Array functions" row) over the
    * tokenized documents: size, distinct size, membership, sorted
    * slice, join — all codegen'd array primitives, no HOF lambdas.
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    t(spark, dir, "documents")
      .select(col("doc_id"),
        size(words).as("n_words"),
        size(array_distinct(words)).as("n_distinct"),
        array_contains(words, "the").as("has_the"),
        array_join(slice(sort_array(words), 1, 3), "-").as("first3_sorted"),
        element_at(words, 1).as("head_word"),
        element_at(words, -1).as("last_word"))
      .orderBy("doc_id")
  }

  private val arrayFuncsOracle =
    """SELECT doc_id,
      |  CAST(len(w) AS INTEGER) AS n_words,
      |  CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct,
      |  list_contains(w, 'the') AS has_the,
      |  array_to_string(list_sort(w)[1:3], '-') AS first3_sorted,
      |  w[1] AS head_word,
      |  w[-1] AS last_word
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- math funcs
  /** Math-function surface (SURVEY "Math functions" row), restricted to
    * IEEE-754-exact operations (abs/ceil/floor/sqrt/mod/greatest) so
    * results are bit-identical across engines — transcendentals (exp,
    * ln, pow) are libm-dependent and excluded from the oracle-gated
    * surface by design.
    */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") - 30000.0).as("abs_dev"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        (col("l_discount") * col("l_discount")).as("disc_sq"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_tax"), col("l_discount")).as("l"))
      .orderBy("l_orderkey", "l_linenumber")

  private val mathFuncsOracle =
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_extendedprice - 30000.0) AS abs_dev,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |  sqrt(l_quantity) AS qty_sqrt,
      |  l_discount * l_discount AS disc_sq,
      |  l_orderkey % 7 AS key_mod7,
      |  greatest(l_quantity, l_discount * 100) AS g,
      |  least(l_tax, l_discount) AS l
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --------------------------------------------------------- salted join
  /** Skew-salted equi-join (the 100 TB mitigation for a hot join key):
    * the fact side gets a deterministic salt in [0, S), the dim side is
    * replicated S× with every salt value, and the join runs on
    * (key, salt) so one hot key's rows spread over S reducers instead
    * of one. Results are identical to the unsalted join — the oracle
    * computes the plain form. (Spark's AQE skew-join splits oversized
    * partitions reactively; explicit salting is the declarative version
    * that also covers joins AQE can't split, e.g. bucketed or
    * pre-sorted inputs.)
    */
  def joinSaltedSkew(spark: SparkSession, dir: String): DataFrame = {
    val S = 8
    val ev = graft.Tables.events(spark, dir)
    val fact = ev.select(col("user_id"), col("value"),
      pmod(hash(col("event_id")), lit(S)).as("salt"))
    val dim = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val dimSalted = dim.withColumn("salt",
      explode(array((0 until S).map(lit(_)): _*)))
    fact.join(dimSalted, Seq("user_id", "salt"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value"), 6).as("total_value"),
        min(col("signup_ts")).as("signup_ts"))
      .orderBy("user_id")
  }

  private val joinSaltedSkewOracle =
    """SELECT e.user_id, count(*) AS n_events,
      |  CAST(sum(CAST(e.value AS DECIMAL(27,6))) AS DOUBLE) AS total_value,
      |  CAST(min(d.signup_ts) AS TIMESTAMP) AS signup_ts
      |FROM events e
      |JOIN (SELECT user_id, min(ts) AS signup_ts FROM events
      |      WHERE event_type = 'signup' GROUP BY user_id) d
      |  ON e.user_id = d.user_id
      |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin

  // ---------------------------------------------------------- percentiles
  /** Exact continuous percentiles per group (SURVEY "Aggregations" row;
    * the sort-based exact path — `approx_percentile` sketches are the
    * at-scale variant and, like HLL, engine-specific and not
    * oracle-gated). Spark's `percentile` and DuckDB's `quantile_cont`
    * share the interpolation definition on doubles.
    */
  def percentileAgg(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  private val percentileAggOracle =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Driver-side sample budget for [[quantileSelectOn]] — the collected
    * sample targets this many rows regardless of input size (the r10
    * fixed-2%-fraction sample was linear in n: a driver OOM at 100 TB).
    */
  private[graft] val QuantileSampleTarget = 100000L

  /** Cap on the collected bracket-window row count. The window is
    * O(n/√s) only when values are spread; under extreme duplication
    * (most rows equal to the bracket value) it can be corpus-sized, so
    * it is COUNTED before collection and over-cap inputs take the
    * scan-only bisection path instead of a driver collect.
    */
  private[graft] var QuantileWindowCap = 2000000L // var: specs shrink it to exercise the cap path

  /** Observability for specs: size of the last driver-collected sample. */
  private[graft] var lastQuantileSampleSize: Int = -1

  /** Sampling modulus for n rows: expected sample size is
    * min(n/50, [[QuantileSampleTarget]]) — CONSTANT in n past the knee
    * (n = 50·target), unlike the r10 fixed-2% fraction.
    */
  private[graft] def quantileSampleModulus(n: Long): Long =
    math.max(50L, n / QuantileSampleTarget)

  /** Monotone double→long bit transform (and inverse): preserves IEEE
    * total order so the bisection below can halve the VALUE domain.
    */
  private def toOrd(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    if (b < 0) b ^ 0x7FFFFFFFFFFFFFFFL else b
  }
  private def fromOrd(l: Long): Double = {
    val b = if (l < 0) l ^ 0x7FFFFFFFFFFFFFFFL else l
    java.lang.Double.longBitsToDouble(b)
  }

  /** Exact r-th smallest of `vals.x` by bisection over the ordered
    * double bit-space: ≤64 counting scans, no sort, no driver
    * collection, no 32-bit rank limit. The always-correct fallback for
    * degenerate inputs (empty sample, duplicate-heavy window,
    * misbracketed rank) — never the common path.
    */
  private[graft] def selectByBisection(vals: DataFrame, r: Long): Double = {
    val mm = vals.agg(min(col("x")).as("mn"), max(col("x")).as("mx")).collect().head
    var lo = toOrd(mm.getDouble(0))
    var hi = toOrd(mm.getDouble(1))
    while (lo < hi) { // invariant: answer's ord in [lo, hi]
      val mid = lo + (hi - lo) / 2
      val c = vals.filter(col("x") <= fromOrd(mid)).count()
      if (c >= r) hi = mid else lo = mid + 1
    }
    fromOrd(lo)
  }

  /** Exact DISCRETE quantiles (order statistics) WITHOUT a global sort
    * — the at-scale selection path [[percentileAgg]]'s sort-based exact
    * percentile can't take. Two passes: (1) a deterministic hash sample
    * (modulus derived from n so the collected size is a CONSTANT
    * ~[[QuantileSampleTarget]], not a fraction of n) brackets each
    * target rank with a ±4√s safety margin; (2) ONE scan counts rows
    * below each bracket and collects only the bracket windows (counted
    * first, capped at [[QuantileWindowCap]]), from which the exact k-th
    * element is selected. Rank arithmetic is verified against the
    * counted bounds — if a freak sample misbrackets (the margin is
    * ~4σ), the affected quantile falls back to [[selectByBisection]]
    * rather than returning a wrong element. Matches DuckDB's
    * `quantile_disc` (rank = ⌈q·n⌉): the answer is an actual data
    * element, no interpolation arithmetic to diverge on.
    */
  def quantileSelect(spark: SparkSession, dir: String): DataFrame = {
    val vals = graft.Tables.t(spark, dir, "lineitem")
      .select(col("l_extendedprice").as("x"),
        concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("rk"))
    quantileSelectOn(spark, vals, Seq(0.5, 0.9, 0.99))
  }

  /** Quantile discretization (the feature BUCKETIZER every training
    * pipeline runs on numeric features): equi-depth bucket edges from
    * the exact p25/p50/p75 order statistics ([[quantileSelectOn]] —
    * two bounded passes, no global sort), then bucket assignment is
    * ONE scan-local CASE projection under the three broadcast edge
    * literals, and the report is one bounded hash-agg. Buckets hold
    * ~n/4 rows each (ties land low); exact element edges mean both
    * engines cut at the identical values — no interpolation to
    * diverge on.
    */
  def featureBucketize(spark: SparkSession, dir: String): DataFrame = {
    val vals = graft.Tables.t(spark, dir, "lineitem")
      .select(col("l_extendedprice").as("x"),
        concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("rk"))
    val edges = quantileSelectOn(spark, vals, Seq(0.25, 0.5, 0.75))
      .orderBy("q").collect().map(_.getDouble(1))
    val bucket = when(col("x") <= edges(0), 0)
      .when(col("x") <= edges(1), 1)
      .when(col("x") <= edges(2), 2)
      .otherwise(3)
    vals.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy("bucket")
  }

  private val featureBucketizeOracle =
    """WITH e AS (
      |  SELECT quantile_disc(l_extendedprice, 0.25) AS e1,
      |    quantile_disc(l_extendedprice, 0.5) AS e2,
      |    quantile_disc(l_extendedprice, 0.75) AS e3
      |  FROM lineitem)
      |SELECT CASE WHEN l_extendedprice <= e1 THEN 0
      |            WHEN l_extendedprice <= e2 THEN 1
      |            WHEN l_extendedprice <= e3 THEN 2 ELSE 3 END AS bucket,
      |  count(*) AS n_rows, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      |FROM lineitem, e
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Core of [[quantileSelect]] over any (x: double, rk: string) frame. */
  private[graft] def quantileSelectOn(
      spark: SparkSession, vals: DataFrame, qs: Seq[Double]): DataFrame = {
    import spark.implicits._
    val n = vals.count()
    def rank(q: Double): Long = math.max(1L, math.ceil(q * n).toLong)
    if (n == 0L) return Seq.empty[(Double, Double)].toDF("q", "value")
    val modulus = quantileSampleModulus(n)
    val sample = vals
      .filter(pmod(graft.operators.Dedup.phash(col("rk")), lit(modulus)) === 0)
      .select(col("x")).collect().map(_.getDouble(0)).sorted
    val s = sample.length
    lastQuantileSampleSize = s
    if (s == 0) // freak empty sample (only plausible for tiny n)
      return qs.map(q => (q, selectByBisection(vals, rank(q))))
        .toDF("q", "value").orderBy("q")
    val margin = math.max(10, (4 * math.sqrt(s.toDouble)).toInt)
    val brackets = qs.map { q =>
      val r = rank(q) // quantile_disc rank
      val p = ((r.toDouble / n) * s).toInt
      val lo = sample(math.max(0, math.min(s - 1, p - margin)))
      val hi = sample(math.min(s - 1, p + margin))
      (q, r, lo, hi)
    }
    // one scan: per-bracket below-counts + the size of the union window
    val windowCond = brackets.map { case (_, _, lo, hi) =>
      col("x") >= lo && col("x") <= hi
    }.reduce(_ || _)
    val belowAggs = brackets.map { case (q, _, lo, _) =>
      sum(when(col("x") < lo, 1L).otherwise(0L)).as(s"below_$q")
    } :+ sum(when(windowCond, 1L).otherwise(0L)).as("win_n")
    val below = vals.agg(belowAggs.head, belowAggs.tail: _*).collect().head
    if (below.getLong(qs.length) > QuantileWindowCap)
      return qs.map(q => (q, selectByBisection(vals, rank(q))))
        .toDF("q", "value").orderBy("q")
    val window = vals.filter(windowCond).select(col("x"))
      .collect().map(_.getDouble(0)).sorted
    val rows = brackets.zipWithIndex.map { case ((q, r, lo, hi), i) =>
      val cntBelow = below.getLong(i)
      val inWin = window.filter(v => v >= lo && v <= hi)
      val idx = r - cntBelow - 1 // 0-based rank within the sorted window
      val value =
        if (idx >= 0 && idx < inWin.length) inWin(idx.toInt)
        else selectByBisection(vals, r) // misbracketed: never wrong output
      (q, value)
    }
    rows.toDF("q", "value").orderBy("q")
  }

  /** Per-GROUP exact discrete quantiles without a global (or per-group)
    * sort — generalizes [[quantileSelectOn]]: one scan samples every
    * group at a group-sized modulus (driver sample ≤ ~target TOTAL,
    * split across groups), one scan counts below-bracket + window rows
    * PER GROUP (when-chain brackets, single hash agg), then the exact
    * in-group rank is selected from the collected windows. Driver state
    * is O(groups × per-group sample) — the same order as the grouped
    * RESULT itself, so inherent to the operator. Degenerate groups
    * (empty sample, oversized window, misbracket) fall back to
    * [[selectByBisection]] on that group only.
    */
  def quantileSelectGrouped(spark: SparkSession, dir: String): DataFrame = {
    val vals = graft.Tables.events(spark, dir)
      .select(col("event_type").as("g"), col("value").as("x"),
        col("event_id").cast("string").as("rk"))
    quantileSelectGroupedOn(spark, vals, Seq(0.5, 0.9))
      .select(col("g").as("event_type"), col("q"), col("value"))
      .orderBy("event_type", "q")
  }

  /** Core of [[quantileSelectGrouped]] over any (g, x, rk) frame. */
  private[graft] def quantileSelectGroupedOn(
      spark: SparkSession, vals: DataFrame, qs: Seq[Double]): DataFrame = {
    import spark.implicits._
    val counts = vals.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty)
      return Seq.empty[(String, Double, Double)].toDF("g", "q", "value")
    def rank(q: Double, n: Long): Long = math.max(1L, math.ceil(q * n).toLong)
    def groupOf(df: DataFrame, g: String): DataFrame =
      df.filter(col("g") === g).select(col("x"))
    // per-group modulus: total driver sample ~QuantileSampleTarget
    val perTarget = math.max(1000L, QuantileSampleTarget / counts.size)
    def chainD(m: Map[String, Double], default: Double): Column =
      m.foldLeft(lit(default)) { case (acc, (g, v)) =>
        when(col("g") === g, lit(v)).otherwise(acc)
      }
    val modChain = counts.foldLeft(lit(Long.MaxValue)) { case (acc, (g, n)) =>
      when(col("g") === g, lit(math.max(50L, n / perTarget))).otherwise(acc)
    }
    val sampled = vals
      .filter(pmod(graft.operators.Dedup.phash(col("rk")), modChain) === 0)
      .select(col("g"), col("x")).collect()
    val samples: Map[String, Array[Double]] = sampled.groupBy(_.getString(0))
      .map { case (g, rows) => g -> rows.map(_.getDouble(1)).sorted }
    // brackets per (group, q); sampleless groups go straight to bisection
    val bracketed = counts.keys.toSeq.sorted.flatMap { g =>
      samples.get(g).filter(_.nonEmpty).map { sample =>
        val n = counts(g)
        val s = sample.length
        val margin = math.max(10, (4 * math.sqrt(s.toDouble)).toInt)
        val bs = qs.map { q =>
          val r = rank(q, n)
          val p = ((r.toDouble / n) * s).toInt
          val lo = sample(math.max(0, math.min(s - 1, p - margin)))
          val hi = sample(math.min(s - 1, p + margin))
          (q, r, lo, hi)
        }
        g -> bs
      }
    }.toMap
    // ONE grouped scan: per-(group, q) below-counts + per-group window size
    val loChains = qs.indices.map { j =>
      chainD(bracketed.map { case (g, bs) => g -> bs(j)._3 }, Double.NegativeInfinity)
    }
    val winLo = chainD(bracketed.map { case (g, bs) => g -> bs.map(_._3).min },
      Double.PositiveInfinity)
    val winHi = chainD(bracketed.map { case (g, bs) => g -> bs.map(_._4).max },
      Double.NegativeInfinity)
    val winCond = col("x") >= winLo && col("x") <= winHi
    val aggCols = qs.indices.map { j =>
      sum(when(col("x") < loChains(j), 1L).otherwise(0L)).as(s"below_$j")
    } :+ sum(when(winCond, 1L).otherwise(0L)).as("win_n")
    val stats = vals.groupBy(col("g")).agg(aggCols.head, aggCols.tail: _*)
      .collect().map(r => r.getString(0) -> r).toMap
    val okWindow = bracketed.keySet.filter { g =>
      stats(g).getLong(qs.length + 1) <= QuantileWindowCap / math.max(1, counts.size)
    }
    val windows: Map[String, Array[Double]] =
      if (okWindow.isEmpty) Map.empty
      else vals.filter(winCond && col("g").isInCollection(okWindow))
        .select(col("g"), col("x")).collect()
        .groupBy(_.getString(0))
        .map { case (g, rows) => g -> rows.map(_.getDouble(1)).sorted }
    val rows = counts.keys.toSeq.sorted.flatMap { g =>
      val n = counts(g)
      qs.zipWithIndex.map { case (q, j) =>
        val r = rank(q, n)
        val value = bracketed.get(g).filter(_ => okWindow(g)) match {
          case Some(bs) =>
            val (_, _, lo, hi) = bs(j)
            val cntBelow = stats(g).getLong(j + 1)
            val inWin = windows.getOrElse(g, Array.empty[Double])
              .filter(v => v >= lo && v <= hi)
            val idx = r - cntBelow - 1
            if (idx >= 0 && idx < inWin.length) inWin(idx.toInt)
            else selectByBisection(groupOf(vals, g), r)
          case None => selectByBisection(groupOf(vals, g), r)
        }
        (g, q, value)
      }
    }
    rows.toDF("g", "q", "value")
  }

  private val quantileSelectGroupedOracle =
    """SELECT event_type, CAST(0.5 AS DOUBLE) AS q,
      |  quantile_disc(value, 0.5) AS value FROM events GROUP BY event_type
      |UNION ALL
      |SELECT event_type, CAST(0.9 AS DOUBLE),
      |  quantile_disc(value, 0.9) FROM events GROUP BY event_type
      |ORDER BY event_type, q""".stripMargin

  private val quantileSelectOracle =
    """SELECT CAST(0.5 AS DOUBLE) AS q, quantile_disc(l_extendedprice, 0.5) AS value FROM lineitem
      |UNION ALL
      |SELECT CAST(0.9 AS DOUBLE), quantile_disc(l_extendedprice, 0.9) FROM lineitem
      |UNION ALL
      |SELECT CAST(0.99 AS DOUBLE), quantile_disc(l_extendedprice, 0.99) FROM lineitem
      |ORDER BY q""".stripMargin

  // ------------------------------------------------ extended window fns
  /** Rank-family window surface beyond row_number (SURVEY "Window
    * functions" row): ntile, percent_rank, cume_dist, first/last value
    * over an explicit frame. All rank math is exact integer-ratio
    * arithmetic — deterministic across engines.
    */
  def windowFuncsExt(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(asc("o_totalprice"), asc("o_orderkey"))
    val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first(col("o_orderkey")).over(wFrame).as("cheapest_key"),
        last(col("o_orderkey")).over(wFrame).as("priciest_key"))
      .orderBy("o_orderkey")
  }

  private val windowFuncsExtOracle =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  first_value(o_orderkey) OVER wf AS cheapest_key,
      |  last_value(o_orderkey) OVER wf AS priciest_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
      |  wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------ union by name
  /** Schema-aligned union with missing columns (SURVEY "Set ops" /
    * schema-union family — the relational face of the sync pipeline's
    * union-schema inference): two differently-shaped projections
    * unioned by NAME, absent columns null-filled.
    */
  def unionByNameQ(spark: SparkSession, dir: String): DataFrame = {
    val buyers = t(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("entity_id"), col("c_name").as("name"),
        col("c_acctbal").as("balance"), lit("customer").as("kind"))
    val vendors = t(spark, dir, "supplier")
      .select(col("s_suppkey").as("entity_id"), col("s_name").as("name"),
        lit("supplier").as("kind")) // no balance column
    buyers.unionByName(vendors, allowMissingColumns = true)
      .select(col("kind"), col("entity_id"), col("name"), col("balance"))
      .orderBy("kind", "entity_id")
  }

  private val unionByNameOracle =
    """SELECT kind, entity_id, name, balance FROM (
      |  SELECT c_custkey AS entity_id, c_name AS name, c_acctbal AS balance,
      |    'customer' AS kind
      |  FROM customer WHERE c_acctbal > 9000
      |  UNION ALL BY NAME
      |  SELECT s_suppkey AS entity_id, s_name AS name, 'supplier' AS kind
      |  FROM supplier)
      |ORDER BY kind, entity_id""".stripMargin

  // --------------------------------------------------------- regexp fns
  /** Regexp surface (SURVEY "String functions" row): extraction with
    * groups, boolean match, count. Patterns restricted to the syntax
    * subset Java and RE2-style engines agree on (no lookaround).
    */
  def regexpFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+) ", 1).as("first_word"),
        col("p_name").rlike("red|blue").as("has_color"),
        size(split(col("p_name"), " ")).as("n_words"),
        regexp_replace(col("p_type"), "[A-Z]+", "#").as("type_masked"))
      .orderBy("p_partkey")

  private val regexpFuncsOracle =
    """SELECT p_partkey,
      |  coalesce(regexp_extract(p_name, '^([a-z]+) ', 1), '') AS first_word,
      |  regexp_matches(p_name, 'red|blue') AS has_color,
      |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
      |  regexp_replace(p_type, '[A-Z]+', '#', 'g') AS type_masked
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------- registry

  // ------------------------------------------------- bloom prefilter join
  /** Selective semi join with a bloom-filter runtime prefilter (SURVEY
    * §2.4 joins EXT; same shape as Spark's `InjectRuntimeFilter` /
    * Trino dynamic filtering, but explicit and stats-independent).
    *
    * The dim side's keys build ONE bounded bloom filter via the native
    * [[graft.functions.BloomFilterBuildAgg]] (partials map-side, OR
    * merge); fact rows that cannot match are dropped at the scan by the
    * codegen'd `might_contain` predicate BEFORE the join shuffle — at
    * 100 TB this cuts the shuffled fact volume to ~selectivity + fpp.
    * False positives survive the prefilter and are removed by the exact
    * semi join, so the result is exactly the plain semi join's.
    */
  def joinBloomPrefilter(spark: SparkSession, dir: String): DataFrame = {
    // cached while the function runs: the dim-key set (dim-sized,
    // broadcast-class) is read twice driver-side — sizing count, bloom
    // build — off one orders scan; released in the finally below
    val dimKeys = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
      .cache()
    try {
      // Size the filter from a cheap key-count (at scale: catalog stats).
      val nKeys = dimKeys.count()
      val blob = dimKeys
        .agg(BloomFilterFns.bloomBuild(col("o_orderkey"), math.max(1000L, nKeys), 0.03))
        .head.getAs[Array[Byte]](0)
      t(spark, dir, "lineitem")
        .where(BloomFilterFns.bloomMightContain(col("l_orderkey"), blob))
        .join(dimKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("l_returnflag")
    } finally dimKeys.unpersist()
    // unpersist is plan-keyed: the returned plan stays correct — it
    // recomputes the (filter+project) dim side instead of leaking cached
    // partitions into the shared session across bench invocations
  }

  private val joinBloomPrefilterOracle =
    """SELECT l_returnflag, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("join_bloom_prefilter", joinBloomPrefilter _, Some(joinBloomPrefilterOracle),
      "bloom runtime prefilter before an exact semi join"),
    GraftQuery("grouping_sets", groupingSets _, Some(groupingSetsOracle),
      "explicit GROUPING SETS via SQL surface"),
    GraftQuery("unpivot_wide", unpivotWide _, Some(unpivotWideOracle),
      "UNPIVOT/melt: wide measure frame to long (group, measure, value) form, " +
        "expand after the aggregation"),
    GraftQuery("pivot_agg", pivotAgg _, Some(pivotAggOracle),
      "DataFrame pivot with explicit values"),
    GraftQuery("array_funcs", arrayFuncs _, Some(arrayFuncsOracle),
      "array function surface over tokenized documents"),
    GraftQuery("math_funcs", mathFuncs _, Some(mathFuncsOracle),
      "IEEE-exact math function surface"),
    GraftQuery("join_salted_skew", joinSaltedSkew _, Some(joinSaltedSkewOracle),
      "skew-salted equi-join, identical results to the plain join"),
    GraftQuery("feature_bucketize", featureBucketize _, Some(featureBucketizeOracle),
      "equi-depth quantile discretizer: exact order-statistic edges, scan-local bucket assignment"),
    GraftQuery("quantile_select", quantileSelect _, Some(quantileSelectOracle),
      "exact order-statistic quantiles via 2-pass sample-bracketed selection, no global sort"),
    GraftQuery("quantile_select_grouped", quantileSelectGrouped _, Some(quantileSelectGroupedOracle),
      "exact per-group discrete quantiles, one sampled scan + one grouped counting scan"),
    GraftQuery("percentile_agg", percentileAgg _, Some(percentileAggOracle),
      "exact interpolated percentiles per group"),
    GraftQuery("window_funcs_ext", windowFuncsExt _, Some(windowFuncsExtOracle),
      "ntile / percent_rank / cume_dist / first-last value"),
    GraftQuery("union_by_name", unionByNameQ _, Some(unionByNameOracle),
      "unionByName with missing columns null-filled"),
    GraftQuery("regexp_funcs", regexpFuncs _, Some(regexpFuncsOracle),
      "regexp extract / match / mask surface"))
}
