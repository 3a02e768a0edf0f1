package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // ----------------------------------------------- distribution drift

  /** Value-distribution DRIFT between the early and late halves of the
    * event stream — the monitor a training-data pipeline runs per
    * ingest batch to catch upstream shifts before they poison a mix:
    * the metric value is bucketed into [[DriftBuckets]] equal-width
    * bins over its global range, early/late = the µs-epoch midpoint of
    * the time range (integers, exact), and each bin reports both
    * counts, both fractions, and the absolute fraction gap (the
    * per-bin term a PSI/TVD monitor thresholds on; fractions are one
    * IEEE division each, rounded to 12 — transcendental-free, so both
    * engines agree bit-exactly).
    *
    * Scale: ONE scan of events (the 1-row bounds frame broadcasts back
    * like [[outlierOrders]]), then an 8-row window — no re-scan for
    * the totals.
    */
  val DriftBuckets = 8

  def profileDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(unix_micros(col("ts")).as("us"), col("value"))
    val bounds = ev.agg(min(col("us")).as("mn_us"), max(col("us")).as("mx_us"),
      min(col("value")).as("mn_v"), max(col("value")).as("mx_v"))
    val counts = ev.crossJoin(broadcast(bounds))
      .select(
        least(floor((col("value") - col("mn_v")) * lit(DriftBuckets.toDouble) /
          (col("mx_v") - col("mn_v"))), lit((DriftBuckets - 1).toLong))
          .cast("int").as("bucket"),
        (col("us") <= expr("(mn_us + mx_us) div 2")).as("early"))
      .groupBy("bucket")
      .agg(sum(when(col("early"), 1L).otherwise(0L)).as("n_early"),
        sum(when(!col("early"), 1L).otherwise(0L)).as("n_late"))
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("frac_early", round(col("n_early") / sum(col("n_early")).over(w), 12))
      .withColumn("frac_late", round(col("n_late") / sum(col("n_late")).over(w), 12))
      .select(col("bucket"), col("n_early"), col("n_late"),
        col("frac_early"), col("frac_late"),
        round(abs(col("frac_early") - col("frac_late")), 12).as("drift"))
      .orderBy("bucket")
  }

  private val profileDriftOracle =
    s"""WITH ev AS (SELECT epoch_us(ts) AS us, value FROM events),
       |b AS (SELECT min(us) AS mn_us, max(us) AS mx_us,
       |             min(value) AS mn_v, max(value) AS mx_v FROM ev),
       |tagged AS (
       |  SELECT LEAST(CAST(floor((value - mn_v) * ${DriftBuckets}.0 / (mx_v - mn_v)) AS BIGINT),
       |               ${DriftBuckets - 1}) AS bucket,
       |         us <= (mn_us + mx_us) // 2 AS early
       |  FROM ev, b),
       |counts AS (
       |  SELECT CAST(bucket AS INTEGER) AS bucket,
       |    count(*) FILTER (early) AS n_early,
       |    count(*) FILTER (NOT early) AS n_late
       |  FROM tagged GROUP BY 1),
       |tot AS (SELECT sum(n_early) AS te, sum(n_late) AS tl FROM counts),
       |fr AS (
       |  SELECT bucket, n_early, n_late,
       |    round(CAST(n_early AS DOUBLE) / te, 12) AS frac_early,
       |    round(CAST(n_late AS DOUBLE) / tl, 12) AS frac_late
       |  FROM counts, tot)
       |SELECT bucket, n_early, n_late, frac_early, frac_late,
       |  round(abs(frac_early - frac_late), 12) AS drift
       |FROM fr ORDER BY bucket""".stripMargin

  // ------------------------------------------------ correlation matrix

  /** Columns whose pairwise Pearson correlations [[profileCorrelations]]
    * reports — the numeric measures of `lineitem`.
    */
  val CorrColumns: Seq[String] =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private def corrPairs: Seq[(String, String)] =
    for {
      i <- CorrColumns.indices
      j <- (i + 1) until CorrColumns.length
    } yield (CorrColumns(i), CorrColumns(j))

  /** Pairwise Pearson correlation matrix over the numeric measure
    * columns — the feature-redundancy screen run before training any
    * model on tabular features (near-|1| pairs carry one signal twice;
    * near-0 pairs justify keeping both). All five sufficient statistics
    * per pair (n, Σx, Σy, Σx², Σy², Σxy) come from EXACT decimal sums
    * (per-row double products are IEEE-exact, the cast-to-decimal
    * accumulation is order-independent — the [[outlierOrders]]
    * pattern), so the final r is a fixed sequence of IEEE ops on
    * identical operands in both engines.
    *
    * Scale: ONE scan, ONE aggregation — all C + C(C−1)/2 sums are
    * columns of a single map-side-combined hash-agg emitting one row;
    * the C(C−1)/2 output rows are driver-free projections of that row.
    * No shuffle moves anything but partial-agg states.
    */
  def profileCorrelations(spark: SparkSession, dir: String): DataFrame = {
    val D = "decimal(38,12)"
    val aggs =
      count(lit(1)).cast("double").as("n") +:
        (CorrColumns.map(c => sum(col(c).cast(D)).cast("double").as(s"s_$c")) ++
          CorrColumns.map(c =>
            sum((col(c) * col(c)).cast(D)).cast("double").as(s"ss_$c")) ++
          corrPairs.map { case (a, b) =>
            sum((col(a) * col(b)).cast(D)).cast("double").as(s"sp_${a}_$b")
          })
    val m = t(spark, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
    corrPairs.map { case (a, b) =>
      m.select(lit(a).as("col_x"), lit(b).as("col_y"),
        col("n").cast("long").as("n_rows"),
        round(
          (col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")) /
            (sqrt(col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")) *
              sqrt(col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))),
          12).as("pearson_r"))
    }.reduce(_ unionByName _).orderBy("col_x", "col_y")
  }

  private val profileCorrelationsOracle: String = {
    val sums =
      (CorrColumns.map(c =>
        s"CAST(sum(CAST($c AS DECIMAL(38,12))) AS DOUBLE) AS s_$c") ++
        CorrColumns.map(c =>
          s"CAST(sum(CAST($c * $c AS DECIMAL(38,12))) AS DOUBLE) AS ss_$c") ++
        corrPairs.map { case (a, b) =>
          s"CAST(sum(CAST($a * $b AS DECIMAL(38,12))) AS DOUBLE) AS sp_${a}_$b"
        }).mkString(",\n    ")
    val rows = corrPairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(n AS BIGINT) AS n_rows,
         |    round((n * sp_${a}_$b - s_$a * s_$b)
         |      / (sqrt(n * ss_$a - s_$a * s_$a) * sqrt(n * ss_$b - s_$b * s_$b)),
         |      12) AS pearson_r
         |  FROM m""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH m AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |    $sums
       |  FROM lineitem)
       |$rows
       |ORDER BY col_x, col_y""".stripMargin
  }

  // ------------------------------------------------ linear regression

  /** Grouped closed-form OLS — y = intercept + slope·x per return
    * flag (extendedprice on quantity): all five sufficient statistics
    * (n, Σx, Σy, Σxy, Σy²/Σx²) from ONE map-side-combined aggregation
    * with exact decimal accumulation (the [[profileCorrelations]]
    * discipline), then the normal-equation solve as a fixed-order
    * IEEE double expression — bit-identical cross-engine, no iterative
    * fitting, no second pass. The regression step a profiling suite
    * takes after correlation says "related": HOW related.
    */
  def regressPrice(spark: SparkSession, dir: String): DataFrame = {
    // scale 4: EXACT for the ≤2-decimal inputs and their ≤4-decimal
    // products, and coarse enough that both engines' double→decimal
    // conversions agree (a scale-12 cast of a product double rounds
    // differently across engines at the 12th place, and the normal-
    // equation cancellations amplify that ulp into the 11th output
    // digit)
    val D = "decimal(38,4)"
    val g = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("l_quantity").cast(D)).cast("double").as("sx"),
        sum(col("l_extendedprice").cast(D)).cast("double").as("sy"),
        sum((col("l_quantity") * col("l_extendedprice")).cast(D)).cast("double").as("sxy"),
        sum((col("l_quantity") * col("l_quantity")).cast(D)).cast("double").as("sxx"),
        sum((col("l_extendedprice") * col("l_extendedprice")).cast(D)).cast("double").as("syy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val varx = col("n") * col("sxx") - col("sx") * col("sx")
    val vary = col("n") * col("syy") - col("sy") * col("sy")
    g.select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
        // rounding scales match each output's magnitude: at |x| ≈ 5e4
        // a 12-decimal grid exceeds double precision and the engines'
        // round() implementations legitimately disagree on the last
        // ulp — 6/9/12 keep every rounded value exactly representable
        round(cov / varx, 9).as("slope"),
        round((col("sy") - cov / varx * col("sx")) / col("n"), 6).as("intercept"),
        round(cov * cov / (varx * vary), 12).as("r2"))
      .orderBy("l_returnflag")
  }

  private val regressPriceOracle: String =
    """WITH g AS (
      |  SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
      |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
      |  round((n * sxy - sx * sy) * (n * sxy - sx * sy)
      |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 12) AS r2
      |FROM g ORDER BY l_returnflag""".stripMargin

  // ------------------------------------ functional-dependency discovery

  /** Columns screened for functional dependencies — two derived
    * columns plant REAL FDs (`o_orderpriority ↔ prio_class` is a
    * bijection), the raw ones plant non-FDs at varied cardinalities.
    */
  val FdColumns: Seq[String] = Seq(
    "o_custkey", "o_orderstatus", "o_orderpriority", "prio_class", "o_year")

  private val fdPairs: Seq[(String, String)] =
    for { a <- FdColumns; b <- FdColumns if a != b } yield (a, b)

  val FdK = 256

  private def fdSource(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").select(
      col("o_custkey").cast("string").as("o_custkey"),
      col("o_orderstatus"),
      col("o_orderpriority"),
      element_at(split(col("o_orderpriority"), "-"), 1).as("prio_class"),
      year(col("o_orderdate")).cast("string").as("o_year"))

  /** Functional-dependency discovery (the schema-inference profiler
    * step: find `a → b` rules, i.e. candidate keys and derivable
    * columns, before modeling a new table): `a → b` holds iff
    * ndv(a) = ndv(a, b). Testing every pair exactly costs one
    * distinct-aggregation per pair — at 100 TB that is the whole job,
    * so this runs the two-phase sketch screen:
    *
    * phase 1 — ONE scan computes a KMV sketch per column AND per
    * ordered pair (C + C·(C−1) sketches, O(k) state each, ≤ k longs
    * through the shuffle per sketch); a pair whose estimate differs
    * from its determinant's CANNOT hold (the sketch is exact below k,
    * and ndv(a,b) ≥ ndv(a) always), so non-FDs are refuted for the
    * price of one pass.
    *
    * phase 2 — only SCREEN SURVIVORS pay the exact distinct
    * aggregation (typically a handful), confirming or refuting with
    * exact counts. Every number is integer-exact cross-engine (the
    * same md5-prefix KMV hash as ANALYZE; pair values hash their
    * 0x1f-joined concatenation, injective for separator-free values).
    */
  def profileFds(spark: SparkSession, dir: String): DataFrame =
    profileFdsOn(spark, fdSource(spark, dir))

  /** Pair-hash mixer: each pair sketch hashes the integer combination
    * `(ha * 1000003 + hb) mod 2^32` of the two PRE-COMPUTED per-column
    * hashes instead of md5-ing the concatenated values -- one md5 per
    * COLUMN per row (C of them) instead of one per column AND ordered
    * pair (C + C*(C-1), which at 5 columns made md5 the whole query:
    * 25 digests per row). The odd multiplier keeps the mix a bijection
    * of `ha`, so the combination stays KMV-uniform, and the product is
    * < 2^32 * 10^6 -- far from BIGINT overflow, which DuckDB would
    * refuse (Spark would silently wrap: the cross-engine trap this
    * constant is sized against).
    */
  private val FdMix = 1000003L
  private val FdMod = 4294967296L

  private[operators] def profileFdsOn(spark: SparkSession, src: DataFrame): DataFrame = {
    import spark.implicits._
    def h(c: Column) = conv(substring(md5(c), 1, 8), 16, 10).cast("long")
    def sk(c: Column) = graft.functions.KmvSketchAgg.kmvSketch(c, FdK)
    val hashed = src.select(
      FdColumns.map(c => col(c)) ++ FdColumns.map(c => h(col(c)).as(s"_h_$c")): _*)
    val aggs =
      FdColumns.map(c => sk(col(s"_h_$c")).as(s"_s_$c")) ++
        fdPairs.map { case (a, b) =>
          sk(pmod(col(s"_h_$a") * lit(FdMix) + col(s"_h_$b"), lit(FdMod)))
            .as(s"_s_${a}_$b") }
    val r = hashed.agg(aggs.head, aggs.tail: _*).collect()(0)
    val estS = FdColumns.zipWithIndex.map { case (c, i) =>
      c -> r.getStruct(i).getLong(0) }.toMap
    val estP = fdPairs.zipWithIndex.map { case (p, i) =>
      p -> r.getStruct(FdColumns.size + i).getLong(0) }.toMap
    val screened = fdPairs.filter(p => estS(p._1) == estP(p))
    val exact: Map[(String, String), (Long, Long)] =
      if (screened.isEmpty) Map.empty
      else {
        val ex = screened.flatMap { case (a, b) => Seq(
          countDistinct(col(a)).as(s"_d_${a}_$b"),
          countDistinct(col(a), col(b)).as(s"_p_${a}_$b")) }
        val er = src.agg(ex.head, ex.tail: _*).collect()(0)
        screened.zipWithIndex.map { case (p, i) =>
          p -> ((er.getLong(2 * i), er.getLong(2 * i + 1))) }.toMap
      }
    fdPairs.map { case (a, b) =>
      val scr = exact.get((a, b))
      (a, b, estS(a), estP((a, b)), scr.isDefined,
        scr.map(_._1), scr.map(_._2), scr.map(x => x._1 == x._2))
    }.toDF("det", "dep", "ndv_det_est", "ndv_pair_est", "screened",
      "ndv_det", "ndv_pair", "holds")
      .orderBy("det", "dep")
  }

  private val profileFdsOracle: String = {
    def hSql(c: String) = s"CAST(concat('0x', substr(md5($c), 1, 8)) AS BIGINT)"
    def est(hExpr: String) =
      s"""(SELECT CAST(CASE WHEN cnt < $FdK THEN cnt
         |      ELSE ${(FdK - 1).toLong * 4294967296L} // hk END AS BIGINT)
         |    FROM (SELECT count(*) AS cnt, max(h) AS hk FROM (
         |      SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
         |        SELECT DISTINCT $hExpr AS h
         |        FROM sub) d) r
         |    WHERE rn <= $FdK) s)""".stripMargin
    val rows = fdPairs.map { case (a, b) =>
      val pairExpr = s"((${hSql(a)} * $FdMix + ${hSql(b)}) % $FdMod)"
      s"""SELECT '$a' AS det, '$b' AS dep, ea.e AS ndv_det_est, ep.e AS ndv_pair_est,
         |  ea.e = ep.e AS screened,
         |  CASE WHEN ea.e = ep.e THEN (SELECT count(DISTINCT $a) FROM sub) END AS ndv_det,
         |  CASE WHEN ea.e = ep.e THEN (SELECT count(DISTINCT ($a, $b)) FROM sub) END AS ndv_pair,
         |  CASE WHEN ea.e = ep.e THEN
         |    (SELECT count(DISTINCT $a) = count(DISTINCT ($a, $b)) FROM sub) END AS holds
         |FROM (SELECT ${est(hSql(a))} AS e) ea, (SELECT ${est(pairExpr)} AS e) ep""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH sub AS (
       |  SELECT CAST(o_custkey AS VARCHAR) AS o_custkey, o_orderstatus,
       |    o_orderpriority, string_split(o_orderpriority, '-')[1] AS prio_class,
       |    CAST(year(o_orderdate) AS VARCHAR) AS o_year
       |  FROM orders)
       |SELECT * FROM (
       |  $rows
       |) ORDER BY det, dep""".stripMargin
  }

  // ---------------------------------------------------------- registry

  /** Declarative data-quality expectations (the dbt-test / Deequ
    * check-suite shape): each check is a named predicate compiled into
    * a conditional count, grouped so one scan per TABLE evaluates all
    * of that table's checks (never one scan per check); the
    * referential check is a broadcast-eligible anti-join on the key.
    * Emits (check, n_violations, n_checked) — the report a pipeline
    * gates a publish on. At 100 TB the per-table scans are the
    * irreducible cost and everything else is a 1-row union.
    */
  def dqExpectations(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    val c = t(spark, dir, "customer")
    // orders-scan checks: key uniqueness via count-distinct delta,
    // accepted status set, non-negative total
    val ordersChecks = o.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_orderkey"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("bad_status"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpos_total"),
      count(lit(1)).as("n_orders"))
    val liChecks = li.agg(
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 45, 1L).otherwise(0L))
        .as("qty_range"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.08, 1L).otherwise(0L))
        .as("disc_range"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_shipdate"),
      count(lit(1)).as("n_lineitem"))
    val orphans = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("fk_orphans"))
    def row(name: String, v: Column, n: Column) =
      struct(lit(name).as("check"), v.cast("long").as("n_violations"),
        n.cast("long").as("n_checked"))
    ordersChecks.crossJoin(liChecks).crossJoin(orphans)
      .select(explode(array(
        row("orders_unique_key", col("dup_orderkey"), col("n_orders")),
        row("orders_status_set", col("bad_status"), col("n_orders")),
        row("orders_positive_total", col("nonpos_total"), col("n_orders")),
        row("orders_customer_fk", col("fk_orphans"), col("n_orders")),
        row("lineitem_qty_range", col("qty_range"), col("n_lineitem")),
        row("lineitem_discount_range", col("disc_range"), col("n_lineitem")),
        row("lineitem_shipdate_not_null", col("null_shipdate"), col("n_lineitem")))).as("r"))
      .select(col("r.check").as("check"), col("r.n_violations").as("n_violations"),
        col("r.n_checked").as("n_checked"))
      .orderBy("check")
  }

  private val dqExpectationsOracle =
    """WITH oc AS (
      |  SELECT count(*) - count(DISTINCT o_orderkey) AS dup_orderkey,
      |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
      |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_total,
      |    count(*) AS n_orders
      |  FROM orders),
      |lc AS (
      |  SELECT CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT) AS qty_range,
      |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS disc_range,
      |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate,
      |    count(*) AS n_lineitem
      |  FROM lineitem),
      |fk AS (
      |  SELECT count(*) AS fk_orphans FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |r AS (
      |  SELECT 'orders_unique_key' AS check, dup_orderkey AS n_violations, n_orders AS n_checked FROM oc
      |  UNION ALL SELECT 'orders_status_set', bad_status, n_orders FROM oc
      |  UNION ALL SELECT 'orders_positive_total', nonpos_total, n_orders FROM oc
      |  UNION ALL SELECT 'orders_customer_fk', fk_orphans, n_orders FROM oc, fk
      |  UNION ALL SELECT 'lineitem_qty_range', qty_range, n_lineitem FROM lc
      |  UNION ALL SELECT 'lineitem_discount_range', disc_range, n_lineitem FROM lc
      |  UNION ALL SELECT 'lineitem_shipdate_not_null', null_shipdate, n_lineitem FROM lc)
      |SELECT "check", n_violations, n_checked FROM r ORDER BY "check" """.stripMargin

  /** Benford first-digit expectations in parts-per-million —
    * `round(log10(1 + 1/d) · 10⁶)` precomputed as integer constants
    * (they sum to exactly 1,000,000), so no transcendental is ever
    * evaluated in either engine.
    */
  val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford first-digit screen over order totals — the data-quality /
    * fraud heuristic: naturally-grown monetary amounts follow the
    * logarithmic first-digit law, fabricated or truncated feeds don't.
    * All-integer: amounts become cents via `floor(x·100 + 0.5)` (the
    * engine-identical rounding idiom), the leading digit falls out of
    * a 13-branch integer threshold ladder (no float log, no
    * double→string rendering — both diverge cross-engine), observed
    * shares and deviations are ppm integers via floor division, and
    * the Benford expectations are precomputed ppm literals. One
    * scan-local projection + one 9-group hash-agg.
    */
  def profileBenford(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    // leading digit = cents div (largest power of 10 <= cents): the
    // ascending fold leaves the LARGEST power as the outermost branch
    val digit = (1 to 13).foldLeft(col("cents")) { (acc, p) =>
      val pow = math.pow(10, p).toLong
      when(col("cents") >= pow, call_function("div", col("cents"), lit(pow))).otherwise(acc)
    }
    val expected = BenfordPpm.foldLeft(lit(0L)) { case (acc, (d, ppm)) =>
      when(col("digit") === d, lit(ppm)).otherwise(acc)
    }
    base.select(digit.as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
      .withColumn("total", sum(col("n_obs")).over(Window.partitionBy()))
      .select(col("digit"), col("n_obs"),
        expr("div(n_obs * 1000000, total)").as("obs_ppm"),
        expected.as("benford_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
      .orderBy("digit")
  }

  private val profileBenfordOracle = {
    val ladder = (1 to 13).foldLeft("cents") { (acc, p) =>
      val pow = math.pow(10, p).toLong
      s"CASE WHEN cents >= $pow THEN cents // $pow ELSE $acc END"
    }
    val exp = BenfordPpm.map { case (d, ppm) =>
      s"WHEN digit = $d THEN $ppm"
    }.mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH c AS (
       |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
       |d AS (SELECT $ladder AS digit FROM c),
       |g AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
       |tt AS (SELECT sum(n_obs) AS total FROM g)
       |SELECT digit, n_obs,
       |  CAST((n_obs * 1000000) // total AS BIGINT) AS obs_ppm,
       |  CAST($exp AS BIGINT) AS benford_ppm,
       |  CAST(abs((n_obs * 1000000) // total - ($exp)) AS BIGINT) AS dev_ppm
       |FROM g, tt ORDER BY digit""".stripMargin
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("profile_benford", profileBenford _, Some(profileBenfordOracle),
      "Benford first-digit screen: integer cents, threshold-ladder digit, ppm deviations vs the law"),
    GraftQuery("dq_expectations", dqExpectations _, Some(dqExpectationsOracle),
      "declarative data-quality check suite: one scan per table + FK anti-join, named violation counts"),
    GraftQuery("profile_columns", profileColumns _, Some(profileColumnsOracle),
      "one-pass per-column profile of lineitem (rows / nulls / exact distinct)"),
    GraftQuery("outlier_orders", outlierOrders _, Some(outlierOrdersOracle),
      "z-score price outliers from exact-decimal mean/variance"),
    GraftQuery("profile_drift", profileDrift _, Some(profileDriftOracle),
      "early-vs-late value-distribution drift report (equal-width bins, exact split)"),
    GraftQuery("profile_correlations", profileCorrelations _, Some(profileCorrelationsOracle),
      "pairwise Pearson correlation matrix from one exact-decimal aggregation pass"),
    GraftQuery("profile_fds", profileFds _, Some(profileFdsOracle),
      "functional-dependency discovery: one-scan KMV screen over all column pairs, exact verify of survivors"),
    GraftQuery("regress_price", regressPrice _, Some(regressPriceOracle),
      "grouped closed-form OLS from one exact-decimal sufficient-statistics pass"))
}
