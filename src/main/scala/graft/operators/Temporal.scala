package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables.t

/** Temporal join operators (SURVEY §2.4 "Joins: theta/range/as-of" —
  * EXT surface): as-of join and bounded interval self-join, each
  * expressed in the shape that survives 100 TB rather than as a naive
  * theta-join.
  */
object Temporal {

  /** Interval-join window: 5 minutes in microseconds. */
  val RangeWindowUs: Long = 5L * 60 * 1000 * 1000

  // ------------------------------------------------------------ as-of

  /** As-of join: for every purchase event, the most recent view event
    * of the same user at-or-before the purchase (DuckDB `ASOF JOIN`
    * semantics). Spark-first shape: UNION the two event kinds, one
    * window pass per user ordered by (ts, kind) taking the running max
    * of the view timestamp — a single shuffle on the join key, never a
    * per-row backward probe, and no interval explosion. The running
    * max IS the as-of match because event time is monotone within the
    * window frame.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    // kind 0 sorts before kind 1 at equal ts, so a view at exactly the
    // purchase timestamp is matched (ASOF's >= bound)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        lit(0).as("kind"), unix_micros(col("ts")).as("view_us"),
        lit(null).cast("long").as("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        lit(1).as("kind"), lit(null).cast("long").as("view_us"),
        col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(asc("us"), asc("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(purchases)
      .withColumn("last_view_us", max(col("view_us")).over(w))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("purchase_ts"),
        timestamp_micros(col("last_view_us")).as("last_view_ts"))
      .orderBy("user_id", "event_id")
  }

  private val asofJoinOracle =
    """SELECT p.user_id, p.event_id,
      |  CAST(p.ts AS TIMESTAMP) AS purchase_ts,
      |  CAST(v.ts AS TIMESTAMP) AS last_view_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, max(ts) AS ts FROM events
      |                WHERE event_type = 'view' GROUP BY user_id, ts) v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.user_id, p.event_id""".stripMargin

  // ------------------------------------------------------- range join

  /** Bounded interval self-join: ordered event pairs of the same user
    * at most 5 minutes apart. Spark-first shape: each left row is
    * tagged into its own and the next 5-minute time bucket, the join
    * runs as an EQUI-join on (user_id, bucket) and the exact range
    * predicate filters inside the bucket — candidate volume is bounded
    * by per-(user, bucket) density, not |events|² (the naive theta join
    * Spark would otherwise execute as a broadcast nested loop).
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val left = e.withColumn("bkt",
      explode(array(floor(col("us") / RangeWindowUs),
        floor(col("us") / RangeWindowUs) + 1)))
    val right = e.withColumn("bkt", floor(col("us") / RangeWindowUs))
    left.as("a").join(right.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.bkt") === col("b.bkt") &&
          (col("b.us") - col("a.us")).between(0, RangeWindowUs) &&
          (col("a.us") < col("b.us") ||
            (col("a.us") === col("b.us") && col("a.event_id") < col("b.event_id"))))
      .select(col("a.user_id").as("user_id"),
        col("a.event_id").as("first_id"), col("b.event_id").as("second_id"),
        (col("b.us") - col("a.us")).as("gap_us"))
      .orderBy("user_id", "first_id", "second_id")
  }

  private val rangeJoinOracle =
    s"""SELECT a.user_id, a.event_id AS first_id, b.event_id AS second_id,
       |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
       |FROM events a JOIN events b
       |  ON a.user_id = b.user_id
       |  AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND $RangeWindowUs
       |  AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
       |ORDER BY a.user_id, first_id, second_id""".stripMargin

  // ---------------------------------------------------- interval join

  val ViewDurUs: Long = 10L * 60 * 1000 * 1000
  val PromoDurUs: Long = 5L * 60 * 1000 * 1000
  val GridUs: Long = 10L * 60 * 1000 * 1000

  /** INTERVAL OVERLAP join — two interval sets (view sessions extended
    * 10 min, purchase windows extended 5 min), pairs of the same user
    * whose intervals intersect. Spark-first shape: each interval
    * explodes onto the time-grid cells it spans (≤ len/W + 1 cells,
    * bounded), the join is a pure EQUI-join on (user, cell), and the
    * FIRST-OVERLAP-CELL condition `greatest(s_a, s_b) div W = cell`
    * makes every overlapping pair match in EXACTLY ONE cell — the
    * classic dedup-free grid interval join: no DISTINCT pass over the
    * (potentially huge) pair stream, unlike the naive cell join whose
    * duplicates force one. The exact overlap predicate filters inside
    * the cell, so candidate volume is per-(user, cell) density, never
    * |A|·|B| — the theta join Spark would otherwise run as a broadcast
    * nested loop.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("s"))
    def spans(tpe: String, dur: Long, id: String, s: String, e: String) = ev
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id").as(id),
        col("s").as(s), (col("s") + dur).as(e))
      .withColumn("cell", explode(expr(s"sequence($s div ${GridUs}L, $e div ${GridUs}L)")))
    val v = spans("view", ViewDurUs, "view_id", "vs", "ve")
    val p = spans("purchase", PromoDurUs, "purchase_id", "ps", "pe")
    v.join(p, Seq("user_id", "cell"))
      .filter(expr(s"vs <= pe AND ps <= ve AND greatest(vs, ps) div ${GridUs}L = cell"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (least(col("ve"), col("pe")) - greatest(col("vs"), col("ps"))).as("overlap_us"))
      .orderBy("user_id", "view_id", "purchase_id")
  }

  private val intervalJoinOracle =
    s"""WITH v AS (
       |  SELECT user_id, event_id AS view_id, epoch_us(ts) AS vs,
       |    epoch_us(ts) + $ViewDurUs AS ve
       |  FROM events WHERE event_type = 'view'),
       |p AS (
       |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS ps,
       |    epoch_us(ts) + $PromoDurUs AS pe
       |  FROM events WHERE event_type = 'purchase')
       |SELECT v.user_id AS user_id, view_id, purchase_id,
       |  least(ve, pe) - greatest(vs, ps) AS overlap_us
       |FROM v JOIN p ON v.user_id = p.user_id AND vs <= pe AND ps <= ve
       |ORDER BY v.user_id, view_id, purchase_id""".stripMargin

  // ------------------------------------------------------ gap fill

  private val DayUs: Long = 86400L * 1000000

  /** Time-series gap fill with last-observation-carried-forward —
    * the regularization step every downsampled metric feed needs
    * before joins or charting: per event type, the LAST `value`
    * observed each day (deterministic last: max (us, event_id) wins),
    * re-gridded onto EVERY day of the observed range, missing days
    * filled by the ignore-nulls trailing window. Days before a key's
    * first observation stay null (`filled = false` marks carried
    * rows).
    *
    * Scale shape: the per-day last-value reduction is one window on
    * (type, day) — map-side the row stream collapses to one row per
    * (type, day); the grid explode generates keys×days rows from a
    * 1-row broadcast bound (never touching the event stream again);
    * the LOCF window re-uses the (type) partitioning. No self-join,
    * no per-gap probing.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .withColumn("day", expr(s"us DIV ${DayUs}L"))
    val lastPerDay = ev
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"), col("day"))
          .orderBy(desc("us"), desc("event_id"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day"), col("value"))
    val bounds = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val grid = lastPerDay.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(expr("sequence(mn, mx)")).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPerDay, Seq("event_type", "day"), "left")
      .withColumn("filled_value", last(col("value"), ignoreNulls = true).over(w))
      .select(col("event_type"), col("day"),
        col("value").isNotNull.as("observed"), col("filled_value"))
      .orderBy("event_type", "day")
  }

  private val gapFillOracle =
    s"""WITH e AS (
       |  SELECT event_type, event_id, value,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
       |    epoch_us(CAST(ts AS TIMESTAMP)) // $DayUs AS day
       |  FROM events),
       |lastd AS (
       |  SELECT event_type, day, value FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY event_type, day ORDER BY us DESC, event_id DESC) AS rn
       |    FROM e) WHERE rn = 1),
       |b AS (SELECT min(day) AS mn, max(day) AS mx FROM e),
       |grid AS (
       |  SELECT event_type, mn + i AS day
       |  FROM (SELECT DISTINCT event_type FROM lastd), b, range(0, 100000) r(i)
       |  WHERE mn + i <= mx)
       |SELECT g.event_type AS event_type, g.day AS day,
       |  l.value IS NOT NULL AS observed,
       |  last_value(l.value IGNORE NULLS) OVER (
       |    PARTITION BY g.event_type ORDER BY g.day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
       |FROM grid g LEFT JOIN lastd l
       |  ON g.event_type = l.event_type AND g.day = l.day
       |ORDER BY g.event_type, g.day""".stripMargin

  // ---------------------------------------------------------- resample

  private val HourUs: Long = 3600L * 1000000

  /** Time-series downsampling to OHLC bars — the resample step every
    * metric/market feed runs before storage or charting: per
    * (event_type, hour), open/close are the first/last observed value
    * under the total (us, event_id) order, high/low the extremes,
    * plus count and an exact integer-cents turnover. ONE hash
    * aggregation, no window: open/close ride `min_by`/`max_by` over
    * the unique (us, event_id) key, so partial aggregation stays
    * map-side combinable — at 100 TB the shuffle carries one partial
    * bar per (partition, type, hour), never raw ticks (the window
    * formulation would shuffle every event to sort it). Doubles are
    * only ever PICKED (first/last/min/max), never summed — the
    * summed measure is exact integer cents.
    */
  def resample(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .withColumn("hour", expr(s"us DIV ${HourUs}L"))
      .groupBy(col("event_type"), col("hour"))
      .agg(
        min_by(col("value"), struct(col("us"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("us"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
      .orderBy("event_type", "hour")

  private val resampleOracle =
    s"""WITH e AS (
       |  SELECT event_type, event_id, value,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
       |    epoch_us(CAST(ts AS TIMESTAMP)) // $HourUs AS hour
       |  FROM events)
       |SELECT event_type, hour,
       |  (min({'us': us, 'id': event_id, 'val': value})).val AS open,
       |  max(value) AS high, min(value) AS low,
       |  (max({'us': us, 'id': event_id, 'val': value})).val AS close,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
       |FROM e GROUP BY event_type, hour
       |ORDER BY event_type, hour""".stripMargin

  // ---------------------------------------------------------- registry

  /** Seasonal-naive forecast + backtest — the baseline every real
    * forecasting pipeline must beat, run as one relational job: the
    * first 80% of observed days train an hour-of-day seasonal profile
    * per event type (predicted hourly count = train-total div
    * train-days, integer floor), the remaining days are scored on the
    * FULL (type × day × hour) grid — absent hours count as actual 0,
    * the error a sparse-join evaluation silently hides. All-integer:
    * µs-epoch day/hour arithmetic, floor-division predictions, MAE
    * reported in ppm (1e6·Σ|err| div points).
    *
    * Scale shape: two hash-aggs over the event stream (train profile,
    * test actuals), a 1-row bounds broadcast, and a types×days×24
    * grid exploded from literals — the grid is report-sized, never
    * event-sized; no window, no self-join.
    */
  def forecast(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val HourUs = 3600000000L
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"),
        expr(s"unix_micros(ts) div $DayUs").as("d"),
        pmod(expr(s"unix_micros(ts) div $HourUs"), lit(24)).as("h"))
    val b = ev.agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
      .withColumn("cutoff",
        col("mn") + call_function("div", (col("mx") - col("mn") + 1) * 4, lit(5)))
    val train = ev.crossJoin(broadcast(b)).filter(col("d") < col("cutoff"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(b))
      .select(col("event_type"), col("h"),
        call_function("div", col("c"), col("cutoff") - col("mn")).as("pred"))
    val actual = ev.crossJoin(broadcast(b)).filter(col("d") >= col("cutoff"))
      .groupBy(col("event_type"), col("d"), col("h"))
      .agg(count(lit(1)).as("cnt"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(b))
      .select(col("event_type"), explode(expr("sequence(cutoff, mx)")).as("d"))
      .select(col("event_type"), col("d"), explode(expr("sequence(0, 23)")).as("h"))
    grid
      .join(actual, Seq("event_type", "d", "h"), "left")
      .join(broadcast(train), Seq("event_type", "h"), "left")
      .select(col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("a"),
        coalesce(col("pred"), lit(0L)).as("p"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("a")).as("n_actual"),
        sum(abs(col("a") - col("p"))).as("total_abs_err"))
      .withColumn("mae_ppm",
        call_function("div", col("total_abs_err") * 1000000L, col("n_points")))
      .orderBy("event_type")
  }

  private val forecastOracle =
    """WITH ev AS (
      |  SELECT event_type,
      |    epoch_us(ts) // 86400000000 AS d,
      |    (epoch_us(ts) // 3600000000) % 24 AS h
      |  FROM events),
      |b AS (
      |  SELECT min(d) AS mn, max(d) AS mx,
      |    min(d) + ((max(d) - min(d) + 1) * 4) // 5 AS cutoff
      |  FROM ev),
      |train AS (
      |  SELECT event_type, h, count(*) // (cutoff - mn) AS pred
      |  FROM ev, b WHERE d < cutoff GROUP BY event_type, h, cutoff, mn),
      |actual AS (
      |  SELECT event_type, d, h, count(*) AS cnt
      |  FROM ev, b WHERE d >= cutoff GROUP BY 1, 2, 3),
      |grid AS (
      |  SELECT event_type, d, h
      |  FROM (SELECT DISTINCT event_type FROM ev),
      |    b, LATERAL (SELECT unnest(generate_series(cutoff, mx)) AS d) gd,
      |    LATERAL (SELECT unnest(generate_series(0, 23)) AS h) gh),
      |scored AS (
      |  SELECT g.event_type,
      |    coalesce(a.cnt, 0) AS a,
      |    coalesce(t.pred, 0) AS p
      |  FROM grid g
      |  LEFT JOIN actual a ON a.event_type = g.event_type AND a.d = g.d AND a.h = g.h
      |  LEFT JOIN train t ON t.event_type = g.event_type AND t.h = g.h)
      |SELECT event_type,
      |  count(*) AS n_points,
      |  CAST(sum(a) AS BIGINT) AS n_actual,
      |  CAST(sum(abs(a - p)) AS BIGINT) AS total_abs_err,
      |  CAST((sum(abs(a - p)) * 1000000) // count(*) AS BIGINT) AS mae_ppm
      |FROM scored GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("timeseries_forecast", forecast _, Some(forecastOracle),
      "seasonal-naive hour-of-day forecast + full-grid integer MAE backtest (absent hours count)"),
    GraftQuery("timeseries_resample", resample _, Some(resampleOracle),
      "OHLC downsampling in ONE map-side-combinable hash agg: min_by/max_by opens and closes"),
    GraftQuery("timeseries_gapfill", gapFill _, Some(gapFillOracle),
      "daily re-grid + LOCF fill via ignore-nulls trailing window, no per-gap probing"),
    GraftQuery("asof_join", asofJoin _, Some(asofJoinOracle),
      "as-of join via union + running-max window (single shuffle)"),
    GraftQuery("range_join", rangeJoin _, Some(rangeJoinOracle),
      "bounded interval self-join via time-bucket equi-join"),
    GraftQuery("interval_join", intervalJoin _, Some(intervalJoinOracle),
      "interval overlap join: grid-cell equi-join with the dedup-free first-overlap-cell condition"))
}
