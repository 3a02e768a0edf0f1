package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery

/** Event-sequence analytics over the change-stream-shaped `events`
  * table: ordered funnel conversion and weekly retention cohorts — the
  * two reports every large event pipeline serves.
  *
  * Time arithmetic is integer microseconds end to end (`unix_micros` /
  * DuckDB `epoch_us` after the shared ns→µs truncation), so stage
  * boundaries and week indices are bit-identical cross-engine; the
  * only division in each query is the final single-division fraction.
  *
  * Scale notes:
  *   - [[eventFunnel]] computes all three stage timestamps in
  *     consecutive window projections over the SAME `user_id`
  *     partitioning — Catalyst plans ONE hash exchange, and no
  *     self-joins of the event table (the naive per-stage join shape
  *     re-shuffles the full table once per stage).
  *   - [[retentionCohorts]] reduces events to distinct (user, week)
  *     pairs early (map-side combine), so the cohort join moves one
  *     row per user-week, not one per event.
  */
object Funnels {

  private val WeekUs: Long = 7L * 86400 * 1000000

  /** Ordered funnel view → click → purchase: a user converts a stage
    * only with an event STRICTLY after their previous stage's first
    * event (the order-sensitive definition real funnels use; a click
    * before the first view does not count).
    */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id"))
    val staged = ev
      .withColumn("t1", min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("us") > col("t1"), col("us"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("us") > col("t2"), col("us"))).over(w))
    val perUser = staged.groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
    val counts = perUser.agg(
      count(col("t1")).as("n1"), count(col("t2")).as("n2"), count(col("t3")).as("n3"))
    counts
      .select(explode(array(
        struct(lit("1_view").as("stage"), col("n1").as("n_users")),
        struct(lit("2_click").as("stage"), col("n2").as("n_users")),
        struct(lit("3_purchase").as("stage"), col("n3").as("n_users")))).as("s"))
      .select(col("s.stage").as("stage"), col("s.n_users").as("n_users"))
      .withColumn("conv_frac",
        round(col("n_users").cast("double") /
          max(col("n_users")).over(Window.partitionBy()), 12))
      .orderBy("stage")
  }

  private val eventFunnelOracle =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
      |  OVER (PARTITION BY user_id) AS t1 FROM e),
      |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
      |  OVER (PARTITION BY user_id) AS t2 FROM s1),
      |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
      |  OVER (PARTITION BY user_id) AS t3 FROM s2),
      |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
      |  FROM s3 GROUP BY 1),
      |c AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM u),
      |st AS (
      |  SELECT '1_view' AS stage, n1 AS n_users FROM c
      |  UNION ALL SELECT '2_click', n2 FROM c
      |  UNION ALL SELECT '3_purchase', n3 FROM c)
      |SELECT stage, n_users,
      |  round(CAST(n_users AS DOUBLE) / max(n_users) OVER (), 12) AS conv_frac
      |FROM st ORDER BY stage""".stripMargin

  /** Weekly retention: cohort = a user's first-activity week (integer
    * µs-epoch week — no calendar/timezone semantics to diverge on);
    * for each later week offset, the fraction of the cohort still
    * active. The k=0 row IS the cohort size, so the denominator is a
    * window max over the grid, not a second pass.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val uw = graft.Tables.events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $WeekUs").as("wk"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    uw.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_k"))
      .agg(count(lit(1)).as("n_active"))
      .withColumn("retention_frac",
        round(col("n_active").cast("double") /
          max(col("n_active")).over(Window.partitionBy(col("cohort_wk"))), 12))
      .orderBy("cohort_wk", "week_k")
  }

  private val retentionCohortsOracle =
    s"""WITH uw AS (
       |  SELECT DISTINCT user_id,
       |    epoch_us(CAST(ts AS TIMESTAMP)) // $WeekUs AS wk
       |  FROM events),
       |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1),
       |grid AS (
       |  SELECT cohort_wk, wk - cohort_wk AS week_k, count(*) AS n_active
       |  FROM uw JOIN cohort USING (user_id)
       |  GROUP BY 1, 2)
       |SELECT cohort_wk, week_k, n_active,
       |  round(CAST(n_active AS DOUBLE) /
       |    max(n_active) OVER (PARTITION BY cohort_wk), 12) AS retention_frac
       |FROM grid ORDER BY cohort_wk, week_k""".stripMargin

  private val HourUs: Long = 3600L * 1000000

  /** Trailing window for the anomaly baseline (hours). */
  val AnomalyBaselineHours = 24

  /** Rate-anomaly detection: hours whose event count exceeds 2× the
    * mean of the trailing 24 INCLUSIVE hours, per event type — the
    * health check an ingest pipeline alarms on. The spike test is an
    * integer cross-multiplication (`count · n_hours > 2 · window_sum`),
    * so no fraction is ever compared; the reported ratio is the single
    * final division.
    *
    * Scale: one hash-agg to hourly counts (map-side combine does the
    * heavy reduction), then a RANGE-frame window over the tiny
    * (type × hours) grid.
    */
  def eventAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val hourly = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr(s"unix_micros(ts) DIV $HourUs").as("hr"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rangeBetween(-(AnomalyBaselineHours - 1), 0)
    hourly
      .withColumn("win_sum", sum(col("n")).over(w))
      .withColumn("win_hours", count(lit(1)).over(w))
      .filter(col("n") * col("win_hours") > col("win_sum") * 2)
      .select(col("event_type"), col("hr"), col("n"),
        col("win_sum"), col("win_hours"),
        round(col("n").cast("double") * col("win_hours") / col("win_sum"), 12)
          .as("spike_ratio"))
      .orderBy("event_type", "hr")
  }

  private val eventAnomaliesOracle =
    s"""WITH hourly AS (
       |  SELECT event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) // $HourUs AS hr,
       |    count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |win AS (
       |  SELECT event_type, hr, n,
       |    CAST(sum(n) OVER w AS BIGINT) AS win_sum,
       |    count(*) OVER w AS win_hours
       |  FROM hourly
       |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
       |    RANGE BETWEEN ${AnomalyBaselineHours - 1} PRECEDING AND CURRENT ROW))
       |SELECT event_type, hr, n, win_sum, win_hours,
       |  round(CAST(n AS DOUBLE) * win_hours / win_sum, 12) AS spike_ratio
       |FROM win
       |WHERE n * win_hours > win_sum * 2
       |ORDER BY event_type, hr""".stripMargin

  /** Last-touch attribution: every purchase credits the user's most
    * recent STRICTLY-preceding touch event (click or view; none →
    * 'direct') — the standard marketing-attribution transform, and a
    * window pattern the rest of the suite doesn't cover:
    * `last(..., ignoreNulls)` over a trailing row frame, i.e. "carry
    * the latest qualifying value forward". Reports per channel:
    * purchases, exact-decimal revenue, and total touch→purchase
    * latency in integer µs (sums are exact; no float division inside
    * the gate).
    *
    * Ties on one µs timestamp break on the unique `event_id`, so the
    * frame boundary is deterministic cross-engine.
    *
    * Scale: ONE user_id hash exchange serves both window columns
    * (same partitioning, same frame — Catalyst plans a single window
    * operator); everything after is a hash-agg onto ≤3 channel rows
    * with map-side partials.
    */
  def eventAttribution(spark: SparkSession, dir: String): DataFrame =
    eventAttributionOn(graft.Tables.events(spark, dir))

  private[operators] def eventAttributionOn(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_type"), col("value"),
        col("event_id"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("click", "view")
    ev
      // both window columns in ONE projection so CollapseWindow plans
      // a single Window operator over the one user_id exchange
      .select(col("*"),
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w)
          .as("touch_type"),
        last(when(isTouch, col("us")), ignoreNulls = true).over(w)
          .as("touch_us"))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch_type"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        Relational.dsum(col("value"), 6).as("revenue"),
        sum(coalesce(col("us") - col("touch_us"), lit(0L))).as("delay_us_total"))
      .orderBy("channel")
  }

  private val eventAttributionOracle =
    """WITH e AS (
      |  SELECT user_id, event_type, value, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |t AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type IN ('click', 'view')
      |      THEN event_type END IGNORE NULLS) OVER w AS touch_type,
      |    last_value(CASE WHEN event_type IN ('click', 'view')
      |      THEN us END IGNORE NULLS) OVER w AS touch_us
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT coalesce(touch_type, 'direct') AS channel,
      |  count(*) AS n_purchases,
      |  CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
      |  CAST(sum(coalesce(us - touch_us, 0)) AS BIGINT) AS delay_us_total
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY channel""".stripMargin

  // ---------------------------------------------------------- registry

  // ----------------------------------------------------- DAU/WAU ratio

  /** DAU/WAU stickiness — the product-analytics engagement ratio. A
    * sliding-window DISTINCT cannot sum daily distincts (users repeat
    * across days), so each (user, active-day) pair CONTRIBUTES to the
    * seven report days it covers: one distinct on (user, day), a ×7
    * explode of that (already user-deduped) pair stream, and one
    * distinct-agg per report day — shuffle is pairs×7, never events×7,
    * and no self-join over the raw stream exists. Report days clamp to
    * the observed range; the ratio is one IEEE division, rounded to 12
    * like every cross-engine double here.
    */
  def eventStickiness(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct()
    val bounds = pairs.agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
    val dau = pairs.groupBy(col("d").as("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val wau = pairs
      .select(col("user_id"), explode(expr("sequence(d, d + 6)")).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, "day")
      .crossJoin(broadcast(bounds))
      .filter(col("day").between(col("mn"), col("mx")))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 12).as("stickiness"))
      .orderBy("day")
  }

  private val eventStickinessOracle =
    """WITH pairs AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
      |b AS (SELECT min(d) AS mn, max(d) AS mx FROM pairs),
      |dau AS (SELECT d AS day, count(DISTINCT user_id) AS dau FROM pairs GROUP BY d),
      |wau AS (
      |  SELECT day, count(DISTINCT user_id) AS wau FROM (
      |    SELECT user_id, d + i AS day FROM pairs, range(0, 7) r(i)) u
      |  GROUP BY day)
      |SELECT day, dau, wau,
      |  round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 12) AS stickiness
      |FROM dau JOIN wau USING (day), b
      |WHERE day BETWEEN b.mn AND b.mx
      |ORDER BY day""".stripMargin

  /** Session gap bounding a journey step (µs): consecutive events
    * further apart than this belong to different paths.
    */
  private val PathGapUs: Long = 1800L * 1000000

  /** Batch sessionization — the gap-based session assignment every
    * event warehouse materializes (the batch twin of the streaming
    * sessionize path): an event starts a NEW session when it is the
    * user's first or follows a > 30-minute silence; the session id is
    * the running count of session starts. Reports per-user session
    * structure: session count, busiest session, longest session span.
    *
    * Scale shape: the lag and the running sum stack on ONE (user_id)
    * window partitioning — a single hash exchange of the event
    * stream; the two downstream hash-aggs re-use the same user
    * partitioning (Catalyst collapses them onto the window exchange,
    * no second shuffle of event rows). All session arithmetic is
    * integer µs.
    */
  def eventSessions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) <= PathGapUs, 0L).otherwise(1L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_ev"), (max(col("us")) - min(col("us"))).as("span_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_ev")).as("n_events"),
        max(col("n_ev")).as("busiest_events"), max(col("span_us")).as("longest_span_us"))
      .orderBy("user_id")
  }

  private val eventSessionsOracle =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
       |f AS (
       |  SELECT user_id, us,
       |    CASE WHEN us - lag(us, 1) OVER w <= $PathGapUs THEN 0 ELSE 1 END AS new_s,
       |    event_id
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |s AS (
       |  SELECT user_id, us,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
       |      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM f),
       |per AS (
       |  SELECT user_id, sid, count(*) AS n_ev, max(us) - min(us) AS span_us
       |  FROM s GROUP BY user_id, sid)
       |SELECT user_id, count(*) AS n_sessions,
       |  CAST(sum(n_ev) AS BIGINT) AS n_events,
       |  max(n_ev) AS busiest_events, max(span_us) AS longest_span_us
       |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Top user-journey trigrams — sequential path mining, the "what do
    * users DO around a purchase" report funnels can't answer: each
    * user's event stream ordered by (ts, event_id), consecutive
    * event-type triples whose BOTH gaps stay inside the 30-minute
    * session bound, counted and ranked.
    *
    * Scale shape: the two leads stack on ONE (user_id) window
    * partitioning — a single hash exchange of the event stream, no
    * self-joins (the naive 3-way join re-shuffles the table twice);
    * the trigram hash-agg's key space is |event_types|³ (map-side
    * combine collapses it early), and the top-20 is TakeOrdered
    * (per-partition heads + driver merge, no global sort).
    */
  def eventPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .withColumn("us2", lead(col("us"), 1).over(w))
      .withColumn("us3", lead(col("us"), 2).over(w))
      .filter(col("e3").isNotNull &&
        col("us2") - col("us") <= PathGapUs && col("us3") - col("us2") <= PathGapUs)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(desc("n_paths"), col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  private val eventPathsOracle =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
       |  FROM events),
       |t AS (
       |  SELECT event_type AS e1,
       |    lead(event_type, 1) OVER w AS e2, lead(event_type, 2) OVER w AS e3,
       |    us, lead(us, 1) OVER w AS us2, lead(us, 2) OVER w AS us3
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
       |SELECT e1, e2, e3, count(*) AS n_paths
       |FROM t
       |WHERE e3 IS NOT NULL AND us2 - us <= $PathGapUs AND us3 - us2 <= $PathGapUs
       |GROUP BY 1, 2, 3
       |ORDER BY n_paths DESC, e1, e2, e3
       |LIMIT 20""".stripMargin

  /** First-order Markov transition model over the event stream — the
    * journey model product analytics exports (next-action prediction,
    * anomaly screens on p(next|current)): consecutive event pairs per
    * user, per-(from, to) transition counts, row-normalized
    * probabilities (ONE IEEE division each, 12 places) and the rank of
    * each destination within its source state. Scale: the lead()
    * window shuffles once on user_id (the same exchange every
    * sessionization pass pays), the transition count is a hash-agg on
    * a |states|² key space, and the normalization windows run over
    * ≤|states|² rows — nothing after the first exchange touches the
    * event stream again.
    */
  def eventMarkov(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val trans = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .filter(col("e2").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"))
      .agg(count(lit(1)).as("n_trans"))
    val wSrc = Window.partitionBy(col("e1"))
    trans
      .withColumn("n_src", sum(col("n_trans")).over(wSrc))
      .select(col("e1"), col("e2"), col("n_trans"),
        round(col("n_trans") / col("n_src"), 12).as("p_trans"),
        row_number().over(wSrc.orderBy(desc("n_trans"), col("e2"))).as("dest_rank"))
      .orderBy("e1", "e2")
  }

  private val eventMarkovOracle =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |t AS (
      |  SELECT event_type AS e1,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS e2
      |  FROM e),
      |c AS (
      |  SELECT e1, e2, count(*) AS n_trans FROM t
      |  WHERE e2 IS NOT NULL GROUP BY 1, 2)
      |SELECT e1, e2, n_trans,
      |  round(CAST(n_trans AS DOUBLE) / sum(n_trans) OVER (PARTITION BY e1), 12) AS p_trans,
      |  CAST(row_number() OVER (PARTITION BY e1 ORDER BY n_trans DESC, e2) AS INTEGER) AS dest_rank
      |FROM c ORDER BY e1, e2""".stripMargin

  /** A/B experiment readout — deterministic hash-bucket assignment
    * (the ONLY production-safe split: arm membership derives from the
    * user id alone, so every event of a user lands in one arm without
    * any assignment table, join, or coordination) and per-arm funnel
    * conversion. Per-user reduction first (one hash-agg on user_id),
    * then a 2-group rollup: conversion rate is a SINGLE IEEE division
    * of exact integer counts and revenue the exact-decimal sum, so
    * both engines agree bit-for-bit. At 100 TB the per-user agg
    * map-side combines and the arm rollup moves 2 rows.
    */
  def eventAbtest(spark: SparkSession, dir: String): DataFrame = {
    val perUser = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"),
        sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0)).cast("decimal(27,4)")).as("rev"))
      .withColumn("arm",
        when(pmod(Dedup.phash(col("user_id").cast("string")), lit(2)) === 0, "A")
          .otherwise("B"))
    perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("conv")).as("n_converted"),
        (sum(col("conv")).cast("double") / count(lit(1))).as("conv_rate"),
        sum(col("rev")).cast("double").as("revenue"))
      .orderBy("arm")
  }

  private val eventAbtestOracle = {
    val armHash = Dedup.phashSql("CAST(user_id AS VARCHAR)")
    s"""WITH per_user AS (
       |  SELECT user_id,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
       |    sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
       |      AS DECIMAL(27,4))) AS rev,
       |    CASE WHEN $armHash % 2 = 0 THEN 'A' ELSE 'B' END AS arm
       |  FROM events GROUP BY user_id)
       |SELECT arm, count(*) AS n_users,
       |  CAST(sum(conv) AS BIGINT) AS n_converted,
       |  CAST(sum(conv) AS DOUBLE) / count(*) AS conv_rate,
       |  CAST(sum(rev) AS DOUBLE) AS revenue
       |FROM per_user GROUP BY arm ORDER BY arm""".stripMargin
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("event_abtest", eventAbtest _, Some(eventAbtestOracle),
      "A/B readout: deterministic hash-bucket arms, per-arm funnel conversion + exact revenue"),
    GraftQuery("event_sessions", eventSessions _, Some(eventSessionsOracle),
      "gap-based batch sessionization: one user-window exchange, per-user session structure"),
    GraftQuery("event_markov", eventMarkov _, Some(eventMarkovOracle),
      "first-order Markov transition matrix: per-(from, to) counts, row-normalized " +
        "probabilities, destination rank per source state"),
    GraftQuery("event_paths", eventPaths _, Some(eventPathsOracle),
      "top session-bounded event-type trigram journeys: stacked leads on one window exchange"),
    GraftQuery("event_stickiness", eventStickiness _, Some(eventStickinessOracle),
      "DAU/WAU stickiness: sliding 7-day distinct users via pairwise day contribution, no self-join"),
    GraftQuery("event_attribution", eventAttribution _, Some(eventAttributionOracle),
      "last-touch purchase attribution via ignore-nulls trailing window"),
    GraftQuery("event_funnel", eventFunnel _, Some(eventFunnelOracle),
      "ordered view->click->purchase funnel, one shuffle via stacked windows"),
    GraftQuery("retention_cohorts", retentionCohorts _, Some(retentionCohortsOracle),
      "weekly retention grid from integer epoch-week cohorts"),
    GraftQuery("event_anomalies", eventAnomalies _, Some(eventAnomaliesOracle),
      "hourly rate spikes vs trailing-24h mean (integer cross-multiplied test)"))
}
