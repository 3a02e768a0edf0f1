package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, SparkEntry}

/** Shuffle-count audit for the event-analytics family: these queries
  * claim specific exchange budgets in their scaladocs; the plans are
  * pinned here so a refactor that silently adds a shuffle fails CI.
  */
class PlanAuditSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def exchanges(name: String): Int = {
    val pe = SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString
    "\\bExchange ".r.findAllIn(pe).size
  }

  test("retention_cohorts: the cohort join broadcasts; only 2 exchanges touch raw rows") {
    // 5 exchanges total, but only (user,wk) distinct and the cohort min
    // move un-aggregated data; grid agg / window / final sort shuffle
    // the ≤(cohorts × offsets)-row grid. The load-bearing assertion is
    // the broadcast: the full event set must never re-shuffle for the
    // cohort join.
    val pe = SparkEntry.queries("retention_cohorts")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(pe.contains("BroadcastHashJoin"), s"cohort join not broadcast:\n$pe")
    assert(exchanges("retention_cohorts") <= 5,
      s"retention plan grew to ${exchanges("retention_cohorts")} exchanges")
  }

  test("event_anomalies: hourly agg + tiny grid window stay within 3 exchanges") {
    assert(exchanges("event_anomalies") <= 3,
      s"anomaly plan grew to ${exchanges("event_anomalies")} exchanges")
  }

  test("seq_pack: one shard shuffle + final order only") {
    assert(exchanges("seq_pack") <= 2,
      s"packing plan grew to ${exchanges("seq_pack")} exchanges")
  }
}
