package graft

import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {

  test("rank_stats_scalable equals the single-window rank_stats bit for bit") {
    val exact = Analytics.rankStats(spark, sf).collect()
    val scaled = Analytics.rankStatsScalable(spark, sf).collect()
    assert(exact.length == scaled.length)
    exact.zip(scaled).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("rank_stats_scalable ranks inside (status, bucket) windows, not status-wide") {
    // Plan pin for the 100x property: the big-table row_number window must
    // be partitioned by (o_orderstatus, bkt), never by o_orderstatus alone
    // (the histogram's own tiny windows may be status-wide — that frame is
    // 3*BUCKETS rows).
    val plan = Analytics.rankStatsScalable(spark, sf).queryExecution.optimizedPlan.toString
    val rnLines = plan.split("\n").filter(_.contains("row_number()"))
    assert(rnLines.nonEmpty && rnLines.forall(_.contains("bkt")), plan)
  }
}
