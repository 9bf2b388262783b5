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

  test("scd2 intervals tile per user: gapless, run-collapsed, exactly one current row") {
    val rows = Analytics.scd2Intervals(spark, sf)
      .select("user_id", "attr", "valid_from_us", "valid_to_us", "version", "is_current")
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).sameElements(1 to sorted.length), s"user $uid versions")
      sorted.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a.getLong(3) == b.getLong(2), s"user $uid: valid_to must equal next valid_from")
        assert(a.getString(1) != b.getString(1), s"user $uid: consecutive runs must differ")
      }
      assert(sorted.count(_.getBoolean(5)) == 1 && sorted.last.getBoolean(5),
        s"user $uid: exactly the last interval is current")
      assert(sorted.init.forall(!_.isNullAt(3)) && sorted.last.isNullAt(3),
        s"user $uid: only the current interval is open-ended")
    }
  }

  test("scd2 intervals: both windows share one user_id exchange") {
    val plan = Analytics.scd2Intervals(spark, sf).queryExecution.executedPlan.toString
    val exchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected a single shuffle, got $exchanges:\n$plan")
  }
}
