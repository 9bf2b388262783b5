package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Registry-wide physical-plan invariant: NO registered query may plan a
  * non-broadcast cartesian product — the join shape that turns a working
  * sf0.1 query into an O(n²) shuffle at 100 TB. The handful of constant
  * marker frames in the statements derivation (2-3 literal rows crossed
  * onto the fact) plan as BroadcastNestedLoopJoin with a tiny build
  * side, which is the correct shape and stays allowed; a
  * CartesianProductExec (both sides partitioned, every pair
  * materialized) is never acceptable in this registry. */
class PlanInvariantsSpec extends SparkSpec {

  test("no registered query plans a non-broadcast cartesian product") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
      val hits = plan.collectWithSubqueries { case c: CartesianProductExec => c }
      if (hits.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian product planned in: ${offenders.mkString(", ")}")
  }
}
