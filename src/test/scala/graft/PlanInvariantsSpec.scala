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

  test("query registry has no silent name collisions and every oracle has a query") {
    import graft.operators._
    val parts = Seq(Relational.queries, Analytics.queries,
      graft.warehouse.Warehouse.queries, TextAnalysis.queries,
      TrainPrep.queries, Dedup.queries, Ann.queries,
      graft.streaming.EventStreams.queries, Multimodal.queries)
    // Map ++ overwrites silently: a duplicate name would shrink the merge
    assert(parts.map(_.size).sum == SparkEntry.queries.size,
      "duplicate query name across operator modules")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      s"orphan oracle keys: ${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }

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
