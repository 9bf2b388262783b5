package graft

import org.apache.spark.sql.functions._
import graft.operators.Salt
import graft.sources.Tables

/** Scale-machinery specs: bucketed co-located joins (no shuffle at the
  * join) and deterministic skew salting (same answers, spread keys). */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_bkt")
      Tables.customer(spark, sf).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_bkt")
      val j = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      // co-located: the join itself reads pre-bucketed data — no exchange
      // between the scans and the join (only the final agg may shuffle)
      val joinPart = plan.substring(plan.indexOf("Join"))
      assert(!plan.substring(0, plan.indexOf("Join")).contains("Exchange") ||
        plan.contains("SortMergeJoin"), plan)
      val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
      assert(exchanges <= 1, s"expected at most the agg exchange, got $exchanges:\n$plan")
      // and the answer matches the unbucketed join
      val expect = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("salted aggregation matches plain aggregation") {
    val e = Tables.eventsUs(spark, sf)
    val plain = e.groupBy(col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).as("sum_value"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Salt.saltedSumCount(e, Seq(col("event_type")),
        round(col("value") * 100).cast("long"), 16, Seq(col("event_id")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join matches plain join and spreads hot keys") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salt.saltedJoin(o, c, "o_custkey", 8, Seq(col("o_orderkey")))
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // determinism: same salt for same rows on re-run
    val s1 = o.select(Salt.rowSalt(8, Seq(col("o_orderkey"))).as("s")).collect()
    val s2 = o.select(Salt.rowSalt(8, Seq(col("o_orderkey"))).as("s")).collect()
    assert(s1.sameElements(s2))
  }
}
