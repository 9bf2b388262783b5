package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Error bounds for the sketch-based queries. Since r14 both are fully
  * oracled at the driver (md5-derived HLL registers / bottom-k sample
  * thresholds that DuckDB replays bit-for-bit), so the driver owns
  * exactness vs the mirror and this spec owns the approximation bound
  * vs the EXACT aggregates — the two checks are complementary. */
class ApproxSpec extends SparkSpec {

  test("approx_distinct within 5% of exact countDistinct") {
    val approx = SparkEntry.queries("approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) <= math.max(1, 0.05 * ex),
        s"group $k: approx ${approx(k)} vs exact $ex")
    }
  }

  test("approx_percentiles within 5% of exact percentiles") {
    val approx = SparkEntry.queries("approx_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = SparkEntry.queries("percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p50, p90)) =>
      assert(math.abs(approx(k)._1 - p50) <= math.max(0.5, 0.05 * p50))
      assert(math.abs(approx(k)._2 - p90) <= math.max(0.5, 0.05 * p90))
    }
  }
}
