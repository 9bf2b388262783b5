package graft

import org.apache.spark.sql.Row

class RelationalSpec extends SparkSpec {

  test("q1_agg groups lineitem and sums exactly") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq ==
      Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "count_order", "avg_qty"))
    // exact-cents arithmetic: sum_qty must equal avg_qty * count to the bit
    rows.foreach { r =>
      val sumQty = r.getDouble(2)
      val n = r.getLong(4)
      val avg = r.getDouble(5)
      assert(math.abs(avg * n - sumQty) < 1e-6)
    }
    // deterministic order
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(flags == flags.sorted)
  }

  test("every oracleSql key has a queries entry and vice-versa keys are valid") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k without query")
    }
  }
}
