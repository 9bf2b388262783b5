package graft

import org.apache.spark.sql.functions._

/** The r7 TPC-H additions (TpchExtra.scala): internal-consistency checks
  * against independently recomputed values at sf0.001. Oracle-parity is
  * the driver gate's job; these pin the semantics each query claims. */
class TpchExtraSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q6_filter_agg matches a recomputed filtered revenue sum") {
    val rows = run("q6_filter_agg").collect()
    assert(rows.length == 1)
    val expected = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .select((round(col("l_extendedprice") * 100).cast("long") *
        round(col("l_discount") * 10000).cast("long")).as("u"))
      .agg(sum(col("u"))).first().getLong(0) / 1000000.0
    assert(math.abs(rows.head.getDouble(0) - expected) < 1e-9)
  }

  test("q8_market_share yields one share per year, each within [0,1]") {
    val rows = run("q8_market_share").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1995L, 1996L))
    rows.foreach { r =>
      val s = r.getDouble(1)
      assert(s >= 0.0 && s <= 1.0, s"share out of range: $s")
    }
  }

  test("q9_nation_profit groups are unique and ordered nation asc, year desc") {
    val rows = run("q9_nation_profit").collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(keys.distinct == keys)
    assert(keys == keys.sortBy { case (n, y) => (n, -y) })
  }

  test("q11_value_concentration returns exactly the suppliers above 0.1% of total") {
    val rows = run("q11_value_concentration").collect()
    assert(rows.nonEmpty)
    // recompute per-supplier cent totals independently
    val sv = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = sv.values.map(BigInt(_)).sum
    val expected = sv.filter { case (_, v) => BigInt(v) * 1000 > total }
    assert(rows.map(_.getLong(0)).toSet == expected.keySet)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - expected(r.getLong(0)) / 100.0) < 1e-9)
    }
  }

  test("q12_shipping_delay line counts partition the joined fact") {
    val rows = run("q12_shipping_delay").collect()
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    val totalLines = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val joined = graft.sources.Tables.lineitem(spark, sf).join(
      graft.sources.Tables.orders(spark, sf),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(totalLines == joined)
  }

  test("q13_order_count_dist distribution covers every customer exactly once") {
    val rows = run("q13_order_count_dist").collect()
    val nCustomers = graft.sources.Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nCustomers)
    // custdist descending, ties broken by c_count descending
    val pairs = rows.map(r => (r.getLong(1), r.getLong(0))).toSeq
    assert(pairs == pairs.sortBy { case (d, c) => (-d, -c) })
  }

  test("q2_min_cost_supplier keeps only per-part minimum unit prices, ties included") {
    val rows = run("q2_min_cost_supplier").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val byPart = rows.groupBy(_.getLong(0))
    byPart.values.foreach { g =>
      val prices = g.map(_.getDouble(3)).distinct
      assert(prices.length == 1, s"non-min survivors in a part group: $g")
    }
  }

  test("q6 pushes every predicate to the scan and reads only needed columns") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = run("q6_filter_agg")
    // scan METADATA, not the plan string — toString truncates the
    // PushedFilters list past ~100 chars; unwrap the AQE root first
    // (its collect treats the input plan as opaque)
    val inner = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = inner.collectWithSubqueries {
      case f: FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("lineitem")) => f
    }.headOption
    assert(scan.isDefined, "no lineitem FileSourceScanExec found")
    val pushed = scan.get.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("LessThan(l_shipdate"), s"shipdate not pushed: $pushed")
    assert(pushed.contains("LessThan(l_quantity"), s"quantity not pushed: $pushed")
    // column pruning: exactly the 4 touched columns, nothing else
    assert(scan.get.requiredSchema.fieldNames.toSet ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
      s"wrong read schema: ${scan.get.requiredSchema.fieldNames.toSeq}")
  }

  test("q11's per-supplier sums are staged once (no in-plan lineitem re-derivation)") {
    // the global total re-aggregates the STAGED sv frame; without the
    // barrier both the total and the filter side would each scan
    // lineitem (the q15 double-derive shape)
    val plan = run("q11_value_concentration").queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem.parquet"),
      s"lineitem scanned inside the query plan — barrier not in effect:\n$plan")
  }

  test("grouping_sets_agg emits exactly the {(p,s),(s),()} lattice, sums consistent") {
    val rows = run("grouping_sets_agg").collect()
    val leaves = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    val byStatus = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) != "ALL")
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    // the (priority)-only set is NOT in the lattice — rollup/cube would add it
    assert(!rows.exists(r => r.getString(0) != "ALL" && r.getString(1) == "ALL"),
      "unexpected (priority, ALL) rows — lattice is not the requested grouping sets")
    assert(grand.length == 1 && byStatus.nonEmpty && leaves.nonEmpty)
    assert(leaves.map(_.getLong(2)).sum == grand.head.getLong(2))
    byStatus.foreach { s =>
      val exp = leaves.filter(_.getString(1) == s.getString(1)).map(_.getLong(2)).sum
      assert(s.getLong(2) == exp, s"status ${s.getString(1)} subtotal mismatch")
    }
  }

  test("q20_excess_suppliers: every reported supplier holds >20% of some red part") {
    val rows = run("q20_excess_suppliers").collect()
    assert(rows.nonEmpty)
    val l = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("qty_s"))
      .collect()
    val perPart = l.groupBy(_.getLong(0)).map { case (p, g) =>
      p -> g.map(_.getLong(2)).sum
    }
    val redParts = graft.sources.Tables.part(spark, sf)
      .filter(col("p_name").like("%red%")).select(col("p_partkey"))
      .collect().map(_.getLong(0)).toSet
    val qualifying = l.filter(r => redParts(r.getLong(0)) &&
      r.getLong(2) * 5 > perPart(r.getLong(0))).map(_.getLong(1)).toSet
    assert(rows.map(_.getLong(0)).toSet == qualifying)
  }

  test("discount_elasticity: line conservation, r in [-1,1], stats in range") {
    import spark.implicits._
    val rows = SparkEntry.queries("discount_elasticity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nJoined = graft.sources.Tables.lineitem(spark, sf).join(
      graft.sources.Tables.part(spark, sf),
      col("l_partkey") === col("p_partkey")).count()
    assert(rows.map(_.getLong(1)).sum == nJoined, "every joined line counted once")
    rows.filter(!_.isNullAt(4)).foreach { r =>
      assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-9, s"r out of range: $r")
    }
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 10000, s"bps: $r")
      assert(r.getDouble(3) > 0, s"qty: $r")
    }
  }

  test("orders_backlog: conservation (opened = orders), never negative, closes out") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("orders_backlog")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 0L), "backlog never negative")
    val nOrders = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nOrders, "every order opens once")
    val withLines = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == withLines, "every lined order closes once")
    assert(rows.last.getLong(3) == nOrders - withLines, "final backlog = never-closed")
  }

  test("trade_flow_matrix: export shares sum to 1 per supplier nation, totals = q-free fact") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("trade_flow_matrix")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25 * 25, "at most |nation|^2 cells")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getLong(3) > 0, s"empty cell emitted: $r")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, s"share out of range: $r")
    }
    rows.groupBy(_.getString(0)).foreach { case (sn, cells) =>
      val s = cells.map(_.getDouble(4)).sum
      assert(math.abs(s - 1.0) <= 1e-4, s"$sn export shares sum $s")
    }
    // conservation: the matrix covers every lineitem exactly once
    val nLines = graft.sources.Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(3)).sum == nLines, "every line lands in one cell")
  }
}
