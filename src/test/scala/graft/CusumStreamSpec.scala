package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{CusumObs, CusumStream}

/** The live CUSUM monitor must reproduce the registered batch screen
  * exactly when fed the same series under the trained reference —
  * including across micro-batch boundaries (the state pair (P, min P)
  * is the whole sufficient statistic). */
class CusumStreamSpec extends SparkSpec {

  test("streamed CUSUM levels and alarms row-equal to batch fin_cusum under chunked arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the WarehouseSpec fixture: 20 flat months then a doubled regime
    val amts = (1 to 20).map(m => 100.0 + (m % 3)) ++
      (21 to 30).map(m => 200.0 + (m % 3))
    val up = amts.zipWithIndex.map { case (a, i) =>
      ("S", "0001", 2024 + i / 12, i % 12 + 1, a)
    }.toDF("department", "gl_code", "year", "month", "amount")
    val batch = graft.warehouse.Warehouse.finCusumFrom(up).collect()
      .map(r => ((r.getInt(2), r.getInt(3)),
        (r.getBoolean(7), r.getBoolean(8)))).toMap
    // trained reference = the series' (n, s) — what batch derives in-query
    val cents = amts.map(a => math.round(a * 100))
    val (n, s) = (cents.size.toLong, cents.sum)
    val obs = amts.zipWithIndex.map { case (a, i) =>
      CusumObs("S|0001", 2024 + i / 12, i % 12 + 1, math.round(a * 100), n, s)
    }
    val stream = MemoryStream[CusumObs]
    val q = CusumStream.cusumStream(stream.toDS())
      .writeStream.format("memory").queryName("cusum_live")
      .outputMode("append").start()
    try {
      obs.grouped(7).foreach { c => stream.addData(c); q.processAllAvailable() }
      val live = spark.table("cusum_live").collect()
        .map(r => ((r.getInt(1), r.getInt(2)),
          (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6))))
        .toMap
      assert(live.size == 30)
      // alarms identical to the registered batch screen, month for month
      live.foreach { case (ym, (_, _, aHi, aLo)) =>
        assert((aHi, aLo) == batch(ym), s"month $ym")
      }
      // levels identical to the batch scaled integers (cusum dollars
      // reported by batch = C / (n * 2000.0))
      val batchLevels = graft.warehouse.Warehouse.finCusumFrom(up).collect()
        .map(r => ((r.getInt(2), r.getInt(3)),
          (r.getDouble(5), r.getDouble(6)))).toMap
      live.foreach { case (ym, (cHi, cLo, _, _)) =>
        assert(batchLevels(ym) == ((cHi / (n * 2000.0), cLo / (n * 2000.0))),
          s"level at $ym")
      }
    } finally q.stop()
  }

  test("out-of-order month is dropped, not folded: levels stay exact and the late row is absent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val amts = (1 to 12).map(m => 100.0 + (m % 3))
    val cents = amts.map(a => math.round(a * 100))
    val (n, s) = (cents.size.toLong, cents.sum)
    def ob(i: Int) =
      CusumObs("S|0001", 2024, i + 1, cents(i), n, s)
    val inOrder = (0 until 12).map(ob)
    def run(batches: Seq[Seq[CusumObs]], name: String) = {
      val stream = MemoryStream[CusumObs]
      val q = CusumStream.cusumStream(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { c => stream.addData(c); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getInt(2), r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
          .sortBy(_._1).toSeq
      } finally q.stop()
    }
    val clean = run(inOrder.grouped(5).toSeq, "cusum_clean")
    // months 1-8 arrive, then month 3 is REPLAYED late (plus a fresh
    // month 9), then the rest — the regression the guard exists for
    val withLate = run(Seq(inOrder.take(8),
      Seq(ob(2).copy(cents = 999999L), ob(8)), inOrder.drop(9)), "cusum_late")
    // the late month-3 re-arrival produced no row and corrupted nothing:
    // the emission equals the clean in-order replay exactly
    assert(withLate == clean, s"late replay corrupted the fold")
    assert(clean.size == 12)
  }
}
