package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** MemoryStream payloads (top-level: encoders require stable types). */
case class StreamEv(event_id: Long, user_id: Long, ts_us: Long, value: Double)
case class OhlcEv(event_id: Long, ts_us: Long, event_type: String, value: Double)

/** Streaming specs: drive the streaming operators through MemoryStream
  * and assert they converge to their batch-equivalent answers. */
class StreamingSpec extends SparkSpec {

  private def loadEvents(): Seq[Event] = {
    Tables.eventsUs(spark, sf)
      .select("user_id", "ts_us", "event_type", "value")
      .collect()
      .map(r => Event(r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(_.ts_us)
  }

  test("watermarked tumbling agg over a memory stream matches the batch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    val withTs = stream.toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val q = EventStreams.tumblingAgg(withTs)
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      val got = spark.table("tumbling")
        .select(unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start_us", "event_type").collect()
      val want = SparkEntry.queries("stream_tumbling_agg")(spark, sf).collect()
      assert(got.length == want.length && got.sameElements(want))
    } finally q.stop()
  }

  test("dedup-then-count uniques stream matches the batch distinct-user panel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    val withTs = stream.toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val q = EventStreams.uniquesStream(withTs)
      .writeStream.format("memory").queryName("uniq")
      .outputMode("complete").start()
    try {
      // two batches: replays of the first half arrive with the second —
      // the dedup state must absorb them
      val (a, b) = events.splitAt(events.length / 2)
      stream.addData(a)
      q.processAllAvailable()
      stream.addData(b ++ a.take(200))
      q.processAllAvailable()
      val got = spark.table("uniq")
        .select(unix_micros(col("hour")).as("window_start_us"), col("n_users"))
        .orderBy("window_start_us").collect()
      val want = SparkEntry.queries("stream_uniques")(spark, sf)
        .select(col("window_start_us"), col("n_users")).collect()
      assert(got.length == want.length && got.sameElements(want))
    } finally q.stop()
  }

  test("streaming OHLC bars converge to the oracled batch events_ohlc_bars") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.eventsUs(spark, sf)
      .select("event_id", "ts_us", "event_type", "value").collect()
      .map(r => OhlcEv(r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(_.ts_us)
    val stream = MemoryStream[OhlcEv]
    val withTs = stream.toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val q = EventStreams.ohlcStream(withTs)
      .writeStream.format("memory").queryName("ohlc")
      .outputMode("complete").start()
    try {
      // chunked arrivals: partial bars from batch 1 must merge exactly
      // with batch 2's remainder (struct min/max is mergeable state)
      val (a, b) = events.splitAt(events.length / 2)
      stream.addData(a)
      q.processAllAvailable()
      stream.addData(b)
      q.processAllAvailable()
      val got = spark.table("ohlc")
        .select(col("event_type"), unix_micros(col("bar_start")).as("bar_us"),
          col("open"), col("high"), col("low"), col("close"),
          col("n_events"), col("volume"))
        .orderBy("event_type", "bar_us").collect()
      val want = SparkEntry.queries("events_ohlc_bars")(spark, sf).collect()
      assert(got.length == want.length, s"${got.length} vs ${want.length} bars")
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("watermarked hopping agg over a memory stream matches the batch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Event]
    val withTs = stream.toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val q = EventStreams.hoppingAgg(withTs)
      .writeStream.format("memory").queryName("hopping")
      .outputMode("complete").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      val got = spark.table("hopping")
        .select(unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start_us", "event_type").collect()
      val want = SparkEntry.queries("stream_hopping_agg")(spark, sf).collect()
      assert(got.length == want.length && got.sameElements(want))
    } finally q.stop()
  }

  test("stream-stream interval join converges to the oracled batch interval_join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.eventsUs(spark, sf)
      .select("event_id", "user_id", "ts_us", "event_type", "value").collect()
    def mk(kind: String) = evs.filter(_.getString(3) == kind)
      .map(r => StreamEv(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4))).toSeq
    val clicks = MemoryStream[StreamEv]; val purchases = MemoryStream[StreamEv]
    def withTs(s: MemoryStream[StreamEv]) =
      s.toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val q = EventStreams.clickPurchaseJoin(withTs(clicks), withTs(purchases))
      .select(col("p_event_id"), col("c_event_id"))
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    try {
      clicks.addData(mk("click")); purchases.addData(mk("purchase"))
      q.processAllAvailable()
      val got = spark.table("ssjoin").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = SparkEntry.queries("interval_join")(spark, sf)
        .select("p_event_id", "c_event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty && got == want, s"stream ${got.size} vs batch ${want.size}")
    } finally q.stop()
  }

  test("watermarked streaming dedup drops in-horizon duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = (1L to 100L).map(i => StreamEv(i, i % 7, i * 1000000L, 0.0))
    val dups = base.filter(_.event_id % 3 == 0) // replayed events
    val stream = MemoryStream[StreamEv]
    val q = EventStreams.dedupStream(
        stream.toDF().withColumn("ts", timestamp_micros(col("ts_us"))))
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      stream.addData(base ++ dups)
      q.processAllAvailable()
      stream.addData(dups) // replay again in a later batch, still in horizon
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("event_id").collect().map(_.getLong(0))
      assert(ids.length == base.length && ids.toSet == base.map(_.event_id).toSet)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment matches the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val events = loadEvents()
    val stream = MemoryStream[Event]
    // static dim broadcast-joined into every micro-batch — the standard
    // streaming-enrichment shape (dim re-read per batch, no state)
    val q = stream.toDF().join(broadcast(dim), Seq("user_id"), "left")
      .groupBy(col("c_mktsegment")).count()
      .writeStream.format("memory").queryName("enrich")
      .outputMode("complete").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      val got = spark.table("enrich").collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      val want = Tables.eventsUs(spark, sf).join(broadcast(dim), Seq("user_id"), "left")
        .groupBy(col("c_mktsegment")).count().collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }

  test("native session_window agg matches the oracled batch sessionize") {
    // batch-mode session_window: same gap semantics as the window-based
    // sessionize query (session end = last event, not last+gap, so
    // compare on (user, start, n, sum))
    val got = EventStreams.sessionWindowAgg(
        Tables.eventsUs(spark, sf).withColumn("ts", timestamp_micros(col("ts_us"))))
      .select(col("user_id"), unix_micros(col("start")).as("start_us"),
        col("n_events"), col("sum_cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = SparkEntry.queries("sessionize")(spark, sf)
      .select(col("user_id"), col("start_us"), col("n_events"),
        round(col("sum_value") * 100).cast("long").as("sum_cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty && got == want, s"session_window ${got.size} vs batch ${want.size}")
  }

  test("flatMapGroupsWithState sessionizer converges to batch sessionize") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 30L * 60 * 1000 * 1000
    val events = loadEvents()
    val flushUs = events.map(_.ts_us).max + 10 * gapUs
    val users = events.map(_.user_id).distinct
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionizeStream(stream.toDS(), gapUs)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      // a far-future flush event per user closes every real session
      stream.addData(users.map(u => Event(u, flushUs, "flush", 0.0)))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .select("user_id", "start_us", "end_us", "n_events", "sum_cents")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val want = SparkEntry.queries("sessionize")(spark, sf)
        .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"),
          round(col("sum_value") * 100).cast("long").as("sum_cents"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(want.nonEmpty && got == want,
        s"streaming sessions ${got.size} vs batch ${want.size}")
    } finally q.stop()
  }

  test("late audit: chunked prefix max equals the naive global window on scrambled arrivals") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // arrival order (event_id) deliberately decorrelated from event time:
    // deterministic scramble with known heavy stragglers
    val n = 20000
    val rows = (0 until n).map { i =>
      val ts = (i.toLong * 7919 % n) * 1000000L // scrambled seconds
      (i.toLong, ts)
    }
    val e = rows.toDF("event_id", "ts_us").repartition(13)
    val got = graft.streaming.EventStreams.lateAuditFrom(e)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // naive single-pass reference
    var runMax = Long.MinValue
    val lates = rows.sortBy(_._1).map { case (_, ts) =>
      val late = if (runMax == Long.MinValue) 0L else math.max(0L, runMax - ts)
      runMax = math.max(runMax, ts)
      late
    }
    def bucket(l: Long): String =
      if (l == 0) "0_on_time" else if (l <= 60000000L) "1_under_1m"
      else if (l <= 600000000L) "2_under_10m" else if (l <= 3600000000L) "3_under_1h"
      else "4_over_1h"
    val want = lates.groupBy(bucket).map { case (b, ls) =>
      (b, ls.size.toLong, ls.max)
    }.toSeq.sortBy(_._1)
    assert(got == want, s"got $got\nwant $want")
    assert(got.size >= 3, s"scramble should spread buckets: $got")
  }

  test("lateAuditStream deltas sum to the batch lateness report across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // scrambled arrivals fed as 4 micro-batches; arrival sequence = event_id
    val n = 12000
    val rows = (0 until n).map { i =>
      val ts = (i.toLong * 7919 % n) * 1000000L
      (i.toLong, ts)
    }
    val stream = MemoryStream[(Long, Long)]
    val q = EventStreams.lateAuditStream(stream.toDS())
      .writeStream.format("memory").queryName("lateaudit")
      .outputMode("append").start()
    try {
      rows.grouped(3000).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      val got = spark.table("lateaudit")
        .groupBy("bucket").agg(sum("n").as("n"), max("max_late_us").as("max_late_us"))
        .orderBy("bucket").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val want = EventStreams.lateAuditFrom(rows.toDF("event_id", "ts_us"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want && got.size >= 3, s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("lateAuditStream fed arrival-hour micro-batches emits exactly the registered stream_late_deltas rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hourUs = 3600L * 1000 * 1000
    // the registered fixture: the sf corpus under the same ±1 h hash
    // jitter, micro-batch = arrival hour
    val jit = graft.sources.Tables.eventsUs(spark, sf)
      .select(col("event_id"), col("ts_us"))
      .withColumn("arr", EventStreams.jitterArr) // the ONE shared jitter definition
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1)) // arrival order: (arr, event_id)
    val batches = jit.groupBy(_._3 / hourUs).toSeq.sortBy(_._1)
    val stream = MemoryStream[(Long, Long)]
    val q = EventStreams.lateAuditStream(stream.toDS())
      .writeStream.format("memory").queryName("latedeltas")
      .outputMode("append").start()
    val got = Seq.newBuilder[(Long, String, Long, Long)]
    try {
      var seen = 0L
      batches.foreach { case (hid, evs) =>
        // arrival key within the batch = the global (arr, event_id)
        // rank, so the live fold replays the registered arrival order
        stream.addData(evs.zipWithIndex.map { case ((_, ts, _), i) => (i.toLong, ts) })
        q.processAllAvailable()
        val all = spark.table("latedeltas").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        all.drop(seen.toInt).foreach { case (b, n, mx) => got += ((hid, b, n, mx)) }
        seen = all.length.toLong
      }
      val want = SparkEntry.queries("stream_late_deltas")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got.result().sorted == want.sorted,
        s"live deltas != registered query (${got.result().size} vs ${want.size} rows)")
    } finally q.stop()
  }

  test("dedupStream forwards exactly stream_replay_dedup's n_unique under the registered replay fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hourUs = 3600L * 1000 * 1000
    val base = graft.sources.Tables.eventsUs(spark, sf)
      .select(col("event_id"), col("ts_us"))
      .collect().map(r => StreamEv(r.getLong(0), 0L, r.getLong(1), 0.0))
    val replays = base.filter(_.event_id % 7 == 0)
    val stream = MemoryStream[StreamEv]
    val q = EventStreams.dedupStream(
        stream.toDF().withColumn("ts", timestamp_micros(col("ts_us"))))
      .writeStream.format("memory").queryName("replaydedup").outputMode("append").start()
    try {
      stream.addData(base ++ replays) // at-least-once delivery: dups in-horizon
      q.processAllAvailable()
      val got = spark.table("replaydedup")
        .groupBy(expr(s"ts_us DIV $hourUs").as("hour_id"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = SparkEntry.queries("stream_replay_dedup")(spark, sf).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got.keySet == want.keySet)
      want.foreach { case (h, (arrivals, unique, nrep)) =>
        assert(got(h) == unique, s"hour $h: forwarded ${got(h)} vs n_unique $unique")
        assert(arrivals == unique + nrep)
      }
      assert(want.values.map(_._3).sum > 0, "fixture produced no replays")
    } finally q.stop()
  }

  test("cohortDeltaStream deltas reconstruct orders_cohort_ltv exactly on scrambled arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.CohortStream
    import graft.streaming.CohortStream.OrderEvt
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("midx"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => OrderEvt(r.getLong(0), r.getInt(1), r.getLong(2)))
    // LATEST months arrive first: customers' cohorts re-assign repeatedly,
    // exercising the negate-and-move path on nearly every batch
    val scrambled = orders.sortBy(o => (-o.midx, o.custkey))
    val stream = MemoryStream[OrderEvt]
    val q = CohortStream.cohortDeltaStream(stream.toDS())
      .writeStream.format("memory").queryName("cohortdeltas")
      .outputMode("append").start()
    try {
      scrambled.grouped(math.max(1, scrambled.length / 4 + 1)).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val acc = spark.table("cohortdeltas")
        .groupBy(col("cohortIdx").as("cohort_idx"), col("offset"))
        .agg(sum("dActive").as("n_active"), sum("dRevCents").as("rev_cents"))
        .filter(col("n_active") > 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cohort_idx")).orderBy(col("offset"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val sz = acc.filter(col("offset") === 0)
        .select(col("cohort_idx"), col("n_active").as("cohort_size"))
      // reconstruct the FULL batch report from the folded deltas, with the
      // batch query's own arithmetic (same casts, same division forms)
      val got = acc.join(sz, Seq("cohort_idx"))
        .withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
        .select(col("cohort_idx"), col("offset"), col("cohort_size"),
          col("n_active"), (col("rev_cents").cast("double") / 100.0).as("revenue"),
          (col("cum_rev_cents").cast("double") / 100.0).as("cum_revenue"),
          (col("cum_rev_cents").cast("double")
            / (col("cohort_size").cast("double") * 100.0)).as("ltv_per_customer"))
        .orderBy(col("cohort_idx"), col("offset")).collect()
      val want = graft.operators.Analytics.ordersCohortLtv(spark, sf).collect()
      assert(got.length == want.length, s"${got.length} vs ${want.length}")
      got.zip(want).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    } finally q.stop()
  }

  test("stream_cohort_deltas: the live operator fed month-ordered batches emits the registered face rows per trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.CohortStream
    import graft.streaming.CohortStream.OrderEvt
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("midx"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => OrderEvt(r.getLong(0), r.getInt(1), r.getLong(2)))
    // the registered face, grouped by trigger month (drop the customer
    // key — CohortDelta is emitted per customer group but doesn't carry
    // it; compare per-trigger MULTISETS)
    val face = SparkEntry.queries("stream_cohort_deltas")(spark, sf).collect()
      .groupBy(_.getInt(1)) // batch_midx
      .map { case (m, rs) =>
        m -> rs.map(r => (r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))
          .toSeq.sorted
      }
    val byMonth = orders.groupBy(_.midx).toSeq.sortBy(_._1)
    assert(byMonth.map(_._1) == face.keys.toSeq.sorted, "trigger set mismatch")
    val stream = MemoryStream[OrderEvt]
    val q = CohortStream.cohortDeltaStream(stream.toDS())
      .writeStream.format("memory").queryName("cohortface")
      .outputMode("append").start()
    try {
      byMonth.foreach { case (m, evs) =>
        stream.addData(evs.toSeq)
        q.processAllAvailable()
        // in-order monthly arrival ⇒ a trigger's rows all satisfy
        // cohortIdx + offset = m, so the table partitions by trigger
        val fresh = spark.table("cohortface").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .filter(t => t._1 + t._2 == m).toSeq.sorted
        assert(fresh == face(m), s"trigger $m: live emission != face")
        assert(fresh.forall(_._3 == 1L), s"trigger $m: d_active must be 1 in-order")
      }
      // no stray rows outside the per-trigger partition above
      assert(spark.table("cohortface").count() ==
        face.values.map(_.size.toLong).sum)
    } finally q.stop()
  }

  test("funnelStream snapshots reconstruct events_funnel exactly on scrambled arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.FunnelEvt
    val evts = Tables.eventsUs(spark, sf)
      .select(col("user_id"), col("ts_us"), col("event_type"))
      .collect().map(r => FunnelEvt(r.getLong(0), r.getLong(1), r.getString(2)))
    // LATEST events arrive first: every earlier view/click re-solves the
    // cascade — the adversarial order for the anchor-moving path
    val scrambled = evts.sortBy(e => (-e.tsUs, e.userId))
    val stream = MemoryStream[FunnelEvt]
    val q = FunnelStream.funnelStream(stream.toDS())
      .writeStream.format("memory").queryName("funnelupd")
      .outputMode("append").start()
    try {
      scrambled.grouped(math.max(1, scrambled.length / 5 + 1)).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // the live dashboard fold: last (max-seq) snapshot per user
      val wseq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("upd_seq").desc)
      val got = spark.table("funnelupd")
        .withColumn("rn", row_number().over(wseq)).filter(col("rn") === 1)
        .select(col("user_id"), col("first_view_us"), col("first_click_us"),
          col("first_purchase_us"), col("stage"))
        .orderBy(col("user_id")).collect()
      val want = SparkEntry.queries("events_funnel")(spark, sf).collect()
      assert(got.length == want.length, s"${got.length} vs ${want.length}")
      got.zip(want).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    } finally q.stop()
  }

  test("funnelStream fed event-hour micro-batches emits exactly the registered stream_funnel_deltas rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.FunnelEvt
    val hourUs = 3600L * 1000 * 1000
    val evts = Tables.eventsUs(spark, sf)
      .select(col("user_id"), col("ts_us"), col("event_type"))
      .collect().map(r => FunnelEvt(r.getLong(0), r.getLong(1), r.getString(2)))
    // the registered fixture: one micro-batch per event-time hour,
    // replayed in order
    val batches = evts.groupBy(_.tsUs / hourUs).toSeq.sortBy(_._1)
    val stream = MemoryStream[FunnelEvt]
    val q = FunnelStream.funnelStream(stream.toDS())
      .writeStream.format("memory").queryName("funneldeltas")
      .outputMode("append").start()
    try {
      batches.foreach { case (_, chunk) =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("funneldeltas")
        .select(col("user_id"), col("upd_seq"), col("first_view_us"),
          col("first_click_us"), col("first_purchase_us"), col("stage"))
        .orderBy(col("user_id"), col("upd_seq")).collect()
      val want = SparkEntry.queries("stream_funnel_deltas")(spark, sf)
        .select(col("user_id"), col("upd_seq"), col("first_view_us"),
          col("first_click_us"), col("first_purchase_us"), col("stage"))
        .collect()
      assert(got.length == want.length, s"${got.length} vs ${want.length}")
      got.zip(want).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    } finally q.stop()
  }

  test("stream_late_audit_jitter spreads lateness across buckets (CASE edges live)") {
    val rows = SparkEntry.queries("stream_late_audit_jitter")(spark, sf).collect()
    assert(rows.length >= 4, s"jitter should populate >=4 buckets: ${rows.mkString(", ")}")
    val total = rows.map(_.getLong(1)).sum
    val plain = SparkEntry.queries("stream_late_audit")(spark, sf)
      .collect().map(_.getLong(1)).sum
    assert(total == plain, s"jitter reorders, never drops: $total vs $plain")
  }

  test("stream_watermark_eval: drop counts decrease with delay and agree with the jittered audit") {
    val rows = SparkEntry.queries("stream_watermark_eval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == EventStreams.WatermarkDelaysUs)
    assert(rows.map(_._2).distinct.length == 1, "every delay prices the same stream")
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.reverse.toSeq,
      "a longer watermark can only drop fewer events")
    rows.foreach { case (_, n, d, f, mx) =>
      assert(math.abs(f - d.toDouble / n) < 1e-9, "frac is n_dropped/n_events")
      assert(if (d == 0) mx == 0 else mx > 0)
    }
    // cross-check vs the registered jittered audit: events the audit
    // buckets strictly over 1 h are exactly the 1 h-watermark drops
    val over1h = SparkEntry.queries("stream_late_audit_jitter")(spark, sf)
      .collect().filter(_.getString(0) == "4_over_1h").map(_.getLong(1)).sum
    assert(rows.last._3 == over1h,
      s"1h drops ${rows.last._3} vs audit over-1h bucket $over1h")
  }

  test("stream_watermark_apply: the chosen delay is the eval's smallest qualifying candidate, conservation holds per hour") {
    val evalRows = SparkEntry.queries("stream_watermark_eval")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the choice rule re-derived from the registered eval: smallest
    // delay with 1000·n_dropped ≤ n_events, else the largest candidate
    val want = evalRows.filter { case (_, n, d) => d * 1000 <= n }
      .map(_._1).sorted.headOption
      .getOrElse(EventStreams.WatermarkDelaysUs.max)
    val rows = SparkEntry.queries("stream_watermark_apply")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty && rows.forall(_._2 == want),
      s"chosen delay must be $want")
    // conservation: per event-hour kept + dropped = the raw hourly count,
    // and the totals match the eval's row for the chosen delay
    val hourUs = 3600L * 1000 * 1000
    val raw = Tables.eventsUs(spark, sf)
      .groupBy(expr(s"ts_us DIV $hourUs").as("hour_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r._1 -> (r._3 + r._4)).toMap == raw,
      "kept + dropped must partition every hour's arrivals")
    val evalChosen = evalRows.find(_._1 == want).get
    assert(rows.map(_._4).sum == evalChosen._3,
      "total drops must equal the eval's count for the chosen delay")
    assert(rows.forall(_._5 >= 0.0))
  }

  test("anomaly stats streamed in chunks reconstruct the batch outlier report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
    val rows = ev.select(col("event_type"), col("vc")).as[(String, Long)].collect()
    val stream = MemoryStream[(String, Long)]
    val q = EventStreams.anomalyStatsStream(stream.toDS())
      .toDF("event_type", "n", "s", "qStr")
      .writeStream.format("memory").queryName("anomstats")
      .outputMode("append").start()
    try {
      val (a, rest) = rows.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a, b, c).foreach { chunk =>
        stream.addData(chunk.toSeq); q.processAllAvailable()
      }
      // n grows monotonically per key, so the max struct is the final state
      val finalStats = spark.table("anomstats")
        .groupBy(col("event_type"))
        .agg(max(struct(col("n"), col("s"), col("qStr"))).as("m"))
        .select(col("event_type"), col("m.n").as("n"), col("m.s").as("s"),
          expr("CAST(m.qStr AS DECIMAL(38,0))").as("q"))
      val got = graft.operators.Analytics.anomaliesFromStats(ev, finalStats).collect()
      val want = SparkEntry.queries("events_value_anomaly")(spark, sf).collect()
      assert(got.nonEmpty && got.length == want.length && got.sameElements(want))
    } finally q.stop()
  }

  test("sink-side top-k over streamed window counts matches batch stream_topk_trend") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[EventStreams.Event]
    val withTs = stream.toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val q = EventStreams.tumblingAgg(withTs)
      .writeStream.format("memory").queryName("trend_counts")
      .outputMode("complete").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      val counts = spark.table("trend_counts")
        .select(unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n"))
      val got = EventStreams.topkOf(counts).collect()
      val want = SparkEntry.queries("stream_topk_trend")(spark, sf).collect()
      assert(got.nonEmpty && got.length == want.length && got.sameElements(want))
    } finally q.stop()
  }
}
