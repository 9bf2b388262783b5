package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

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
}
