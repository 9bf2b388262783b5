package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.sources.Tables

/** Structured Streaming operators over the events shape (SURVEY.md §2F).
  *
  * Design: every streaming computation here has a batch-equivalent
  * registered query (stream_tumbling_agg ↔ tumblingAgg, sessionize ↔
  * sessionizeStream) — StreamingSpec drives the streaming side through a
  * MemoryStream and asserts it converges to the batch answer. At scale
  * the watermark bounds state: late data beyond it is dropped instead of
  * keeping every window open forever.
  */
object EventStreams {

  case class Event(user_id: Long, ts_us: Long, event_type: String, value: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
                     n_events: Long, sum_cents: Long)
  /** Public: the state encoder's generated code must reach the accessors. */
  case class SessState(start: Long, last: Long, n: Long, sumCents: Long)

  /** Watermarked tumbling-window aggregation — works identically on a
    * streaming or batch frame with a `ts` timestamp column. */
  def tumblingAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), (col("sum_cents").cast("double") / 100.0).as("sum_value"))

  /** Stateful gap sessionizer: flatMapGroupsWithState keyed on user_id,
    * emitting sessions as the gap closes; the open session stays in
    * state. State per key is O(1) — the 100 TB-safe streaming shape. */
  def sessionizeStream(events: Dataset[Event], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts_us, e.value))
          var cur = state.getOption
          val out = Seq.newBuilder[Session]
          for (e <- sorted) {
            val cents = math.round(e.value * 100)
            cur match {
              case Some(s) if e.ts_us - s.last > gapUs =>
                out += Session(user, s.start, s.last, s.n, s.sumCents)
                cur = Some(SessState(e.ts_us, e.ts_us, 1, cents))
              case Some(s) =>
                cur = Some(SessState(s.start, e.ts_us, s.n + 1, s.sumCents + cents))
              case None =>
                cur = Some(SessState(e.ts_us, e.ts_us, 1, cents))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** stream_tumbling_agg: the oracled batch equivalent of tumblingAgg —
    * identical grouping expressed on integer microseconds so the oracle
    * needs no window-struct parity. One map-side-combined shuffle. */
  def streamTumblingAgg(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000 * 1000
    Tables.eventsUs(spark, dir)
      .groupBy((col("ts_us") - pmod(col("ts_us"), lit(hourUs))).as("window_start_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"))
      .orderBy(col("window_start_us"), col("event_type"))
  }

  val streamTumblingAggSql: String =
    """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS window_start_us, event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_agg" -> (streamTumblingAgg _))

  def oracles: Map[String, String] = Map(
    "stream_tumbling_agg" -> streamTumblingAggSql)
}
