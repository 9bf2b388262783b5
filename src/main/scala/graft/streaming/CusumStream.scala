package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live CUSUM state per series (the prefix-sum pair the batch rewrite
  * proves sufficient: the running minimum IS the last reset point),
  * plus the last folded period (year*12+month) — the in-order guard.
  *
  * State-schema note: adding `lastP` (r10) changed the
  * flatMapGroupsWithState state encoder schema — a restart from a
  * checkpoint written by a pre-r10 binary cannot deserialize the old
  * state and requires a FRESH checkpoint. No production checkpoints
  * exist in-repo; if checkpoint continuity ever matters, wrap the
  * state in a versioned envelope and default missing fields instead
  * of widening this case class in place. */
case class CusumState(pHi: Long, mnHi: Long, pLo: Long, mnLo: Long,
                      lastP: Long)

/** One monitored observation: series key, calendar position, exact
  * integer cents, and the TRAINED reference scalars (n months, sum
  * cents) the increments scale by — joined onto the stream from the
  * reference table before grouping. */
case class CusumObs(key: String, year: Int, month: Int, cents: Long,
                    n: Long, s: Long)

/** Streaming twin of fin_cusum (SURVEY.md §2F): the change-point screen
  * as a MONITOR. The batch op is retrospective — its reference (μ, k, h)
  * comes from the whole series; the production shape trains the
  * reference on history and then watches arrivals, which is exactly
  * the WarehouseStream ingestion pattern (monthly files, in-order per
  * series). State per (department, GL) is TWO prefix/running-min pairs
  * — O(1) longs regardless of stream length — because the batch
  * rewrite C_m = P_m − min(0, min_{j≤m} P_j) is itself incremental:
  * carry (P, min P) and every month's CUSUM level falls out exactly.
  *
  * Within a micro-batch the iterator is sorted by (year, month); across
  * batches arrival order is the warehouse's monthly-file order. A CUSUM
  * is an ORDERED fold — a month arriving after a later month has been
  * folded cannot be inserted without rewinding — so the state carries
  * the last folded period and any observation at or before it is
  * DROPPED, never folded: the levels stay exact, the late row is
  * detectable by its absence from the emission (production routes the
  * same predicate to a dead-letter; the batch query remains the
  * re-statement path once the late file lands in the warehouse).
  * CusumStreamSpec replays the batch fixture in chunks and pins the
  * emitted levels and alarms row-equal to the registered fin_cusum
  * (same scaled integers: y_hi = 20n·x − 20S − |S|, alarm at 40|S|),
  * and pins that an out-of-order replay leaves the fold uncorrupted. */
object CusumStream {

  def cusumStream(obs: Dataset[CusumObs]): Dataset[(String, Int, Int, Long, Long, Boolean, Boolean)] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, (String, Int, Int, Long, Long, Boolean, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[CusumObs], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(
            CusumState(0L, 0L, 0L, 0L, Long.MinValue))
          val out = it.toSeq.sortBy(o => (o.year, o.month)).flatMap { o =>
            val period = o.year.toLong * 12 + o.month
            if (period <= st.lastP) None // late/duplicate: detect, don't fold
            else {
              val yHi = 20L * o.n * o.cents - 20L * o.s - math.abs(o.s)
              val yLo = 20L * o.s - math.abs(o.s) - 20L * o.n * o.cents
              val pHi = st.pHi + yHi
              val pLo = st.pLo + yLo
              st = CusumState(pHi, math.min(st.mnHi, pHi),
                pLo, math.min(st.mnLo, pLo), period)
              val cHi = pHi - math.min(0L, st.mnHi)
              val cLo = pLo - math.min(0L, st.mnLo)
              Some((key, o.year, o.month, cHi, cLo,
                cHi > 40L * math.abs(o.s), cLo > 40L * math.abs(o.s)))
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
