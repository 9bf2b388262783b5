package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.CountMinSketch

/** Streaming twin of heavy_hitters_cms (SURVEY.md §2F): the corpus
  * Count-Min sketch maintained live over a token stream.
  *
  * Why this shape works: a CMS is a w×d grid of exact integer counters
  * — `add` increments, `mergeInPlace` adds grids element-wise — so the
  * sketch is a commutative monoid and micro-batch partials combine into
  * EXACTLY the sketch a single batch pass would build (same counters,
  * same totalCount, byte-identical serialization; estimates depend only
  * on the final grid). That makes continuous heavy-hitter tracking a
  * one-row streaming aggregate: no per-token state, no shuffle growth —
  * state is the fixed-size grid regardless of stream length, the same
  * reason the batch op's treeAggregate scales (TextAnalysis.scala:199).
  *
  * The aggregate is a typed `Aggregator` with the sketch itself as the
  * buffer (java-serialization encoder — CountMinSketchImpl is
  * Serializable and defines equals), emitting the serialized sketch so
  * the sink can probe it. Same (eps, conf, seed) as the batch op →
  * SketchStreamSpec pins the streamed sketch EQUAL (CountMinSketch
  * .equals: same grid, same totalCount) to a batch-folded one under
  * chunked arrivals, plus the CMS never-underestimate / ε·N-overshoot
  * bounds against exact counts.
  */
object SketchStream {

  /** Mergeable CMS aggregator: buffer IS the sketch. */
  class CmsAgg(eps: Double, conf: Double, seed: Int)
      extends Aggregator[String, CountMinSketch, Array[Byte]] {
    def zero: CountMinSketch = CountMinSketch.create(eps, conf, seed)
    def reduce(b: CountMinSketch, tok: String): CountMinSketch = {
      b.addString(tok); b
    }
    def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch =
      a.mergeInPlace(b)
    def finish(b: CountMinSketch): Array[Byte] = b.toByteArray
    def bufferEncoder: Encoder[CountMinSketch] =
      Encoders.javaSerialization[CountMinSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Token stream → one-row stream of the serialized corpus CMS
    * (complete/update mode; the single group key is the whole corpus —
    * state is ONE fixed-size grid, not data-scaled). */
  def cmsStream(tokens: Dataset[String], eps: Double = 1e-4,
                conf: Double = 0.99, seed: Int = 42): DataFrame = {
    val agg = new CmsAgg(eps, conf, seed)
    tokens.groupByKey(_ => 0)(Encoders.scalaInt)
      .agg(agg.toColumn.name("sketch"))
      .toDF("k", "sketch")
  }
}
