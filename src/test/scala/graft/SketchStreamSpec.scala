package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import graft.streaming.SketchStream

/** The live CMS twin: chunked arrivals must produce EXACTLY the sketch
  * one batch pass builds (the grid is a commutative monoid), and the
  * published CMS guarantees must hold against exact counts. */
class SketchStreamSpec extends SparkSpec {

  test("streamed CMS equals the batch-folded sketch under chunked arrivals; bounds hold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .as[String].collect()
    val stream = MemoryStream[String]
    val q = SketchStream.cmsStream(stream.toDS())
      .writeStream.format("memory").queryName("cms_sketch")
      .outputMode("complete").start()
    try {
      toks.grouped(math.max(1, toks.length / 3 + 1))
        .foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
      val bytes = spark.table("cms_sketch").collect()
        .head.getAs[Array[Byte]]("sketch")
      val streamed = CountMinSketch.readFrom(bytes)
      val batch = CountMinSketch.create(1e-4, 0.99, 42)
      toks.foreach(batch.addString)
      // identical grid + totalCount — not approximately: exactly
      assert(streamed == batch, "streamed sketch must equal the batch fold")
      assert(streamed.totalCount == toks.length.toLong)
      // never underestimates; overshoot bounded by eps*N
      val n = toks.length.toLong
      toks.groupBy(identity).map { case (t, ts) => t -> ts.size.toLong }
        .toSeq.sortBy(-_._2).take(20).foreach { case (t, c) =>
          val est = streamed.estimateCount(t)
          assert(est >= c, s"CMS underestimated $t: $est < $c")
          assert(est <= c + math.ceil(1e-4 * n).toLong + 1,
            s"CMS overshoot out of bound for $t: $est vs $c (N=$n)")
        }
    } finally q.stop()
  }
}
