package graft

/** Dev tool: time one registered query (noop-write materialization, same
  * methodology as Bench) for N passes. Usage:
  *   dev/run.sh graft.TimeQuery <query> [sfDir] [passes]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    def materialize(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup on the same codepaths Bench uses
    for (w <- Seq("q1_agg", "topk_window", "q3_join_agg"))
      SparkEntry.queries(w)(spark, sfDir).write.format("noop").mode("overwrite").save()
    val times = (1 to passes).map(_ => materialize())
    println(f"$name: min=${times.min}%.2f s  passes=${times.map(t => f"$t%.2f").mkString(", ")}")
    spark.stop()
  }
}
