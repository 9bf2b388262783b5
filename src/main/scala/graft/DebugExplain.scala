package graft

/** Dev tool: print the optimized/physical plan (and optionally generated
  * code) for one registered query. Usage:
  *   dev/run.sh graft.DebugExplain <query> [sfDir] [codegen]
  */
object DebugExplain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("codegen")) {
      import org.apache.spark.sql.execution.debug._
      df.debugCodegen()
    } else if (args.contains("exec")) {
      // materialize, then print the FINAL adaptive plan (shows AQE's
      // runtime decisions: stage reuse, skew splits, bhj conversions)
      df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.executedPlan.toString)
    } else df.explain("formatted")
    spark.stop()
  }
}
