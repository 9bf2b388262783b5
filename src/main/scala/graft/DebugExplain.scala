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
    // plan-only modes must not run the barrier-staged queries' stages
    // just to print a plan; exec mode wants the real staged shape
    if (!args.contains("exec")) sys.props("graft.barrier.bypass") = "1"
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("codegen")) {
      import org.apache.spark.sql.execution.debug._
      df.debugCodegen()
    } else if (args.contains("exec")) {
      // materialize THIS QueryExecution (noop-write would plan a second
      // one and leave this plan un-executed), then print the FINAL
      // adaptive plan: stage reuse, skew splits, bhj conversions
      df.queryExecution.toRdd.foreachPartition(_ => ())
      println(df.queryExecution.executedPlan.toString)
    } else df.explain("formatted")
    spark.stop()
  }
}
