package graft



/** Plan-audit main: prints the formatted physical plan of the named
  * queries (all when none named) at SPARK_GRAFT_SF_DIR — the loop used
  * to confirm pushdown/broadcast/codegen before recording bench numbers.
  * Usage: dev/run.sh graft.Explain fin_warehouse_build sessionize
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
