package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for graft.
  *
  * Local mode here is a stand-in for a multi-executor cluster: every conf
  * below is one we would also set (with cluster-sized values) at 100 TB.
  * AQE handles runtime coalescing and skew-join splitting; shuffle
  * partition count is sized to the core count locally (on a cluster:
  * ~2-3x total executor cores, or left to AQE's initial partition num).
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
              shufflePartitions: Int = -1): SparkSession.Builder = {
    val parts =
      if (shufflePartitions > 0) shufflePartitions
      else sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(4)
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read as Long (ns since epoch) and normalize in Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
