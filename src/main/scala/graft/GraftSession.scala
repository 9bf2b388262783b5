package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for graft.
  *
  * Local mode here is a stand-in for a multi-executor cluster: every conf
  * below is one we would also set (with cluster-sized values) at 100 TB.
  * AQE handles runtime coalescing and skew-join splitting; the INITIAL
  * shuffle partition count is sized from the dataset's on-disk bytes
  * (see shufflePartitionsFor) because AQE can coalesce a too-fine map
  * side but cannot split a too-coarse one once a single stage's
  * rows-per-task explode — the r12 sf100 probe OOM'd the graph family at
  * 32 partitions on the same heap where 512 completed.
  */
object GraftSession {

  /** Target on-disk (compressed parquet) bytes per shuffle partition.
    * Parquet expands ~5-10x decoded, so 32 MB on disk keeps a task's
    * working set in the low hundreds of MB even through a pair-expanding
    * join — the sf100 reading: 15.6 GB / 32 MB ≈ 487 partitions, the
    * regime where the whole registry completes on an 8 GB heap (512 did;
    * 32 OOM'd graph_similar_parts). */
  private[graft] val TargetPartitionBytes: Long = 32L * 1024 * 1024

  /** Upper rail: beyond this, per-task scheduling overhead dominates on
    * any plausible single-box probe; a real cluster would raise it with
    * its core count. */
  private[graft] val MaxShufflePartitions: Int = 4096

  /** Recursive on-disk byte count of a dataset directory (0 when the
    * path is missing — callers fall back to the cpu floor). Counts
    * DATA files only (.parquet/.orc/.csv/.json and Spark part- files):
    * stray logs or checkpoints dropped next to a dataset must not
    * inflate the partition count (r13 advisory). */
  private[graft] def inputBytes(dir: String): Long = {
    def isData(name: String): Boolean =
      name.endsWith(".parquet") || name.endsWith(".orc") ||
        name.endsWith(".csv") || name.endsWith(".json") ||
        name.startsWith("part-")
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else if (isData(f.getName)) f.length()
      else 0L
    val f = new java.io.File(dir)
    if (f.exists()) walk(f) else 0L
  }

  /** The sizing rule (ScaleSpec pins it): bytes-derived, floored at the
    * core count so small SFs keep one wave of full-width tasks, railed
    * at MaxShufflePartitions. SPARK_GRAFT_SHUFFLE overrides for probes. */
  private[graft] def shufflePartitionsFor(bytes: Long, cpus: Int): Int = {
    val fromBytes = math.ceil(bytes.toDouble / TargetPartitionBytes).toInt
    math.min(MaxShufflePartitions, math.max(cpus, fromBytes))
  }

  /** Partition count for a session over `sfDir`: env override first,
    * then the bytes rule. */
  def partitionsFor(sfDir: String, cpus: Int): Int =
    sys.env.get("SPARK_GRAFT_SHUFFLE").map { v =>
      v.toIntOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
        s"SPARK_GRAFT_SHUFFLE must be a positive integer, got '$v'"))
    }.getOrElse(shufflePartitionsFor(inputBytes(sfDir), cpus))

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
              shufflePartitions: Int = -1,
              sfDir: String = ""): SparkSession.Builder = {
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(4)
    val parts =
      if (shufflePartitions > 0) shufflePartitions
      else if (sfDir.nonEmpty) partitionsFor(sfDir, cpus)
      else cpus
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
