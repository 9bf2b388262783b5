package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4).
  *
  * AQE's skew-join splitting handles most runtime skew, but two cases
  * still need explicit salting at 100 TB: (a) aggregation skew — a hot
  * group funnels into one reducer regardless of AQE; (b) joins where the
  * build side is too big to broadcast and one probe key dominates.
  *
  * Salting is DETERMINISTIC here (hash of the whole row, not rand()):
  * retries and speculative tasks must produce identical partitions, and
  * results must be reproducible run-over-run.
  */
object Salt {

  /** Deterministic per-row salt in [0, n). */
  def rowSalt(n: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(n.toLong)).cast("int")

  /** Measured salt factor for a prospective aggregation key — the
    * skew_eval report's exact arithmetic, ceil(hottest key's rows /
    * mean rows per key) = (max·n_keys + n_rows − 1) DIV n_rows — wired
    * straight into the salted-agg path so the decision report and the
    * fix cannot drift. ONE bounded 1-row collect (the measured-dial
    * pattern: packShards / the graph broadcast gate); the per-key count
    * is map-side combined, so measuring skew cannot itself skew.
    * Factor 1 = unskewed (don't salt); empty input → 1. */
  def measuredSaltFactor(df: DataFrame, key: Column): Int = {
    val r = df.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
      .agg(expr("(max(c) * count(*) + sum(c) - 1) DIV sum(c)").as("f"))
      .head()
    if (r.isNullAt(0)) 1 else math.max(1L, r.getLong(0)).toInt
  }

  /** Two-phase salted sum/count aggregation: partial aggregate on
    * (key, salt) spreads a hot key over n reducers, the final aggregate
    * on key combines n partials — the second shuffle carries n rows per
    * key, not the raw data. */
  def saltedSumCount(df: DataFrame, keys: Seq[Column], value: Column,
                     n: Int, saltSource: Seq[Column]): DataFrame = {
    val partial = df
      .withColumn("__salt", rowSalt(n, saltSource))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys: _*)
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join: the skewed (large) side gets a deterministic salt,
    * the other side is replicated n ways (explode over 0..n-1), and the
    * join key becomes (key, salt) — a hot key's rows spread over n tasks.
    * Use when the replicated side is too big to broadcast but n-fold
    * replication is still cheap. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 n: Int, saltSource: Seq[Column]): DataFrame = {
    val salted = skewed.withColumn("__salt", rowSalt(n, saltSource))
    val replicated = other.withColumn("__salt",
      explode(array((0 until n).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
