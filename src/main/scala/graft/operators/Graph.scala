package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Graph analytics over entity relationships derived from the fact
  * tables (SURVEY.md §2B extension). The dedup family already covers
  * connected components (large-star/small-star in Dedup.dedupClusters);
  * this module adds iterative value propagation — PageRank — expressed
  * the Spark-native way: a FIXED number of unrolled join+aggregate
  * rounds (never a driver loop with per-step collects), each round one
  * co-partitioned join on the vertex key plus one map-side-combined
  * aggregate, with AQE free to re-plan every round.
  *
  * Exactness discipline: ranks live in integer MICRO-UNITS (1.0 =
  * 1_000_000) and every per-edge share is an integer floor division
  * (r·w DIV s), so the per-vertex sums are order-independent integers
  * — distributed float summation could never hash-match an oracle, and
  * published PageRank tolerances don't need float anyway. Both engines
  * run the identical integer recurrence r' = 0.15 + 0.85·Σ(r·w DIV s)
  * (damping 0.85, Brin & Page '98), so all 5 iterations hash-match.
  */
object Graph {

  private val Iters = 5

  /** graph_part_rank: weighted PageRank over the order co-purchase part
    * graph — "which parts anchor the catalog": an edge (a, b) with
    * weight w means parts a and b were bought together in w orders
    * (the part_affinity pair shape, kept per-order-bounded: an order
    * with k lines contributes k·(k−1) directed pairs, k is bounded by
    * order size, never a supplier-clique expansion). Rank flows along
    * co-purchase weight: r'(v) = 0.15 + 0.85·Σ_{u→v} (r(u)·w(u,v) DIV
    * s(u)), s(u) the total outgoing weight.
    *
    * Scale: the per-order part set distincts ONCE and is staged for
    * both sides of the pair self-join (the part_affinity r8-verdict
    * lesson); edges + per-vertex out-weights stage once and feed all 5
    * rounds. Every node has out-edges by construction (the graph is
    * symmetric), so there is no dangling-mass term. Isolated parts
    * (never co-purchased) are out of the graph and out of the report.
    * Overflow bound: r·w < total_mass·max_w ≤ n·1e6·max_w — inside
    * BIGINT for any realistic catalog (documented like part_affinity's
    * 2^53 note). */
  def graphPartRank(spark: SparkSession, dir: String): DataFrame =
    graphPartRankFrom(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")))

  /** `pairs` = raw (ok, p) membership rows; distinct applied here. */
  private[graft] def graphPartRankFrom(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val li = stageBarrier(pairs.select(col("ok"), col("p")).distinct())
    val edges = stageBarrier(
      li.select(col("ok"), col("p").as("src"))
        .join(li.select(col("ok"), col("p").as("dst")), Seq("ok"))
        .filter(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w")))
    val nodeStats = stageBarrier(
      edges.groupBy(col("src")).agg(sum(col("w")).as("s")))
    var ranks = nodeStats.select(col("src").as("part"), col("s"),
      lit(1000000L).as("r"))
    var it = 0
    while (it < Iters) {
      val inc = ranks.join(edges, ranks("part") === edges("src"))
        .select(col("dst"), expr("(r * w) DIV s").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("inc"))
      ranks = nodeStats.join(inc, nodeStats("src") === inc("dst"), "left")
        .select(col("src").as("part"), col("s"),
          // DIV, not `/`: Column./ is double division and would lose
          // exactness past 2^53 — the whole point is integer recurrence
          expr("CAST(150000 + (85 * coalesce(inc, 0)) DIV 100 AS BIGINT)").as("r"))
      it += 1
    }
    ranks.select(col("part"), col("s").as("out_w"), col("r").as("rank_micro"),
        (round(col("r").cast("double") / 1000000.0, 6) + 0.0).as("rank"))
      .orderBy(col("part"))
  }

  /** Mirror: the identical integer recurrence unrolled as 5 CTE rounds. */
  lazy val graphPartRankSql: String = {
    def step(k: Int): String =
      s"""r$k AS (SELECT ns.src AS part, ns.s,
         |  150000 + (85 * coalesce(c.inc, 0)) // 100 AS r
         |  FROM ns LEFT JOIN (
         |    SELECT ed.dst, sum((r.r * ed.w) // r.s) AS inc
         |    FROM r${k - 1} r JOIN ed ON ed.src = r.part
         |    GROUP BY ed.dst) c
         |  ON c.dst = ns.src)""".stripMargin
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |ed AS (SELECT a.p AS src, b.p AS dst, count(*) AS w
       |       FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p
       |       GROUP BY 1, 2),
       |ns AS (SELECT src, sum(w) AS s FROM ed GROUP BY src),
       |r0 AS (SELECT src AS part, s, CAST(1000000 AS BIGINT) AS r FROM ns),
       |${(1 to Iters).map(step).mkString(",\n")}
       |SELECT part, CAST(s AS BIGINT) AS out_w, CAST(r AS BIGINT) AS rank_micro,
       |       round(CAST(r AS DOUBLE) / 1000000, 6) + 0.0 AS rank
       |FROM r$Iters ORDER BY part""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_part_rank" -> (graphPartRank _))

  def oracles: Map[String, String] = Map(
    "graph_part_rank" -> graphPartRankSql)
}
