package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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

  /** Max adjacency bytes embedded as a CSR inside a generated
    * expression (the size-gated eval-broadcast discipline): past it the
    * join-based plans remain — embedded state must stay a constant
    * fraction of executor memory, never data-scaled. */
  private val CsrByteGate = 64L * 1024 * 1024

  /** Snapshot (key, sorted-neighbor-list) rows into the compact CSR the
    * graph kernels binary-search — one bounded driver collect, gated by
    * CsrByteGate at every call site. */
  private def collectCsr(adj: DataFrame, keyCol: String, nsCol: String): graft.expressions.AdjCsr = {
    val rows = adj.select(col(keyCol), col(nsCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    val keys = rows.map(_._1)
    val offs = new Array[Int](rows.length + 1)
    var i = 0
    while (i < rows.length) { offs(i + 1) = offs(i) + rows(i)._2.length; i += 1 }
    val flat = new Array[Long](offs(rows.length))
    i = 0
    while (i < rows.length) {
      System.arraycopy(rows(i)._2, 0, flat, offs(i), rows(i)._2.length); i += 1
    }
    graft.expressions.AdjCsr(keys, offs, flat)
  }

  /** Snapshot (key, sorted-neighbor-list) rows into packed V-bit
    * adjacency bitmaps (V²/8 bytes — for any graph inside CsrByteGate's
    * edge bound, at most a few MB). Same bounded driver collect as
    * collectCsr; call sites gate on nE·16 ≤ CsrByteGate. */
  private def collectBitmap(adj: DataFrame, keyCol: String, nsCol: String): graft.expressions.AdjBitmap = {
    val rows = adj.select(col(keyCol), col(nsCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    val keys = rows.map(_._1)
    val n = keys.length
    val stride = math.max(1, (n + 63) / 64)
    val words = new Array[Long](n * stride)
    val degs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val ns = rows(i)._2
      degs(i) = ns.length.toLong
      var j = 0
      while (j < ns.length) {
        val idx = java.util.Arrays.binarySearch(keys, ns(j))
        if (idx >= 0) words(i * stride + (idx >> 6)) |= 1L << (idx & 63)
        j += 1
      }
      i += 1
    }
    graft.expressions.AdjBitmap(keys, degs, words, stride)
  }

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

  /** The weighted co-purchase edge frame (src, dst, w) from raw (ok, p)
    * membership rows — the shared derivation every graph query pays:
    * 1.9B per-order pairs through one agg exchange at sf100 (~170 s of
    * each heavy graph query's wall there). */
  private[graft] def coEdgesFrom(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val li = stageBarrier(pairs.select(col("ok"), col("p")).distinct())
    li.select(col("ok"), col("p").as("src"))
      .join(li.select(col("ok"), col("p").as("dst")), Seq("ok"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
  }

  /** The once-per-ingest staged form of coEdgesFrom (sources.Staged:
    * content-fingerprint cache, shutdown cleanup) — the graph twin of
    * the fin staged warehouse and the text staged signal tables. The
    * edge build is the dominant sf100 cost of graph_part_rank (170 of
    * 273.7 s) and graph_assortativity (170 of 259.3 s), and it is
    * byte-identical between them, so the _staged twins read it here
    * instead of re-deriving it per query. Three long columns — exactly
    * the narrow-signal shape Staged.table's contract asks for. */
  private[graft] def stagedCoEdges(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Staged.table(spark, "coedges", dir) {
      coEdgesFrom(Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")))
    }

  /** `pairs` = raw (ok, p) membership rows; distinct applied here. */
  private[graft] def graphPartRankFrom(pairs: DataFrame): DataFrame =
    // Ephemeral PARQUET staging, NOT a stage barrier and NOT a block
    // checkpoint (r14, all three measured at sf100): a barrier reuses
    // the agg's shuffle files but RE-RUNS its reduce stage in every
    // consuming job — and the 5 rank rounds + the final pass each scan
    // the edges, so the ~saturated-|V|² edge reduce re-ran 6× (321.6 s,
    // r13). localCheckpoint persists row-format blocks, which
    // serialized the edge frame ~4× its columnar size: MEMORY_AND_DISK
    // squatted the unified pool for the whole query (282.9 s warm,
    // GC-bound), DISK_ONLY paid the fat write AND the fat reads
    // (335.8 s). Parquet's delta/dictionary encodings store the three
    // long columns in ~1/6 the block footprint, so the one-time write
    // is cheap and every round's re-scan is a columnar read through
    // the OS page cache.
    graphPartRankFromEdges(graft.sources.Staged.ephemeral(coEdgesFrom(pairs)))

  /** The 5 rank rounds over an already-materialized (src, dst, w) edge
    * frame (ephemeral parquet in-query; the staged table for the twin). */
  private[graft] def graphPartRankFromEdges(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val nodeStats = stageBarrier(
      edges.groupBy(col("src")).agg(sum(col("w")).as("s")))
    // Broadcast dial (r10): the rank frame is |V| rows of 3 scalars —
    // tiny next to the |E| edge frame — but Catalyst has no stats for
    // the iterated subtree, so every round ran a full SortMergeJoin
    // RE-SHUFFLING the edges (20 SMJs, zero broadcasts, zero reuse in
    // the r9 plan). Gate on a measured |V|: below ~2M nodes (~50 MB)
    // the rank/inc sides broadcast and the edges NEVER leave their
    // scan partitions; above it the co-partitioned SMJ is the honest
    // cluster shape (ranks must move each round — they change).
    val nV = nodeStats.count()
    def small(df: DataFrame): DataFrame =
      if (nV <= 2000000L) broadcast(df) else df
    var ranks = nodeStats.select(col("src").as("part"), col("s"),
      lit(1000000L).as("r"))
    var it = 0
    while (it < Iters) {
      val r = small(ranks)
      val inc = edges.join(r, r("part") === edges("src"))
        .select(col("dst"), expr("(r * w) DIV s").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("inc"))
      ranks = nodeStats.join(small(inc), nodeStats("src") === inc("dst"), "left")
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

  /** graph_triangles: triangle count + global clustering coefficient of
    * the co-purchase graph — how clique-ish the catalog is (a pure
    * per-order-clique graph has coefficient 1; cross-order structure
    * pulls it down). Degree-ordered node-iterator (Suri &
    * Vassilvitskii WWW'11): each undirected edge orients from the
    * (degree, id)-LOWER endpoint, so a node's out-degree is O(√m) even
    * at hub nodes and the wedge self-join never explodes on a heavy
    * vertex — THE distributed triangle-counting trick. Wedges close
    * against the oriented edge list; between the two wedge tips the
    * closing edge is oriented by the same rank, so one probe join
    * suffices. All counts are exact integers (wedge total is
    * Σ d·(d−1) DIV 2 — always even, exact), the coefficient is one
    * boundary division. Edge list, degrees, and the oriented+ranked
    * list each stage once (consumed 2-3×). */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame =
    graphTrianglesFrom(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")))

  private[graft] def graphTrianglesFrom(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val li = stageBarrier(pairs.select(col("ok"), col("p")).distinct())
    graphTrianglesFromUnd(stageBarrier(
      li.select(col("ok"), col("p").as("u"))
        .join(li.select(col("ok"), col("p").as("v")), Seq("ok"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()))
  }

  /** The closure count over an already-distinct undirected (u, v)
    * edge frame (u < v) — the staged twin enters here with the staged
    * edge table's upper-triangle half. */
  private[graft] def graphTrianglesFromUnd(und: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val dg = stageBarrier(
      und.select(col("u").as("node"))
        .unionAll(und.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d")))
    val lower = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val orn = und
      .join(dg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(dg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
      .select(when(lower, col("u")).otherwise(col("v")).as("src"),
        when(lower, col("v")).otherwise(col("u")).as("dst"),
        when(lower, col("dv")).otherwise(col("du")).as("dd"))
    val orn2 = stageBarrier(orn)
    // Adjacency-intersect closure instead of materializing the wedge
    // set: per ORIENTED edge (u, v) the triangles it closes are
    // |N+(u) ∩ N+(v)| — same count the wedge semi-join produces, but
    // the Σd² work runs inside one compiled sorted-merge kernel per
    // edge and no wedge row ever shuffles (7.3 s → the kernel's linear
    // merges at sf0.1; the dedup_containment argument on long arrays).
    import org.apache.spark.sql.GraftColumnBridge.{column => kcol, expression => kexp}
    import graft.expressions.SortedLongIntersectCount
    val adj = stageBarrier(orn2.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs")))
    // Size-gated CSR fast path (r10): the oriented adjacency totals
    // exactly |E| longs; when it fits the embedded-state gate the
    // per-edge closure count is one generated local merge — no
    // adjacency array ever joins back onto the edge list
    val nE = und.count()
    val tri = (if (nE * 8L <= CsrByteGate) {
      val csr = collectCsr(adj, "src", "nbrs")
      orn2.select(kcol(graft.expressions.AdjCommonCount(
        kexp(col("src")), kexp(col("dst")), csr)).as("c"))
    } else {
      orn2.select(col("src"), col("dst"))
        .join(adj.select(col("src"), col("nbrs").as("nu")), Seq("src"))
        .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")), Seq("dst"), "left")
        .select(kcol(SortedLongIntersectCount(kexp(col("nu")),
          kexp(coalesce(col("nv"), array().cast("array<bigint>"))))).as("c"))
    }).agg(sum(col("c").cast("long")).as("n_triangles"))
    val stats = dg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("(d * (d - 1)) DIV 2")).as("n_wedges"))
    val ecnt = und.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(broadcast(ecnt)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_triangles").cast("double") * 3.0
            / col("n_wedges").cast("double"), 6) + 0.0).as("clustering"))
  }

  lazy val graphTrianglesSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |und AS (SELECT DISTINCT a.p AS u, b.p AS v
      |        FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
      |dg AS (SELECT node, count(*) AS d
      |       FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
      |       GROUP BY node),
      |orn AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS src,
      |               CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS dst,
      |               CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN dv.d ELSE du.d END AS dd
      |        FROM und JOIN dg du ON du.node = u JOIN dg dv ON dv.node = v),
      |wg AS (SELECT e1.dst AS v, e2.dst AS w
      |       FROM orn e1 JOIN orn e2 ON e1.src = e2.src
      |        AND (e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst))),
      |tri AS (SELECT count(*) AS n_triangles
      |        FROM wg WHERE EXISTS (SELECT 1 FROM orn
      |                              WHERE orn.src = wg.v AND orn.dst = wg.w)),
      |st AS (SELECT count(*) AS n_nodes,
      |              CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges FROM dg),
      |ec AS (SELECT count(*) AS n_edges FROM und)
      |SELECT n_nodes, n_edges, n_wedges, n_triangles,
      |       CASE WHEN n_wedges = 0 THEN NULL
      |            ELSE round(CAST(n_triangles AS DOUBLE) * 3.0
      |                       / CAST(n_wedges AS DOUBLE), 6) + 0.0 END AS clustering
      |FROM st, ec, tri""".stripMargin

  /** graph_similar_parts: item-item similarity by co-purchase NEIGHBOR
    * overlap — for each part, its 5 most structurally similar parts by
    * Jaccard of full neighbor sets (the classic item-item collaborative
    * filter: two parts are similar when the baskets they appear in
    * overlap, even if the parts themselves rarely co-occur... scored
    * here over candidate pairs that DO co-occur at least once, the
    * natural recommender candidate set and the bound that keeps the
    * pair space at |E|, never all-pairs).
    *
    * Scale: the Jaccard numerator c(u,v) for a candidate edge equals
    * that edge's TRIANGLE support, so it is computed by triangle
    * enumeration over the (degree,id)-oriented adjacency (the
    * graph_triangles orientation): out-lists are O(√m) even at hubs,
    * each triangle is emitted once by the compiled sorted-merge
    * intersect kernel on its lowest oriented edge and credits its three
    * edges as SCALAR rows — no hub's full neighbor array is ever
    * replicated per candidate edge (the r9 shape's Σdeg² transport).
    * Candidates = edges (each scored once, mirrored into both
    * directions for ranking); the top-5 window partitions by part —
    * bounded by max degree, never corpus-scaled. jac = c/(da+db−c) is
    * one double division of exact integers; both engines sort the
    * identical doubles (tie-break part_b), so ranks hash-match. The
    * mirror keeps the direct full-neighbor list_intersect form — same
    * c by the support identity, single-node DuckDB has no transport. */
  def graphSimilarParts(spark: SparkSession, dir: String): DataFrame =
    graphSimilarPartsFrom(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")))

  private[graft] def graphSimilarPartsFrom(pairs: DataFrame): DataFrame =
    graphSimilarPartsFrom(pairs, forceBranch = None)

  /** The measured-density scoring dial, pure so the spec pins its
    * choices directly: SPARSE graphs (E < V²/8) take triangle-credit
    * scoring (out-lists O(√m), no hub replication); dense graphs whose
    * adjacency collect fits the embedded-state gate take the packed
    * BITMAP kernel (per-edge cost O(V/64) words — the sorted-merge CSR
    * paid O(du+dv) = O(V) per edge on a saturating projection, the r11
    * sf10 superlinear term at 36 s); past the gate the array JOIN plan
    * remains (dense + huge never binds: E ≤ gate/16 bounds V ≤ √(8E),
    * so any graph dense enough to skip "sparse" and big enough to skip
    * "bitmap" is out of the dial's domain by construction). */
  private[graft] def similarPartsBranch(nV: Long, nE: Long): String =
    if (nE * 8L < nV * nV) "sparse"
    else if (nE * 16L <= CsrByteGate) "bitmap"
    else "join"

  /** `forceBranch`: spec hook pinning that all scoring strategies give
    * identical output; production passes None and the density dial
    * decides. */
  private[graft] def graphSimilarPartsFrom(
      pairs: DataFrame, forceBranch: Option[String]): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val li = stageBarrier(pairs.select(col("ok"), col("p")).distinct())
    graphSimilarPartsFromUnd(stageBarrier(
      li.select(col("ok"), col("p").as("u"))
        .join(li.select(col("ok"), col("p").as("v")), Seq("ok"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()), forceBranch)
  }

  /** Scoring over an already-distinct undirected (u, v) edge frame —
    * the staged twin's entry (the density dial and all three scoring
    * branches are unchanged; they never looked at the membership rows). */
  private[graft] def graphSimilarPartsFromUnd(
      und: DataFrame, forceBranch: Option[String]): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    import org.apache.spark.sql.GraftColumnBridge.{column => kcol, expression => kexp}
    import graft.expressions.{SortedLongIntersect, SortedLongIntersectCount}
    val dg = stageBarrier(
      und.select(col("u").as("node"))
        .unionAll(und.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d")))
    // Density dial (two scalar jobs on already-staged frames — the
    // dedupEmbedding planes precedent). A SPARSE graph (growing catalog,
    // hub outliers — the 100 TB TPC-H shape: |E| ≈ 10·|orders| while
    // |V| = |parts| keeps growing) is scored by triangle credits over
    // the (degree,id)-oriented adjacency: out-lists are O(√m) even at
    // hubs, so no hub's full neighbor array is ever replicated per
    // candidate edge (the r9 plan's Σdeg² transport). A DENSE projection
    // (fixed small catalog — the local testdata: 2000 parts, 60 % of
    // complete) is scored per-edge by the compiled sorted-merge kernel
    // on full V-BOUNDED adjacency arrays: triangle count approaches
    // E·d̄ there and credit rows would dwarf the capped array transport.
    // Both strategies produce the identical frame (GraphSpec pins it).
    val dialRow = dg.agg(count(lit(1)), sum(col("d"))).first()
    val nV = dialRow.getLong(0)
    val nE = dialRow.getLong(1) / 2 // handshake: Σd = 2|E|
    val branch = forceBranch.getOrElse(similarPartsBranch(nV, nE))
    val scoredBase =
      if (branch == "sparse") {
        // each triangle found ONCE on its lowest oriented edge (both
        // other vertices sit in that edge's out-lists); its three
        // undirected edges are credited as scalar rows
        val lower = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
        val orn = stageBarrier(und
          .join(dg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
          .join(dg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
          .select(when(lower, col("u")).otherwise(col("v")).as("src"),
            when(lower, col("v")).otherwise(col("u")).as("dst")))
        val adj = stageBarrier(orn.groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("nbrs")))
        val triWs = orn
          .join(adj.select(col("src"), col("nbrs").as("nu")), Seq("src"))
          .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")), Seq("dst"), "left")
          .select(col("src").as("a"), col("dst").as("b"),
            explode(kcol(SortedLongIntersect(kexp(col("nu")),
              kexp(coalesce(col("nv"), array().cast("array<bigint>")))))).as("w"))
        // credits normalize to raw-id order (orientation is by
        // (degree,id) rank, so a/b/w raw order is arbitrary) to meet
        // und's u < v key
        val credits = triWs.select(least(col("a"), col("b")).as("cu"),
            greatest(col("a"), col("b")).as("cv"))
          .unionAll(triWs.select(least(col("a"), col("w")).as("cu"),
            greatest(col("a"), col("w")).as("cv")))
          .unionAll(triWs.select(least(col("b"), col("w")).as("cu"),
            greatest(col("b"), col("w")).as("cv")))
          .groupBy(col("cu"), col("cv")).agg(count(lit(1)).as("c"))
        und.join(credits.withColumnRenamed("cu", "u").withColumnRenamed("cv", "v"),
            Seq("u", "v"), "left")
          .join(dg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
          .join(dg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
          .select(col("u"), col("v"), col("du"), col("dv"),
            coalesce(col("c"), lit(0L)).as("c"))
      } else if (branch == "bitmap") {
        // dense AND the whole adjacency fits the embedded-state gate:
        // snapshot it as packed V-bit BITMAPS inside ONE generated
        // expression (the IVF centroid-table shipping discipline) —
        // per-edge Jaccard input (c, du, dv) is stride = ceil(V/64)
        // AND+popcount words, ZERO joins, no array ever shuffles. The
        // r10-r11 sorted-merge CSR here paid O(du+dv) per edge, which
        // on a saturating projection (d̄ → V) is O(E·V) = O(V³) total —
        // the measured 36.4 s sf10 term; the bitmap pays O(E·V/64).
        val nbrAll = und.select(col("u").as("node"), col("v").as("nbr"))
          .unionAll(und.select(col("v").as("node"), col("u").as("nbr")))
        val adj = nbrAll.groupBy(col("node"))
          .agg(sort_array(collect_list(col("nbr"))).as("ns"))
        val bm = collectBitmap(adj, "node", "ns")
        val st = kcol(graft.expressions.AdjBitmapStats(
          kexp(col("u")), kexp(col("v")), bm))
        und.select(col("u"), col("v"), st.as("st"))
          .select(col("u"), col("v"), col("st.du").as("du"),
            col("st.dv").as("dv"), col("st.c").as("c"))
      } else {
        val nbrAll = und.select(col("u").as("node"), col("v").as("nbr"))
          .unionAll(und.select(col("v").as("node"), col("u").as("nbr")))
        val adj = stageBarrier(nbrAll.groupBy(col("node"))
          .agg(sort_array(collect_list(col("nbr"))).as("ns"), count(lit(1)).as("d")))
        und
          .join(adj.select(col("node").as("u"), col("ns").as("nu"), col("d").as("du")), Seq("u"))
          .join(adj.select(col("node").as("v"), col("ns").as("nv"), col("d").as("dv")), Seq("v"))
          .select(col("u"), col("v"), col("du"), col("dv"),
            kcol(SortedLongIntersectCount(kexp(col("nu")), kexp(col("nv"))))
              .cast("long").as("c"))
      }
    val scored = scoredBase
    val both = scored
      .select(col("u").as("part_a"), col("v").as("part_b"),
        col("c"), col("du").as("da"), col("dv").as("db"))
      .unionAll(scored.select(col("v").as("part_a"), col("u").as("part_b"),
        col("c"), col("dv").as("da"), col("du").as("db")))
      .withColumn("jaccard",
        round(col("c").cast("double")
          / (col("da") + col("db") - col("c")).cast("double"), 4) + 0.0)
    val w = Window.partitionBy(col("part_a"))
      .orderBy(col("jaccard").desc, col("part_b"))
    both.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("part_a"), col("rank"), col("part_b"),
        col("c").as("n_common"), col("jaccard"))
      .orderBy(col("part_a"), col("rank"))
  }

  lazy val graphSimilarPartsSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |und AS (SELECT DISTINCT a.p AS u, b.p AS v
      |        FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
      |nb AS (SELECT u AS node, v AS nbr FROM und
      |       UNION ALL SELECT v AS node, u AS nbr FROM und),
      |adj AS (SELECT node, list(nbr ORDER BY nbr) AS ns, count(*) AS d
      |        FROM nb GROUP BY node),
      |sc AS (SELECT u, v, aa.d AS du, ab.d AS dv,
      |         CAST(len(list_intersect(aa.ns, ab.ns)) AS BIGINT) AS c
      |       FROM und JOIN adj aa ON aa.node = und.u
      |       JOIN adj ab ON ab.node = und.v),
      |bo AS (SELECT u AS part_a, v AS part_b, c, du AS da, dv AS db FROM sc
      |       UNION ALL SELECT v, u, c, dv, du FROM sc),
      |jc AS (SELECT part_a, part_b, c,
      |         round(CAST(c AS DOUBLE) / CAST(da + db - c AS DOUBLE), 4) + 0.0 AS jaccard
      |       FROM bo),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY part_a
      |                                    ORDER BY jaccard DESC, part_b) AS rank
      |       FROM jc)
      |SELECT part_a, rank, part_b, c AS n_common, jaccard
      |FROM rk WHERE rank <= 5 ORDER BY part_a, rank""".stripMargin

  // ------------------------------------------------------- graph_degree_dist
  /** DEGREE DISTRIBUTION of the co-purchase graph: parts bucketed by
    * floor(log2(distinct co-purchase partners)) with count, share, and
    * degree mass — the first chart anyone draws over a graph (power-law
    * vs uniform decides whether hub-aware strategies like the
    * graph_triangles degree-ordering or skew salting are worth it; the
    * corpus_length_hist bucketing on graph degrees).
    *
    * Exactness: degree is an exact integer count of distinct partners;
    * the bucket is len(binary(n))−1 (no transcendental), the share one
    * division of exact integers.
    *
    * Scale: the family's staged per-order distinct + per-order-bounded
    * pair quadratic (never corpus-quadratic), one degree shuffle, then
    * a ≤~30-row bucket rollup STAGED for its two consumers (output +
    * 1-row total, trade_flow_matrix's shape). */
  def graphDegreeDist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val li = stageBarrier(Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct())
    graphDegreeDistFromUnd(
      li.select(col("ok"), col("pk").as("pa"))
        .join(li.select(col("ok"), col("pk").as("pb")), Seq("ok"))
        .filter(col("pa") < col("pb"))
        .select(col("pa"), col("pb")).distinct())
  }

  /** Bucketing over an already-distinct undirected (pa, pb) edge frame. */
  private[graft] def graphDegreeDistFromUnd(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val deg = pairs.select(explode(array(col("pa"), col("pb"))).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("degree"))
    val agg = stageBarrier(deg
      .withColumn("bucket", (length(bin(col("degree"))) - 1).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_parts"), sum(col("degree")).as("sum_degree")))
    val tot = agg.agg(sum(col("n_parts")).as("tp"))
    agg.crossJoin(broadcast(tot))
      .select(col("bucket"),
        expr("CAST(shiftleft(CAST(1 AS BIGINT), bucket) AS BIGINT)").as("bucket_lo"),
        col("n_parts"),
        (round(col("n_parts").cast("double") / col("tp").cast("double"), 6) + 0.0)
          .as("share"),
        col("sum_degree"))
      .orderBy(col("bucket"))
  }

  val graphDegreeDistSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |pr AS (SELECT DISTINCT a.pk AS pa, b.pk AS pb
      |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |dg AS (SELECT p, count(*) AS degree FROM (
      |         SELECT pa AS p FROM pr UNION ALL SELECT pb AS p FROM pr) ends
      |       GROUP BY p),
      |ag AS (SELECT CAST(length(format('{:b}', degree)) - 1 AS INT) AS bucket,
      |              count(*) AS n_parts, CAST(sum(degree) AS BIGINT) AS sum_degree
      |       FROM dg GROUP BY bucket),
      |tt AS (SELECT sum(n_parts) AS tp FROM ag)
      |SELECT bucket, CAST(1 AS BIGINT) << bucket AS bucket_lo, n_parts,
      |       round(CAST(n_parts AS DOUBLE)/CAST(tp AS DOUBLE), 6) + 0.0 AS share,
      |       sum_degree
      |FROM ag CROSS JOIN tt ORDER BY bucket""".stripMargin

  // ---------------------------------------------------- graph_assortativity
  /** Degree ASSORTATIVITY of the co-purchase graph (Newman PRL'02): the
    * Pearson correlation of endpoint degrees over edges — do hub parts
    * co-purchase with other hubs (r>0, social-network-like) or with
    * niche parts (r<0, catalog/star-like)? The one-number summary that
    * decides with graph_degree_dist whether hub-aware strategies pay.
    * Over the directed edge enumeration (each undirected edge in both
    * orientations) x/y marginals coincide, so
    * r = (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²) — no square roots, every
    * term an exact DECIMAL(38,0)/HUGEINT integer product (the
    * fin_dept_correlation moment discipline on graph degrees), ONE
    * cast per factor, NULL on regular graphs (zero degree variance).
    *
    * Scale: the family's staged per-order distinct + per-order-bounded
    * pair quadratic; the distinct directed edge list and degree frame
    * each stage once (ed feeds deg + the moment join; deg feeds both
    * endpoint joins + the node count); the two degree joins are
    * co-partitioned on the vertex key; everything collapses to ONE
    * 1-row moment aggregate + a broadcast 1-row node count. */
  def graphAssortativity(spark: SparkSession, dir: String): DataFrame =
    graphAssortativityFrom(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")))

  private[graft] def graphAssortativityFrom(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val li = stageBarrier(pairs.select(col("ok"), col("p")).distinct())
    val ed = stageBarrier(
      li.select(col("ok"), col("p").as("src"))
        .join(li.select(col("ok"), col("p").as("dst")), Seq("ok"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct())
    graphAssortativityFromEdges(ed)
  }

  /** The degree-moment statistic over an already-distinct (src, dst)
    * edge frame — the staged twin enters here with the staged weighted
    * table's key columns (grouping made them distinct). */
  private[graft] def graphAssortativityFromEdges(ed: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val deg = stageBarrier(ed.groupBy(col("src")).agg(count(lit(1)).as("d")))
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val xy = ed
      .join(deg.select(col("src"), col("d").as("x")), Seq("src"))
      .join(deg.select(col("src").as("dst"), col("d").as("y")), Seq("dst"))
    val m = xy.agg(count(lit(1)).as("m2"),
      sum(d38(col("x"))).as("sx"),
      sum(d38(col("x")) * d38(col("x"))).as("sxx"),
      sum(d38(col("x")) * d38(col("y"))).as("sxy"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val m2 = d38(col("m2"))
    val den = m2 * col("sxx") - col("sx") * col("sx")
    m.crossJoin(broadcast(nodes))
      .select(col("n_nodes"), expr("m2 DIV 2").cast("long").as("n_edges"),
        when(den <= 0, lit(null).cast("double"))
          .otherwise(round((m2 * col("sxy") - col("sx") * col("sx")).cast("double")
            / den.cast("double"), 6) + 0.0).as("assortativity"))
  }

  val graphAssortativitySql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |ed AS (SELECT DISTINCT a.p AS src, b.p AS dst
      |       FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p),
      |dg AS (SELECT src, count(*) AS d FROM ed GROUP BY src),
      |xy AS (SELECT CAST(dx.d AS HUGEINT) AS x, CAST(dy.d AS HUGEINT) AS y
      |       FROM ed JOIN dg dx ON ed.src = dx.src JOIN dg dy ON ed.dst = dy.src),
      |m AS (SELECT count(*) AS m2, sum(x) AS sx, sum(x*x) AS sxx, sum(x*y) AS sxy
      |      FROM xy),
      |nn AS (SELECT count(*) AS n_nodes FROM dg)
      |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
      |  CAST(m2 // 2 AS BIGINT) AS n_edges,
      |  CASE WHEN CAST(m2 AS HUGEINT)*sxx - sx*sx <= 0 THEN NULL
      |       ELSE round(CAST(CAST(m2 AS HUGEINT)*sxy - sx*sx AS DOUBLE)
      |                  / CAST(CAST(m2 AS HUGEINT)*sxx - sx*sx AS DOUBLE), 6) + 0.0
      |  END AS assortativity
      |FROM m, nn""".stripMargin

  /** Staged twins (r14): identical rank/statistic off the staged
    * co-purchase edge table — the oracle SQL is the in-query twin's
    * verbatim, so the driver gate asserts the staged read IS the
    * in-query derivation. */
  def graphPartRankStaged(spark: SparkSession, dir: String): DataFrame =
    graphPartRankFromEdges(stagedCoEdges(spark, dir))

  def graphAssortativityStaged(spark: SparkSession, dir: String): DataFrame =
    graphAssortativityFromEdges(
      stagedCoEdges(spark, dir).select(col("src"), col("dst")))

  /** The staged table's upper-triangle half = the distinct undirected
    * edge list (the weighted table carries both directions, so
    * src < dst keeps each undirected edge exactly once). */
  private def stagedUnd(spark: SparkSession, dir: String): DataFrame =
    stagedCoEdges(spark, dir).filter(col("src") < col("dst"))

  def graphTrianglesStaged(spark: SparkSession, dir: String): DataFrame =
    graphTrianglesFromUnd(
      stagedUnd(spark, dir).select(col("src").as("u"), col("dst").as("v")))

  def graphSimilarPartsStaged(spark: SparkSession, dir: String): DataFrame =
    graphSimilarPartsFromUnd(
      stagedUnd(spark, dir).select(col("src").as("u"), col("dst").as("v")),
      forceBranch = None)

  def graphDegreeDistStaged(spark: SparkSession, dir: String): DataFrame =
    graphDegreeDistFromUnd(
      stagedUnd(spark, dir).select(col("src").as("pa"), col("dst").as("pb")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_assortativity" -> (graphAssortativity _),
    "graph_assortativity_staged" -> (graphAssortativityStaged _),
    "graph_degree_dist" -> (graphDegreeDist _),
    "graph_degree_dist_staged" -> (graphDegreeDistStaged _),
    "graph_similar_parts" -> (graphSimilarParts _),
    "graph_similar_parts_staged" -> (graphSimilarPartsStaged _),
    "graph_triangles" -> (graphTriangles _),
    "graph_triangles_staged" -> (graphTrianglesStaged _),
    "graph_part_rank" -> (graphPartRank _),
    "graph_part_rank_staged" -> (graphPartRankStaged _))

  def oracles: Map[String, String] = Map(
    "graph_assortativity" -> graphAssortativitySql,
    "graph_assortativity_staged" -> graphAssortativitySql,
    "graph_degree_dist" -> graphDegreeDistSql,
    "graph_degree_dist_staged" -> graphDegreeDistSql,
    "graph_similar_parts" -> graphSimilarPartsSql,
    "graph_similar_parts_staged" -> graphSimilarPartsSql,
    "graph_triangles" -> graphTrianglesSql,
    "graph_triangles_staged" -> graphTrianglesSql,
    "graph_part_rank" -> graphPartRankSql,
    "graph_part_rank_staged" -> graphPartRankSql)
}
