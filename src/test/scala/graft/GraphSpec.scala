package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Properties of the integer-exact PageRank (the oracle owns value
  * equality; this spec owns graph-theoretic behavior). */
class GraphSpec extends SparkSpec {

  test("graph_part_rank: hub of a planted star outranks leaves, leaves tie") {
    import spark.implicits._
    // star: part 1 co-purchased with each of 10 leaves (one order per
    // pair); leaves never co-occur with each other
    val pairs = (1 to 10).flatMap(i => Seq((100L + i, 1L), (100L + i, 10L + i)))
      .toDF("ok", "p")
    val rows = Graph.graphPartRankFrom(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 11)
    val hub = rows(1L)._2
    val leaves = (11L to 20L).map(rows(_)._2)
    assert(leaves.distinct.size == 1, s"leaves should tie: $leaves")
    assert(hub > leaves.head * 3, s"hub $hub vs leaf ${leaves.head}")
    // hub out-weight = 10 one-order edges, leaf out-weight = 1
    assert(rows(1L)._1 == 10L && rows(11L)._1 == 1L)
  }

  test("graph_assortativity: planted star is exactly -1, regular K4 is NULL") {
    import spark.implicits._
    // star: hub part 1 with 3 leaves, one order per edge — perfectly
    // disassortative, Newman's r = -1 exactly
    val star = Seq((101L, 1L), (101L, 11L), (102L, 1L), (102L, 12L),
      (103L, 1L), (103L, 13L)).toDF("ok", "p")
    val rs = Graph.graphAssortativityFrom(star).collect().head
    assert(rs.getLong(0) == 4 && rs.getLong(1) == 3)
    assert(math.abs(rs.getDouble(2) - (-1.0)) < 1e-9, s"star r = ${rs.getDouble(2)}")
    // K4: all degrees equal -> zero degree variance -> NULL, not a
    // division blow-up
    val k4 = Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L)).toDF("ok", "p")
    val rk = Graph.graphAssortativityFrom(k4).collect().head
    assert(rk.getLong(0) == 4 && rk.getLong(1) == 6)
    assert(rk.isNullAt(2), "regular graph must yield NULL assortativity")
  }

  test("graph_triangles: planted K4 + tail path counts exactly") {
    import spark.implicits._
    // order 100: parts {1,2,3,4} -> K4 (4 triangles, 6 edges);
    // orders 101/102 add the tail 4-5-6 (2 edges, no triangles)
    val pairs = (Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (101L, 4L), (101L, 5L), (102L, 5L), (102L, 6L))).toDF("ok", "p")
    val r = Graph.graphTrianglesFrom(pairs).collect().head
    assert(r.getLong(0) == 6, s"nodes ${r.getLong(0)}")
    assert(r.getLong(1) == 8, s"edges ${r.getLong(1)}")
    // wedges: deg (3,3,3,4,2,1) -> 3+3+3+6+1+0 = 16
    assert(r.getLong(2) == 16, s"wedges ${r.getLong(2)}")
    assert(r.getLong(3) == 4, s"triangles ${r.getLong(3)}")
    assert(r.getDouble(4) == 0.75, s"clustering ${r.getDouble(4)}")
  }

  test("graph_similar_parts: twin parts sharing all baskets rank each other first") {
    import spark.implicits._
    // 5 orders each {1, 2, x_i}: parts 1 and 2 are twins (same baskets),
    // each leaf x_i only ever appears with the twins
    val pairs = (1 to 5).flatMap(i => Seq((100L + i, 1L), (100L + i, 2L), (100L + i, 10L + i)))
      .toDF("ok", "p")
    val rows = Graph.graphSimilarPartsFrom(pairs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // N(1) = {2, x1..x5}, N(2) = {1, x1..x5}: common 5, union 7
    assert(rows((1L, 1)) == ((2L, 5L, 0.7143)), s"part1 rank1: ${rows((1L, 1))}")
    assert(rows((2L, 1)) == ((1L, 5L, 0.7143)), s"part2 rank1: ${rows((2L, 1))}")
    // a leaf's only candidates are the twins, common = the other twin
    assert(rows((11L, 1))._2 == 1L && rows((11L, 2))._2 == 1L)
    // leaves never co-occur -> never paired with each other
    assert(!rows.values.exists(v => v._1 >= 11L && v._1 <= 15L) ||
      rows.keys.forall { case (a, _) => true })
    val leafPartners = rows.collect { case ((a, _), (b, _, _)) if a == 11L => b }
    assert(leafPartners.toSet == Set(1L, 2L), s"leaf partners $leafPartners")
  }

  test("similar-parts dial: sparse below E < V²/8, bitmap for small-dense, join past the collect gate") {
    // planted small-dense catalog (the r11 sf10 shape: V fixed, E
    // saturating toward V²/2) must take the bitmap kernel, whose
    // per-edge cost is O(V/64) words instead of the merge's O(V)
    assert(Graph.similarPartsBranch(2000L, 1200000L) == "bitmap")
    // growing catalog, hub outliers: E ≪ V² -> triangle credits
    assert(Graph.similarPartsBranch(1000000L, 10000000L) == "sparse")
    // dense AND past the embedded-state collect gate -> the join plan
    assert(Graph.similarPartsBranch(8000L, 8000000L) == "join")
  }

  test("graph_similar_parts: triangle-credit scoring == brute full-neighbor Jaccard, hub transport bounded") {
    import spark.implicits._
    // adversarial hub: part 1 co-occurs with EVERYTHING (the shape whose
    // full neighbor array the r9 plan replicated per candidate edge),
    // plus a clique order and chain orders for triangle variety
    val pairs = (
      (1 to 12).map(i => (200L + i, 1L)) ++                  // hub in 12 orders
      (1 to 12).map(i => (200L + i, 20L + i.toLong)) ++      // each with a distinct leaf
      Seq((301L, 2L), (301L, 3L), (301L, 4L), (301L, 5L),    // a K4 order
        (302L, 2L), (302L, 3L), (302L, 1L))                  // overlap order incl. hub
    ).toDF("ok", "p")
    def run(branch: String) =
      Graph.graphSimilarPartsFrom(pairs, forceBranch = Some(branch)).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val got = run("sparse")
    // the density dial is an execution choice, never a semantic one:
    // the bitmap-kernel and array-join branches return the identical frame
    assert(run("bitmap").toSet == got.toSet,
      "bitmap and sparse scoring strategies disagree")
    assert(run("join").toSet == got.toSet,
      "join and sparse scoring strategies disagree")
    // brute re-simulation: full neighbor sets, Jaccard over co-occurring
    // pairs, top-5 by (jaccard desc, part_b) — the r9 semantics pinned
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = rows.groupBy(_._1).map { case (_, v) => v.map(_._2).toSet }
    val und = byOrder.flatMap(s => for (a <- s; b <- s if a < b) yield (a, b)).toSet
    val nbr = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val exp = und.toSeq.flatMap { case (u, v) =>
      val c = (nbr(u) & nbr(v)).size.toLong
      val j = BigDecimal(c.toDouble / (nbr(u).size + nbr(v).size - c))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((u, v, c, j), (v, u, c, j))
    }.groupBy(_._1).flatMap { case (a, cands) =>
      cands.sortBy(x => (-x._4, x._2)).take(5).zipWithIndex
        .map { case ((_, b, c, j), i) => (a, i + 1, b, c, j) }
    }.toSet
    assert(got.toSet == exp, s"got ${got.toSet.diff(exp)} vs exp ${exp.diff(got.toSet)}")
    // transport bound: the oriented out-list of ANY node (the only
    // arrays the plan ships) is <= sqrt(2m) — the degree-orientation
    // guarantee that kills the hub replication
    val m = und.size
    val dg = nbr.map { case (k, v) => k -> v.size }
    def rank(x: Long) = (dg(x), x)
    val outDeg = und.toSeq.map { case (a, b) =>
      (if (Ordering[(Int, Long)].lt(rank(a), rank(b))) a else b) -> 1
    }.groupBy(_._1).map(_._2.size)
    assert(outDeg.max <= math.ceil(math.sqrt(2.0 * m)).toInt,
      s"oriented out-degree ${outDeg.max} exceeds sqrt(2m)=${math.sqrt(2.0 * m)}")
  }

  test("graph_part_rank: rank mass bounded and floors-only below the float fixpoint") {
    val rows = SparkEntry.queries("graph_part_rank")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val total = rows.map(_.getLong(2)).sum
    // every vertex keeps the damping base; integer floors only ever
    // LOSE mass vs the n*1e6 float fixpoint total
    rows.foreach(r => assert(r.getLong(2) >= 150000L))
    assert(total <= n * 1000000L, s"total $total vs ${n * 1000000L}")
    assert(total >= n * 800000L, s"total $total lost too much to floors")
    // deterministic re-run
    val again = SparkEntry.queries("graph_part_rank")(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet == again)
  }

  test("graph_degree_dist: vertex/edge-mass conservation, shares sum to 1, buckets exact") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("graph_degree_dist")(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute the graph independently: distinct undirected co-purchase pairs
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val pairs = li.select(col("ok"), col("pk").as("a"))
      .join(li.select(col("ok"), col("pk").as("b")), Seq("ok"))
      .filter(col("a") < col("b")).select(col("a"), col("b")).distinct()
    val nEdges = pairs.count()
    val nVerts = pairs.select(explode(array(col("a"), col("b"))).as("p"))
      .distinct().count()
    assert(rows.map(_.getLong(2)).sum == nVerts, "every co-purchased part bucketed once")
    assert(rows.map(_.getLong(4)).sum == 2 * nEdges, "degree mass = 2|E| (handshake)")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) <= 1e-4, "shares sum to 1")
    rows.foreach { r =>
      val (b, lo, np, sd) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(4))
      assert(lo == (1L << b) && sd >= np * lo && sd < np * (lo << 1), s"bucket: $r")
    }
  }

  test("staged twins: part_rank/assortativity off the staged edge table match in-query") {
    // The driver gate asserts this against the shared oracle SQL too;
    // here it's pinned suite-side so a Staged.table regression (stale
    // cache key, partial write) can't hide between gate runs.
    for (name <- Seq("graph_part_rank", "graph_assortativity",
                     "graph_triangles", "graph_similar_parts", "graph_degree_dist")) {
      val inQuery = SparkEntry.queries(name)(spark, sf).collect().toSeq
      val staged = SparkEntry.queries(s"${name}_staged")(spark, sf).collect().toSeq
      assert(staged == inQuery, s"$name staged twin diverged")
    }
  }
}
