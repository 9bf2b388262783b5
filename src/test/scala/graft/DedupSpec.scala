package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.Text

/** Correctness authority for the sketch-based dedup operators (driver
  * check is rows-only: xxhash64 seeds aren't reproducible in DuckDB). */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  test("dedup_winnow_pairs: matches a full driver-side re-simulation of MOSS matching") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("dedup_winnow_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.Text.shingleHashes(col("text"), 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    def fps(h: Seq[String]): Set[String] =
      if (h.isEmpty) Set.empty
      else (0 until math.max(h.length - 3, 1))
        .map(s => h.slice(s, math.min(s + 4, h.length)).min).toSet
    val all = hs.map { case (id, h) => id -> fps(h) }
    val df = all.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val rare = all.map { case (id, s) => id -> s.filter(df(_) <= 8) }
    val ids = rare.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      n = (rare(a) & rare(b)).size if n >= 2
    } yield (a, b, n.toLong))
      .sortBy { case (a, b, n) => (-n, a, b) }.take(50)
    assert(got.toSeq == expected, s"got ${got.length} vs expected ${expected.length}")
    assert(got.nonEmpty, "the gate corpus must contain overlapping docs")
  }

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into " +
    "the deep green forest where tall trees grow beside a cold clear river"
  private val nearDup = base.replace("cold clear river", "cold muddy river")
  private val distinct1 = "completely different content about spark engines and shuffle " +
    "partitions with broadcast joins and adaptive query execution at scale"

  test("dedup_exact collapses case/whitespace variants to min doc_id") {
    val df = Seq((1L, base), (2L, base.toUpperCase), (3L, "  " + base + "  "), (4L, distinct1))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .groupBy("fp").agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
    val rows = df.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 3L), (4L, 1L)))
  }

  test("dedup_clusters: every >=0.9 pair shares a cluster whose id is its min member") {
    val pairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf).collect()
      .filter(_.getDouble(2) >= 0.9).map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // transitive closure: both endpoints of every candidate pair co-cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // a cluster's id is the minimum doc_id among its members
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid min is ${members.keys.min}")
    }
    // exactly the docs that appear in some pair are clustered
    assert(clusters.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
  }

  test("minhash signature estimates Jaccard within 0.15 on a near-dup pair") {
    val df = Seq((1L, base), (2L, nearDup), (3L, distinct1)).toDF("doc_id", "text")
      .select(col("doc_id"), array_distinct(Text.shingles(col("text"), 3)).as("sh"),
        Dedup.minhashSignature(col("text")).as("sig"))
    val Array(a, b, c) = df.orderBy("doc_id").collect()
    def jac(x: Seq[String], y: Seq[String]): Double =
      x.toSet.intersect(y.toSet).size.toDouble / x.toSet.union(y.toSet).size
    def est(x: Seq[Long], y: Seq[Long]): Double =
      x.zip(y).count { case (p, q) => p == q }.toDouble / x.length
    val shA = a.getSeq[String](1); val shB = b.getSeq[String](1); val shC = c.getSeq[String](1)
    val sigA = a.getSeq[Long](2); val sigB = b.getSeq[Long](2); val sigC = c.getSeq[Long](2)
    assert(math.abs(est(sigA, sigB) - jac(shA, shB)) <= 0.15,
      s"est ${est(sigA, sigB)} vs true ${jac(shA, shB)}")
    assert(est(sigA, sigC) <= 0.2, "unrelated docs must not look similar")
  }

  test("minhash LSH finds the corpus's planted near-dups") {
    // ground truth: candidate pairs with true Jaccard >= 0.9 from the oracled query
    val truth = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "sf corpus should contain planted near-dups")
    val recall = truth.intersect(found).size.toDouble / truth.size
    assert(recall >= 0.9, s"banded LSH recall $recall over ${truth.size} true pairs")
  }

  test("minhash LSH survives short/empty documents (ANSI array indexing)") {
    // docs under k words have an EMPTY signature; unguarded sig[i]
    // banding would throw INVALID_ARRAY_INDEX under ANSI mode
    val docs = Seq((1L, base), (2L, base), (3L, "too short"), (4L, ""), (5L, distinct1))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshFrom(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)), "identical docs pair; short docs drop out quietly")
  }

  test("banded ngram candidates survive a globally common shingle (no quadratic bucket)") {
    // r6's 1-band generator (bucket = the single global min-shingle hash)
    // collapsed every doc whose minimum happened to be one common trigram
    // into ONE bucket: with s distinct shingles per doc, ~n/s docs of a
    // corpus sharing that trigram co-bucket -> O((n/s)^2) pairs that AQE
    // can split but not shrink. The r7 banded key needs TWO independent
    // lane minima to agree, cutting the hot bucket to ~n/s^2. Plant one
    // shared trigram across 8k otherwise-disjoint docs: the old shape
    // yields ~ (8000/31)^2/2 = 33k+ pairs; the banded shape must stay
    // under a few thousand, and it must still complete promptly.
    val common = "zz yy xx" // one shared trigram across the whole corpus
    val docs = spark.range(8000).selectExpr("id AS doc_id",
      // 30 words unique to the doc (w<id>_0 .. w<id>_29) + the planted trigram
      s"""concat_ws(' ', transform(sequence(0, 29), i -> concat('w', id, '_', i))) || ' $common'
         | AS text""".stripMargin)
    val pairs = Dedup.ngramJaccardFrom(docs)
    val n = pairs.count()
    assert(n < 5000, s"hot-bucket blowup: $n candidate pairs from one common shingle")
    // and true dups still pair with certainty (identical sets agree on
    // every lane min by construction)
    val withDup = docs.union(Seq((9001L,
      "w1_0 w1_1 w1_2 w1_3 w1_4 w1_5")).toDF("doc_id", "text"))
      .union(Seq((9002L, "w1_0 w1_1 w1_2 w1_3 w1_4 w1_5")).toDF("doc_id", "text"))
    val exact = Dedup.ngramJaccardFrom(withDup)
      .filter(col("id_a") === 9001L && col("id_b") === 9002L).collect()
    assert(exact.length == 1 && exact(0).getDouble(2) == 1.0,
      "identical docs must be guaranteed candidates at jaccard 1.0")
  }

  test("ngram jaccard survives short/empty documents") {
    val docs = Seq((1L, base), (2L, base), (3L, "too short"), (4L, ""), (5L, distinct1))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardFrom(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSet == Set((1L, 2L, 1.0)), "identical docs pair; short docs drop out")
  }

  test("band eval: identical docs land in the top bucket with perfect recall and zero error") {
    val docs = Seq((1L, base), (2L, base), (3L, nearDup), (4L, distinct1))
      .toDF("doc_id", "text")
    val rows = Dedup.bandEvalFrom(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (r1, r2, err) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(r1 >= 0.0 && r1 <= r2 && r2 <= 1.0, s"recalls out of order: $r")
      assert(err >= 0.0 && err <= 1.0, s"estimator error out of range: $r")
    }
    // the identical pair (1,2) has J = 1: bucket 9, found by EVERY band
    // (first_band = 0) with an exact 8/8 signature agreement
    val top = rows.find(_.getLong(0) == 9L).getOrElse(fail("no top bucket"))
    assert(top.getLong(1) >= 1L)
    assert(top.getDouble(2) == 1.0 && top.getDouble(3) == 1.0,
      s"J=1 pairs must be in every band's candidates: $top")
  }

  test("band eval at gate scale: 1-band recall respects the banding curve in the top bucket") {
    val rows = SparkEntry.queries("dedup_band_eval")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.find(_.getLong(0) == 9L).foreach { top =>
      // bucket [0.9,1.0]: per-band hit probability J^2 >= 0.81; allow
      // sampling slack on small bucket counts
      assert(top.getDouble(2) >= (if (top.getLong(1) >= 10) 0.7 else 0.0),
        s"1-band recall implausibly low for near-identical pairs: $top")
    }
  }

  test("threshold eval: exact clones removed at every tau, disjoint docs never; fractions exact") {
    // 10 disjoint docs (distinct word universes) + 3 exact clones of
    // doc 0: identical shingle sets share every lane minimum, so the
    // clones are SURE banded candidates at J = 1.0 and must be removed
    // at every tau including 0.950; the disjoint docs never pair.
    val words = (0 until 10).map(d => (0 until 20).map(w => s"w${d}_$w").mkString(" "))
    val docs = (words.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((100L, words(0)), (101L, words(0)), (102L, words(0))))
      .toDF("doc_id", "text")
    val rows = Dedup.thresholdEvalFrom(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Dedup.ThresholdsPerMille)
    val td = 13.0
    val tt = (13 * 20).toDouble
    rows.foreach { case (tau, nd, tr, fd, ft) =>
      assert(nd == 3, s"tau $tau: exactly the 3 clones must drop, got $nd")
      assert(tr == 60, s"tau $tau: clone tokens, got $tr")
      assert(math.abs(fd - (td - 3) / td) < 1e-6 && math.abs(ft - (tt - 60) / tt) < 1e-6)
    }
  }

  test("threshold eval at gate scale: removals monotone non-increasing in tau, fractions consistent") {
    val rows = SparkEntry.queries("dedup_threshold_eval")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val nds = rows.map(_._2)
    assert(nds.toSeq == nds.sorted.reverse.toSeq,
      "a stricter (higher) tau can only remove fewer docs")
    val trs = rows.map(_._3)
    assert(trs.toSeq == trs.sorted.reverse.toSeq)
    rows.foreach { case (tau, nd, tr, fd, ft) =>
      assert(fd >= 0 && fd <= 1 && ft >= 0 && ft <= 1, s"tau $tau")
      assert(nd == 0 || tr > 0, s"tau $tau: removed docs must carry tokens")
    }
  }

  test("dedup_threshold_apply: chosen tau follows the retained-token rule, removal set matches the eval") {
    val evalRows = SparkEntry.queries("dedup_threshold_eval")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val rows = SparkEntry.queries("dedup_threshold_apply")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // the choice rule re-derived from the registered eval: smallest tau
    // keeping >= 98% of tokens (integer cross-multiplied), else largest
    val raw = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(size(filter(split(col("text"), " "), w => length(w) > 0))
          .cast("long")).as("nw"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tt = raw.values.map(_._2).sum
    val want = evalRows.filter { case (_, _, tr) =>
        1000L * (tt - tr) >= Dedup.RetainPerMille.toLong * tt }
      .map(_._1).sorted.headOption.getOrElse(Dedup.ThresholdsPerMille.max)
    assert(rows.nonEmpty && rows.forall(_._2 == want), s"chosen tau must be $want")
    // conservation per source: kept + removed = the raw corpus
    rows.foreach { case (src, _, nd, _, nr) =>
      assert(nd + nr == raw(src)._1, s"$src: docs don't conserve")
    }
    // total retained tokens = corpus total − the eval's removal at chosen tau
    val trChosen = evalRows.find(_._1 == want).get._3
    assert(rows.map(_._4).sum == tt - trChosen, "retained tokens disagree with the eval")
    val ndChosen = evalRows.find(_._1 == want).get._2
    assert(rows.map(_._5).sum == ndChosen, "removed docs disagree with the eval")
  }

  test("embed threshold eval: planted cosines cross the right cutoffs, spine reports zero rows") {
    // cell 0: v0 ≡ v1 (cos 1.0), v2 at cos 0.97 to both; cell 1: v3
    // alone. keep-min removal: τ=0.95 drops {v1, v2} (all 3 pairs
    // qualify), τ∈{0.98, 0.99, 0.995} drops {v1} (only the clone pair)
    val c97 = 0.97
    val s97 = math.sqrt(1.0 - c97 * c97)
    val celled = Seq(
      (0L, Seq(1.0, 0.0), 0), (1L, Seq(1.0, 0.0), 0),
      (2L, Seq(c97, s97), 0), (3L, Seq(0.0, 1.0), 1))
      .toDF("vec_id", "v", "cell")
    val rows = Dedup.embedThresholdEvalFrom(celled).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Dedup.CosThresholds)
    assert(rows(0) == ((0.95, 3L, 2L, 0.5)), s"tau 0.95: ${rows(0)}")
    Seq(1, 2, 3).foreach { i =>
      assert(rows(i)._2 == 1 && rows(i)._3 == 1 && rows(i)._4 == 0.75,
        s"tau ${rows(i)._1}: only the exact clone drops: ${rows(i)}")
    }
    // a frame with NO qualifying pairs still reports all four taus
    val lone = Seq((0L, Seq(1.0, 0.0), 0), (1L, Seq(0.0, 1.0), 0))
      .toDF("vec_id", "v", "cell")
    val z = Dedup.embedThresholdEvalFrom(lone).collect()
    assert(z.length == 4 && z.forall(r => r.getLong(2) == 0 && r.getDouble(3) == 1.0))
  }

  test("cluster stats conserve dedup_clusters' membership and bound the savings") {
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf).collect()
    val stats = SparkEntry.queries("dedup_cluster_stats")(spark, sf).collect()
    assert(stats.nonEmpty)
    // clusters only contain >=0.9-pair members, so every size >= 2
    stats.foreach { r =>
      assert(r.getLong(0) >= 2L, s"singleton cluster in stats: $r")
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1), s"n_docs != size*n_clusters: $r")
      assert(r.getLong(3) >= 0L, s"negative savings: $r")
    }
    assert(stats.map(_.getLong(2)).sum == clusters.length,
      "stats must conserve the clustered doc count")
    val bySize = clusters.groupBy(_.getLong(1)).values.map(_.length.toLong)
      .groupBy(identity).map { case (szv, g) => (szv, g.size.toLong) }
    assert(stats.map(r => (r.getLong(0), r.getLong(1))).toMap == bySize,
      "per-size cluster counts must match a driver-side recount")
  }

  test("simhash: near-dup hamming below unrelated hamming") {
    val df = Seq((1L, base), (2L, nearDup), (3L, distinct1)).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)),
      s"near-dup ${ham(m(1L), m(2L))} !< unrelated ${ham(m(1L), m(3L))}")
    assert(ham(m(1L), m(2L)) <= 16, "near-dup should be within 16 bits")
  }

  test("embedding pairs are label-blocked and cosine is bounded") {
    val rows = SparkEntry.queries("dedup_embedding")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= -1.0001 && c <= 1.0001)
      assert(r.getLong(1) < r.getLong(2))
    }
  }

  test("star components flatten a 256-link chain in O(log n) rounds") {
    // a path graph is the adversarial case for min-label propagation
    // (diameter 256 → 256 rounds); the star alternation must land in
    // O(log n). Shuffled edge order so convergence can't ride on input
    // ordering.
    val rnd = new scala.util.Random(7)
    val edges = rnd.shuffle((0L until 256L).map(i => (i, i + 1)).toSeq)
      .toDF("a", "b")
    val (labels, rounds) = Dedup.starComponents(edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 257)
    assert(got.values.forall(_ == 0L), s"non-root labels: ${got.filter(_._2 != 0L)}")
    assert(rounds <= 12, s"expected O(log 256) rounds, took $rounds")
  }

  test("star components handle forests, isolated self-pairs, and empty input") {
    // two components + a self-loop-only node (dropped: no real edge)
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L), (7L, 7L)).toDF("a", "b")
    val (labels, _) = Dedup.starComponents(edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
    val (empty, emptyRounds) = Dedup.starComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(empty.count() == 0 && emptyRounds == 0)
  }

  test("embedding reps: one best edge per vector, rep is the block min, drops are real pairs") {
    val reps = SparkEntry.queries("dedup_embedding_reps")(spark, sf).collect()
    assert(reps.nonEmpty)
    val ids = reps.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "a vector got two rep edges")
    reps.foreach { r =>
      assert(r.getLong(1) < r.getLong(0), "rep must be the block's minimum id")
      val expected = if (r.getDouble(2) >= 0.99) "drop" else "keep"
      assert(r.getString(3) == expected)
    }
    // every dropped member's (rep, member) edge exists in the FULL pair
    // yardstick with the identical cosine — the star edge IS a pair
    val pairs = Dedup.dedupEmbeddingFullPairs(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    reps.filter(_.getString(3) == "drop").foreach { r =>
      val key = (r.getLong(1), r.getLong(0))
      assert(pairs.get(key).contains(r.getDouble(2)),
        s"drop edge $key missing from the pair list")
    }
  }

  test("bounded embedding pairs: subset of the full pair list, same components, output linear") {
    val full = Dedup.dedupEmbeddingFullPairs(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val got = SparkEntry.queries("dedup_embedding")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3))
    assert(got.nonEmpty)
    // 1. every bounded pair is a real pair with the identical cosine
    got.foreach { case (k, c) =>
      assert(full.get(k).contains(c), s"bounded pair $k not in the full list")
    }
    // 2. the id-ordered partner chains preserve connectivity: connected
    // components of the bounded edge set == those of the full edge set
    def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
      Dedup.starComponents(edges.toDF("a", "b"))._1.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(got.map(_._1).toSeq) == comps(full.keys.toSeq),
      "bounded pairs changed the connected components")
    // 3. the output bound is structural: per (member, table) at most
    // PairCap partners, so |pairs| <= n * PairCap * 3 always
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(got.length <= n * Dedup.PairCap * 3)
  }

  test("containment: every FULL containment found; excerpt-in-wrapper case Jaccard misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // base docs with disjoint vocab + an excerpt (first 10 words of doc 1
    // inside a much longer wrapper) + an unrelated doc
    val w1 = (0 until 40).map(i => s"alpha$i").mkString(" ")
    val excerpt = (0 until 12).map(i => s"alpha$i").mkString(" ")
    val wrapper = excerpt + " " + (0 until 60).map(i => s"beta$i").mkString(" ")
    val other = (0 until 30).map(i => s"gamma$i").mkString(" ")
    val docs = Seq((1L, w1), (2L, wrapper), (3L, other), (4L, excerpt))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("containment")))
    // 4's shingles (alpha0..alpha11) are fully inside 1 AND wrapper 2:
    // full containments are guaranteed by the min-shingle inverted probe
    val full = got.filter(_._3 == 1.0).map(t => (t._1, t._2)).toSet
    assert(full.contains((4L, 1L)), s"excerpt-in-original missed: ${got.toSeq}")
    assert(full.contains((4L, 2L)), s"excerpt-in-wrapper missed: ${got.toSeq}")
    // the wrapper pair has LOW Jaccard (10 shared of ~68 union) — the
    // case the symmetric banded generator cannot see
    assert(!got.exists(t => t._1 == 3L || t._2 == 3L), "unrelated doc paired")
    // no false scores: recompute one pair by hand (shingle sets)
    got.foreach { case (a, b, c) => assert(c >= 0.8 && c <= 1.0, s"($a,$b,$c)") }
  }

  test("containment: exact-dup classes collapse and re-expand; <3 unique shingles => found surely") {
    import spark.implicits._
    // a 5-copy byte-identical clique + a 28/30-contained partial doc
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val partial = ((0 until 30).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")
    val docs = ((1L to 5L).map(id => (id, base)) :+ (9L, partial))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("containment")))
    // all 20 ordered within-clique pairs re-expand at containment 1.0
    val clique = got.filter(t => t._1 <= 5 && t._2 <= 5)
    assert(clique.length == 20 && clique.forall(_._3 == 1.0), s"clique: ${got.toSeq}")
    // the partial doc has only 2 non-shared shingles, so at least TWO of
    // its bottom-4 probes MUST land in the shared region (pigeonhole —
    // the r14 ≥2-hit rule's determinism case): all 5 (partial, copy)
    // pairs are found deterministically, each expanded from the single
    // class-level score 28/30
    val part = got.filter(_._1 == 9L)
    assert(part.length == 5 && part.forall(t => math.abs(t._3 - 28.0 / 30) < 1e-12),
      s"partial: ${got.toSeq}")
    // reverse direction is 28/38 < 0.8: excluded
    assert(got.length == 25, s"extra pairs: ${got.toSeq}")
  }

  test("dedup_semantic: planted exact replicas all drop; loose same-center pairs survive") {
    import spark.implicits._
    // 2000 clustered vectors + 100 exact replicas of distinct bases
    // (cos = 1.0). Jitter is seeded-Gaussian at σ = 1.0 — same-center
    // cosines sit at ~0.33 ± 0.12, so an ACCIDENTAL ≥0.99 pair is a
    // >5σ event (a deterministic sine-phase jitter aliases: i and
    // i+1275 read as replicas — the r8 first cut of this spec); only
    // the planted replicas can drop. Identical vectors land in
    // identical argmax-dot cells deterministically, so every replica
    // drops: the report's n_dropped must sum to exactly 100.
    val base = (0 until 2000).map { i =>
      val c = i % 25
      val r = new java.util.Random(i * 7919L + 13)
      (i.toLong, Array.tabulate(64) { d =>
        math.sin(c * 3.1 + d * 0.73) + r.nextGaussian()
      }.toSeq)
    }
    val replicas = (0 until 100).map(j => (2000L + j, base(j * 20)._2))
    val corpus = (base ++ replicas).toDF("vec_id", "v")
    val rep = graft.operators.Dedup.semanticFrom(
      graft.operators.Ann.celledEmbeddingsOf(corpus)).collect()
    val dropped = rep.map(_.getLong(3)).sum
    assert(dropped == 100, s"expected exactly 100 replica drops, got $dropped")
    assert(rep.exists(_.getDouble(4) == 1.0), "replica cells should show max_cos 1.0")
  }

  test("semantic pair space is CellPairCap-bounded in ONE degenerate cell; replica drops stay exact") {
    import spark.implicits._
    // one oversized cell: 200 distinct jittered vectors + 3 exact
    // replicas of each of the first 50 — the degenerately self-similar
    // shape where the full pair list is b²/2 (the r11 sf10 superlinear
    // term). The chain bound must hold AND every replica must still
    // drop: the continuous plane-0 projection ties exactly on replicas,
    // so each family of 4 is a contiguous run in the cell order.
    val r = new java.util.Random(42)
    val base = (0 until 200).map(i =>
      (i.toLong, Seq.fill(64)(r.nextGaussian())))
    val replicas = for (j <- 0 until 50; k <- 0 until 3)
      yield (1000L + j * 3 + k, base(j)._2)
    val n = base.length + replicas.length
    val celled = (base ++ replicas).map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "v", "cell")
    val rep = graft.operators.Dedup.semanticFrom(celled).collect()
    assert(rep.length == 1)
    assert(rep(0).getLong(2) <= n.toLong * graft.operators.Dedup.CellPairCap,
      s"pair bound violated: ${rep(0).getLong(2)}")
    assert(rep(0).getLong(3) == 150, s"expected 150 replica drops, got ${rep(0).getLong(3)}")
    // the threshold-eval leg reads the SAME bounded pair list: every
    // tau sees exactly the 150 replica removals (accidental >=0.95
    // cosines between 64-d Gaussians are ~20 sigma events)
    val te = graft.operators.Dedup.embedThresholdEvalFrom(celled).collect()
    assert(te.length == 4 && te.forall(_.getLong(2) == 150),
      s"threshold eval drift: ${te.mkString(";")}")
  }

  test("banded threshold eval: a 50-clone family in one bucket stays chain-connected under PairCap") {
    import spark.implicits._
    val words = (0 until 10).map(d => (0 until 20).map(w => s"v${d}_$w").mkString(" "))
    val clones = (0 until 50).map(k => ((100 + k).toLong, words(0)))
    val docs = (words.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++ clones)
      .toDF("doc_id", "text")
    val rows = Dedup.thresholdEvalFrom(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    rows.foreach { case (tau, nd) =>
      assert(nd == 50, s"tau $tau: all 50 clones of doc 0 must drop, got $nd")
    }
  }

  test("dedup_cross_source: pair conservation vs the registered jaccard list, shares sum to 1") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("dedup_cross_source")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDups = graft.operators.Dedup.dedupNgramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.9).count()
    assert(rows.map(_.getLong(2)).sum == nDups, "every near-dup pair attributed once")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) <= 1e-4, "shares sum to 1")
    rows.foreach(r => assert(r.getString(0) <= r.getString(1), s"unordered key: $r"))
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
  }

  test("dedup_clusters_star labels match min-label dedup_clusters exactly") {
    val prop = SparkEntry.queries("dedup_clusters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val star = SparkEntry.queries("dedup_clusters_star")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(star == prop)
  }
}
