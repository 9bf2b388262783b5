package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.sources.Tables

/** Document deduplication suite (SURVEY.md §2D) — the LLM-pretraining
  * corpus dedup toolchain, each variant built so candidate generation is
  * bucket-keyed (shuffle on a bucket key, candidate pairs O(near-dups)),
  * NEVER an all-pairs cross join:
  *
  *  - exact: md5-of-normal-form grouping (one shuffle on the hash);
  *  - ngram-jaccard: banded md5-MinHash candidates (4 bands × 2 lanes —
  *    collision needs TWO independent minima to agree, so one globally
  *    common shingle cannot form a corpus-wide bucket the way the old
  *    1-band min-shingle key did), true Jaccard on the candidates;
  *  - minhash-LSH: 32-hash signature, 8 bands x 4 rows, bucket join —
  *    pair probability ~ 1-(1-j^4)^8, the classic banding curve;
  *  - simhash: 64-bit per-doc signature, hamming-comparable;
  *  - embedding: exact cosine within (label, hyperplane-bucket) blocks
  *    unioned over 3 LSH tables — bucket count 2^planes is the knob
  *    that grows with data, so block size (and pair work) stays bounded.
  *
  * Every signature here is md5-derived and therefore fully oracled:
  * the ngram-jaccard band lanes and (since r13) the 32 minhash
  * signature lanes are md5-seeded universal hashes, and (since r14)
  * simhash votes on the md5 digest bits themselves — DuckDB reproduces
  * the exact candidate sets and signatures across the whole family.
  */
object Dedup {

  // ------------------------------------------- banded candidate generation
  /** 4 bands × 2 lanes. A pair collides in band k iff BOTH lane minima
    * agree; lane i's per-shingle hash derives from the shingle's md5 as
    * h1 + i·h2 over the digest's two 60-bit halves (Kirsch–Mitzenmacher
    * double hashing — one md5 per shingle TOTAL, not one per lane), so
    * per-band collision probability is J² and overall candidate
    * probability 1-(1-J²)⁴ — ≈0.9987 at J=0.9, ≈1 at J=1 (identical
    * sets agree on every lane min by construction). The r6 generator was
    * the 1-band special case (bucket = global min shingle hash): every
    * document whose minimum happened to be one globally common trigram
    * landed in ONE bucket, and within-bucket pair work is O(b²) — AQE
    * skew-join splits partitions but cannot reduce the pair count. Two
    * lanes make a corpus-wide bucket require a corpus-wide TWO-lane
    * agreement, which only near-identical sets produce (DedupSpec plants
    * one globally shared trigram across 8k docs and pins the candidate
    * count). The halves are exactly what DuckDB parses from hex chars
    * 1-15 / 17-31 of the same md5, so every lane is oracle-reproducible
    * (ExpressionsSpec pins kernel ≡ declarative hex parse). */
  private[operators] val NgramBands = 4
  private[operators] val NgramLanes = 2

  /** Partners per member per bucket/block/table: the per-bucket pair
    * expansion bound shared by the embedding blocker (r10) and the
    * banded Jaccard candidates (r12). A degenerately self-similar
    * bucket of size b emits ≤ b·PairCap pairs instead of b²/2, and the
    * id-ordered partner chains (rank rn ↔ rn+1 always pairs) keep every
    * within-bucket clique CONNECTED, so the connected components a
    * downstream dedup extracts are unchanged. Interpolated into the
    * mirrors (shared-constant rule). Declared here, ABOVE every val
    * mirror that interpolates it (object-init order — a forward
    * reference interpolates 0 silently). */
  private[graft] val PairCap = 8

  /** The 8 lane minima in one compiled kernel pass. */
  private def laneMins(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.ShingleMd5Lanes(
      GraftColumnBridge.expression(text), 3, NgramBands, NgramLanes))
  }

  /** Band-k lane-l minimum as the equivalent DuckDB expression over a
    * column `sh` of md5-hex lists — multipliers read from the SAME
    * laneConsts stream as the kernel so the two engines cannot drift;
    * the 128-bit products run in HUGEINT, exactly the kernel's
    * Mersenne-folded mulmod. */
  private def laneMinSql(k: Int, l: Int): String =
    laneMinSqlAt(k * NgramLanes + l, NgramBands * NgramLanes)

  /** Lane i of a `total`-lane universal-hash family over the md5 list
    * `sh` — shared by the banded ngram keys (8 lanes) and the 32-lane
    * MinHash signature; both read the SAME laneConsts stream as the
    * kernels, so the engines cannot drift. */
  private def laneMinSqlAt(i: Int, total: Int): String = {
    val cs = graft.expressions.TextHashes.laneConsts(2 * total)
    val (a, b) = (cs(2 * i), cs(2 * i + 1))
    s"""list_min(list_transform(sh, x ->
       |        (CAST($a AS HUGEINT) * CAST(concat('0x', substr(x, 1, 15)) AS BIGINT)
       |         + CAST($b AS HUGEINT) * CAST(concat('0x', substr(x, 17, 15)) AS BIGINT))
       |        % ${graft.expressions.TextHashes.LaneP}))""".stripMargin
  }

  private def bandedCteSql: String = bandedCteSqlFrom("s")

  /** `src` = the shingle-set CTE the banded keys read (parameterized so
    * the prefixed ngramDupsCtes fragment can feed its own ngd_s). */
  private def bandedCteSqlFrom(src: String): String =
    (0 until NgramBands).map { k =>
      s"SELECT doc_id, $k AS band, ${laneMinSql(k, 0)} AS b0, ${laneMinSql(k, 1)} AS b1 FROM $src"
    }.mkString("\n      |  UNION ALL ")

  /** Exact shingle Jaccard of two TEXT columns via the native kernel —
    * evaluated once per CANDIDATE pair, so no corpus-wide shingle-set
    * materialization exists anywhere in the pipeline (the r6 shape
    * built an md5 array ~6× the text for every doc and shuffled it). */
  private def shingleJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.ShingleJaccard(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), 3))
  }

  /** Narrow banded keys (doc_id, band, b0, b1), staged ONCE behind a
    * stage barrier with a repartition inside it (minhashLshFrom's
    * pattern: the subtree ends in a shuffle, so the barrier materializes
    * it and both self-join sides read the same shuffle files instead of
    * re-running the shingle kernel per side). The empty-lanes filter and
    * the 4-row band explode sit ABOVE the barrier, where they read the
    * materialized 8-long array (ANSI-safe: indexing only after the
    * size-8 filter). 4 rows × 3 scalars per doc — tiny next to the text
    * the kernel consumes. */
  private def bandedKeys(docs: DataFrame): DataFrame =
    org.apache.spark.sql.GraftColumnBridge.stageBarrier(
        docs.select(col("doc_id"), laneMins(col("text")).as("lm"))
          .repartition(col("doc_id")))
      .filter(size(col("lm")) === NgramBands * NgramLanes)
      .select(col("doc_id"), explode(array((0 until NgramBands).map { k =>
        struct(lit(k).as("band"),
          col("lm")(k * NgramLanes).as("b0"),
          col("lm")(k * NgramLanes + 1).as("b1"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.b0"), col("bb.b1"))

  // ----------------------------------------------------------- dedup_exact
  /** Exact dedup: group by normalized-text md5, keep the minimum doc_id.
    * Scale: one hash-keyed shuffle carrying (hash, id) pairs only. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("fp"))

  val dedupExactSql: String =
    """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |       min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin

  // -------------------------------------------------- dedup_ngram_jaccard
  /** N-gram Jaccard near-dup: banded-MinHash candidate pairs (see
    * bandedKeys — 4 bands × 2 independent md5-derived lanes, skew-proof
    * where the r6 1-band min-shingle key was O(b²) on a hot bucket),
    * true Jaccard on the distinct shingle sets decides.
    *
    * Scale/shape (r7): shingle sets are NEVER materialized corpus-wide
    * — the r6 shape built an md5 array ~6× the text for every doc and
    * pushed it through the min-bucket self-join exchange, re-encoding
    * the corpus as hash arrays in transit. Now the candidate self-join
    * exchange carries (doc_id, band, b0, b1) scalars from one
    * ShingleMd5Lanes kernel pass, and the exact-Jaccard verify joins
    * the O(near-dups) candidate list back to the documents' TEXT (AQE
    * broadcasts the tiny pair list, so text stays in its scan stage)
    * where the ShingleJaccard kernel shingles just the two candidate
    * texts per pair. DedupSpec pins the hot-bucket bound. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardFrom(Tables.documents(spark, dir))

  /** The banded-candidate exact-Jaccard pipeline over any (doc_id, text)
    * frame (spec entry point — DedupSpec drives the hot-bucket and
    * short-doc cases through it). */
  def ngramJaccardFrom(docs: DataFrame): DataFrame = {
    val keyed = bandedKeys(docs)
    val pairs = keyed.as("x").join(keyed.as("y"),
        col("x.band") === col("y.band") && col("x.b0") === col("y.b0") &&
          col("x.b1") === col("y.b1") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val t = docs.select(col("doc_id"), col("text"))
    pairs
      .join(t.select(col("doc_id").as("id_a"), col("text").as("ta")), Seq("id_a"))
      .join(t.select(col("doc_id").as("id_b"), col("text").as("tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        shingleJaccard(col("ta"), col("tb")).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The whole banded-candidate ngram-dup pipeline as an oracle CTE
    * chain ending in `ngram_dups(doc_id)` — every document that appears
    * as the LARGER id of a ≥0.9-Jaccard candidate pair. Shared with
    * corpus_curate's oracle (TrainPrep) so the two queries' SQL can
    * never disagree about the candidate generator again: the r7 sf0.1
    * gate caught corpus_curate still carrying the r6 1-band min-shingle
    * CTE while the Spark side had moved to banded candidates — 4 true
    * near-dups found only by the banded side. */
  // ------------------------------------------------- dedup_containment
  /** Asymmetric containment near-dup: find documents whose distinct
    * word-3-shingle set is ≥80% CONTAINED in another document's —
    * the quote/excerpt/boilerplate-wrapper case Jaccard misses (a short
    * doc fully inside a long one has low Jaccard but containment 1.0).
    *
    * Candidates come from a bottom-shingle INVERTED probe, not the
    * banded Jaccard generator (symmetric MinHash bands lose recall
    * exactly on the asymmetric pairs this operator exists for): if
    * sh(a) ⊆ sh(b), then EVERY one of a's smallest shingle hashes is
    * one of b's shingles — so probing each doc's bottom-4 hashes
    * against an inverted index of every doc's distinct shingles, and
    * requiring ≥ min(2, |sh(a)|) hits (see containmentFrom's r14
    * note), finds every FULL containment by construction (spec-pinned)
    * and a ≥0.8-contained doc with probability ≈ 0.97. Exact md5-set
    * intersections on the staged hash arrays then score each
    * candidate; containment = n_shared/na is one exact integer
    * division, bit-identical in the oracle.
    *
    * Scale: the probe side is FOUR scalars per doc; the posting side
    * explodes distinct shingles pre-pruned by a broadcast bloom of the
    * probe keys — linear in corpus tokens at worst, a few % of them
    * after the prune, shuffling only (hash, id) scalar pairs; candidate
    * work equals the ≥2-shared-probe hit count, never all pairs; texts
    * are fetched only for candidates. */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame =
    containmentFrom(Tables.documents(spark, dir))

  /** Core over any (doc_id, text) frame — spec entry point. The
    * distinct-shingle-hash arrays are staged ONCE (barrier with a
    * repartition inside — one md5 kernel pass; the r7 first cut ran the
    * kernel for the probe AND posting sides and then re-derived both
    * raw shingle sets per candidate from text, 3 full md5 sweeps =
    * 5.1 s at sf0.1, the registry's slowest query).
    *
    * r8 upgrades, both class-level:
    *  - EXACT-DUP PRE-COLLAPSE: docs with an identical shingle array
    *    form one class (key = md5 of the concatenated array — one
    *    scalar through the shuffle, never the array); probing, the
    *    inverted index, and the md5-set intersections all run on class
    *    REPRESENTATIVES, so a c-copy byte-identical cluster costs ONE
    *    probe and ONE score instead of c² (the r7 Scaladoc's warned
    *    worst case). The pair-list output re-expands classes at the
    *    end — output-size cost is inherent to the pair contract
    *    (dedup_embedding's argument; `dedup_clusters` is the scale
    *    path for cluster-shaped output).
    *  - BOTTOM-4 PROBE, ≥2 SHARED (r14): each class probes its FOUR
    *    smallest distinct shingle hashes, and a candidate pair must
    *    share at least min(2, |sh(a)|) of them. The r13 1-of-3 rule
    *    admitted every class that shared ONE probe hash — and globally
    *    common shingles whose hash happens to be small are the bottom
    *    probe of thousands of classes at once, so candidates grew to
    *    ~29× docs (1.44M pairs at 50k docs) and the exact-scoring
    *    joins shipped class arrays per pair: the actual owner of the
    *    sf100 spill blow-up (the posting explode the bloom filter
    *    prunes was the lesser term). Requiring a SECOND independent
    *    probe hit is the same AND-rule that fixed the r6 hot-bucket
    *    banding in ngramJaccard: measured at the same 50k-doc corpus,
    *    candidates drop 1.44M → ~16k. Recall: full containments are
    *    still found BY CONSTRUCTION (every probe lies in the superset;
    *    classes with ≤4 shingles probe all of them, and ≥0.8 of ≤4
    *    rounds up to all-contained), a doc with ≤2 non-shared shingles
    *    still deterministically lands ≥2 of its bottom-4 in the shared
    *    region (pigeonhole — the DedupSpec partial-doc pin), and a
    *    general ≥0.8-contained doc hits ≥2 of 4 with
    *    1 - 0.2⁴ - 4·0.8·0.2³ ≈ 0.97. Probe cost: 4 scalars per
    *    class. */
  def containmentFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    // 60-bit LONG md5 prefixes (r13): the staged hash arrays are the
    // frame's transport cost — fixed 8 B/element (vs 32-char strings),
    // set-equivalent, and the posting/class shuffles here are the
    // heaviest in the family (the sf100 single-box probe ENOSPC'd on
    // string-array spills); the mirror parses the same digest prefix.
    val sh = GraftColumnBridge.stageBarrier(
      docs.select(col("doc_id"),
          array_distinct(Text.shingleHashes60(col("text"), 3)).as("shl"))
        .filter(size(col("shl")) > 0)
        .repartition(col("doc_id")))
    // identical-shingle-SET classes (arrays sorted once per doc, so two
    // docs with the same set in different first-occurrence order merge —
    // their containment relations are set-determined anyway), staged
    // like sh so the five consumers (probe, post, sa, sb, within)
    // re-read ONE set of class-shuffle files instead of re-running the
    // grouping. The shuffle key is (xxhash64(array), size) — two cheap
    // scalars, never a concatenated-hash string; it never reaches
    // output, so the oracle may group by the sorted list itself (same
    // partition of docs; a 64+size-bit collision merging two classes is
    // ~2⁻⁷⁸ per pair). The stored class array is SORTED — the probe
    // slice reads it directly and the scorer's merge kernel requires it.
    import org.apache.spark.sql.GraftColumnBridge.{column => kcol, expression => kexp}
    import graft.expressions.SortedLongIntersectCount
    val cls = GraftColumnBridge.stageBarrier(
      sh.select(col("doc_id"), array_sort(col("shl")).as("ssh"))
        .groupBy(xxhash64(col("ssh"), lit(42)).as("ck"), size(col("ssh")).as("csz"))
        .agg(min(col("doc_id")).as("rep"),
          collect_list(col("doc_id")).as("members"),
          first(col("ssh")).as("ssh")))
    val probe = cls.select(col("rep").as("id_a"),
      least(lit(2), col("csz")).as("need"),
      explode(slice(col("ssh"), 1, 4)).as("m"))
    // r14: BLOOM-PRUNE THE POSTING EXPLODE. The posting side used to
    // push every distinct shingle of every class through the candidate
    // exchange — linear, but ~3-4× the corpus as shuffle scratch (part
    // of the sf100 single-box ENOSPC, BASELINE r13). Only postings
    // whose hash equals SOME class's bottom-4 probe hash can ever
    // join, so a bloom filter of the probe keys (≤4/class; a few % of
    // distinct shingles) drops the rest BEFORE the exchange. Spark's
    // own InjectRuntimeFilter can't reach a Generate-born key, so the
    // filter is built manually (one treeAggregate over the probe side)
    // and broadcast; fpp 1% only adds spurious join INPUT — the
    // equi-join + hit-count keep the result exact.
    val nCls = cls.count()
    val bloom = probe.stat.bloomFilter("m", math.max(64L, 4L * nCls), 0.01)
    val bloomBc = docs.sparkSession.sparkContext.broadcast(bloom)
    val post = cls.select(col("rep").as("id_b"), explode(col("ssh")).as("m"))
      .filter(kcol(graft.expressions.BroadcastBloomMightContain(bloomBc, kexp(col("m")))))
    // hit-counted candidates (probes and postings are both distinct per
    // class, so count(*) per pair = #shared probe hashes); the partial
    // aggregate collapses the hit rows map-side before the exchange
    val cands = probe.join(post, Seq("m"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("hits"), max(col("need")).as("need"))
      .filter(col("hits") >= col("need"))
      .select(col("id_a"), col("id_b"))
    // exact set intersection by linear merge over the sorted class
    // arrays (SortedLongIntersectCount since the r13 60-bit long
    // transport) — array_intersect's per-row hash structure was
    // ~70 µs/candidate, the dominant cost of the r8 first cut;
    // set-equal to the oracle's list_intersect
    val scored = cands
      .join(cls.select(col("rep").as("id_a"), col("ssh").as("sa"),
        col("members").as("ma")), Seq("id_a"))
      .join(cls.select(col("rep").as("id_b"), col("ssh").as("sb"),
        col("members").as("mb")), Seq("id_b"))
      .select(col("ma"), col("mb"),
        kcol(SortedLongIntersectCount(kexp(col("sa")), kexp(col("sb")))).as("n_shared"),
        size(col("sa")).as("n_contained"))
      .withColumn("containment",
        col("n_shared").cast("double") / col("n_contained"))
      .filter(col("containment") >= 0.8)
    // cross-class expansion: every member pair inherits the class score
    val crossPairs = scored
      .select(explode(col("ma")).as("contained_id"), col("mb"),
        col("n_shared"), col("n_contained"), col("containment"))
      .select(col("contained_id"), explode(col("mb")).as("container_id"),
        col("n_shared"), col("n_contained"), col("containment"))
    // within-class pairs: identical sets, containment exactly 1.0
    val within = cls.filter(size(col("members")) >= 2)
      .select(col("members"), col("csz").as("n"))
      .select(explode(col("members")).as("contained_id"), col("members"), col("n"))
      .select(col("contained_id"), explode(col("members")).as("container_id"), col("n"))
      .filter(col("contained_id") =!= col("container_id"))
      .select(col("contained_id"), col("container_id"),
        col("n").as("n_shared"), col("n").as("n_contained"),
        lit(1.0).as("containment"))
    // stage the tiny pair output behind its own shuffle before the
    // global sort: orderBy's range-sampling job otherwise re-evaluates
    // the whole candidate+intersect lineage a second time (the scoring
    // joins broadcast under AQE, so no shuffle boundary shields them)
    GraftColumnBridge.stageBarrier(
        crossPairs.unionByName(within).repartition(col("contained_id")))
      .orderBy(col("contained_id"), col("container_id"))
  }

  val dedupContainmentSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(
      |           [words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
      |            for i in range(0, len(words)-2)], x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT))) AS sh
      |  FROM w WHERE len(words) >= 3),
      |cls AS (SELECT list_sort(sh) AS ssh, min(doc_id) AS rep, list(doc_id) AS members
      |        FROM s GROUP BY list_sort(sh)),
      |probe AS (SELECT rep AS id_a, least(2, len(ssh)) AS need, unnest(ssh[1:4]) AS m FROM cls),
      |post AS (SELECT rep AS id_b, unnest(ssh) AS m FROM cls),
      |cand AS (
      |  SELECT p.id_a, q.id_b FROM probe p JOIN post q ON p.m = q.m
      |  WHERE p.id_a <> q.id_b
      |  GROUP BY p.id_a, q.id_b
      |  HAVING count(*) >= max(p.need)),
      |sc AS (
      |  SELECT c.id_a, c.id_b, sa.members AS ma, sb.members AS mb,
      |         len(list_intersect(sa.ssh, sb.ssh)) AS n_shared,
      |         len(sa.ssh) AS n_contained
      |  FROM cand c JOIN cls sa ON c.id_a = sa.rep JOIN cls sb ON c.id_b = sb.rep
      |  WHERE CAST(len(list_intersect(sa.ssh, sb.ssh)) AS DOUBLE) / len(sa.ssh) >= 0.8),
      |cross_pairs AS (
      |  SELECT ta.a AS contained_id, tb.b AS container_id, n_shared, n_contained,
      |         CAST(n_shared AS DOUBLE) / n_contained AS containment
      |  FROM sc, unnest(ma) AS ta(a), unnest(mb) AS tb(b)),
      |within AS (
      |  SELECT ta.a AS contained_id, tb.b AS container_id,
      |         len(ssh) AS n_shared, len(ssh) AS n_contained,
      |         CAST(1.0 AS DOUBLE) AS containment
      |  FROM cls, unnest(members) AS ta(a), unnest(members) AS tb(b)
      |  WHERE ta.a <> tb.b)
      |SELECT * FROM cross_pairs
      |UNION ALL SELECT * FROM within
      |ORDER BY contained_id, container_id""".stripMargin

  // `ngd_w`, not `w`: this fragment lands at the TOP level of composed
  // oracles (corpus_pipeline_funnel) that also embed subqueries with
  // their own `WITH w` — legal shadowing inlined, but a duplicate-alias
  // binder error once SparkEntry materializes CTEs, so the shared
  // fragment takes the prefixed name (the pq_/pr_ hygiene rule).
  val ngramDupsCtes: String =
    s"""ngd_w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |ngd_s AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(
      |           [words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
      |            for i in range(0, len(words)-2)], x -> md5(x))) AS sh
      |  FROM ngd_w WHERE len(words) >= 3),
      |ngd_b AS (
      |  ${bandedCteSqlFrom("ngd_s")}),
      |ngd_p AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |  FROM ngd_b x JOIN ngd_b y
      |    ON x.band = y.band AND x.b0 = y.b0 AND x.b1 = y.b1 AND x.doc_id < y.doc_id),
      |ngram_dups AS (
      |  SELECT DISTINCT id_b AS doc_id
      |  FROM ngd_p JOIN ngd_s a ON ngd_p.id_a = a.doc_id JOIN ngd_s c ON ngd_p.id_b = c.doc_id
      |  WHERE len(list_intersect(a.sh, c.sh))
      |          / (len(a.sh) + len(c.sh) - len(list_intersect(a.sh, c.sh))) >= 0.9)""".stripMargin

  val dedupNgramJaccardSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(
      |           [words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
      |            for i in range(0, len(words)-2)], x -> md5(x))) AS sh
      |  FROM w WHERE len(words) >= 3),
      |b AS (
      |  $bandedCteSql),
      |p AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |  FROM b x JOIN b y
      |    ON x.band = y.band AND x.b0 = y.b0 AND x.b1 = y.b1 AND x.doc_id < y.doc_id)
      |SELECT id_a, id_b,
      |       len(list_intersect(a.sh, c.sh))
      |         / (len(a.sh) + len(c.sh) - len(list_intersect(a.sh, c.sh))) AS jaccard
      |FROM p JOIN s a ON p.id_a = a.doc_id JOIN s c ON p.id_b = c.doc_id
      |ORDER BY id_a, id_b""".stripMargin

  // ----------------------------------------------------------- dedup_band_eval
  /** The LSH BANDING-CURVE eval — ann_recall_report's twin for the
    * dedup family: before trusting a banding parameterization, publish
    * (a) how much candidate RECALL fewer bands would lose at each true
    * Jaccard level, and (b) how accurate the lane-minima MinHash
    * ESTIMATE of Jaccard is. Over every 4-band candidate pair, bucketed
    * by exact shingle Jaccard (decile, top bucket = [0.9, 1.0]):
    * recall_1band / recall_2band = the fraction of the bucket a 1- or
    * 2-band scheme would still have found (pair collides in band 0 /
    * bands 0-1 — the bands are i.i.d. by construction, so prefix-band
    * recall IS b-band recall, no reordering bias), and mean_est_err =
    * mean |agree/8 − J| of the 8-lane signature-agreement estimator.
    * The expected banding curve (1−(1−J²)^b) should bound recall_1band
    * ≈ J² from below per bucket; DedupSpec pins monotonicity and that
    * the top bucket's 1-band recall ≥ its curve value.
    *
    * Everything cross-engine-exact: membership in a band is integer
    * lane-minima equality; first_band is an integer min; the Jaccard
    * bucket is the cross-multiplied integer test (10·c) DIV u (never a
    * float threshold); the estimator error |8c − agree·u|/(8u) is one
    * division of exact integers, accumulated in rounded micro-units
    * (the embed_cluster_stats discipline).
    *
    * Scale: the staged (lm, ssh) frame is ONE kernel pass over the
    * corpus (the dedup_containment staging lesson); the pair space is
    * the registered 4-band candidate set — identical to what
    * dedup_ngram_jaccard already scores — with ALL per-pair arithmetic
    * (merge-intersect + 8 integer compares) on the staged arrays. */
  def dedupBandEval(spark: SparkSession, dir: String): DataFrame =
    bandEvalFrom(Tables.documents(spark, dir))

  private[graft] def bandEvalFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.GraftColumnBridge.{column => kcol, expression => kexp}
    import graft.expressions.SortedLongIntersectCount
    val nl = NgramBands * NgramLanes
    val base = GraftColumnBridge.stageBarrier(
      docs.select(col("doc_id"), laneMins(col("text")).as("lm"),
          array_sort(array_distinct(Text.shingleHashes60(col("text"), 3))).as("ssh"))
        .filter(size(col("lm")) === nl)
        .repartition(col("doc_id")))
    val keyed = base.select(col("doc_id"), explode(array((0 until NgramBands).map { k =>
        struct(lit(k).as("band"),
          col("lm")(k * NgramLanes).as("b0"),
          col("lm")(k * NgramLanes + 1).as("b1"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.b0"), col("bb.b1"))
    val pairs = keyed.as("x").join(keyed.as("y"),
        col("x.band") === col("y.band") && col("x.b0") === col("y.b0") &&
          col("x.b1") === col("y.b1") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(min(col("x.band")).as("first_band"))
    val sc = pairs
      .join(base.select(col("doc_id").as("id_a"), col("lm").as("la"),
        col("ssh").as("sa")), Seq("id_a"))
      .join(base.select(col("doc_id").as("id_b"), col("lm").as("lb"),
        col("ssh").as("sb")), Seq("id_b"))
      .select(col("first_band"),
        kcol(SortedLongIntersectCount(kexp(col("sa")), kexp(col("sb")))).as("c"),
        size(col("sa")).as("na"), size(col("sb")).as("nb"),
        expr("aggregate(zip_with(la, lb, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END)," +
          " 0, (acc, v) -> acc + v)").as("agree"))
    val ers = sc.select(
      expr("least(9, (10 * c) DIV (na + nb - c))").as("j_bucket"), col("first_band"),
      expr("CAST(round((1000000.0 * abs(8 * c - agree * (na + nb - c)))" +
        " / (8.0 * (na + nb - c))) AS BIGINT)").as("err_micro"))
    ers.groupBy(col("j_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("first_band") === 0, 1L).otherwise(0L)).as("h1"),
        sum(when(col("first_band") <= 1, 1L).otherwise(0L)).as("h2"),
        sum(col("err_micro")).as("se"))
      .select(col("j_bucket"), col("n_pairs"),
        (round(col("h1").cast("double") / col("n_pairs"), 4) + 0.0).as("recall_1band"),
        (round(col("h2").cast("double") / col("n_pairs"), 4) + 0.0).as("recall_2band"),
        (round(col("se").cast("double") / (col("n_pairs") * lit(1000000.0)), 6) + 0.0)
          .as("mean_est_err"))
      .orderBy(col("j_bucket"))
  }

  val dedupBandEvalSql: String = {
    val lanesList = (for (k <- 0 until NgramBands; l <- 0 until NgramLanes)
      yield laneMinSql(k, l)).mkString("[", ",\n      |        ", "]")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(
      |           [words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
      |            for i in range(0, len(words)-2)], x -> md5(x))) AS sh
      |  FROM w WHERE len(words) >= 3),
      |lanes AS (
      |  SELECT doc_id, $lanesList AS lm,
      |         list_sort(list_distinct(list_transform(sh, x -> CAST(concat('0x', substr(x, 1, 15)) AS BIGINT)))) AS ssh
      |  FROM s),
      |b AS (
      |  $bandedCteSql),
      |pb AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, min(x.band) AS first_band
      |  FROM b x JOIN b y
      |    ON x.band = y.band AND x.b0 = y.b0 AND x.b1 = y.b1 AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2),
      |sc AS (
      |  SELECT p.first_band,
      |         len(list_intersect(a.ssh, c.ssh)) AS c,
      |         len(a.ssh) AS na, len(c.ssh) AS nb,
      |         list_reduce([CASE WHEN a.lm[i] = c.lm[i] THEN 1 ELSE 0 END
      |                      for i in range(1, 9)], (x, y) -> x + y) AS agree
      |  FROM pb p JOIN lanes a ON p.id_a = a.doc_id JOIN lanes c ON p.id_b = c.doc_id),
      |ers AS (
      |  SELECT least(9, (10 * c) // (na + nb - c)) AS j_bucket, first_band,
      |         CAST(round((1000000.0 * abs(8 * c - agree * (na + nb - c)))
      |                    / (8.0 * (na + nb - c))) AS BIGINT) AS err_micro
      |  FROM sc)
      |SELECT j_bucket, count(*) AS n_pairs,
      |       round(CAST(count(CASE WHEN first_band = 0 THEN 1 END) AS DOUBLE)
      |             / count(*), 4) + 0.0 AS recall_1band,
      |       round(CAST(count(CASE WHEN first_band <= 1 THEN 1 END) AS DOUBLE)
      |             / count(*), 4) + 0.0 AS recall_2band,
      |       round(CAST(sum(err_micro) AS DOUBLE) / (count(*) * 1000000.0), 6) + 0.0
      |         AS mean_est_err
      |FROM ers GROUP BY j_bucket ORDER BY j_bucket""".stripMargin
  }

  // ---------------------------------------------------- dedup_threshold_eval
  /** The dedup-AGGRESSIVENESS decision report (the layout_skip_eval /
    * stream_watermark_eval pattern applied to the Jaccard cutoff):
    * before committing a near-dup threshold, price each candidate τ
    * (0.700/0.800/0.900/0.950) by what it removes — documents deduped
    * (distinct larger-id members of a ≥τ candidate pair, the keep-min
    * convention every dedup_* op uses) and the whitespace tokens those
    * documents carry — and what fraction of the corpus survives.
    * "0.95 keeps 99% of tokens, 0.70 costs 8%" is the number that
    * picks the knob.
    *
    * Exactness: the τ test is the cross-multiplied integer comparison
    * 1000·c ≥ τ‰·(na+nb−c) — no float Jaccard ever forms — on the
    * same exact intersect counts dedup_band_eval scores; retained
    * fractions are single divisions of exact integer sums.
    *
    * Scale: the staged (lm, ssh) frame is ONE kernel pass (the
    * band_eval staging); the pair space is the 4-band candidate set
    * BOUNDED to PairCap partners per member per bucket in doc_id order
    * (see the chain comment below — clone-family removals exact, total
    * pair work ≤ 4·PairCap·n); the 4-way τ explode carries scalars
    * only, and the distinct-(τ, doc) dedup bounds the join at 4× the
    * dup-doc count. The τ spine comes from the 1-row totals frame, so
    * a τ that removes nothing still reports (LEFT join, coalesce 0).
    * Token counts are NON-EMPTY whitespace tokens (the text_bpe_encode
    * convention). */
  def dedupThresholdEval(spark: SparkSession, dir: String): DataFrame =
    thresholdEvalFrom(Tables.documents(spark, dir))

  private[graft] val ThresholdsPerMille = Seq(700, 800, 900, 950)

  /** Non-empty whitespace tokens (the text_bpe_encode convention) —
    * shared by the threshold eval and apply faces. */
  private[graft] val nwTokens: Column =
    size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long")

  /** The (τ, removed doc) frame both threshold faces consume: distinct
    * larger-id members of a ≥τ bounded banded candidate pair, per
    * candidate τ — factored so the eval and the apply CANNOT diverge
    * on the pair space or the τ test (the ngramDupsCtes drift rule). */
  private[graft] def removedByTauFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.GraftColumnBridge.{column => kcol, expression => kexp}
    import graft.expressions.SortedLongIntersectCount
    val nl = NgramBands * NgramLanes
    // 60-bit LONG prefix transport (r13): this staged frame's ssh arrays
    // are what the banded candidate join ships per pair — the ONE
    // measured per-row inflation at sf100 (13.6 -> 34.6 µs/doc;
    // partition count already ruled out). Fixed 8 B longs are
    // intersect-exact at a quarter of the 32-char digest's bytes.
    val base = GraftColumnBridge.stageBarrier(
      docs.select(col("doc_id"), laneMins(col("text")).as("lm"),
          array_sort(array_distinct(Text.shingleHashes60(col("text"), 3))).as("ssh"))
        .filter(size(col("lm")) === nl)
        .repartition(col("doc_id")))
    val keyed = base.select(col("doc_id"), explode(array((0 until NgramBands).map { k =>
        struct(lit(k).as("band"),
          col("lm")(k * NgramLanes).as("b0"),
          col("lm")(k * NgramLanes + 1).as("b1"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.b0"), col("bb.b1"))
    // Bounded bucket fan-out (r12, the dedup_embedding PairCap chain):
    // a replicated corpus puts every clone family in ONE (band,b0,b1)
    // bucket, so the full bucket self-join is output-quadratic exactly
    // where dedup matters most (the r11 sf10 sweep: 1.75 → 14.4 s on
    // 100× data). Each member pairs with its next-PairCap bucket-mates
    // in doc_id order — a clone family of k stays chain-connected and
    // every non-minimal clone keeps a J=1 lower partner, so removal
    // counts for exact clones are unchanged; a ≥τ near-dup pair can
    // escape only when > PairCap bucket-mates separate it in doc_id
    // order (the documented bounded-candidate scoping).
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("b0"), col("b1"))
    val rankedK = keyed
      .withColumn("rn", row_number().over(wk.orderBy(col("doc_id"))))
      .withColumn("bs", count(lit(1)).over(wk))
    val probes = rankedK.filter(col("rn") < col("bs"))
      .select(col("band"), col("b0"), col("b1"), col("doc_id").as("id_a"),
        explode(sequence(col("rn") + 1,
          least(col("rn") + PairCap, col("bs")))).as("prn"))
    val partners = rankedK.select(col("band"), col("b0"), col("b1"),
      col("rn").as("prn"), col("doc_id").as("id_b"))
    val pairs = probes.join(partners, Seq("band", "b0", "b1", "prn"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val sc = pairs
      .join(base.select(col("doc_id").as("id_a"), col("ssh").as("sa")), Seq("id_a"))
      .join(base.select(col("doc_id").as("id_b"), col("ssh").as("sb")), Seq("id_b"))
      .select(col("id_b"),
        kcol(SortedLongIntersectCount(kexp(col("sa")), kexp(col("sb")))).as("c"),
        size(col("sa")).as("na"), size(col("sb")).as("nb"))
    sc.select(col("id_b"), col("c"), (col("na") + col("nb") - col("c")).as("u"),
        explode(array(ThresholdsPerMille.map(lit(_)): _*)).as("tau"))
      .filter(lit(1000) * col("c") >= col("tau") * col("u"))
      .select(col("tau"), col("id_b")).distinct()
  }

  private[graft] def thresholdEvalFrom(docs: DataFrame): DataFrame = {
    val removed = removedByTauFrom(docs)
    // non-empty whitespace tokens (r12 advisory: raw space-splits count
    // empty strings from consecutive spaces — this now matches the
    // length(word)>0 convention of text_bpe_encode and the shingle staging)
    val nwCol = nwTokens
    val toks = docs.select(col("doc_id").as("id_b"), nwCol.as("nw"))
    val rem = removed.join(toks, Seq("id_b"))
      .groupBy(col("tau"))
      .agg(count(lit(1)).as("nd"), sum(col("nw")).as("tr"))
    val spine = docs
      .agg(count(lit(1)).as("td"), sum(nwCol).as("tt"))
      .select(explode(array(ThresholdsPerMille.map(lit(_)): _*)).as("tau"),
        col("td"), col("tt"))
    spine.join(rem, Seq("tau"), "left")
      .select(col("tau"),
        coalesce(col("nd"), lit(0L)).as("n_docs_removed"),
        coalesce(col("tr"), lit(0L)).as("tokens_removed"),
        (round((col("td") - coalesce(col("nd"), lit(0L))).cast("double")
          / col("td"), 6) + 0.0).as("frac_docs_retained"),
        (round((col("tt") - coalesce(col("tr"), lit(0L))).cast("double")
          / col("tt"), 6) + 0.0).as("frac_tokens_retained"))
      .orderBy(col("tau"))
  }

  /** The shared mirror chain words → shingles → banded bounded pairs →
    * (τ, removed doc) + per-doc token counts — both threshold faces
    * compose from this one constant (the ngramDupsCtes drift rule). */
  private val thresholdCtes: String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(
      |           [words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
      |            for i in range(0, len(words)-2)], x -> md5(x))) AS sh
      |  FROM w WHERE len(words) >= 3),
      |lanes AS (SELECT doc_id,
      |                 list_sort(list_distinct(list_transform(sh, x -> CAST(concat('0x', substr(x, 1, 15)) AS BIGINT)))) AS ssh
      |          FROM s),
      |b AS (
      |  $bandedCteSql),
      |rb AS (
      |  SELECT doc_id, band, b0, b1,
      |         row_number() OVER (PARTITION BY band, b0, b1 ORDER BY doc_id) AS rn,
      |         count(*) OVER (PARTITION BY band, b0, b1) AS bs
      |  FROM b),
      |pb AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |  FROM rb x JOIN rb y
      |    ON x.band = y.band AND x.b0 = y.b0 AND x.b1 = y.b1
      |   AND y.rn > x.rn AND y.rn <= x.rn + $PairCap),
      |sc AS (
      |  SELECT p.id_b,
      |         len(list_intersect(a.ssh, c.ssh)) AS c,
      |         len(a.ssh) AS na, len(c.ssh) AS nb
      |  FROM pb p JOIN lanes a ON p.id_a = a.doc_id JOIN lanes c ON p.id_b = c.doc_id),
      |taus AS (SELECT unnest([${ThresholdsPerMille.mkString(", ")}]) AS tau),
      |rd AS (
      |  SELECT DISTINCT tau, id_b
      |  FROM sc CROSS JOIN taus
      |  WHERE 1000 * c >= tau * (na + nb - c)),
      |dn AS (SELECT doc_id,
      |              CAST(len(list_filter(string_split(text, ' '),
      |                                   x -> len(x) > 0)) AS BIGINT) AS nw
      |       FROM documents)""".stripMargin

  val dedupThresholdEvalSql: String =
    s"""WITH $thresholdCtes,
      |rem AS (
      |  SELECT tau, CAST(count(*) AS BIGINT) AS nd, CAST(sum(nw) AS BIGINT) AS tr
      |  FROM rd JOIN dn ON rd.id_b = dn.doc_id GROUP BY tau),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS td, CAST(sum(nw) AS BIGINT) AS tt
      |        FROM dn)
      |SELECT taus.tau,
      |       coalesce(nd, 0) AS n_docs_removed,
      |       coalesce(tr, 0) AS tokens_removed,
      |       round(CAST(td - coalesce(nd, 0) AS DOUBLE) / td, 6) + 0.0
      |         AS frac_docs_retained,
      |       round(CAST(tt - coalesce(tr, 0) AS DOUBLE) / tt, 6) + 0.0
      |         AS frac_tokens_retained
      |FROM taus CROSS JOIN tot LEFT JOIN rem ON rem.tau = taus.tau
      |ORDER BY taus.tau""".stripMargin

  // --------------------------------------------------- dedup_threshold_apply
  /** Retained-token floor for the τ choice: the most aggressive τ must
    * still keep ≥98% of corpus tokens. */
  private[graft] val RetainPerMille = 980

  /** The decision→action closure for the Jaccard-dedup knob (the
    * layout_zorder_apply / skew_salted_auto / stream_watermark_apply
    * pattern — the lexical leg of the threshold trilogy gets its apply
    * face; the quality and semantic legs already act via corpus_curate
    * and dedup_semantic): choose the SMALLEST (most aggressive)
    * candidate τ whose retained token fraction stays ≥ 98% — integer
    * cross-multiplied 1000·(tt−tr) ≥ 980·tt, never a float compare —
    * falling back to the largest candidate, then actually REMOVE that
    * τ's keep-min dedup set and report the retained corpus per source
    * (docs, tokens, docs removed), the chosen τ in every row so the
    * oracle re-derives the choice and the gate checks the whole
    * eval → choose → apply composition.
    *
    * Scale: the (τ, removed doc) frame is the eval's own bounded
    * banded pair space (removedByTauFrom, staged once for the choice
    * aggregate and the drop set); the choice crosses back as a
    * broadcast 1-row frame; the removal is one doc_id anti-join; the
    * panel is a ≤|sources| map-side-combined rollup. */
  def dedupThresholdApply(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val docs = Tables.documents(spark, dir)
    val removed = stageBarrier(removedByTauFrom(docs))
    val toks = stageBarrier(
      docs.select(col("doc_id"), col("source"), nwTokens.as("nw")))
    val rem = removed
      .join(toks.select(col("doc_id").as("id_b"), col("nw")), Seq("id_b"))
      .groupBy(col("tau")).agg(sum(col("nw")).as("tr"))
    val spine = toks.agg(sum(col("nw")).as("tt"))
      .select(explode(array(ThresholdsPerMille.map(lit(_)): _*)).as("tau"),
        col("tt"))
    val chosen = spine.join(rem, Seq("tau"), "left")
      .filter(lit(1000) * (col("tt") - coalesce(col("tr"), lit(0L)))
        >= lit(RetainPerMille) * col("tt"))
      .agg(coalesce(min(col("tau")), lit(ThresholdsPerMille.max)).as("tau"))
    val dropIds = removed.join(broadcast(chosen), Seq("tau"))
      .select(col("id_b").as("doc_id")).distinct()
    val kept = toks.join(dropIds, Seq("doc_id"), "left_anti")
    val rmSrc = toks.join(dropIds, Seq("doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs_removed"))
    val keptSrc = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_tokens"))
    // distinct-source SPINE (r12 advisory): a source whose documents are
    // ALL removed at the chosen tau must still report (n_docs 0, its
    // n_docs_removed) — driving the panel from kept docs silently
    // dropped it; both faces left-join onto the spine.
    toks.select(col("source")).distinct()
      .crossJoin(broadcast(chosen))
      .join(keptSrc, Seq("source"), "left")
      .join(rmSrc, Seq("source"), "left")
      .select(col("source"), col("tau"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_docs_removed"), lit(0L)).as("n_docs_removed"))
      .orderBy(col("source"))
  }

  val dedupThresholdApplySql: String =
    s"""WITH $thresholdCtes,
      |rem AS (
      |  SELECT tau, CAST(sum(nw) AS BIGINT) AS tr
      |  FROM rd JOIN dn ON rd.id_b = dn.doc_id GROUP BY tau),
      |tot AS (SELECT CAST(sum(nw) AS BIGINT) AS tt FROM dn),
      |ch AS (
      |  SELECT coalesce(
      |           min(CASE WHEN 1000 * (tt - coalesce(tr, 0))
      |                         >= $RetainPerMille * tt
      |                    THEN taus.tau END),
      |           ${ThresholdsPerMille.max}) AS tau
      |  FROM taus CROSS JOIN tot LEFT JOIN rem ON rem.tau = taus.tau),
      |drop_ids AS (SELECT DISTINCT id_b FROM rd JOIN ch ON rd.tau = ch.tau),
      |kept AS (
      |  SELECT d.source, dn.nw
      |  FROM documents d JOIN dn ON d.doc_id = dn.doc_id
      |  WHERE d.doc_id NOT IN (SELECT id_b FROM drop_ids)),
      |kept_src AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(nw) AS BIGINT) AS n_tokens
      |  FROM kept GROUP BY source),
      |rm_src AS (
      |  SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs_removed
      |  FROM documents d JOIN drop_ids ON d.doc_id = drop_ids.id_b
      |  GROUP BY d.source),
      |src AS (SELECT DISTINCT source FROM documents)
      |SELECT src.source, ch.tau,
      |       coalesce(k.n_docs, 0) AS n_docs,
      |       coalesce(k.n_tokens, 0) AS n_tokens,
      |       coalesce(r.n_docs_removed, 0) AS n_docs_removed
      |FROM src CROSS JOIN ch
      |LEFT JOIN kept_src k ON k.source = src.source
      |LEFT JOIN rm_src r ON r.source = src.source
      |ORDER BY src.source""".stripMargin

  // ---------------------------------------------------------- dedup_clusters
  /** Connected components over the ≥0.9-Jaccard near-dup graph — pair
    * lists aren't transitive, so a pipeline needs ONE cluster id per
    * document to keep a single representative per GROUP of near-dups
    * (A~B, B~C must collapse together even when A~C was never a
    * candidate pair). Min-label propagation to a fixpoint: every
    * iteration is one distributed join + min-aggregate (Pregel's shape —
    * the driver only counts changed labels, rows never leave the
    * cluster), converging in O(component diameter) rounds; near-dup
    * components are clique-ish, so the fixpoint lands in 1-3 rounds. At
    * 100 TB the standard refinement for DEEP components is
    * large-star/small-star (O(log n) rounds); diameter-bound propagation
    * is exact and cheaper for the shallow components dedup emits. The
    * iteration cap is a safety rail; the convergence check exits first.
    *
    * Oracle: DuckDB derives the same components with a recursive CTE
    * (min label reachable per node). */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dedupNgramJaccard(spark, dir).filter(col("jaccard") >= 0.9)
      .select(col("id_a"), col("id_b"))
    // both directions in ONE pass over the candidate join (a union of
    // two projections would run the whole jaccard join twice)
    val edges = pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst")).persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("cluster_id", col("node")).persist()
    var converged = false
    var iter = 0
    while (!converged && iter < 25) {
      val prop = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("cluster_id"))
      val next = labels.select(col("node"), col("cluster_id")).union(prop)
        .groupBy(col("node")).agg(min(col("cluster_id")).as("cluster_id"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("cluster_id", "old"), Seq("node"))
        .filter(col("cluster_id") =!= col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels.select(col("node").as("doc_id"), col("cluster_id"))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  val dedupClustersSql: String =
    s"""WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(
      |           [words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
      |            for i in range(0, len(words)-2)], x -> md5(x))) AS sh
      |  FROM w WHERE len(words) >= 3),
      |b AS (
      |  $bandedCteSql),
      |cp AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |  FROM b x JOIN b y
      |    ON x.band = y.band AND x.b0 = y.b0 AND x.b1 = y.b1 AND x.doc_id < y.doc_id),
      |p AS (
      |  SELECT id_a, id_b
      |  FROM cp JOIN s a ON cp.id_a = a.doc_id JOIN s c ON cp.id_b = c.doc_id
      |  WHERE len(list_intersect(a.sh, c.sh))
      |          / (len(a.sh) + len(c.sh) - len(list_intersect(a.sh, c.sh))) >= 0.9),
      |e AS (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |r AS (
      |  SELECT DISTINCT src AS node, src AS lab FROM e
      |  UNION
      |  SELECT e.dst, r.lab FROM r JOIN e ON e.src = r.node)
      |SELECT node AS doc_id, min(lab) AS cluster_id
      |FROM r GROUP BY node ORDER BY cluster_id, doc_id""".stripMargin

  // ------------------------------------------------- dedup_cluster_stats
  /** The dedup SAVINGS panel: per near-dup cluster SIZE, how many
    * clusters exist, how many documents they hold, and how many
    * characters keeping one representative per cluster reclaims
    * (sum of member chars minus the kept min-doc_id member's) — the
    * one-page answer to "what does near-dedup buy us" a curation run
    * publishes next to corpus_pipeline_funnel's doc counts (the funnel
    * reports survivors per stage; this reports the duplicate MASS
    * distribution — a corpus of many small clusters and one of a few
    * giant ones dedup very differently, and cluster-size skew is what
    * decides whether the pair-list or the star form is the right
    * output downstream).
    *
    * Scale: reuses dedup_clusters' converged labels (bucket-keyed
    * candidates → min-label components); the stats are two integer
    * aggregates — per-cluster then per-size — over (doc_id, cluster,
    * chars) scalars. The representative's chars are min_by/arg_min on
    * the unique doc_id (deterministic both engines). Output is
    * |distinct cluster sizes| rows. */
  def dedupClusterStats(spark: SparkSession, dir: String): DataFrame = {
    val cl = dedupClusters(spark, dir)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val per = cl.join(docs, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("sz"), sum(col("n_chars")).as("chars_tot"),
        min_by(col("n_chars"), col("doc_id")).as("rep_chars"))
    per.groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"),
        sum(col("chars_tot") - col("rep_chars")).as("chars_dropped"))
      .orderBy(col("cluster_size"))
  }

  /** Mirror embeds the dedup_clusters oracle verbatim as a subquery
    * (the ann_rrf_fusion drift-proofing) and aggregates identically. */
  lazy val dedupClusterStatsSql: String =
    s"""WITH comp AS (SELECT * FROM ($dedupClustersSql) t),
      |per AS (
      |  SELECT c.cluster_id, count(*) AS sz, sum(d.n_chars) AS chars_tot,
      |         arg_min(d.n_chars, d.doc_id) AS rep_chars
      |  FROM comp c JOIN documents d USING (doc_id)
      |  GROUP BY c.cluster_id)
      |SELECT sz AS cluster_size, count(*) AS n_clusters,
      |       CAST(sum(sz) AS BIGINT) AS n_docs,
      |       CAST(sum(chars_tot - rep_chars) AS BIGINT) AS chars_dropped
      |FROM per GROUP BY sz ORDER BY cluster_size""".stripMargin

  // ---------------------------------------------------- dedup_minhash_lsh
  private val NumHashes = 32
  private val Bands = 8
  private val Rows = NumHashes / Bands

  /** 32-lane MinHash signature straight from text — one compiled kernel
    * pass per row inside whole-stage codegen (the declarative 32x
    * transform/array_min chain evaluated interpreted and dominated the
    * query). r13: the lanes are the md5-derived universal-hash family
    * of ShingleMd5Lanes (32 bands × 1 lane — the SAME laneConsts stream
    * and Mersenne mulmod as the banded ngram keys), replacing the
    * xxhash64 mixing whose seed no DuckDB expression reproduces: every
    * lane is now `laneMinSqlAt` in SQL, so the registered query gains a
    * full hash oracle and leaves the rows-only set. Built via the
    * column bridge so it works in ANY session — the GraftExtensions SQL
    * registration is for SQL-text users. */
  def minhashSignature(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.ShingleMd5Lanes(
      GraftColumnBridge.expression(text), 3, NumHashes, 1))
  }

  /** MinHash + banded LSH: signature → 8 band buckets → bucket self-join
    * → candidate pairs with the signature-agreement Jaccard estimate.
    * Scale: the only shuffle is on the band key; pair count is
    * O(near-dup pairs x bands), deduplicated before the estimate. The
    * band key is the 4 raw row minima (r13 — joining on the values
    * keeps the bucket oracle-reproducible; the old xxhash64 fold of the
    * rows saved 24 bytes/row of exchange at the price of any oracle). */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLshFrom(Tables.documents(spark, dir))

  /** LSH over any (doc_id, text) frame. Documents under k words produce
    * an EMPTY signature (ShingleMd5Lanes) and are non-candidates by
    * definition — they are filtered before banding, because indexing
    * sig[i] on an empty array would throw under ANSI mode.
    *
    * The signature projection is staged behind a stage barrier with a
    * doc_id repartition INSIDE it: the subtree then ends in a shuffle,
    * which the barrier materializes once — both self-join sides read
    * the same shuffle files (the aliased sides never hit ReuseExchange,
    * and a shuffle-free barrier would still re-run the lineage per
    * side). The shuffled rows are (doc_id, 32-int sig) — tiny next to
    * the text the kernel consumes. The length filter sits ABOVE the
    * barrier, where it reads the materialized sig instead of forcing a
    * second kernel evaluation in a Filter node; net: the signature kernel
    * runs ONCE per corpus where the unstaged shape ran it up to 4×. */
  def minhashLshFrom(docs: DataFrame): DataFrame =
    minhashLshFromSigs(org.apache.spark.sql.GraftColumnBridge.stageBarrier(
        docs.select(col("doc_id"), minhashSignature(col("text")).as("sig"))
          .repartition(col("doc_id")))
      .filter(size(col("sig")) === NumHashes))

  /** dedup_minhash_lsh_staged: identical banding off the staged per-doc
    * signature table (stagedMinhashSigs) — the r13 sf100 probe put
    * dedup_minhash_lsh at 120.1 s, dominated by the in-query 32-lane
    * signature kernel over 5M docs; production signs once per ingest
    * and every LSH re-run (threshold tuning, incremental batches) scans
    * 32 integers per doc. Oracled against the SAME SQL as the in-query
    * twin (array<bigint> round-trips bit-exact). */
  def dedupMinhashLshStaged(spark: SparkSession, dir: String): DataFrame =
    minhashLshFromSigs(
      stagedMinhashSigs(spark, dir).filter(size(col("sig")) === NumHashes))

  /** Staged (doc_id, sig) — the 32-lane md5 MinHash signatures
    * (sources.Staged cache: once per JVM per dir content; sub-k-word
    * docs keep their empty array in the table, callers filter). */
  def stagedMinhashSigs(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Staged.table(spark, "minhash32", dir) {
      Tables.documents(spark, dir)
        .select(col("doc_id"), minhashSignature(col("text")).as("sig"))
    }

  /** The banding + candidate self-join + agreement estimate over any
    * (doc_id, sig array<long>) frame with full-length signatures. */
  private def minhashLshFromSigs(sigs: DataFrame): DataFrame = {
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until Bands).map { b =>
        struct(lit(b).as("band") +:
          (0 until Rows).map(r => col("sig")(b * Rows + r).as(s"r$r")): _*)
      }: _*)).as("bb"))
      .select(col("doc_id") +: col("sig") +: (col("bb.band") +:
        (0 until Rows).map(r => col(s"bb.r$r"))): _*)
    val a = banded.as("a"); val b = banded.as("b")
    val agree = aggregate(
      zip_with(col("a.sig"), col("b.sig"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    val bandEq = (0 until Rows).map(r => col(s"a.r$r") === col(s"b.r$r"))
      .foldLeft(col("a.band") === col("b.band"))(_ && _)
    a.join(b, bandEq && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (agree / lit(NumHashes.toDouble)).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The full md5-lane mirror (r13): 32 laneMinSqlAt lanes per doc, the
    * 8 band keys as raw 4-lane tuples, signature-agreement estimate as
    * the exact integer count over 32 IEEE-divided — every number the
    * engine emits, re-derived from the same md5 parses and laneConsts. */
  val dedupMinhashLshSql: String = {
    val lanesList = (0 until NumHashes).map(i => laneMinSqlAt(i, NumHashes))
      .mkString("[", ",\n      |        ", "]")
    val bandCtes = (0 until Bands).map { k =>
      s"SELECT doc_id, $k AS band, lm[${k * Rows + 1}] AS r0, lm[${k * Rows + 2}] AS r1, " +
        s"lm[${k * Rows + 3}] AS r2, lm[${k * Rows + 4}] AS r3 FROM lanes"
    }.mkString("\n      |  UNION ALL ")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(
      |           [words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
      |            for i in range(0, len(words)-2)], x -> md5(x))) AS sh
      |  FROM w WHERE len(words) >= 3),
      |lanes AS (SELECT doc_id, $lanesList AS lm FROM s),
      |b AS (
      |  $bandCtes),
      |p AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |  FROM b x JOIN b y
      |    ON x.band = y.band AND x.r0 = y.r0 AND x.r1 = y.r1
      |   AND x.r2 = y.r2 AND x.r3 = y.r3 AND x.doc_id < y.doc_id)
      |SELECT id_a, id_b,
      |       list_reduce([CASE WHEN a.lm[i] = c.lm[i] THEN 1 ELSE 0 END
      |                    for i in range(1, ${NumHashes + 1})], (x, y) -> x + y)
      |         / CAST($NumHashes AS DOUBLE) AS est_jaccard
      |FROM p JOIN lanes a ON p.id_a = a.doc_id JOIN lanes c ON p.id_b = c.doc_id
      |ORDER BY id_a, id_b""".stripMargin
  }

  // -------------------------------------------------------- dedup_simhash
  /** 64-bit SimHash (majority vote per bit over word hashes) via the
    * native graft.expressions.SimHashMd5 kernel — one compiled pass per
    * row; the declarative 64-bit-vote formulation ran interpreted.
    * r14: the word hash moved from xxhash64(seed 42) to the first 64
    * digest bits of md5(word) — the r13 minhash-lane recipe — so every
    * signature bit is DuckDB-reproducible and the query is fully
    * oracled (dedupSimhashSql below reconstructs the majority votes
    * from the h1/hc digest parses). */
  def simhash(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.SimHashMd5(
      GraftColumnBridge.expression(text)))
  }

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), simhash(col("text")).as("simhash"))
      .orderBy(col("doc_id"))

  /** The mirror rebuilds each of the 64 majority votes as a signed SUM
    * over the doc's words: bit b of a word's hash is (hc >> b) & 1 for
    * b < 4 and (h1 >> (b-4)) & 1 above, with h1/hc the two
    * BIGINT-parseable pieces of md5's first 16 hex chars (the lane
    * mirrors' h1 parse). Bit 63 lands as the sign bit, so the final
    * assembly adds -2^63 instead of 1<<63 — same two's-complement long
    * both engines. 64 vectorized CASE sums per word row beat the
    * nested-lambda form ~10× in DuckDB at sf0.1. */
  val dedupSimhashSql: String = {
    def bitExpr(b: Int): String =
      if (b < 4) s"(hc >> $b) & 1" else s"(h1 >> ${b - 4}) & 1"
    val sums = (0 until 64).map(b =>
      s"sum(CASE WHEN ${bitExpr(b)} = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",\n      |  ")
    val assemble = (0 until 64).map(b =>
      if (b == 63) s"CASE WHEN s63 > 0 THEN -9223372036854775808 ELSE 0 END"
      else s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" +\n      |  ")
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS x FROM documents),
      |h AS (SELECT doc_id,
      |        CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) AS h1,
      |        CAST(concat('0x', substr(md5(x), 16, 1)) AS BIGINT) AS hc
      |      FROM w),
      |s AS (SELECT doc_id,
      |  $sums
      |  FROM h GROUP BY doc_id)
      |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash
      |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Hamming distance between two simhash columns. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------------ dedup_embedding
  private val BlockTables = Seq(6, 7, 8) // distinct from ann_lsh's tables 0-5
  private val BlockPlanes = 4 // floor: 16 sign-buckets per (label, table)
  private val BlockTargetRows = 256L // target rows per (label, table, bucket)

  /** The planes knob, actually wired to the data: planes =
    * max(4, ceil(log2(rowsPerLabel / targetBlock))) so block size stays
    * ~targetBlock as the corpus grows — pair work O(n·B·tables), never
    * O(n²/labels). Recall per the banding math in dedupEmbedding's
    * Scaladoc: at τ=0.99, 3 tables keep recall ≈0.99 through planes≈8;
    * beyond that, add tables. At sf0.01/sf0.1 this evaluates to the
    * floor (4), so the static DuckDB oracle stays exact at the
    * correctness gate's scale while sf1+ gets finer blocks. */
  def blockPlanes(rows: Long, labels: Long): Int = {
    val perLabel = math.max(1L, rows / math.max(1L, labels))
    val needed = math.ceil(
      math.log(perLabel.toDouble / BlockTargetRows) / math.log(2.0)).toInt
    math.max(BlockPlanes, needed)
  }

  /** Embedding near-dup candidates — see dedupEmbedding below: exact
    * cosine within (label, hyperplane-bucket) blocks, unioned over 3
    * LSH tables, bounded to PairCap partners per member.
    *
    * Scale: label alone is a FIXED-cardinality key — within-block pairs
    * are O(n²/|labels|), i.e. 100× data → 10,000× pairs. The hyperplane
    * bucket is the knob that grows with data: block count per label is
    * 2^planes per table, so planes ≈ log2(n/B) holds block size at B and
    * total pair work at O(n·B·tables). A τ-similar pair lands in the
    * same bucket of one table with prob (1-θ/π)^planes (θ = arccos τ),
    * so 3 tables keep recall ≈ 1-(1-(1-θ/π)^planes)³ ≈ 0.995 at τ=0.99.
    * The only shuffles are on (label, table, bucket) and the partner
    * rank key; duplicate candidate pairs collapse as scalars.
    *
    * Oracle parity: buckets are deterministic sign(dot(v, plane))
    * expressions whose ±1 plane components (Ann.planeSign) are baked
    * into the SQL below from the SAME Scala function; the cosine is the
    * sequential double fold Vectors.dot mirrors (NOT DuckDB's
    * float-precision list_cosine_similarity). */
  /** The (vec_id, label, v, t, block) bucketed frame both embedding-pair
    * variants read. Staged behind a barrier: the subtree is shuffle-free,
    * so this is NOT shuffle-stage reuse (the staged RDD is lazy) — the
    * barrier's win is stopping Catalyst from re-deriving the bucket
    * expressions into each side's join-key null filters, which
    * re-evaluated the 3-table hyperplane projection per side (A/B at
    * sf1: 41.7 s unstaged vs 33.4 s staged; sf0.1 1.16 vs 0.94). */
  private def bucketedEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    // two scalar jobs to size the index — the standard price of any
    // data-sized LSH; at sf<=0.1 planes stays at the floor (4), keeping
    // the static oracle SQL exact at the correctness gate's scale
    val stats = e.agg(count(lit(1)), countDistinct(col("label"))).first()
    val planes = blockPlanes(stats.getLong(0), stats.getLong(1))
    org.apache.spark.sql.GraftColumnBridge.stageBarrier(
      e.select(col("vec_id"), col("label"), col("v"),
        explode(array(BlockTables.map(t => struct(lit(t).as("t"),
          Ann.hyperplaneBucket(col("v"), t, planes).as("block"))): _*)).as("tb"))
        .select(col("vec_id"), col("label"), col("v"), col("tb.t"), col("tb.block")))
  }

  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    // Bounded pair expansion (r10): the full within-block pair list is
    // output-QUADRATIC on a degenerately self-similar corpus — LSH
    // collocates near-identical vectors by design (identical vectors
    // share every sign bucket no matter how many planes), so no
    // bucketing knob fixes it; the r7 sf10 probe measured >600 s of
    // real pair output while everything else scaled linearly. Each
    // member now pairs with its next-PairCap block-mates in vec_id
    // order: output ≤ n·PairCap·tables, and the rank chains keep every
    // block connected, so the components OF THE UNFILTERED candidate
    // graph are unchanged (DedupSpec pins subset/cosine/component
    // equality vs the full-pair yardstick below). The guarantee is
    // scoped to the unfiltered edge set: a consumer that thresholds
    // pairs by cos_sim BEFORE clustering can lose a ≥τ pair more than
    // PairCap ranks away whose chain path runs through sub-τ edges —
    // threshold-based clustering should use dedup_embedding_reps,
    // whose star edges are independent of this bounded list. The
    // explode-then-equi-join shape does O(n·PairCap) WORK, never
    // materializing the b² join.
    val bucketed = bucketedEmbeddings(spark, dir)
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"), col("t"), col("block"))
    val ranked = bucketed
      .withColumn("rn", row_number().over(wb.orderBy(col("vec_id"))))
      .withColumn("bs", count(lit(1)).over(wb))
    val probes = ranked.filter(col("rn") < col("bs"))
      .select(col("label"), col("t"), col("block"),
        col("vec_id").as("id_a"), col("v").as("av"),
        explode(sequence(col("rn") + 1,
          least(col("rn") + PairCap, col("bs")))).as("prn"))
    val partners = ranked.select(col("label"), col("t"), col("block"),
      col("rn").as("prn"), col("vec_id").as("id_b"), col("v").as("bv"))
    // cosine is computed map-side in the join projection, BEFORE the
    // cross-table dedup: a pair costs <=3 fused dot products and only
    // scalars cross the dedup exchange (the r7 sf1 lesson)
    probes.join(partners, Seq("label", "t", "block", "prn"))
      .select(col("label"), col("id_a"), col("id_b"),
        (round(Vectors.cosine(col("av"), col("bv")), 4) + 0.0).as("cos_sim"))
      .dropDuplicates("id_a", "id_b")
      .orderBy(col("label"), col("id_a"), col("id_b"))
  }

  /** Spec-only yardstick (UNREGISTERED): the exact full within-block
    * pair list the bounded query above is verified against — every
    * bounded pair must appear here with the identical cosine, and the
    * connected components of both edge sets must coincide (DedupSpec).
    * Quadratic on self-similar corpora by definition of its output, so
    * it must never be a registered query (r9 verdict). */
  private[graft] def dedupEmbeddingFullPairs(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = bucketedEmbeddings(spark, dir)
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a.label") === col("b.label") && col("a.t") === col("b.t") &&
        col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.label").as("label"), col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        (round(Vectors.cosine(col("a.v"), col("b.v")), 4) + 0.0).as("cos_sim"))
      .dropDuplicates("id_a", "id_b")
      .orderBy(col("label"), col("id_a"), col("id_b"))
  }

  // ------------------------------------------------- dedup_embedding_reps
  /** The 100 TB form of embedding dedup: REPRESENTATIVE-star edges
    * instead of the full pair list. dedup_embedding materializes every
    * within-block pair — O(b²) per block, and when a corpus region is
    * degenerately self-similar the full pair list is quadratic because
    * the ANSWER is (the r7 sf10 probe: a dominant shared component made
    * each replica's vectors mutually ≥0.99-cosine — whole-block
    * cliques, >600 s of real pair output at 10× sf1 while every other
    * operator scaled linearly). No bucketing fixes that: LSH collocates
    * similar vectors by design, and you cannot split a clique.
    *
    * This variant verifies each member against its block's minimum-id
    * representative only: O(b) cosines per block, output ≤ n rows, and
    * the star edges (member → rep, cos ≥ τ) produce the same connected
    * components as the full pair list whenever near-dup blocks are
    * cliques — which ≥0.99-cosine blocks are up to LSH banding
    * (member ~ rep ~ member′ chains transitively). Emits per vector its
    * best rep edge (highest cosine, rep_id tie-break) and the
    * keep/drop verdict a pipeline consumes. sf10: 7.7 s cold / 3.5 s
    * warm where the pair list ran >600 s. */
  def dedupEmbeddingReps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val stats = e.agg(count(lit(1)), countDistinct(col("label"))).first()
    val planes = blockPlanes(stats.getLong(0), stats.getLong(1))
    val bucketed = org.apache.spark.sql.GraftColumnBridge.stageBarrier(
      e.select(col("vec_id"), col("label"), col("v"),
        explode(array(BlockTables.map(t => struct(lit(t).as("t"),
          Ann.hyperplaneBucket(col("v"), t, planes).as("block"))): _*)).as("tb"))
        .select(col("vec_id"), col("label"), col("v"), col("tb.t"), col("tb.block")))
    // one (rep_id, rep_v) per block: a |blocks|-row aggregate (min_by is
    // deterministic — vec_id is unique), then members verify against
    // their rep map-side in the join projection
    val reps = bucketed.groupBy(col("label"), col("t"), col("block"))
      .agg(min(col("vec_id")).as("rep_id"), expr("min_by(v, vec_id)").as("rep_v"))
    val edges = bucketed.join(reps, Seq("label", "t", "block"))
      .filter(col("vec_id") =!= col("rep_id"))
      .select(col("vec_id"), col("rep_id"),
        (round(Vectors.cosine(col("v"), col("rep_v")), 4) + 0.0).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("rep_id"))
    edges.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("rep_id"), col("cos_sim"),
        when(col("cos_sim") >= 0.99, "drop").otherwise("keep").as("verdict"))
      .orderBy(col("vec_id"))
  }

  /** Per-table rep CTE: min-id member (and its vector) per (label,
    * bucket-of-table-t). */
  private def repCteSql(t: Int, bcol: String): String =
    s"""SELECT label, $bcol AS blk, min(vec_id) AS rep_id, min_by(v, vec_id) AS rep_v
       |      FROM bkt GROUP BY label, $bcol""".stripMargin

  val dedupEmbeddingRepsSql: String = {
    val cos =
      """CAST(round(
        |    list_reduce([mv[i]*rep_v[i] for i in range(1, len(mv)+1)], (x, y) -> x + y)
        |    / (sqrt(list_reduce([mv[i]*mv[i] for i in range(1, len(mv)+1)], (x, y) -> x + y))
        |     * sqrt(list_reduce([rep_v[i]*rep_v[i] for i in range(1, len(rep_v)+1)], (x, y) -> x + y))), 4) AS DOUBLE) + 0.0""".stripMargin
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bkt AS (SELECT vec_id, label, v,
       |        ${bucketSql(6)} AS b0,
       |        ${bucketSql(7)} AS b1,
       |        ${bucketSql(8)} AS b2
       |        FROM e),
       |r0 AS (${repCteSql(6, "b0")}),
       |r1 AS (${repCteSql(7, "b1")}),
       |r2 AS (${repCteSql(8, "b2")}),
       |edges AS (
       |  SELECT m.vec_id, r.rep_id, m.v AS mv, r.rep_v
       |  FROM bkt m JOIN r0 r ON m.label = r.label AND m.b0 = r.blk AND m.vec_id <> r.rep_id
       |  UNION ALL
       |  SELECT m.vec_id, r.rep_id, m.v, r.rep_v
       |  FROM bkt m JOIN r1 r ON m.label = r.label AND m.b1 = r.blk AND m.vec_id <> r.rep_id
       |  UNION ALL
       |  SELECT m.vec_id, r.rep_id, m.v, r.rep_v
       |  FROM bkt m JOIN r2 r ON m.label = r.label AND m.b2 = r.blk AND m.vec_id <> r.rep_id),
       |c AS (SELECT vec_id, rep_id, $cos AS cos_sim FROM edges),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |                     ORDER BY cos_sim DESC, rep_id) AS rn FROM c)
       |SELECT vec_id, rep_id, cos_sim,
       |       CASE WHEN cos_sim >= 0.99 THEN 'drop' ELSE 'keep' END AS verdict
       |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  /** ±1 plane components of block table `t`, plane `p`, as a DuckDB
    * list literal — generated from Ann.planeSign so Spark and the
    * oracle cannot drift. */
  private def planeListSql(t: Int, p: Int): String =
    (0 until 64).map(d => s"${Ann.planeSign(t, p, d)}.0").mkString("[", ", ", "]")

  /** Bucket of `v` in block table `t` as a DuckDB expression: the same
    * sequential dot fold (list_reduce folds left in element order; its
    * first-element seed equals Spark's 0.0 seed bit-for-bit because
    * 0.0 + x == x) and the same >= 0 sign test. */
  private def bucketSql(t: Int): String =
    (0 until BlockPlanes).map { p =>
      s"""(CASE WHEN list_reduce([v[i] * (${planeListSql(t, p)})[i]
         |  for i in range(1, 65)], (x, y) -> x + y) >= 0 THEN ${1 << p} ELSE 0 END)""".stripMargin
    }.mkString("(", " + ", ")")

  /** A pair is a candidate iff SOME table buckets it together — the OR
    * below is exactly the Spark side's explode-join-dropDuplicates. */
  val dedupEmbeddingSql: String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bkt AS (SELECT vec_id, label, v,
       |        ${bucketSql(6)} AS b0,
       |        ${bucketSql(7)} AS b1,
       |        ${bucketSql(8)} AS b2
       |        FROM e),
       |lng AS (SELECT vec_id, label, v, t,
       |          CASE t WHEN 0 THEN b0 WHEN 1 THEN b1 ELSE b2 END AS blk
       |        FROM bkt CROSS JOIN range(0, 3) tt(t)),
       |rk AS (SELECT vec_id, label, v, t, blk,
       |         row_number() OVER (PARTITION BY label, t, blk ORDER BY vec_id) AS rn
       |       FROM lng),
       |p AS (SELECT DISTINCT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
       |             a.v AS av, b.v AS bv
       |      FROM rk a JOIN rk b ON a.label = b.label AND a.t = b.t AND a.blk = b.blk
       |       AND b.rn > a.rn AND b.rn <= a.rn + $PairCap)
       |SELECT label, id_a, id_b,
       |  CAST(round(
       |    list_reduce([av[i]*bv[i] for i in range(1, len(av)+1)], (x, y) -> x + y)
       |    / (sqrt(list_reduce([av[i]*av[i] for i in range(1, len(av)+1)], (x, y) -> x + y))
       |     * sqrt(list_reduce([bv[i]*bv[i] for i in range(1, len(bv)+1)], (x, y) -> x + y))), 4) AS DOUBLE) + 0.0 AS cos_sim
       |FROM p ORDER BY label, id_a, id_b""".stripMargin

  // ------------------------------------------------------ dedup_incremental
  /** Incremental admission: a NEW batch of documents (doc_id % 10 == 0
    * stands in for the day's ingest) is screened against the EXISTING
    * corpus — the shape a continuously-fed training pipeline actually
    * runs, where re-deduplicating the whole corpus per ingest is not an
    * option. Verdict per batch doc: drop if any corpus candidate reaches
    * Jaccard ≥ 0.9 (identical texts share every shingle, so exact dups
    * are guaranteed candidates at j = 1.0), keep otherwise — with the
    * best-matching corpus doc and candidate count for audit.
    *
    * Scale: the banded keys are staged once over the whole corpus (one
    * kernel pass — batch and corpus are disjoint slices of the same
    * staged frame); candidates join batch-side keys to corpus-side keys
    * on (band, bucket), so candidate work scales with the ingest, not
    * the corpus, and the banding keeps one globally common shingle from
    * pairing the batch against a corpus-wide bucket (the r6 1-band key
    * did exactly that). As in dedup_ngram_jaccard, only (doc_id, band,
    * b0, b1) scalars cross the candidate exchange; the exact-Jaccard
    * verify joins the candidate list back to the documents' text and
    * the ShingleJaccard kernel shingles only the candidate pairs.
    * The best-match window partitions on the fine-grained batch doc_id.
    * Batch docs with no bucket match (or fewer than 3 words — no
    * shingles) short-circuit to keep via the left join. */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val keyed = bandedKeys(docs)
    val candIds = keyed.filter(col("doc_id") % 10 === 0).as("x")
      .join(keyed.filter(col("doc_id") % 10 =!= 0).as("y"),
        col("x.band") === col("y.band") && col("x.b0") === col("y.b0") &&
          col("x.b1") === col("y.b1"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("match_id"))
      .distinct()
    val t = docs.select(col("doc_id"), col("text"))
    val cand = candIds
      .join(t.select(col("doc_id"), col("text").as("ta")), Seq("doc_id"))
      .join(t.select(col("doc_id").as("match_id"), col("text").as("tb")), Seq("match_id"))
      .select(col("doc_id"), col("match_id"),
        shingleJaccard(col("ta"), col("tb")).as("j"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("j").desc, col("match_id"))
    val best = cand
      .withColumn("rk", row_number().over(w))
      .withColumn("n_candidates", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("match_id").as("best_match"),
        col("j").as("best_jaccard"), col("n_candidates"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 10 === 0)
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("best_match"), col("best_jaccard"),
        when(col("best_jaccard") >= 0.9, "drop").otherwise("keep").as("verdict"))
      .orderBy(col("doc_id"))
  }

  val dedupIncrementalSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(
      |           [words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
      |            for i in range(0, len(words)-2)], x -> md5(x))) AS sh
      |  FROM w WHERE len(words) >= 3),
      |b AS (
      |  $bandedCteSql),
      |cand0 AS (
      |  SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS match_id
      |  FROM b x JOIN b y ON x.band = y.band AND x.b0 = y.b0 AND x.b1 = y.b1
      |  WHERE x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0),
      |cand AS (
      |  SELECT c.doc_id, c.match_id,
      |         len(list_intersect(a.sh, m2.sh))
      |           / (len(a.sh) + len(m2.sh) - len(list_intersect(a.sh, m2.sh))) AS j
      |  FROM cand0 c JOIN s a ON c.doc_id = a.doc_id
      |               JOIN s m2 ON c.match_id = m2.doc_id),
      |best AS (
      |  SELECT doc_id, match_id AS best_match, j AS best_jaccard, n_candidates
      |  FROM (SELECT *,
      |          row_number() OVER (PARTITION BY doc_id ORDER BY j DESC, match_id) AS rk,
      |          count(*) OVER (PARTITION BY doc_id) AS n_candidates
      |        FROM cand) WHERE rk = 1)
      |SELECT d.doc_id, coalesce(best.n_candidates, 0) AS n_candidates,
      |       best.best_match, best.best_jaccard,
      |       CASE WHEN best.best_jaccard >= 0.9 THEN 'drop' ELSE 'keep' END AS verdict
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
      |LEFT JOIN best ON d.doc_id = best.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ----------------------------------------------------- dedup_clusters_star
  /** Connected components via alternating large-star/small-star (the
    * O(log n)-round refinement dedupClusters' Scaladoc names for DEEP
    * components — Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14; the SHAPE is from the public paper, the code is
    * original). Where min-label propagation needs O(diameter) rounds — a
    * 10k-link chain of pairwise near-dups needs 10k joins — the star
    * rounds halve every path, so any component flattens in O(log n)
    * rounds regardless of shape.
    *
    * Per round, both operations are a groupBy-min plus a join back —
    * never a collect_set of a neighborhood, so a hot node (one doc
    * near-dup to millions) costs a wide join fan-out but no single-task
    * array. Convergence = the small-star edge SET reaches a fixpoint
    * (count equal + empty set-difference); at fixpoint every edge points
    * directly at its component minimum, which is exactly the
    * (doc_id, cluster_id) labeling.
    *
    * Registered against the SAME DuckDB recursive-CTE oracle as
    * dedup_clusters — both must produce the identical labeling. */
  def dedupClustersStar(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dedupNgramJaccard(spark, dir).filter(col("jaccard") >= 0.9)
      .select(col("id_a"), col("id_b"))
    starComponents(pairs)._1
      .select(col("node").as("doc_id"), col("cluster_id"))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  /** Large-star/small-star fixpoint over an undirected edge list (any
    * two-column frame of node-id pairs). Returns (labels, rounds):
    * labels = (node, cluster_id = component min) for every node with
    * ≥1 edge; rounds = alternation count to the fixpoint (DedupSpec
    * pins O(log n) on a path graph min-label propagation can't touch). */
  def starComponents(pairs: DataFrame, maxIter: Int = 30): (DataFrame, Int) = {
    val cols = pairs.columns
    // canonical small-pointing orientation (hi > lo), self-loops dropped
    def toHiLo(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("hi"),
        least(col("u"), col("v")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct()
    // large-star: every node u connects its LARGER neighbors to
    // m = min(N(u) ∪ {u}) — paths to the minimum halve each round
    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = bidir.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      toHiLo(bidir.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }
    // small-star: every node connects its SMALLER neighbors (and
    // itself) to the minimum of that down-neighborhood
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      toHiLo(e.join(mins, "hi")
        .select(explode(array(
          struct(col("lo").as("u"), col("m").as("v")),
          struct(col("hi").as("u"), col("m").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v")))
    }
    // localCheckpoint (eager) truncates the lineage every round — the
    // alternative (persist alone) keeps a logical plan that DOUBLES per
    // round and blows up Catalyst after ~10 rounds on a deep graph, the
    // exact graphs this operator exists for. Old checkpoint blocks are
    // freed by the ContextCleaner when the superseded frame drops out
    // of scope.
    var cur = toHiLo(pairs.select(col(cols(0)).as("u"), col(cols(1)).as("v")))
      .localCheckpoint()
    var rounds = 0
    var converged = cur.isEmpty
    while (!converged && rounds < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint()
      converged = next.count() == cur.count() && next.except(cur).isEmpty
      cur = next
      rounds += 1
    }
    // fixpoint is a star per component: hi → component min
    val labels = cur.select(col("hi").as("node"), col("lo").as("cluster_id"))
      .union(cur.select(col("lo").as("node"), col("lo").as("cluster_id")))
      .groupBy(col("node")).agg(min(col("cluster_id")).as("cluster_id"))
    (labels, rounds)
  }

  // --------------------------------------------------------- dedup_semantic
  /** SemDeDup (Abbas et al., arXiv:2303.09540): cluster the embedding
    * space, then call two items semantic duplicates when their cosine
    * within a shared cluster exceeds τ = 0.99 — the centroid index
    * prunes the pair space so the quadratic never leaves a cluster.
    * The clustering REUSES the two-level IVF index (Ann.celledEmbeddings
    * — same strided seeds, same integer-exact Lloyd step, same kernels),
    * so the oracle composes the identical ivfIndexCtes and the cluster
    * assignment cannot drift from ann_ivf_topk's.
    *
    * Output: one row per cluster that holds ≥1 pair — member count,
    * pairwise-cosine count, max cosine with its argmax pair, and
    * n_dropped = vectors with a lower-id τ-neighbor (the keep-lowest-id
    * convention every dedup op here shares). The gate corpora plant no
    * ≥τ embedding replicas (dedup_embedding_reps finds 0 drops there
    * too), so the per-cluster report keeps the full pairwise arithmetic
    * cross-engine-verified while n_dropped lights up on replicated
    * corpora (the MakeScale sf1/sf10 shape). Thresholding happens on
    * the 4-decimal-rounded cosine (the dedup_embedding_reps discipline)
    * so the τ compare is bit-identical cross-engine.
    *
    * Scale: ONE shuffle on the cell key, and the within-cell pair
    * space is BOUNDED to CellPairCap partners per member in (sign-
    * bucket, vec_id) rank order (r12 — the dedup_embedding PairCap
    * playbook; nlist saturates at MaxLists so cell size grows linearly
    * with the corpus past ~1M vectors, and the r11 sf10 sweep measured
    * the resulting quadratic directly). Identical vectors share every
    * sign bit and sort adjacent, so exact-replica drops are unaffected
    * by the cap; a ≥τ-but-inexact pair can escape when > CellPairCap
    * sorted cell-mates separate it — the bounded-candidate scoping, on
    * top of the paper's own cell-boundary recall caveat inherent to
    * cluster-scoped dedup. */
  def dedupSemantic(spark: SparkSession, dir: String): DataFrame =
    semanticFrom(Ann.celledEmbeddings(spark, dir))

  /** Per-member partner cap for the within-cell SemDeDup pair space —
    * the r10 dedup_embedding PairCap playbook applied to the IVF cell:
    * a cell of b members emits ≤ b·CellPairCap pairs instead of b²/2.
    * nlist saturates at MaxLists, so above ~1M vectors cell size (and
    * the full pair space) grows LINEARLY with the corpus — the r11
    * sf10 sweep measured the quadratic term directly (dedup_semantic's
    * family at ~11× on 100× data). Interpolated into both mirrors
    * (shared-constant rule). */
  private[graft] val CellPairCap = 8

  /** Sub-order sign planes: within a cell, members are RANKED by
    * (8-plane sign bucket, RAW plane-0 projection, vec_id) of the
    * VECTOR (LSH table 9 — disjoint from ann_lsh's 0-5 and
    * dedup_embedding's 6-8), so the CellPairCap window is an LSH-aware
    * neighborhood. The continuous projection is the key to exactness:
    * identical vectors tie on bucket AND projection, and no distinct
    * vector can sort STRICTLY BETWEEN two equal keys, so every exact-
    * replica run is contiguous no matter how large or clustered the
    * cell — each non-minimal replica pairs with its in-run predecessor
    * at cos 1.0 (a sign-bucket alone fails here: same-center vectors
    * have correlated signs and interleave, measured in DedupSpec's
    * planted corpus). A ≥τ-but-not-identical pair can still fall
    * > CellPairCap ranks apart — the bounded-candidate scoping
    * dedup_embedding documents, inherent to any capped pair list. */
  private[graft] val SubOrderPlanes = 8
  private[graft] val SubOrderTable = 9

  /** The bounded within-cell pair list both SemDeDup consumers read:
    * (cell, vec_id, lower_id, cos_sim) with vec_id > lower_id, each
    * unordered pair at most once, ≤ CellPairCap partners per member in
    * (sign-bucket, vec_id) rank order. The cosine is computed map-side
    * in the join projection; only scalars cross the partner exchange. */
  private[graft] def celledChainPairs(celled: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = Window.partitionBy(col("cell"))
    val ranked = celled
      .withColumn("hb", Ann.hyperplaneBucket(col("v"), SubOrderTable, SubOrderPlanes))
      .withColumn("d0", Ann.hyperplaneProj(col("v"), SubOrderTable, 0))
      .withColumn("rn",
        row_number().over(wc.orderBy(col("hb"), col("d0"), col("vec_id"))))
      .withColumn("bs", count(lit(1)).over(wc))
    val probes = ranked.filter(col("rn") < col("bs"))
      .select(col("cell"), col("vec_id").as("ida"), col("v").as("av"),
        explode(sequence(col("rn") + 1,
          least(col("rn") + CellPairCap, col("bs")))).as("prn"))
    val partners = ranked.select(col("cell"), col("rn").as("prn"),
      col("vec_id").as("idb"), col("v").as("bv"))
    probes.join(partners, Seq("cell", "prn"))
      .select(col("cell"),
        greatest(col("ida"), col("idb")).as("vec_id"),
        least(col("ida"), col("idb")).as("lower_id"),
        (round(Vectors.cosine(col("av"), col("bv")), 4) + 0.0).as("cos_sim"))
  }

  /** Sub-order bucket of `v` as a DuckDB expression — Ann.planeSign
    * table SubOrderTable baked in (the dedup_embedding oracle pattern),
    * folding over range(1, len(v)+1) to match VectorKernels.dot's
    * min-length fold on any dimension. */
  /** Plane 0 of the sub-order table as a DuckDB list literal — the
    * continuous tie-break projection (Ann.hyperplaneProj's twin). */
  private def subOrderPlane0Sql: String =
    (0 until 64).map(d => s"${Ann.planeSign(SubOrderTable, 0, d)}.0")
      .mkString("[", ", ", "]")

  private def subOrderBucketSql: String =
    (0 until SubOrderPlanes).map { p =>
      val plane = (0 until 64).map(d => s"${Ann.planeSign(SubOrderTable, p, d)}.0")
        .mkString("[", ", ", "]")
      s"""(CASE WHEN list_reduce([v[i] * ($plane)[i]
         |  for i in range(1, len(v)+1)], (x, y) -> x + y) >= 0 THEN ${1 << p} ELSE 0 END)""".stripMargin
    }.mkString("(", " + ", ")")

  /** Shared celled-chain-pair CTE fragment (prefixed sdd_ — composes
    * over ivfIndexCtes' e/celled without collisions): the exact DuckDB
    * twin of celledChainPairs. */
  private def celledChainSql: String =
    s"""sdd_hb AS (SELECT vec_id, $subOrderBucketSql AS hb,
       |  list_reduce([v[i] * ($subOrderPlane0Sql)[i]
       |    for i in range(1, len(v)+1)], (x, y) -> x + y) AS d0 FROM e),
       |sdd_rk AS (
       |  SELECT c.vec_id, c.cell,
       |         row_number() OVER (PARTITION BY c.cell
       |           ORDER BY h.hb, h.d0, c.vec_id) AS rn,
       |         count(*) OVER (PARTITION BY c.cell) AS bs
       |  FROM celled c JOIN sdd_hb h ON h.vec_id = c.vec_id),
       |sdd_sp AS (
       |  SELECT a.cell AS cell,
       |         greatest(a.vec_id, b.vec_id) AS vid,
       |         least(a.vec_id, b.vec_id) AS lower_id,
       |         CAST(round(
       |           list_reduce([av[i]*bv[i] for i in range(1, len(av)+1)], (x, y) -> x + y)
       |           / (sqrt(list_reduce([av[i]*av[i] for i in range(1, len(av)+1)], (x, y) -> x + y))
       |            * sqrt(list_reduce([bv[i]*bv[i] for i in range(1, len(bv)+1)], (x, y) -> x + y))), 4) AS DOUBLE) + 0.0 AS cos_sim
       |  FROM sdd_rk a JOIN sdd_rk b
       |    ON a.cell = b.cell AND b.rn > a.rn AND b.rn <= a.rn + $CellPairCap
       |  JOIN (SELECT vec_id, v AS av FROM e) aa ON aa.vec_id = a.vec_id
       |  JOIN (SELECT vec_id, v AS bv FROM e) bb ON bb.vec_id = b.vec_id)""".stripMargin

  /** Core over any celled (vec_id, v, cell) frame — spec entry point
    * (the spec plants exact replicas: identical vectors get identical
    * argmax-dot cells AND identical sub-order buckets, so every replica
    * is dropped deterministically even under the CellPairCap bound). */
  private[graft] def semanticFrom(celled: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // staged: the scalar pair list feeds BOTH the aggregate and the
    // argmax window (the r6 aliased-reuse lesson — without the barrier
    // Catalyst re-derives the partner join into each consumer)
    val pairs = org.apache.spark.sql.GraftColumnBridge.stageBarrier(
      celledChainPairs(celled))
    val members = celled.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
    val agg = pairs.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("cos_sim")).as("max_cos"),
        countDistinct(when(col("cos_sim") >= 0.99, col("vec_id"))).as("n_dropped"))
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("cos_sim").desc, col("vec_id"), col("lower_id"))
    val top = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("cell"), col("lower_id").as("top_lo"), col("vec_id").as("top_hi"))
    agg.join(top, Seq("cell")).join(members, Seq("cell"))
      .select(col("cell"), col("n_members"), col("n_pairs"), col("n_dropped"),
        col("max_cos"), col("top_lo"), col("top_hi"))
      .orderBy(col("cell"))
  }

  val dedupSemanticSql: String =
    s"""WITH ${Ann.ivfCtes},
       |$celledChainSql,
       |mem AS (SELECT cell, count(*) AS n_members FROM celled GROUP BY cell),
       |ag AS (SELECT cell, count(*) AS n_pairs, max(cos_sim) AS max_cos,
       |              count(DISTINCT CASE WHEN cos_sim >= 0.99 THEN vid END) AS n_dropped
       |       FROM sdd_sp GROUP BY cell),
       |tp AS (SELECT cell, top_lo, top_hi FROM (
       |         SELECT cell, lower_id AS top_lo, vid AS top_hi,
       |                row_number() OVER (PARTITION BY cell
       |                  ORDER BY cos_sim DESC, vid, lower_id) AS rn
       |         FROM sdd_sp) WHERE rn = 1)
       |SELECT ag.cell, n_members, n_pairs, n_dropped, max_cos, top_lo, top_hi
       |FROM ag JOIN tp ON ag.cell = tp.cell JOIN mem ON ag.cell = mem.cell
       |ORDER BY ag.cell""".stripMargin

  // ------------------------------------------------- embed_threshold_eval
  /** The SEMANTIC-dedup cutoff decision report — the third leg of the
    * r11 threshold trilogy (lexical τ: dedup_threshold_eval; quality
    * strictness: corpus_gate_strictness; THIS prices SemDeDup's cosine
    * cutoff): per candidate τ (0.95/0.98/0.99/0.995) the same-cell
    * pairs at or above it, the vectors a keep-min SemDeDup would drop,
    * and the retained fraction — "0.995 keeps 97%, 0.95 keeps 78%" is
    * the aggressiveness knob Abbas et al. '23 sweep offline; here it is
    * one query over the SAME celled frame dedup_semantic scores, so the
    * curve and the verdict cannot disagree.
    *
    * Exactness: cosines are the identical round(·, 4) doubles the
    * oracled dedup_semantic compares (same arithmetic both engines →
    * same booleans at every τ); counts are integers; the fraction one
    * division by the 1-row total.
    *
    * Scale: the pair space is the IVF-cell-bounded, CellPairCap-
    * chained candidate set (celledChainPairs — never all-pairs, never
    * cell-quadratic); the 4-way τ explode carries scalars; the τ spine
    * joins off the 1-row totals frame so a τ dropping nothing still
    * reports. */
  def embedThresholdEval(spark: SparkSession, dir: String): DataFrame =
    embedThresholdEvalFrom(Ann.celledEmbeddings(spark, dir))

  private[graft] val CosThresholds = Seq(0.95, 0.98, 0.99, 0.995)

  private[graft] def embedThresholdEvalFrom(celled: DataFrame): DataFrame = {
    val pairs = celledChainPairs(celled).select(col("vec_id"), col("cos_sim"))
    val rem = pairs
      .select(col("vec_id"), col("cos_sim"),
        explode(array(CosThresholds.map(lit(_)): _*)).as("tau"))
      .filter(col("cos_sim") >= col("tau"))
      .groupBy(col("tau"))
      .agg(count(lit(1)).as("np"), countDistinct(col("vec_id")).as("nd"))
    val spine = celled.agg(count(lit(1)).as("tv"))
      .select(explode(array(CosThresholds.map(lit(_)): _*)).as("tau"), col("tv"))
    spine.join(rem, Seq("tau"), "left")
      .select(col("tau"),
        coalesce(col("np"), lit(0L)).as("n_pairs_over"),
        coalesce(col("nd"), lit(0L)).as("n_vectors_removed"),
        (round((col("tv") - coalesce(col("nd"), lit(0L))).cast("double")
          / col("tv"), 6) + 0.0).as("frac_vectors_retained"))
      .orderBy(col("tau"))
  }

  val embedThresholdEvalSql: String = {
    s"""WITH ${Ann.ivfCtes},
       |$celledChainSql,
       |taus AS (SELECT unnest([${CosThresholds.map(t => s"CAST($t AS DOUBLE)").mkString(", ")}]) AS tau),
       |rem AS (
       |  SELECT tau, CAST(count(*) AS BIGINT) AS np,
       |         CAST(count(DISTINCT vid) AS BIGINT) AS nd
       |  FROM sdd_sp CROSS JOIN taus WHERE cos_sim >= tau GROUP BY tau),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS tv FROM celled)
       |SELECT taus.tau,
       |       coalesce(np, 0) AS n_pairs_over,
       |       coalesce(nd, 0) AS n_vectors_removed,
       |       round(CAST(tv - coalesce(nd, 0) AS DOUBLE) / tv, 6) + 0.0
       |         AS frac_vectors_retained
       |FROM taus CROSS JOIN tot LEFT JOIN rem ON rem.tau = taus.tau
       |ORDER BY taus.tau""".stripMargin
  }

  // ---------------------------------------------------- dedup_cross_source
  /** Near-dup FLOW between sources: for every unordered source pair the
    * count of ≥0.9-Jaccard near-dup pairs with one doc in each (the
    * diagonal = within-source duplication) and its share of all near-dup
    * pairs — the "which sources mirror each other" attribution a corpus
    * owner reads before deciding what to crawl less of (per-source
    * health is corpus_source_report; THIS is the pairwise cross-source
    * structure; corpus_ngram_novelty attributes at span level).
    *
    * Scale: the pair list is the registered banded candidate set (never
    * all-pairs); two doc_id joins attach sources (unhinted — documents
    * scales with the corpus, AQE adjudicates), then ONE map-side-
    * combined aggregate to ≤|sources|² rows, STAGED for its two
    * consumers (output + the 1-row total, trade_flow_matrix's shape).
    * The share is one division of exact integers. Mirror embeds the
    * registered dedup_ngram_jaccard oracle verbatim as a subquery (the
    * rrf drift rule: the flow cannot disagree with the pair list it
    * attributes). */
  def dedupCrossSource(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val agg = stageBarrier(
      dedupNgramJaccard(spark, dir).filter(col("jaccard") >= 0.9)
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), Seq("id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), Seq("id_b"))
        .groupBy(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs")))
    val tot = agg.agg(sum(col("n_pairs")).as("tot"))
    agg.crossJoin(broadcast(tot))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        (round(col("n_pairs").cast("double") / col("tot").cast("double"), 6) + 0.0)
          .as("share"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val dedupCrossSourceSql: String =
    s"""WITH jp AS (SELECT * FROM ($dedupNgramJaccardSql) j WHERE jaccard >= 0.9),
      |pr AS (
      |  SELECT least(sa.source, sb.source) AS source_a,
      |         greatest(sa.source, sb.source) AS source_b
      |  FROM jp
      |  JOIN documents sa ON jp.id_a = sa.doc_id
      |  JOIN documents sb ON jp.id_b = sb.doc_id),
      |ag AS (SELECT source_a, source_b, count(*) AS n_pairs
      |       FROM pr GROUP BY source_a, source_b),
      |tt AS (SELECT sum(n_pairs) AS tot FROM ag)
      |SELECT source_a, source_b, n_pairs,
      |       round(CAST(n_pairs AS DOUBLE)/CAST(tot AS DOUBLE), 6) + 0.0 AS share
      |FROM ag CROSS JOIN tt
      |ORDER BY source_a, source_b""".stripMargin

  // ------------------------------------------------------------------ maps
  // --------------------------------------------------- dedup_winnow_pairs
  /** MOSS-style overlap candidates from the winnowing fingerprints
    * (Schleimer et al. SIGMOD'03 §5 — the matching step over winnowed
    * k-gram fingerprints): document pairs sharing ≥2 selected
    * fingerprint hashes, ranked by shared count. Winnowing guarantees
    * any shared run of ≥ w+k−1 words contributes a shared fingerprint,
    * so this finds PARTIAL overlap (quoted spans, plagiarized passages,
    * shared boilerplate blocks) that whole-set Jaccard dilutes away and
    * containment only catches when one doc is mostly inside the other —
    * the third candidate generator in the dedup family, position-local
    * where minhash/simhash are global.
    *
    * Scale: the fingerprint set is ~2/(w+1) of each doc's shingles
    * (winnowing's density bound); candidates are bucket-keyed on the
    * fingerprint hash with the standard stop-fingerprint cap (hashes in
    * > MaxDf docs are template boilerplate and dropped — the hot-bucket
    * discipline), so per-hash fan-out is ≤ MaxDf²/2 and total candidate
    * work tracks TRUE overlap, never corpus². The exploded fingerprint
    * frame and the rare-filtered frame each stage once (both are
    * consumed twice — the aliased-self-join reuse lesson); top-50
    * TakeOrdered bounds output under the total (shared, id, id) order. */
  /** Stop-fingerprint document-frequency cap (shared with the SQL
    * mirror via interpolation — the shared-constant drift rule). */
  private val MaxDf = 8

  def dedupWinnowPairs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    // Window-minimum SELECTION runs on full digests (the kernel's
    // ordering contract); the exploded fingerprints are TRANSPORT —
    // truncated to 16-hex prefixes (set-exact, half the exchange bytes,
    // r13) and re-deduped per doc in case two selected digests share a
    // prefix (both engines dedupe after the same truncation).
    val fps = stageBarrier(TextAnalysis.winnowBase(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(transform(col("st.fps"),
          f => substring(f, 1, 16)))).as("fp")))
    val rare = stageBarrier(fps.join(
      fps.groupBy(col("fp")).agg(count(lit(1)).as("df")).filter(col("df") <= MaxDf),
      Seq("fp")).select(col("fp"), col("doc_id")))
    rare.select(col("fp"), col("doc_id").as("id_a"))
      .join(rare.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy(col("n_shared").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  lazy val dedupWinnowPairsSql: String =
    s"""WITH ${TextAnalysis.winnowDimsCtes},
       |wsel AS (SELECT doc_id,
       |                list_distinct(list_transform(${TextAnalysis.winnowWmExpr},
       |                                             x -> substr(x, 1, 16))) AS fps
       |         FROM dims),
       |f AS (SELECT doc_id, unnest(fps) AS fp FROM wsel),
       |df AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= $MaxDf),
       |r AS (SELECT f.doc_id, f.fp FROM f JOIN df USING (fp)),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |      FROM r a JOIN r b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2 HAVING count(*) >= 2)
       |SELECT id_a, id_b, n_shared FROM p
       |ORDER BY n_shared DESC, id_a, id_b LIMIT 50""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_winnow_pairs" -> (dedupWinnowPairs _),
    "dedup_cross_source" -> (dedupCrossSource _),
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_band_eval" -> (dedupBandEval _),
    "dedup_threshold_eval" -> (dedupThresholdEval _),
    "dedup_threshold_apply" -> (dedupThresholdApply _),
    "dedup_containment" -> (dedupContainment _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_cluster_stats" -> (dedupClusterStats _),
    "dedup_clusters_star" -> (dedupClustersStar _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_minhash_lsh_staged" -> (dedupMinhashLshStaged _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding" -> (dedupEmbedding _),
    "dedup_embedding_reps" -> (dedupEmbeddingReps _),
    "dedup_semantic" -> (dedupSemantic _),
    "embed_threshold_eval" -> (embedThresholdEval _),
    "dedup_incremental" -> (dedupIncremental _)
  )

  def oracles: Map[String, String] = Map(
    "dedup_winnow_pairs" -> dedupWinnowPairsSql,
    "dedup_cross_source" -> dedupCrossSourceSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_band_eval" -> dedupBandEvalSql,
    "dedup_threshold_eval" -> dedupThresholdEvalSql,
    "dedup_threshold_apply" -> dedupThresholdApplySql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_clusters" -> dedupClustersSql,
    "dedup_cluster_stats" -> dedupClusterStatsSql,
    "dedup_clusters_star" -> dedupClustersSql,
    "dedup_embedding" -> dedupEmbeddingSql,
    "dedup_embedding_reps" -> dedupEmbeddingRepsSql,
    "dedup_semantic" -> dedupSemanticSql,
    "embed_threshold_eval" -> embedThresholdEvalSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    // the staged twin reads the staged signature table — the oracle is
    // the in-query twin's SQL verbatim
    "dedup_minhash_lsh_staged" -> dedupMinhashLshSql,
    "dedup_incremental" -> dedupIncrementalSql,
    // dedup_simhash joined the oracled set in r14: md5 word hashes
    // (the r13 minhash-lane recipe) make every signature bit
    // DuckDB-reproducible; DedupSpec still bounds the hamming behavior.
    "dedup_simhash" -> dedupSimhashSql
  )
}
