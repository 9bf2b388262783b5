package graft

import org.apache.spark.sql.functions._
import graft.operators.TextStats

/** Semantic checks for the corpus-level text statistics beyond oracle
  * parity: planted-corpus hand computations, information-theoretic
  * invariants, and the salted-agg plan shape. */
class TextStatsSpec extends SparkSpec {

  test("lm score: hand-computed Laplace bigram NLL on a planted corpus") {
    import spark.implicits._
    // corpus bigrams: "a b" x3 (docs 1,2), "b a" x1, "b c" x1
    // prefixes: a->3, b->2; prefix vocab V = 2
    // p(bg) = (c2+1)/(c1+V)
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextStats.lmScoreOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def nll(ps: Seq[Double]) =
      BigDecimal(-ps.map(math.log).sum / ps.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1 bigrams: a-b (4/5), b-a (2/4), a-b (4/5)
    assert(got(1L) == ((3L, nll(Seq(0.8, 0.5, 0.8)))))
    // doc 2 bigrams: a-b (4/5), b-c (2/4)
    assert(got(2L) == ((2L, nll(Seq(0.8, 0.5)))))
  }

  test("lm score: boilerplate scores lower than novel word salad") {
    import spark.implicits._
    val repeated = Array.fill(30)("the quick brown fox").mkString(" ")
    val salad = (1 to 120).map(i => s"w$i").mkString(" ")
    val docs = (Seq((1L, repeated), (2L, salad)) ++
      (3 to 40).map(i => (i.toLong, repeated))).toDF("doc_id", "text")
    val s = TextStats.lmScoreOf(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) < s(2L),
      s"boilerplate ${s(1L)} should beat word salad ${s(2L)}")
    // corpus-frequent bigrams give near-zero NLL for the repeated doc
    assert(s(1L) < 0.2 && s(2L) > 1.0)
  }

  test("domain KL: non-negative everywhere, zero for an on-distribution source") {
    import spark.implicits._
    // src_same's distribution IS the global distribution of itself alone
    val one = Seq(("only", "a b c a")).toDF("source", "text")
    val klOne = TextStats.domainKlOf(one).collect()
    assert(klOne.length == 1 && klOne(0).getDouble(2) == 0.0)
    // real corpus: every source diverges non-negatively (Gibbs)
    val rows = SparkEntry.queries("corpus_domain_kl")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0,
      s"KL must be >= 0, got ${r.getDouble(2)} for ${r.getString(0)}"))
    // a source with a private vocabulary diverges more than a clone of
    // the global mix
    val skewed = Seq(
      ("clone", "x y z x y z"), ("clone2", "x y z x y z"),
      ("private", "qq rr ss qq rr ss")).toDF("source", "text")
    val kl = TextStats.domainKlOf(skewed).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl("private") > kl("clone"))
  }

  test("tfidf top term: a doc-unique term beats corpus-wide terms; ties break lexically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common zebra zebra common"),
      (2L, "common common common common"),
      (3L, "common apple banana common")).toDF("doc_id", "text")
    val got = TextStats.tfidfTopOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // zebra: tf 2, df 1 -> (2*3)/(4*1) = 1.5; common: (2*3)/(4*3) = 0.5
    assert(got(1L) == "zebra", "unique term dominates")
    assert(got(2L) == "common", "only term wins by default")
    // apple and banana tie (same tf, same df) -> lexicographic winner
    assert(got(3L) == "apple")
  }

  test("skew_salted_agg equals the plain aggregate and keeps the two-phase plan") {
    val salted = SparkEntry.queries("skew_salted_agg")(spark, sf)
    val got = salted.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val ev = graft.sources.Tables.events(spark, sf)
    val plain = ev.groupBy(col("event_type"))
      .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("s"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == plain, "salting must not change one bit of output")
    // structural: one shuffle on (event_type, __salt), one on (event_type).
    // Inspect a FRESH (unexecuted) frame — after execution AQE wraps the
    // exchanges in leaf query stages that plain collect won't traverse.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val root = SparkEntry.queries("skew_salted_agg")(spark, sf)
      .queryExecution.executedPlan
    val inner = root match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val keys = inner.collectWithSubqueries {
      case s: ShuffleExchangeExec => s.outputPartitioning
    }.collect { case h: HashPartitioning =>
      h.expressions.flatMap(_.references.toSeq.map(_.name)).toSet
    }
    assert(keys.contains(Set("event_type", "__salt")),
      s"partial phase must shuffle on (key, salt): $keys")
    assert(keys.contains(Set("event_type")),
      s"final phase must combine on the key alone: $keys")
  }

  test("bm25_topk: ranked top-20, query terms discriminate, scores reproducible") {
    val df = SparkEntry.queries("bm25_topk")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.toSeq == scores.sortBy(-_).toSeq, "scores must be descending")
    assert(rows.forall(r => r.getAs[Long]("n_terms") >= 1 && r.getAs[Long]("n_terms") <= 5))
    // deterministic under repartitioning (sorted fold + integer stats)
    val again = df.collect().map(_.toSeq).toSeq
    assert(again == rows.map(_.toSeq).toSeq)
  }

  test("ccnet buckets: bucketed two-pass tertile equals the global ntile window") {
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("corpus_ccnet_buckets")(spark, sf)
    // reference: the per-lang global ntile window (single-reducer shape,
    // fine at spec scale) over the same scored frame
    val docs = graft.sources.Tables.documents(spark, sf)
    val scored = TextStats.lmScoreOf(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val w = Window.partitionBy(col("lang")).orderBy(col("avg_neg_logp"), col("doc_id"))
    val ref = scored.select(col("doc_id"),
      when(ntile(3).over(w) === 1, "head").when(ntile(3).over(w) === 2, "middle")
        .otherwise("tail").as("ref_bucket"))
    val joined = got.join(ref, Seq("doc_id")).collect()
    assert(joined.nonEmpty)
    val diff = joined.filter(r => r.getAs[String]("ppl_bucket") != r.getAs[String]("ref_bucket"))
    assert(diff.isEmpty, s"${diff.length} tertile mismatches, e.g. ${diff.take(3).mkString("; ")}")
    // per-lang tertile sizes differ by at most 1
    got.groupBy(col("lang"), col("ppl_bucket")).count().collect()
      .groupBy(_.getString(0)).foreach { case (lang, rs) =>
        val counts = rs.map(_.getLong(2))
        assert(counts.max - counts.min <= 1, s"$lang tertiles unbalanced: ${counts.toSeq}")
      }
  }
}
