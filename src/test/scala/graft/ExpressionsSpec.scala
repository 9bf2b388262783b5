package graft

import org.apache.spark.sql.functions._
import graft.expressions.TextHashes
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions: registration, codegen/eval parity,
  * edge-case handling. */
class ExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("SortedLongIntersectCount equals array_intersect size on sorted inputs") {
    import org.apache.spark.sql.GraftColumnBridge.{column => kcol, expression => kexp}
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L, 4L), Seq(4L, 4L)), // duplicates pair off positionally
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L))
    ).toDF("a", "b")
    val got = df.select(kcol(graft.expressions.SortedLongIntersectCount(
      kexp(col("a")), kexp(col("b")))).as("c")).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(2, 0, 2, 3), got.toSeq.toString)
  }

  test("shingle_minhashes registered via GraftExtensions and deterministic") {
    val df = Seq("a b c d e", "a b c d e", "x y z w v").toDF("text")
      .select(expr("shingle_minhashes(text, 3, 8)").as("sig"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0).length == 8)
    assert(rows(0) == rows(1), "same text, same signature")
    assert(rows(0) != rows(2))
  }

  test("codegen result matches direct kernel eval") {
    val texts = Seq("the quick brown fox jumps", "a b", "")
    val viaSql = texts.toDF("text")
      .select(expr("shingle_minhashes(text, 3, 4)").as("s"),
        expr("simhash64(text)").as("h"))
      .collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      val direct = TextHashes.shingleMinHashes(UTF8String.fromString(t), 3, 4)
      assert(viaSql(i).getSeq[Long](0) == direct.toLongArray().toSeq)
      assert(viaSql(i).getLong(1) == TextHashes.simHash64(UTF8String.fromString(t)))
    }
  }

  test("short/empty text yields empty signature, null stays null") {
    val rows = Seq(Some("a b"), Some(""), None).toDF("text")
      .select(expr("shingle_minhashes(text, 3, 4)").as("s")).collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).getSeq[Long](0).isEmpty)
    assert(rows(2).isNullAt(0))
  }

  test("ShingleMd5s kernel equals transform(shingles, md5) exactly") {
    // includes trailing / consecutive / leading spaces: the kernel must
    // tokenize with split(" ", -1) semantics (keep empty tokens) exactly
    // like the declarative split and DuckDB string_split
    val df = Seq("the quick brown fox jumps over", "a b", "",
      "a b c ", "a b c  ", "a  b c", " a b c", "  ")
      .toDF("text")
      .select(graft.functions.Text.shingleHashes(col("text"), 3).as("kernel"),
        transform(graft.functions.Text.shingles(col("text"), 3), s => md5(s)).as("declarative"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("ShingleMd5Prefixes and ShingleMd5Long60s equal their full-digest derivations") {
    // the two r13 transport forms must be pure functions of the already-
    // pinned full digests: 16-hex prefix = substring(md5, 0, 16), and the
    // 60-bit long = hex chars 1-15 parsed as an integer (the DuckDB
    // CAST(concat('0x', substr(x, 1, 15)) AS BIGINT) convention the lane
    // mirrors share)
    val texts = Seq("the quick brown fox jumps over", "a b c", "a b", "",
      "a b c ", " a b c", "zz yy xx zz yy xx")
    texts.foreach { t =>
      val hexes = TextHashes.shingleMd5s(UTF8String.fromString(t), 3)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
      val gotPrefix = TextHashes.shingleMd5Prefixes(UTF8String.fromString(t), 3)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(gotPrefix == hexes.map(_.substring(0, 16)).toSeq, s"prefixes diverge on '$t'")
      val gotLong = TextHashes.shingleMd5Long60s(UTF8String.fromString(t), 3)
        .toLongArray().toSeq
      assert(gotLong == hexes.map(h => java.lang.Long.parseLong(h.substring(0, 15), 16)).toSeq,
        s"60-bit longs diverge on '$t'")
      // and every value is non-negative: it must round-trip through a
      // signed BIGINT in the oracle
      assert(gotLong.forall(_ >= 0L))
    }
  }

  test("ShingleMd5Lanes equals the independent BigInt hex-parse computation") {
    // independent re-derivation of the lane minima: md5-hex each shingle
    // (via the already-pinned ShingleMd5s kernel semantics), parse hex
    // chars 1-15 / 17-31 as BigInt (the DuckDB oracle's CAST '0x...'),
    // and fold (a_i*h1 + b_i*h2) mod 2^61-1 in exact BigInt arithmetic —
    // pins the kernel's Mersenne mulmod and digest-byte split
    val texts = Seq("the quick brown fox jumps over", "a b c", "a b", "",
      "a b c ", " a b c", "zz yy xx zz yy xx")
    val p = BigInt(TextHashes.LaneP)
    val cs = TextHashes.laneConsts(16).map(BigInt(_))
    texts.foreach { t =>
      val hexes = TextHashes.shingleMd5s(UTF8String.fromString(t), 3)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
      val expect: Seq[Long] =
        if (hexes.isEmpty) Seq.empty
        else (0 until 8).map { i =>
          hexes.map { h =>
            val h1 = BigInt(h.substring(0, 15), 16)
            val h2 = BigInt(h.substring(16, 31), 16)
            ((cs(2 * i) * h1 + cs(2 * i + 1) * h2) mod p).toLong
          }.min
        }
      val got = TextHashes.shingleMd5Lanes(UTF8String.fromString(t), 3, 4, 2)
        .toLongArray().toSeq
      assert(got == expect, s"lane minima diverge on '$t'")
    }
  }

  test("ShingleJaccard kernel equals the declarative distinct-set formula") {
    val pairs = Seq(
      ("the quick brown fox jumps", "the quick brown fox runs"),
      ("a b c d e", "a b c d e"),
      ("a b c", "x y z"),
      ("a b", "a b c"), // left has no shingles
      ("", ""),
      ("a a a a a", "a a a a"))
    pairs.foreach { case (x, y) =>
      def set(t: String): Set[String] = {
        val w = t.split(" ", -1)
        (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
      }
      val (sa, sb) = (set(x), set(y))
      val expect =
        if (sa.union(sb).isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
      val got = TextHashes.shingleJaccard(
        UTF8String.fromString(x), UTF8String.fromString(y), 3)
      assert(got == expect, s"jaccard diverges on ('$x','$y'): $got vs $expect")
    }
  }

  test("RepetitionStats kernel equals the declarative words/shingles chain exactly") {
    // same empty-token-keeping tokenization edge cases as ShingleMd5s,
    // plus planted repetition; checked over real corpus docs below too
    val edge = Seq("the quick brown fox jumps over", "a b", "", "x",
      "a b c ", "a b c  ", "a  b c", " a b c", "  ", "a a a a", "a b a b a b")
      .toDF("text")
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select("text")
    for (df <- Seq(edge, corpus)) {
      val ws = graft.functions.Text.words(col("text"))
      val bi = graft.functions.Text.shingles(col("text"), 2)
      df.select(graft.functions.Text.repetitionStats(col("text")).as("r"),
          size(ws).as("nw"), size(array_distinct(ws)).as("ndw"),
          size(bi).as("nb"), size(array_distinct(bi)).as("ndb"))
        .collect().foreach { r =>
          val k = r.getStruct(0)
          assert((k.getInt(0), k.getInt(1), k.getInt(2), k.getInt(3)) ==
            (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)), r.toString)
        }
    }
  }

  test("VectorDot kernel is bit-identical to the declarative fold") {
    val df = Seq((Seq(1.1, -2.2, 3.3, 0.004), Seq(0.5, 1.5, -2.5, 100.0)))
      .toDF("a", "b")
    val r = df.select(
      graft.functions.Vectors.dot(col("a"), col("b")).as("kernel"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("fold"))
      .collect()(0)
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("VectorQuantError kernel is bit-identical to the declarative chain") {
    // [0, 127.5, 255] makes scale exactly 1.0 and (x-vmin)/scale an exact
    // .5 half — where HALF_UP (Spark round) and rint (HALF_EVEN) diverge;
    // plus random float-ish vectors like the embeddings table carries
    val rnd = new scala.util.Random(7)
    val vecs = Seq(
      Seq(0.0, 127.5, 255.0),
      Seq(-1.5, -0.5, 0.5, 1.5),
      Seq(3.25, 3.25, 3.25),          // zero range -> 1e-12 scale floor
      Seq(0.0)) ++
      (1 to 20).map(_ => Seq.fill(64)(rnd.nextFloat().toDouble * 4 - 2))
    val v = col("v")
    val vmin = array_min(v); val vmax = array_max(v)
    val scale = greatest((vmax - vmin) / 255.0, lit(1e-12))
    val err = transform(v, x => abs(round((x - vmin) / scale) * scale + vmin - x))
    val rows = vecs.toDF("v").select(
      graft.functions.Vectors.quantError(v).as("k"),
      struct(vmin.as("vmin"), vmax.as("vmax"),
        array_max(err).as("max_abs_err"),
        (aggregate(err, lit(0.0), (a, x) => a + x) / size(v)).as("mean_abs_err")).as("d"))
      .collect()
    rows.foreach { r =>
      val k = r.getStruct(0); val d = r.getStruct(1)
      (0 until 4).foreach { i =>
        assert(java.lang.Double.doubleToLongBits(k.getDouble(i)) ==
          java.lang.Double.doubleToLongBits(d.getDouble(i)),
          s"field $i: kernel ${k.getDouble(i)} vs declarative ${d.getDouble(i)}")
      }
    }
  }

  test("simhash64 flips few bits for small edits") {
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "the quick brown fox jumps over the lazy cat again and again today")
      .toDF("text").select(expr("simhash64(text)")).collect()
    val d = java.lang.Long.bitCount(rows(0).getLong(0) ^ rows(1).getLong(0))
    assert(d <= 16, s"one-word edit flipped $d bits")
  }

  test("simhash_md5: codegen == kernel, votes == per-word md5 bit recount") {
    val texts = Seq("the quick brown fox jumps", "a b", "", "solo")
    val viaSql = texts.toDF("text")
      .select(expr("simhash_md5(text)").as("h")).collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(viaSql(i).getLong(0) == TextHashes.simHashMd5(UTF8String.fromString(t)))
      // independent recount: majority vote over each word's first 64
      // md5 digest bits (the h1/hc parse the DuckDB mirror spells)
      val words = t.split(" ", -1)
      val counts = new Array[Int](64)
      val md = java.security.MessageDigest.getInstance("MD5")
      words.foreach { wd =>
        val d = md.digest(wd.getBytes("UTF-8"))
        val u1 = (0 until 8).foldLeft(0L)((acc, b) => (acc << 8) | (d(b) & 0xffL))
        (0 until 64).foreach(b =>
          if (((u1 >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1)
      }
      val expect = (0 until 64).foldLeft(0L)((acc, b) =>
        if (counts(b) > 0) acc | (1L << b) else acc)
      assert(viaSql(i).getLong(0) == expect, s"text '$t'")
    }
  }

  test("simhash_md5 flips few bits for small edits") {
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "the quick brown fox jumps over the lazy cat again and again today")
      .toDF("text").select(expr("simhash_md5(text)")).collect()
    val d = java.lang.Long.bitCount(rows(0).getLong(0) ^ rows(1).getLong(0))
    assert(d <= 16, s"one-word edit flipped $d bits")
  }

  test("BroadcastBloomMightContain: no false negatives, join-safe prune") {
    import org.apache.spark.sql.GraftColumnBridge.{column => kcol, expression => kexp}
    val keys = (0L until 1000L).filter(_ % 7 == 0)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(keys.length, 0.01)
    keys.foreach(bf.putLong)
    val bc = spark.sparkContext.broadcast(bf)
    val got = (0L until 1000L).toDF("k")
      .filter(kcol(graft.expressions.BroadcastBloomMightContain(bc, kexp(col("k")))))
      .collect().map(_.getLong(0)).toSet
    // every true member survives (bloom has no false negatives)...
    assert(keys.forall(got.contains), "bloom dropped a true member")
    // ...and the prune is selective (fpp 1% on 857 non-members)
    assert(got.size <= keys.length + 40, s"prune not selective: ${got.size}")
  }

  test("FormatCents kernel == declarative fmtAmount bit-for-bit") {
    import graft.warehouse.Statements
    val cents = Seq(0L, 1L, -1L, 99L, 100L, -100L, 999L, 1000L, 99999L,
      100000L, 123456L, -123456L, 99999999L, 100000000L, 999999999999L,
      -999999999999L, 99999999999L, 12L, -7L) ++
      (0 until 500).map(i => (i * 7919L - 1500000L) * (i % 13 + 1))
    val rows = cents.toDF("sc")
      .select(Statements.fmtAmount(col("sc")).as("k"),
        Statements.fmtAmountDeclarative(col("sc")).as("d"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"kernel ${r.getString(0)} vs declarative ${r.getString(1)}"))
  }

  test("CleanAmount kernel == declarative cleanAmount on edges and corpus") {
    import graft.functions.Financial
    import graft.warehouse.Statements
    val edges = Seq("", " ", "N/A", "junk", "$1,234.50", "$(1,234.50)",
      "(12)", "( 12 )", "12(34)", "+.5", "5.", "-5.5e2", "1e3", "1e",
      ".", "$-", "(-5)", "((5))", "$,,", "0", "  42  ", "4 2", "--5",
      "(", ")", "()", "( )", "12\n", "(12)\n", "(1\n2)", "(12)\r\n",
      "$1,000,000.00", "$999,999,999.99", "(0.00)", "+0", "-0", "1.2.3",
      "\u00a0 5", "INF", "NaN", "1E+10", "1e-2")
    val edgeRows = edges.toDF("raw")
      .select(Financial.cleanAmount(col("raw")).as("k"),
        Financial.cleanAmountDeclarative(col("raw")).as("d"))
      .collect()
    edgeRows.zip(edges).foreach { case (r, e) =>
      val k = if (r.isNullAt(0)) null else r.getDouble(0)
      val d = if (r.isNullAt(1)) null else r.getDouble(1)
      assert((k == null && d == null) ||
        (k != null && d != null &&
          java.lang.Double.doubleToLongBits(k.asInstanceOf[Double]) ==
          java.lang.Double.doubleToLongBits(d.asInstanceOf[Double])),
        s"input '${e.replace("\n", "\\n")}': kernel $k vs declarative $d")
    }
    // Unicode NEL/LS after a numeral: the regex grammar accepts the
    // prefix (Java `$` anchors before a FINAL line terminator) but ANSI
    // cast then THROWS in the declarative chain (cast does not trim
    // chars above 0x20) — the kernel instead parses the anchored prefix,
    // a strict robustness improvement pinned here.
    val quirky = Seq("5\u0085" -> 5.0, "(5)\u2028" -> -5.0)
    quirky.foreach { case (in, want) =>
      val got = Seq(in).toDF("raw")
        .select(Financial.cleanAmount(col("raw")).as("k")).collect()(0)
      assert(!got.isNullAt(0) && got.getDouble(0) == want, s"'$in' -> $got")
    }

    // the whole derived statements corpus (both statement families)
    val corpus = Statements.income(spark, sf).select(col("amount_str"))
      .unionByName(Statements.balance(spark, sf).select(col("amount_str").as("amount_str")))
      .select(Financial.cleanAmount(col("amount_str")).as("k"),
        Financial.cleanAmountDeclarative(col("amount_str")).as("d"))
    assert(corpus.filter(
      (col("k").isNull =!= col("d").isNull) ||
      (col("k").isNotNull && col("k") =!= col("d"))).count() == 0)
  }
}
