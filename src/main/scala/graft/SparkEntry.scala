package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's end-to-end warehouse build. */
  def entry(spark: SparkSession): DataFrame =
    queries("fin_warehouse_build")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TpchExtra.queries ++ Analytics.queries ++
      graft.warehouse.Warehouse.queries ++
      TextAnalysis.queries ++ TextStats.queries ++ TrainPrep.queries ++
      Bpe.queries ++ Dedup.queries ++ Ann.queries ++ Graph.queries ++
      Layout.queries ++
      graft.streaming.EventStreams.queries ++ Multimodal.queries

  /** Rewrite every CTE head `name AS (` to `name AS MATERIALIZED (`.
    * DuckDB inlines CTEs by default, so a CTE referenced k times is
    * re-derived k times — the composed ANN mirrors (index-build chains
    * referenced by assignment, LUT, and re-rank steps) went
    * combinatorial: ann_ivfpq_topk alone ran 724 s at sf0.01 inlined vs
    * 1.0 s materialized, identical rows. MATERIALIZED is purely an
    * execution-strategy hint — results are unchanged — and applying it
    * uniformly keeps the correctness gate's DuckDB cost bounded by the
    * SUM of CTE costs instead of their reference products.
    * Exclusions: named-window clauses (`WINDOW a AS (…), b AS (…)` —
    * not CTEs; the scanner walks the full comma-separated clause, so
    * EVERY window head is skipped, not just the first), single-quoted
    * string literals, and statements using WITH RECURSIVE (DuckDB
    * restricts CTE hints inside WITH RECURSIVE; the three
    * star-contraction queries run ~1.7 s inlined, nothing to win —
    * matched as the `WITH RECURSIVE` clause, so a mere identifier
    * containing "recursive" no longer disables materialization).
    * Heads are matched case-insensitively (`as (` rewrites too).
    * Sibling-scope duplicate CTE names (the recall report's six
    * embedded legs each define `e`/`un`) materialize fine; what does
    * NOT is an outer CTE shadowed by an inner WITH of the same name —
    * composed fragments therefore prefix their CTE names
    * (ngramDupsCtes' `ngd_w`), and both OracleSqlSpec (every rewritten
    * oracle re-parses) and dev/check.py catch any reintroduction as a
    * binder error. */
  private[graft] def materializeCtes(sql: String): String =
    if (RecursiveWith.matcher(sql).find()) sql
    else {
      val quiet = literalAndCommentSpans(sql)
      val skip = windowClauseSpans(sql, quiet) ++ quiet
      val m = CteHead.matcher(sql)
      val sb = new java.lang.StringBuilder
      var last = 0
      while (m.find()) {
        val inSkipped = skip.exists(s => m.start >= s._1 && m.start < s._2)
        sb.append(sql, last, if (inSkipped) m.end else m.end - 1)
        if (!inSkipped) sb.append("MATERIALIZED (")
        last = m.end
      }
      sb.append(sql, last, sql.length).toString
    }

  private val RecursiveWith =
    java.util.regex.Pattern.compile("""(?i)\bWITH\s+RECURSIVE\b""")
  /** `name AS (` with arbitrary case/whitespace — a CTE head anywhere
    * outside the skipped spans. `AS\s*\(` cannot match an existing
    * `AS MATERIALIZED (`, so the rewrite is idempotent. */
  private val CteHead =
    java.util.regex.Pattern.compile("""(?i)\b(\w+)\s+AS\s*\(""")
  private val WindowKw =
    java.util.regex.Pattern.compile("""(?i)\bWINDOW\s+""")
  private val WindowItem =
    java.util.regex.Pattern.compile("""(?i)(\w+)\s+AS\s*\(""")

  /** Character spans of every named-window clause: from the WINDOW
    * keyword through its LAST comma-separated `name AS (spec)` item —
    * the one SQL context where `name AS (` is not a CTE head. A WINDOW
    * keyword inside a literal/comment span (`quiet`) is prose, not a
    * clause — skipped so it can't swallow following code. */
  private def windowClauseSpans(sql: String, quiet: Seq[(Int, Int)]): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    val kw = WindowKw.matcher(sql)
    while (kw.find()) if (!quiet.exists(s => kw.start >= s._1 && kw.start < s._2)) {
      var pos = kw.end
      var done = false
      while (!done) {
        val im = WindowItem.matcher(sql)
        im.region(pos, sql.length)
        if (im.lookingAt()) {
          var depth = 1
          var i = im.end // just past the '('
          // quiet spans are sorted and i only moves right, so a monotone
          // cursor replaces the per-character linear find (the find made
          // this scan O(len x span-count) on literal-heavy mirrors)
          var qi = 0
          while (depth > 0 && i < sql.length) {
            // parens inside literals/comments are prose — a '(' in a
            // quoted string inside the spec must not desynchronize the
            // clause span (it would let a following CTE head be
            // swallowed into the window span and never materialized)
            while (qi < quiet.length && quiet(qi)._2 <= i) qi += 1
            if (qi < quiet.length && i >= quiet(qi)._1 && i < quiet(qi)._2)
              i = quiet(qi)._2
            else {
              sql.charAt(i) match {
                case '(' => depth += 1
                case ')' => depth -= 1
                case _   =>
              }
              i += 1
            }
          }
          pos = i
          // a comma continues the window list; anything else ends it
          while (pos < sql.length && sql.charAt(pos).isWhitespace) pos += 1
          if (pos < sql.length && sql.charAt(pos) == ',') { pos += 1
            while (pos < sql.length && sql.charAt(pos).isWhitespace) pos += 1
          } else done = true
        } else done = true
      }
      if (pos > kw.end) spans += ((kw.start, pos))
    }
    spans.result()
  }

  /** Spans of single-quoted SQL string literals ('' = escaped quote),
    * double-quoted identifiers ("" = escaped quote), `--` line comments,
    * and `/* */` block comments (nested, the PostgreSQL/DuckDB rule), in
    * one comment-aware pass — literal/identifier text is never
    * rewritten, and an apostrophe INSIDE a comment (the mirrors' prose,
    * e.g. "members' sums") cannot open a phantom string that would
    * swallow real CTE heads. A `--` inside a string likewise does not
    * start a comment. */
  private def literalAndCommentSpans(sql: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '"') {
        val start = i
        i += 1
        var closed = false
        while (!closed && i < sql.length) {
          if (sql.charAt(i) == '"') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '"') i += 2
            else { closed = true; i += 1 }
          } else i += 1
        }
        spans += ((start, i))
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        val start = i
        i += 2
        var depth = 1
        while (depth > 0 && i < sql.length) {
          if (sql.charAt(i) == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
            depth += 1; i += 2
          } else if (sql.charAt(i) == '*' && i + 1 < sql.length && sql.charAt(i + 1) == '/') {
            depth -= 1; i += 2
          } else i += 1
        }
        spans += ((start, i))
      } else if (c == '\'') {
        val start = i
        i += 1
        var closed = false
        while (!closed && i < sql.length) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 2
            else { closed = true; i += 1 }
          } else i += 1
        }
        spans += ((start, i))
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        val start = i
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
        spans += ((start, i))
      } else i += 1
    }
    spans.result()
  }

  /** DuckDB-runnable equivalents over the same parquet tables. Keys absent
    * here get the driver's weaker rows-only check (see SURVEY.md §2). */
  def oracleSql: Map[String, String] =
    (Relational.oracles ++ TpchExtra.oracles ++ Analytics.oracles ++
      graft.warehouse.Warehouse.oracles ++
      TextAnalysis.oracles ++ TextStats.oracles ++ TrainPrep.oracles ++
      Bpe.oracles ++ Dedup.oracles ++ Ann.oracles ++ Graph.oracles ++
      Layout.oracles ++
      graft.streaming.EventStreams.oracles ++ Multimodal.oracles)
      // r14: every registered query carries an oracle — mm_features, the
      // last rows-only holdout, joined via the 60-bit md5 checksum stub
      .map { case (k, v) => k -> materializeCtes(v) }
}
