package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the AS MATERIALIZED oracle rewrite (SparkEntry.materializeCtes)
  * on every context the gate's SQL corpus can contain — the rewrite is
  * pure string→string, so these run without a SparkSession. The DuckDB
  * side (every rewritten oracle still parses/binds) is gated by
  * `dev/check.py --explain`; this spec kills the regression classes the
  * r10 advisory named: multi-window clauses, lowercase heads, and the
  * substring-RECURSIVE over-skip. */
class OracleSqlSpec extends AnyFunSuite {

  private def rw(s: String) = SparkEntry.materializeCtes(s)

  test("plain CTE head is materialized") {
    assert(rw("WITH e AS (SELECT 1) SELECT * FROM e")
      == "WITH e AS MATERIALIZED (SELECT 1) SELECT * FROM e")
  }

  test("lowercase head is materialized too (no silent skip)") {
    assert(rw("with e as (select 1) select * from e")
      == "with e as MATERIALIZED (select 1) select * from e")
  }

  test("every window in a multi-window clause is skipped, CTEs around it still rewritten") {
    val sql = "WITH e AS (SELECT x, y FROM t) " +
      "SELECT sum(x) OVER a, sum(y) OVER b FROM e " +
      "WINDOW a AS (PARTITION BY x ORDER BY y), b AS (ORDER BY y) ORDER BY 1"
    val out = rw(sql)
    assert(out.contains("WITH e AS MATERIALIZED (SELECT"))
    assert(out.contains("WINDOW a AS (PARTITION BY x ORDER BY y), b AS (ORDER BY y)"),
      s"window clause must be untouched, got: $out")
  }

  test("nested parens inside a window spec don't derail the clause scan") {
    val sql = "SELECT sum(x) OVER w FROM t " +
      "WINDOW w AS (PARTITION BY coalesce(a, (b + c)) ORDER BY d), v AS (ORDER BY d)"
    assert(rw(sql) == sql)
  }

  test("WITH RECURSIVE statements are left entirely alone") {
    val sql = "WITH RECURSIVE r AS (SELECT 1 UNION ALL SELECT n+1 FROM r), " +
      "e AS (SELECT 2) SELECT * FROM r, e"
    assert(rw(sql) == sql)
  }

  test("an identifier merely containing 'recursive' no longer disables materialization") {
    val sql = "WITH e AS (SELECT 1 AS non_recursive_ct) SELECT * FROM e"
    assert(rw(sql) == "WITH e AS MATERIALIZED (SELECT 1 AS non_recursive_ct) SELECT * FROM e")
  }

  test("string literals are never rewritten") {
    val sql = "WITH e AS (SELECT 'x AS (' AS s, 'it''s AS (' AS t) SELECT * FROM e"
    val out = rw(sql)
    assert(out.contains("'x AS ('") && out.contains("'it''s AS ('"))
    assert(out.startsWith("WITH e AS MATERIALIZED (SELECT"))
  }

  test("an apostrophe inside a -- comment can't open a phantom string that swallows CTE heads") {
    val sql = "WITH a AS (SELECT 1), -- members' sums\n" +
      "b AS (SELECT 2) SELECT * FROM a, b"
    val out = rw(sql)
    assert(out.contains("a AS MATERIALIZED (") && out.contains("b AS MATERIALIZED ("),
      s"both heads must rewrite despite the comment apostrophe: $out")
  }

  test("block comments are quiet spans: a 'x AS (' inside /* */ is not rewritten") {
    val sql = "WITH a AS (SELECT 1), /* not a head: x AS ( — and (unbalanced */\n" +
      "b AS (SELECT 2) SELECT * FROM a, b"
    val out = rw(sql)
    assert(out.contains("a AS MATERIALIZED (") && out.contains("b AS MATERIALIZED ("))
    assert(out.contains("/* not a head: x AS ( — and (unbalanced */"),
      s"block comment text must be untouched: $out")
  }

  test("nested block comments close at the OUTER terminator (the DuckDB/Postgres rule)") {
    val sql = "WITH a AS (SELECT 1) /* outer /* inner */ still comment: x AS ( */ SELECT * FROM a"
    val out = rw(sql)
    assert(out.contains("a AS MATERIALIZED ("))
    assert(out.contains("still comment: x AS ( */"), s"nested comment mishandled: $out")
  }

  test("double-quoted identifiers are quiet spans, heads around them still rewritten") {
    val sql = "WITH e AS (SELECT 1 AS \"odd AS (name\") SELECT \"odd AS (name\" FROM e"
    val out = rw(sql)
    assert(out.startsWith("WITH e AS MATERIALIZED (SELECT"))
    assert(out.contains("\"odd AS (name\""), s"quoted identifier rewritten: $out")
  }

  test("a '(' inside a string literal in a window spec can't desynchronize the clause span") {
    val sql = "SELECT sum(x) OVER w FROM t " +
      "WINDOW w AS (PARTITION BY nullif(s, '(') ORDER BY d) " +
      "UNION ALL SELECT 1 FROM (WITH g AS (SELECT 2) SELECT * FROM g) q"
    val out = rw(sql)
    assert(out.contains("WINDOW w AS (PARTITION BY nullif(s, '(') ORDER BY d)"),
      s"window spec must be untouched: $out")
    assert(out.contains("g AS MATERIALIZED (SELECT 2)"),
      s"the CTE after the literal-bearing window must still rewrite: $out")
  }

  test("rewrite is idempotent (AS MATERIALIZED heads don't re-match)") {
    val once = rw("WITH e AS (SELECT 1), f AS (SELECT 2) SELECT * FROM e, f")
    assert(rw(once) == once)
    assert(once == "WITH e AS MATERIALIZED (SELECT 1), f AS MATERIALIZED (SELECT 2) SELECT * FROM e, f")
  }

  test("whole registry: rewritten oracles preserve paren balance and never touch WINDOW heads") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // strip -- comments then string literals — prose parens/quotes
      // are legitimate. '[^']*' scans escaped '' as two adjacent
      // literals — fine for counting, and linear (the alternation form
      // stack-overflows on long SQL)
      val code = sql.replaceAll("--[^\n]*", "").replaceAll("'[^']*'", "''")
      assert(code.count(_ == '(') == code.count(_ == ')'),
        s"$name: unbalanced parens after rewrite")
      // no rewritten oracle may contain a WINDOW clause whose head got
      // corrupted to AS MATERIALIZED — the exact r10 advisory failure
      val badWindow = """(?i)\bWINDOW\s+\w+\s+AS\s+MATERIALIZED""".r
      assert(badWindow.findFirstIn(sql).isEmpty,
        s"$name: WINDOW head corrupted by materialization")
      // match the actual clause with the rewriter's own pattern — a
      // lowercase `with recursive` must be caught, and a comment merely
      // mentioning RECURSIVE must not fail a materialized oracle
      val recursiveWith = """(?i)\bWITH\s+RECURSIVE\b""".r
      assert(!(recursiveWith.findFirstIn(sql).nonEmpty && sql.contains("MATERIALIZED")),
        s"$name: WITH RECURSIVE statement must not carry a materialization hint")
    }
  }
}
