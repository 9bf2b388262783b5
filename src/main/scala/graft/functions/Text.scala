package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline operators —
  * all pure `Column` expressions (codegen'd, no UDFs: at 100 TB these
  * fuse with the parquet scan and shuffle nothing).
  *
  * Cross-engine parity notes (the DuckDB oracle mirrors each):
  * counting is done with `regexp_extract_all`/length-difference tricks
  * that behave identically in Java regex and RE2; hashes are md5 (same
  * hex in every engine); ratios divide identical integers so the IEEE
  * result is bit-identical without rounding.
  */
object Text {

  /** Words = single-space tokens (the test corpus is single-spaced;
    * normalize() first for arbitrary whitespace). */
  def words(c: Column): Column = split(c, " ")

  /** Count of non-space runs (robust to leading/multiple spaces). */
  def nWords(c: Column): Column = size(regexp_extract_all(c, lit("[^ ]+"), lit(0)))

  /** Count of tokens under a BPE-ish pre-tokenizer: letter runs, digit
    * runs, or single non-alphanumeric marks. */
  def nBpeTokens(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))

  /** Count of characters outside [a-zA-Z0-9 ]: stripping the alphanumeric/
    * space class leaves exactly the punctuation, so its length IS the count. */
  def nPunct(c: Column): Column =
    length(regexp_replace(c, "[a-zA-Z0-9 ]", ""))

  /** How many words of `c` are in the given stopword list. */
  def stopwordCount(c: Column, stops: Seq[String]): Column =
    size(filter(words(c), w => w.isInCollection(stops)))

  /** Distinct-word count. */
  def nUniqueWords(c: Column): Column = size(array_distinct(words(c)))

  /** Whitespace-collapsed, lowercased, trimmed normal form. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** md5 content fingerprint of the normal form. */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Word k-shingles ("a b c" 3-grams); empty array when under k words. */
  def shingles(c: Column, k: Int): Column = {
    val ws = words(c)
    when(size(ws) >= k,
      transform(sequence(lit(0), size(ws) - k),
        i => concat_ws(" ", (1 to k).map(j => element_at(ws, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** md5 of every shingle — the rolling-hash fingerprint set. Native
    * compiled kernel; produces the identical md5-hex strings as
    * `transform(shingles(c,k), md5)` (and as the DuckDB oracles), just
    * without the interpreted lambda chain. */
  def shingleHashes(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.ShingleMd5s(
      GraftColumnBridge.expression(c), k))
  }

  /** 16-hex md5 PREFIX of every shingle — the transport form (r13):
    * 64-bit-equivalent for set arithmetic, half the bytes of the full
    * digest through every stage/shuffle, and still oracle-exact
    * (DuckDB: substr(md5(x), 1, 16)). Use this wherever the hash array
    * is STAGED or SHUFFLED and the hex never reaches output. */
  def shingleHashes16(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.ShingleMd5Prefixes(
      GraftColumnBridge.expression(c), k))
  }

  /** 60-bit md5 prefix of every shingle as a LONG — the fixed-width
    * transport form (8 B/element, binary sorts/merges) for array-heavy
    * set arithmetic; DuckDB parses the identical value as
    * CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT). */
  def shingleHashes60(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.ShingleMd5Long60s(
      GraftColumnBridge.expression(c), k))
  }

  /** One-pass winnowing profile struct (n, nw, n_selected, sel_min,
    * sel_max, fps) over the word-k-shingle md5s — native kernel twin of
    * the per-window transform/aggregate argmin chain (rightmost-tie,
    * bit-identical selections; TextSpec re-simulates the paper's
    * algorithm against it). */
  def winnowStats(c: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.WinnowStats(
      GraftColumnBridge.expression(c), k, w))
  }

  /** One-pass repetition stats struct (n_words, n_distinct_words,
    * n_bigrams, n_distinct_bigrams) — native kernel twin of the
    * words/shingles(2) array chain (pinned in ExpressionsSpec). */
  def repetitionStats(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.RepetitionStats(
      GraftColumnBridge.expression(c)))
  }

  /** Stopword lists for the language-ID heuristic (es/fr share 'la' —
    * the scoring tie-break is deterministic and mirrored in the oracle). */
  val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"),
    "fr" -> Seq("le", "la", "les", "un", "une", "et", "est"))
}
