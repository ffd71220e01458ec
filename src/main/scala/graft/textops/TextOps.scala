package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text operators.
  *
  * All operators are pure Catalyst column expressions (no UDFs), so they stay
  * inside whole-stage codegen and are expressible 1:1 in the DuckDB oracle
  * SQL. Semantics mirror the reference implementation:
  *   - tokenizer: /root/reference/src/beyond_vector_search/text.py:8-17
  *   - char n-grams: /root/reference/src/beyond_vector_search/retrievers.py:33-44
  *   - sentence join: /root/reference/src/beyond_vector_search/text.py:44-49
  *   - EM normalization: /root/reference/src/beyond_vector_search/evaluator.py:23-28
  */
object TextOps {

  /** Token regex: keeps hyphen/underscore-joined tokens ("inc-49217",
    * "user_id"), strips other punctuation. Applied to lowercased input —
    * equivalent to the reference's match-[A-Za-z0-9]-then-lowercase for
    * ASCII text (all bundled/test corpora). Unicode edge cases diverge:
    * e.g. lower('İ') introduces an ASCII 'i', and Java's \s is ASCII-only
    * vs Python's Unicode \s in the whitespace ops below.
    */
  val TokenRegex = "[a-z0-9]+(?:[-_][a-z0-9]+)*"

  /** Java's ASCII \s — the class [ \t\n\x0B\f\r] — written out explicitly
    * (ADVICE r7): RE2, the oracle's regex engine, excludes vertical tab
    * U+000B from its \s, so a bare \s in paired Spark/DuckDB patterns
    * silently diverges on any document containing one. Interpolating this
    * literal class into BOTH engines keeps them aligned while preserving
    * the Java semantics the reference-parity contract pins. `WsChars` is
    * the bare character list for embedding in negated classes. */
  val WsChars = """ \t\n\r\f\x0B"""
  val WsClass = s"[$WsChars]"

  /** Lowercase tokenization → array<string>. */
  def tokenize(c: Column): Column =
    regexp_extract_all(lower(c), lit(TokenRegex), lit(0))

  /** Whitespace strip on both ends (unlike `trim`, strips all \s). */
  def strip(c: Column): Column =
    regexp_replace(c, s"^$WsClass+|$WsClass+$$", "")

  /** Lowercase + collapse internal whitespace to single spaces + strip.
    * Matches `_WS_RE.sub(" ", text.lower()).strip()`. */
  def wsNormalize(c: Column): Column =
    strip(regexp_replace(lower(c), s"$WsClass+", " "))

  /** Case/whitespace-insensitive exact-match key:
    * `" ".join(s.lower().split())`. */
  def emKey(c: Column): Column =
    regexp_replace(strip(lower(c)), s"$WsClass+", " ")

  /** Any ASCII digit present. */
  def hasDigits(c: Column): Column = c.rlike("[0-9]")

  /** Sliding character n-grams over the whitespace-normalized, lowercased
    * string; the whole string when shorter than n; empty array for empty
    * input. Pure `transform(sequence(...))` so the same formulation runs in
    * the SQL oracle.
    */
  def charNgrams(c: Column, n: Int): Column = {
    val s = wsNormalize(c)
    when(length(s) === 0, array().cast("array<string>"))
      .when(length(s) < n, array(s))
      .otherwise(
        transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
  }

  /** First `maxSentences` non-empty sentences joined with ". ", with a
    * guaranteed trailing terminator. Sentence boundary = [.!?] followed by
    * whitespace (the terminator is consumed by the split).
    */
  def joinTopSentences(c: Column, maxSentences: Int = 2): Column = {
    val parts = filter(
      transform(split(c, s"[.!?]$WsClass+"), p => strip(p)),
      p => length(p) > 0)
    val joined = strip(array_join(slice(parts, 1, maxSentences), ". "))
    when(size(parts) === 0, lit(""))
      .when(joined.rlike("[.!?]$"), joined)
      .otherwise(concat(joined, lit(".")))
  }
}
