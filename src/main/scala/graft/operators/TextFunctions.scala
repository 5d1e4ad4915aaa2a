package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines:
  * tokenization, shingling, n-gram language ID, quality scoring, token
  * counting, and document fingerprinting. All pure built-in expressions —
  * codegen'd, no UDFs, so they stay inside whole-stage codegen on the
  * 100 TB scan path.
  */
object TextFunctions {

  /** Whitespace tokens of the lower-cased, trimmed text.
    * QUIRK, kept deliberately: empty/whitespace-only text yields [""]
    * (size 1, not 0) — DuckDB's `string_split_regex` does the same, and
    * every oracle is written against that shared behavior; "fixing" one
    * side alone would hash-break dozens of queries. Callers that need
    * true emptiness filter `length(t) > 0` (see Bpe.wordCounts). */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-gram shingles (space-joined). Empty array when there are fewer
    * than `n` tokens (the guard matters: Spark `sequence(0, -1)` would
    * produce a descending sequence, not an empty one). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*)))

  /** Deterministic 60-bit token hash: first 15 hex chars of md5, base-16 →
    * long. Stays positive (< 2^60), portable across engines. */
  def tokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** BPE-ish regex token count: alnum runs (a cheap proxy for subword
    * units) counted alongside whitespace tokens. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+"), lit(0)))

  /** Quality heuristics: mean word length, non-alnum (punct) ratio,
    * stopword ratio — the length/punct/stopword trio the reference-scale
    * data pipelines gate on. */
  def meanWordLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks)

  /** Unicode-aware: letters/digits in ANY script plus whitespace count
    * as signal (the ASCII-only class banded clean CJK/accented text as
    * pure punctuation); `\p{L}\p{N}` is supported by Java regex and
    * DuckDB's RE2 alike, and the x2 oracle mirrors this class. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[\\p{L}\\p{N}\\s]", "")).cast("double") /
      length(text)

  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
      .cast("double") / size(toks)

  /** Quality band from the heuristics (analogous to F5's significance
    * banding — a when-chain with NULL propagation). */
  def qualityBand(nTokens: Column, punct: Column, stop: Column): Column =
    when(nTokens.isNull, lit(null: String))
      .when(nTokens < 5, "too_short")
      .when(punct > 0.3, "too_noisy")
      .when(stop < 0.01, "low_signal")
      .otherwise("ok")

  /** PII scrubbing — the redaction pass of a training-data cleaning
    * pipeline. Deliberately simple patterns that mean the same thing in
    * Java regex (Spark) and RE2 (DuckDB/engines without backtracking):
    * no backreferences, no lookaround. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  /** Trailing \b stops a match ending mid-digit-run (a 16-digit card
    * number no longer loses its first 10 digits to "<PHONE>"); RE2 (the
    * oracle's engine) has no lookarounds, so a LEADING guard that does
    * not consume a character is not portably expressible — long digit
    * runs can still match a suffix. Documented trade, not defended. */
  val PhoneRe = "(?:\\+?[0-9]{1,3}[-. ]?)?\\(?[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Replace emails / phone numbers / IPv4 literals with typed placeholder
    * tokens. Order matters: emails first (their local part can contain
    * digits a phone pattern would chew up). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** How many PII matches the scrub would replace (for audit columns). */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(text, lit(Ipv4Re), lit(0))) +
      size(regexp_extract_all(regexp_replace(
          regexp_replace(text, EmailRe, " "), Ipv4Re, " "),
        lit(PhoneRe), lit(0)))

  /** Content-defined fingerprints: md5 of the first `k` tokens (prefix
    * fingerprint) and the minimum shingle hash (winnowing-style rolling
    * fingerprint — robust to suffix edits). */
  def prefixFingerprint(toks: Column, k: Int): Column =
    md5(concat_ws(" ", slice(toks, 1, k)))

  def minShingleFingerprint(toks: Column, n: Int): Column =
    array_min(transform(shingles(toks, n), s => md5(s)))
}
