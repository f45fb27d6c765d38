package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the scrubbing pass
  * a training-corpus pipeline runs before anything else sees the data.
  *
  * Pattern choices are deliberately RE2-compatible (no lookaround, no
  * backreferences, explicit character classes instead of `\S`): Java's
  * regex engine (Spark) and RE2 (DuckDB, and the regex engine most
  * native scan layers embed) then agree character-for-character, which
  * is what lets the whole operator run under the exact DuckDB oracle.
  *
  * Semantics: replacement is SEQUENTIAL in [[Patterns]] order, and the
  * per-category counts describe what the chain actually replaced. On
  * typical text the categories don't overlap (URLs can't contain `@`
  * with this class, phones require a leading `+`, IPs have no `+`) and
  * order is irrelevant; on adversarial soup an earlier category can
  * consume characters a later one would have matched (an email local
  * part may swallow `+628...` digits) — the counts then faithfully
  * follow the chain, not four independent scans of the raw text
  * (fuzz-pinned against a stagewise regexp_count reference).
  *
  * Scale shape: pure per-row `regexp_replace`/`regexp_count` chains —
  * whole-stage-codegen'd, no shuffle, no UDF; the 100 TB plan is
  * scan → project.
  *
  * Reference analog: none — LLM-pipeline extension per the brief.
  */
object Redaction {

  /** (category, pattern, replacement token), applied in order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("url",   "https?://[A-Za-z0-9./_%#?=&-]+",                        "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",      "<EMAIL>"),
    ("ip",    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",      "<IP>"),
    ("phone", "\\+\\d{7,15}",                                          "<PHONE>"))

  /** All categories replaced by their tokens, in [[Patterns]] order. */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (acc, (_, pat, tok)) =>
      regexp_replace(acc, pat, tok)
    }

  /** Occurrences of literal `tok` in `c` via the exact
    * length-difference trick — a literal scan, no regex.
    */
  private def tokenCount(c: Column, tok: String): Column =
    ((length(c) - length(replace(c, lit(tok), lit("")))) /
      lit(tok.length)).cast("long")

  /** Per-category match counts (BIGINT) + the redacted text, one row
    * per input row: `doc_id, n_url, n_email, n_ip, n_phone, redacted`.
    *
    * Counts are derived from the redacted OUTPUT — occurrences of each
    * replacement token, minus occurrences already present in the RAW
    * text — rather than four extra `regexp_count` scans over the
    * input. That halves the regex passes per row from 8 to 4 (the
    * correction adds only literal replace/length scans, far cheaper
    * than regex). The subtraction makes the count EXACT for arbitrary
    * input, not a contract:
    *
    *  - none of the four patterns can match `<` or `>` (every
    *    character class excludes them), so a literal token string
    *    already in the raw text (`"<URL>"` etc.) always survives
    *    redaction untouched — it is subtracted off exactly;
    *  - no token occurrence can be COMPOSED across a replacement
    *    boundary: a token contains `<` only at position 0, so an
    *    occurrence overlapping an inserted replacement must start
    *    exactly where the replacement starts, and the four tokens are
    *    mutually non-prefix — the occurrence IS that replacement.
    *
    * Hence tokens(redacted) = true matches + pre-existing tokens,
    * exactly, and the difference is the true match count.
    */
  def piiScrub(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame = {
    val counts = Patterns.map { case (cat, _, tok) =>
      (tokenCount(col("redacted"), tok) - tokenCount(col("__raw"), tok))
        .as(s"n_$cat")
    }
    val keys = col(idCol) +: carryCols.map(col)
    docs.select(keys ++ Seq(col(textCol).as("__raw"),
        redact(col(textCol)).as("redacted")): _*)
      .select(keys ++ counts :+ col("redacted"): _*)
  }

  /** Deterministic synthetic-PII injector for the test tables (the
    * synthetic corpus contains no real PII to scrub): appends an email
    * / URL / IP / phone to a doc_id-keyed subset. Replayed verbatim in
    * the oracle SQL so both engines scrub identical input.
    */
  def withFakePii(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      concat(col("text"), fakePiiSuffix(col("doc_id"))))

  /** The injector's suffix as a COLUMN over the id — for callers
    * that need the injected form row-locally inside a wider
    * projection (curation_attributes' single-scan pii flag) without
    * the DataFrame-level rewrite.
    */
  def fakePiiSuffix(docId: Column): Column = concat(
    when(docId % 3 === 0,
      concat(lit(" contact user"), docId, lit("@example.com")))
      .otherwise(lit("")),
    when(docId % 5 === 0,
      concat(lit(" see https://example.org/d/"), docId))
      .otherwise(lit("")),
    when(docId % 7 === 0,
      concat(lit(" from 10."), docId % 256, lit(".0."), docId % 100))
      .otherwise(lit("")),
    when(docId % 11 === 0,
      concat(lit(" call +62"), docId + 1000000))
      .otherwise(lit("")))
}
