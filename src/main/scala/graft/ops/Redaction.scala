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
  * The four categories are pairwise disjoint by construction (URLs
  * can't contain `@` with this class, phones require a leading `+`,
  * IPs have no `+`), so redaction order cannot change the result —
  * it is still applied in one fixed order for determinism.
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

  /** Per-category match counts (BIGINT) + the redacted text, one row
    * per input row: `doc_id, n_url, n_email, n_ip, n_phone, redacted`.
    *
    * Counts are derived from the redacted OUTPUT — occurrences of each
    * replacement token via the exact length-difference trick — rather
    * than four extra `regexp_count` scans over the input. That halves
    * the regex passes per row from 8 to 4; because the categories are
    * pairwise disjoint (see [[Patterns]]) the token count equals the
    * match count whenever the raw text doesn't already contain a
    * literal token string (`"<URL>"` etc.) — the documented contract.
    */
  def piiScrub(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val counts = Patterns.map { case (cat, _, tok) =>
      ((length(col("redacted")) -
        length(replace(col("redacted"), lit(tok), lit("")))) /
        lit(tok.length)).cast("long").as(s"n_$cat")
    }
    docs.select(col(idCol), redact(col(textCol)).as("redacted"))
      .select((col(idCol) +: counts) :+ col("redacted"): _*)
  }

  /** Deterministic synthetic-PII injector for the test tables (the
    * synthetic corpus contains no real PII to scrub): appends an email
    * / URL / IP / phone to a doc_id-keyed subset. Replayed verbatim in
    * the oracle SQL so both engines scrub identical input.
    */
  def withFakePii(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" see https://example.org/d/"), col("doc_id")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" from 10."), col("doc_id") % 256, lit(".0."),
          col("doc_id") % 100))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call +62"), col("doc_id") + 1000000))
        .otherwise(lit(""))))
}
