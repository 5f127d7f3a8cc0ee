package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass a training-data
  * pipeline runs before text leaves curation (the reference corpus is
  * uploaded user documents, exactly the place emails/phones/IPs leak;
  * cf. reference ingestion at Function.java:92-135 which stores raw
  * extracted text with no scrubbing).
  *
  * Pure per-row regex work: no shuffle, linear in corpus size, stays
  * inside whole-stage codegen (regexp_count / regexp_replace are
  * native expressions). At 100 TB this is the ideal operator shape —
  * embarrassingly parallel, scan-bound.
  *
  * Cross-engine contract: patterns use only the Java∩RE2 common
  * subset (character classes, bounded quantifiers, alternation — no
  * lookaround, no backreferences), so Spark's java.util.regex and
  * DuckDB's RE2 find identical non-overlapping left-to-right match
  * sets. Redaction applies patterns in [[types]] order; counts are
  * each taken on the ORIGINAL text (overlapping hits of different
  * types would each count — callers wanting post-redaction residue
  * should re-scan the redacted column).
  */
object Pii {

  /** (name, pattern, replacement token), applied in order.
    *
    * Boundary guards: `\b` (ASCII word boundary, supported identically
    * by java.util.regex and RE2) keeps the phone pattern from matching
    * inside longer digit-dash runs and the IP pattern from starting or
    * ending mid-number; IP octets are constrained to 0-255. A dotted
    * run like "1.2.3.4.5" still yields a leading-prefix match ("5" is
    * a valid octet boundary) — excluding it would need lookaround,
    * which RE2 lacks, so that residue is accepted for the cross-engine
    * contract. */
  private val Octet = "(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
  val types: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}\\b", "<EMAIL>"),
    ("phone", "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
    ("ip", s"\\b$Octet\\.$Octet\\.$Octet\\.$Octet\\b", "<IP>"),
  )

  /** Per-type match counts over the raw text, as (name → count). */
  def counts(text: Column): Seq[(String, Column)] =
    types.map { case (n, re, _) =>
      n -> regexp_count(text, lit(re)).cast("long")
    }

  /** Text with every PII span replaced by its type token. */
  def redact(text: Column): Column =
    types.foldLeft(text) { case (c, (_, re, tok)) => regexp_replace(c, re, tok) }

  // ------------------------------------------------------ DuckDB twins

  def countSql(col: String, typeName: String): String = {
    val re = types.find(_._1 == typeName).get._2
    s"CAST(len(regexp_extract_all($col, '$re')) AS BIGINT)"
  }

  /** DuckDB redaction twin — note the 'g' flag: DuckDB's
    * regexp_replace is first-match-only by default, Spark's is global. */
  def redactSql(col: String): String =
    types.foldLeft(col) { case (c, (_, re, tok)) =>
      s"regexp_replace($c, '$re', '$tok', 'g')"
    }
}
