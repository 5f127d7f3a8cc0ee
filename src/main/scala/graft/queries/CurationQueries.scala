package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import graft.operators.{Decontaminate, Pack, Pii}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation inventory (SURVEY.md §2): the scrub / filter /
  * layout passes a training-data pipeline runs between raw text and
  * tokenized shards — PII redaction, benchmark decontamination,
  * token-budget sequence packing. Each is oracled bit-exact against
  * DuckDB.
  */
object CurationQueries {

  // ------------------------------------------------------------ pii_scan
  /** PII scan+redact over support-ticket-shaped text. The slim TPC-H
    * customer table carries no contact columns, so the ticket text is
    * DERIVED in-flight from real rows (name, segment, planted
    * email/phone/IP from exact integer arithmetic on the key) — the
    * operator under test is the generic [[Pii]] scan/redact pass; the
    * derivation just gives it ground truth with both hit and miss
    * rows. Per-row regex only: no shuffle, scan-bound at any scale. */
  private def piiScan(s: SparkSession, d: String): DataFrame = {
    val email = when(col("c_custkey") % 3 === 0,
      concat(lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com")))
      .otherwise(lit("none"))
    val phone = when(col("c_custkey") % 5 === 0,
      concat_ws("-",
        lpad((col("c_custkey") * 7 % 800 + 100).cast("string"), 3, "0"),
        lpad((col("c_custkey") * 13 % 1000).cast("string"), 3, "0"),
        lpad((col("c_custkey") * 17 % 10000).cast("string"), 4, "0")))
      .otherwise(lit("n/a"))
    val ip = when(col("c_custkey") % 7 === 0,
      concat_ws(".",
        (col("c_custkey") * 3 % 223 + 1).cast("string"),
        (col("c_custkey") * 5 % 256).cast("string"),
        (col("c_custkey") * 11 % 256).cast("string"),
        (col("c_custkey") * 19 % 254 + 1).cast("string")))
      .otherwise(lit("local"))
    val ticket = concat_ws(" ",
      col("c_name"), lit("of segment"), col("c_mktsegment"),
      lit("wrote: reach me at"), email, lit("or"), phone, lit("from"), ip)
    val base = Tables.customer(s, d)
      .select(col("c_custkey").as("doc_id"), ticket.as("ticket"))
    val counted = Pii.counts(col("ticket")).foldLeft(base) {
      case (df, (n, c)) => df.withColumn(s"n_$n", c)
    }
    counted
      .withColumn("redacted", Pii.redact(col("ticket")))
      .drop("ticket")
      .orderBy(col("doc_id"))
  }

  private val piiScanSql: String = {
    val email = "CASE WHEN c_custkey % 3 = 0 THEN lower(replace(c_name, '#', '.')) || '@example.com' ELSE 'none' END"
    val phone = "CASE WHEN c_custkey % 5 = 0 THEN lpad(CAST(c_custkey * 7 % 800 + 100 AS VARCHAR), 3, '0') || '-' || lpad(CAST(c_custkey * 13 % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(c_custkey * 17 % 10000 AS VARCHAR), 4, '0') ELSE 'n/a' END"
    val ip = "CASE WHEN c_custkey % 7 = 0 THEN CAST(c_custkey * 3 % 223 + 1 AS VARCHAR) || '.' || CAST(c_custkey * 5 % 256 AS VARCHAR) || '.' || CAST(c_custkey * 11 % 256 AS VARCHAR) || '.' || CAST(c_custkey * 19 % 254 + 1 AS VARCHAR) ELSE 'local' END"
    s"""
    WITH t AS (
      SELECT c_custkey AS doc_id,
             c_name || ' of segment ' || c_mktsegment || ' wrote: reach me at ' ||
               ($email) || ' or ' || ($phone) || ' from ' || ($ip) AS ticket
      FROM customer)
    SELECT doc_id,
           ${Pii.countSql("ticket", "email")} AS n_email,
           ${Pii.countSql("ticket", "phone")} AS n_phone,
           ${Pii.countSql("ticket", "ip")} AS n_ip,
           ${Pii.redactSql("ticket")} AS redacted
    FROM t
    ORDER BY doc_id"""
  }

  // ------------------------------------------------------ decontam_ngram
  /** Benchmark decontamination over documents: the held-out "eval
    * set" is the doc_id % 7 == 0 slice, n=5 word-grams (sized to this
    * corpus's token entropy; the GPT-3 rule is 13 on web text). */
  private def decontam(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Decontaminate.overlaps(
      corpus = docs.filter(col("doc_id") % 7 =!= 0),
      bench = docs.filter(col("doc_id") % 7 === 0),
      idCol = "doc_id", textCol = "text", n = 5)
      .orderBy(col("doc_id"))
  }

  private val decontamSql: String =
    Decontaminate.overlapsSql("doc_id", "text", n = 5, benchPred = "doc_id % 7 = 0") +
      "\n    ORDER BY doc_id"

  // -------------------------------------------------------- pack_tokens
  /** Concat-then-split packing of documents into 512-token training
    * sequences, packed independently per source shard. */
  private def packTokens(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    Pack.pack(docs, groupCol = "source", orderCol = "doc_id",
        nTokCol = "n_tokens", budget = 512L)
      .orderBy(col("source"), col("doc_id"))
  }

  private val packTokensSql: String = s"""
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT source, doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off
      FROM t)
    SELECT source, doc_id, n_tokens,
           end_off - n_tokens AS start_off, end_off,
           (end_off - n_tokens) // 512 AS first_bin,
           greatest((end_off - 1) // 512, (end_off - n_tokens) // 512) AS last_bin,
           greatest((end_off - 1) // 512, (end_off - n_tokens) // 512)
             - (end_off - n_tokens) // 512 + 1 AS bins_spanned
    FROM c
    ORDER BY source, doc_id"""

  // --------------------------------------------------------- mix_sample
  /** Deterministic training-mixture sampling: sources keep
    * 2000/3500/5000/6500 bp by source-number mod 4, selected by the
    * cross-engine hash — the mixture is a pure function of
    * (seed, doc_id, rates), stable under retries and repartitioning. */
  private val mixRates: Seq[(String, Int)] =
    (0 until 20).map(i => (s"src$i", 2000 + (i % 4) * 1500))

  private def mixSample(s: SparkSession, d: String): DataFrame =
    graft.operators.Mix.sample(
      Tables.documents(s, d).select("doc_id", "source"),
      idCol = "doc_id", sourceCol = "source",
      rates = mixRates, seed = "mix-v1")
      .orderBy(col("doc_id"))

  private val mixSampleSql: String = {
    val (rate, bucket) = graft.operators.Mix.sampleSql(
      "doc_id", "source", mixRates, "mix-v1")
    s"""
    WITH t AS (
      SELECT doc_id, source, $rate AS rate_bp, $bucket AS bucket
      FROM documents)
    SELECT doc_id, source, rate_bp,
           10000.0 / CAST(rate_bp AS DOUBLE) AS weight
    FROM t WHERE bucket < rate_bp
    ORDER BY doc_id"""
  }

  val defs: Map[String, QueryDef] = Map(
    "pii_scan"       -> QueryDef(piiScan _, piiScanSql),
    "mix_sample"     -> QueryDef(mixSample _, mixSampleSql),
    "decontam_ngram" -> QueryDef(decontam _, decontamSql),
    "pack_tokens"    -> QueryDef(packTokens _, packTokensSql),
  )
}
