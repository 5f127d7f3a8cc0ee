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

  /** Documents with the scan repartitioned UP to the session
    * parallelism (r10, the Lloyd-fix discipline) — used by the
    * entries whose corpus map stage tokenizes/shingles the text
    * (decontam, pack, pii, dsir, classifier): a single-file fixture
    * would run that stage on one core. The metadata-only queries
    * (mix, stratified) keep the plain scan. All consumers are
    * partition-independent (integer counts, hash predicates, decimal
    * accumulation).
    *
    * The trade, MEASURED at both SFs (r12, VERDICT r11 #4 — warm
    * TimeOne pairs, with/without the exchange): at sf1.0 the
    * repartition wins decisively on all three flagged entries
    * (curate_dsir 10.10 → 1.94 s, curate_funnel 1.99 → 0.92,
    * pack_tokens 1.06 → 0.84); at sf0.1 it wins for dsir
    * (1.93 → 1.33) and costs pack/funnel ~0.1-0.2 s each (0.48 →
    * 0.59 / 0.51 → 0.71) — the shuffle of the 580 KB fixture exceeds
    * the parallelism gain only when the per-row map work is a single
    * split(). That sub-second fixture-scale cost is accepted: the
    * condition `partitions < parallelism` makes the exchange a
    * PASSTHROUGH on any real multi-split corpus, so the sf0.1 number
    * is the only place it ever shows. Full numbers in BENCH_NOTES
    * round 12. */
  private def docsWide(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
    val p = s.sparkContext.defaultParallelism
    if (base.rdd.getNumPartitions < p) base.repartition(p, col("doc_id"))
    else base
  }


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
    // range-partition the narrow (doc_id, ticket) rows BEFORE the
    // regex stage (r12, the multimodal discipline): a single-file
    // customer table scans as one partition, so without the exchange
    // the whole scan+redact pass — the entry's entire cost — ran on
    // one core (measured 5.8 s at sf1.0). Range partitioning on the
    // sort key lets the final orderBy reuse the distribution (local
    // sort only, no second exchange).
    val base = Tables.customer(s, d)
      .select(col("c_custkey").as("doc_id"), ticket.as("ticket"))
      .repartitionByRange(s.sparkContext.defaultParallelism, col("doc_id"))
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
    val docs = docsWide(s, d)
    Decontaminate.overlaps(
      corpus = docs.filter(col("doc_id") % 7 =!= 0),
      bench = docs.filter(col("doc_id") % 7 === 0),
      idCol = "doc_id", textCol = "text", n = 5)
      .orderBy(col("doc_id"))
  }

  private val decontamSql: String =
    Decontaminate.overlapsSql("doc_id", "text", n = 5, benchPred = "doc_id % 7 = 0") +
      "\n    ORDER BY doc_id"

  // ------------------------------------------------------ decontam_bloom
  /** Bloom-filter decontamination — same split and n as
    * [[decontam]], but membership goes through a broadcast Bloom
    * bitmap instead of the exact shingle set: the 100 TB shape when
    * the eval suite's shingle set outgrows an exact broadcast.
    * Approximate BY DESIGN (one-sided: supersets the exact flag set,
    * never misses a contaminated doc) — but since r10 the bitmap is
    * the engine's own deterministic filter (integer sizing +
    * double-hashed positions on hash64), so the DuckDB oracle rebuilds
    * the exact bitmap and replays membership: HASH-EXACT entry. The
    * zero-false-negative + bounded-false-flag contract stays gated in
    * RecallGateSpec as belt-and-braces. */
  private def decontamBloom(s: SparkSession, d: String): DataFrame = {
    val docs = docsWide(s, d)
    Decontaminate.bloomOverlaps(
      corpus = docs.filter(col("doc_id") % 7 =!= 0),
      bench = docs.filter(col("doc_id") % 7 === 0),
      idCol = "doc_id", textCol = "text", n = 5)
      .orderBy(col("doc_id"))
  }

  private val decontamBloomSql: String =
    Decontaminate.bloomOverlapsSql("doc_id", "text", n = 5,
      benchPred = "doc_id % 7 = 0")

  // --------------------------------------------------- decontam_semantic
  /** Embedding-space decontamination — the semantic complement of the
    * n-gram overlap scans: a corpus item is contaminated if it sits
    * within cosine [[SemTau]] of ANY eval-set embedding (the
    * paraphrase/translation leak n-grams can't see; the check modern
    * eval-hygiene pipelines run alongside exact-match).
    *
    * Scale shape: the eval set is driver-collected and folded into
    * the projection as literals — eval suites are thousands of rows,
    * corpora are billions, so the right asymmetry is a SHUFFLE-FREE
    * single corpus scan computing all |eval| sims per row (at larger
    * eval sets: broadcast-join + groupBy, or route through the ANN
    * index family). Bit-exact: each cosine is the §3 sequential-fold
    * kernel, max is an exact pick, the flag count is integer. */
  private val SemTau = 0.28
  private val SemEvalIds = 1 to 5

  private def decontamSemantic(s: SparkSession, d: String): DataFrame = {
    val evals = Tables.embeddings(s, d)
      .filter(col("vec_id").between(SemEvalIds.head, SemEvalIds.last))
      .orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0))
    val sims = evals.map(ev =>
      graft.functions.VectorFunctions.cosineSimilarity(
        col("embedding"), typedLit(ev)))
    val nClose = sims.map(c => when(c >= SemTau, lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    Tables.embeddings(s, d)
      .filter(col("vec_id") > SemEvalIds.last)
      .select(col("vec_id"), nClose.as("n_close"), greatest(sims: _*).as("max_cos"))
      .filter(col("n_close") > 0)
      .orderBy(col("vec_id"))
  }

  private val decontamSemanticSql: String = s"""
    WITH ev AS (
      SELECT CAST(embedding AS DOUBLE[]) AS ev
      FROM embeddings
      WHERE vec_id BETWEEN ${SemEvalIds.head} AND ${SemEvalIds.last}),
    s AS (
      SELECT e.vec_id,
             CAST(sum(CASE WHEN list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ev.ev) >= $SemTau THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
             max(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ev.ev)) AS max_cos
      FROM embeddings e CROSS JOIN ev
      WHERE e.vec_id > ${SemEvalIds.last}
      GROUP BY e.vec_id)
    SELECT vec_id, n_close, max_cos FROM s
    WHERE n_close > 0
    ORDER BY vec_id"""

  // -------------------------------------------------------- pack_tokens
  /** Concat-then-split packing of documents into 512-token training
    * sequences, packed independently per source shard. */
  private def packTokens(s: SparkSession, d: String): DataFrame = {
    val docs = docsWide(s, d)
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

  // --------------------------------------------------- mix_temperature
  /** Temperature-style mixture rebalancing (the multilingual-T5 α=0.5
    * rule): keep-rate ∝ 1/√|source|, so dominant sources are
    * downsampled toward a flatter mixture while small sources keep
    * everything (rate capped at 1). Deterministic hash selection as
    * in [[mixSample]]; `weight` carries the inverse propensity.
    *
    * Scale shape: per-source counts are ONE tiny map-side-combined
    * aggregate (|sources| rows) broadcast-joined back — the corpus
    * side never shuffles. Cross-engine exactness: the rate uses only
    * IEEE-correctly-rounded ops (sqrt, one divide, exact-integer
    * floor) — a pow(n, alpha) rate would NOT be bit-portable, which
    * is why alpha is pinned to 0.5.
    *
    * No cross-source normalization (Σ√n) on purpose: a float sum over
    * sources is summation-order-dependent across engines; the
    * per-source closed form keeps the whole query bit-exact. */
  private def mixTemperature(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_source"))
    docs.join(broadcast(counts), Seq("source"))
      .withColumn("keep_ppm", least(lit(1000000L),
        floor(lit(4000000.0) / sqrt(col("n_source").cast("double")))))
      .filter(hash64(concat(lit("temp-v1:"), col("doc_id").cast("string")))
        % 1000000L < col("keep_ppm"))
      .select(col("doc_id"), col("source"), col("n_source"), col("keep_ppm"),
        (lit(1000000.0) / col("keep_ppm").cast("double")).as("weight"))
      .orderBy(col("doc_id"))
  }

  private val mixTemperatureSql: String = s"""
    WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_source
               FROM documents GROUP BY source),
    t AS (SELECT d.doc_id, d.source, c.n_source,
            least(CAST(1000000 AS BIGINT),
              CAST(floor(4000000.0 / sqrt(CAST(c.n_source AS DOUBLE))) AS BIGINT)) AS keep_ppm
          FROM documents d JOIN c USING (source))
    SELECT doc_id, source, n_source, keep_ppm,
           1000000.0 / CAST(keep_ppm AS DOUBLE) AS weight
    FROM t
    WHERE ${hash64Sql("'temp-v1:' || CAST(doc_id AS VARCHAR)")} % 1000000 < keep_ppm
    ORDER BY doc_id"""

  // -------------------------------------------------- sample_stratified
  /** Exact-quota stratified sampling: exactly min(quota, |stratum|)
    * docs per source — the min-hash-rank prefix of each stratum, the
    * eval-split / per-source-cap pass where proportional rates
    * ([[mixSample]]) don't fit because the contract is a COUNT.
    *
    * Scale shape: "quota smallest hashes per stratum" is a bounded
    * [[graft.functions.TopKAggregate]] — map-side combined, so each
    * partition ships at most quota pairs per stratum and the shuffle
    * is partitions × strata × quota, independent of corpus rows. The
    * naive plan (row_number over PARTITION BY source) funnels entire
    * strata through single tasks — a handful of sources at 100 TB
    * means TB-scale skewed windows.
    *
    * Determinism: rank key = the cross-engine [[hash64]] masked to 48
    * bits (exact in the aggregate's double ordering; a within-stratum
    * 48-bit tie — P < 1e-9 at 1e4 rows/stratum — breaks on doc_id in
    * both engines identically), so the sample is a pure function of
    * (seed, doc_id), retry- and partitioning-stable. */
  private val stratQuota = 40
  private val stratMask = 1L << 48

  private def sampleStratified(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        (hash64(concat(lit("strat-v1:"), col("doc_id").cast("string")))
          % stratMask).as("hk"))
      .groupBy(col("source"))
      .agg(graft.functions.TopKAggregate
        .topK(col("hk").cast("double"), col("doc_id"), stratQuota).as("picks"))
      .select(col("source"), posexplode(col("picks")).as(Seq("__i", "p")))
      .select(col("p.id").as("doc_id"), col("source"),
        (col("__i") + 1).cast("long").as("sample_rank"))
      .orderBy(col("doc_id"))

  private val sampleStratifiedSql: String = s"""
    WITH t AS (SELECT doc_id, source,
                 ${hash64Sql("'strat-v1:' || CAST(doc_id AS VARCHAR)")} % $stratMask AS hk
               FROM documents),
    r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rk
          FROM t)
    SELECT doc_id, source, CAST(rk AS BIGINT) AS sample_rank
    FROM r WHERE rk <= $stratQuota
    ORDER BY doc_id"""

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

  // ------------------------------------------------------ curate_funnel
  /** The composed curation pass every training-data pipeline runs —
    * language gate → length bounds → stopword floor → repetition cap →
    * exact dedup — reported as the per-stage survivor FUNNEL the
    * pipeline owner actually reads. One scan computes every per-row
    * flag (integer-only threshold arithmetic: no float divergence
    * risk), one hash window ranks dedup survivors among stage-4
    * survivors, one aggregate produces all six counts — two shuffles
    * total at any scale, with only (hash, flags) rows crossing them.
    * Thresholds are integer ratios (stopwords ≥ 1/40 of tokens, top
    * token ≤ 1/8 of tokens), sized to this corpus's measured
    * distributions so every stage drops something at sf0.001-0.1. */
  private def funnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxCount = (xs: org.apache.spark.sql.Column) =>
      graft.functions.ArrayMaxCount.maxCount(xs)
    val flagged = docsWide(s, d)
      .select(col("doc_id"), col("lang"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        coalesce(col("lang") === "en", lit(false)).as("f1"),
        size(col("toks")).cast("long").as("n_toks"),
        langScore(col("toks"), langDicts.head._2).cast("long").as("n_stop"),
        maxCount(col("toks")).cast("long").as("max_tok"),
        graft.operators.Dedup.contentKey(col("text")).as("h"))
      .withColumn("f2", col("f1") && col("n_toks").between(20, 2000))
      .withColumn("f3", col("f2") && col("n_stop") * 40 >= col("n_toks"))
      .withColumn("f4", col("f3") && col("max_tok") * 8 <= col("n_toks"))
    // dedup survivor = min-doc_id among same-hash stage-4 survivors:
    // ordering survivors first makes rank 1 ⇔ that survivor
    val ranked = flagged.withColumn("rk",
      row_number().over(Window.partitionBy(col("h"))
        .orderBy(col("f4").desc, col("doc_id"))))
      .withColumn("f5", col("f4") && col("rk") === 1)
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    ranked
      .agg(count(lit(1)).as("s0"), cnt(col("f1")).as("s1"), cnt(col("f2")).as("s2"),
        cnt(col("f3")).as("s3"), cnt(col("f4")).as("s4"), cnt(col("f5")).as("s5"))
      .selectExpr("""stack(6,
        0, 'all', s0, 1, 'lang_en', s1, 2, 'length', s2,
        3, 'stopword', s3, 4, 'repetition', s4, 5, 'exact_dedup', s5)
        AS (stage, stage_name, n_docs)""")
      .select(col("stage").cast("long").as("stage"), col("stage_name"), col("n_docs"))
      .orderBy(col("stage"))
  }

  private val funnelSql: String = {
    val stops = langDicts.head._2.map(w => s"'$w'").mkString(", ")
    s"""
    WITH t AS (SELECT doc_id, lang, text, ${tokensSql("text")} AS toks FROM documents),
    m AS (SELECT doc_id,
            coalesce(lang = 'en', false) AS f1,
            CAST(len(toks) AS BIGINT) AS n_toks,
            CAST(len(list_filter(toks, x -> x IN ($stops))) AS BIGINT) AS n_stop,
            CAST(list_max(list_transform(list_distinct(toks),
                   u -> len(list_filter(toks, x -> x = u)))) AS BIGINT) AS max_tok,
            md5(trim(text)) AS h
          FROM t),
    f2 AS (SELECT *, (f1 AND n_toks BETWEEN 20 AND 2000) AS f2 FROM m),
    f3 AS (SELECT *, (f2 AND n_stop * 40 >= n_toks) AS f3 FROM f2),
    f4 AS (SELECT *, (f3 AND max_tok * 8 <= n_toks) AS f4 FROM f3),
    r AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY f4 DESC, doc_id) AS rk FROM f4),
    agg AS (SELECT count(*) AS s0,
              CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
              CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
              CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
              CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS s4,
              CAST(sum(CASE WHEN f4 AND rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS s5
            FROM r)
    SELECT CAST(0 AS BIGINT) AS stage, 'all' AS stage_name, s0 AS n_docs FROM agg
    UNION ALL SELECT 1, 'lang_en', s1 FROM agg
    UNION ALL SELECT 2, 'length', s2 FROM agg
    UNION ALL SELECT 3, 'stopword', s3 FROM agg
    UNION ALL SELECT 4, 'repetition', s4 FROM agg
    UNION ALL SELECT 5, 'exact_dedup', s5 FROM agg
    ORDER BY stage"""
  }

  // ----------------------------------------------------------- curate_dsir
  private val DsirBuckets = 8192
  private val DsirTopN = 25

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): rank raw documents
    * by their hashed-n-gram importance under a target distribution
    * (here: the English slice stands in for the curated target).
    * Per bigram, the importance is the log-likelihood ratio
    * log p_target(bucket) − log p_raw(bucket) over [[DsirBuckets]]
    * hashed bigram buckets (the paper's feature choice — and the one
    * that carries signal on this fixture, whose languages share one
    * unigram vocabulary and differ only in transition statistics);
    * per doc, the MEAN ratio (length-debiased). Logs use the INTEGER
    * log₂-floor bits() contract (binary-string length, +1-smoothed)
    * — same cross-engine portability choice as text_surprisal, and
    * the per-doc mean of longs is exact, so the ranking is
    * bit-identical to DuckDB. (The paper's float logs would not
    * hash-match across libm implementations; at bits granularity the
    * selection recovers 23/25 target-language docs here.)
    *
    * Scale shape: the bigram stream is tokenized ONCE and collapsed
    * to a (doc, bucket, count) projection by one map-side-combined
    * groupBy (bounded by docs × distinct-buckets-per-doc, a
    * many-fold reduction of the raw token stream); both corpus
    * histograms derive from that projection with a second TINY
    * aggregate ([[DsirBuckets]] rows, target via conditional sum),
    * broadcast back over it. Per-doc mean over tokens re-weights by
    * the counts — Σ c·sc / Σ c, the same exact-integer ratio the
    * token-stream mean would give, without a second tokenize pass
    * (measured 2× at sf0.1). Widest shuffle is (doc_id, bucket). */
  private def dsir(s: SparkSession, d: String): DataFrame = {
    // tokens projected BEFORE the shingle HOF: collapsing them lets the
    // optimizer inline split() into every element_at reference — the
    // measured 8× quadratic-retokenize trap (Dedup.sharedSpans comment)
    val dbc = docsWide(s, d)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("lang"),
        explode(shingles(col("tk"), 2)).as("w"))
      .groupBy(col("doc_id"), col("lang"),
        (hash64(col("w")) % DsirBuckets).as("b"))
      .agg(count(lit(1)).as("c"))
    def bits(x: org.apache.spark.sql.Column) =
      length(conv(x, 10, 2)).cast("long") - 1L
    val scores = dbc.groupBy(col("b"))
      .agg(sum(col("c")).as("cr"),
        sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("ct"))
      .select(col("b"), (bits(col("ct") + 1) - bits(col("cr") + 1)).as("sc"))
    dbc.join(broadcast(scores), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        (sum(col("c") * col("sc")).cast("double") / sum(col("c")))
          .as("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(DsirTopN)
  }

  private val dsirSql: String = s"""
    WITH toks AS (
      SELECT doc_id, lang, ${tokensSql("text")} AS t FROM documents),
    dbc AS (
      SELECT doc_id, lang, ${hash64Sql("w")} % $DsirBuckets AS b, count(*) AS c
      FROM (SELECT doc_id, lang, unnest(${shinglesSql("t", 2)}) AS w FROM toks)
      GROUP BY 1, 2, 3),
    sc AS (
      SELECT b,
             (length(bin(coalesce(CAST(sum(c) FILTER (lang = 'en') AS BIGINT), 0) + 1)) - 1)
             - (length(bin(CAST(sum(c) AS BIGINT) + 1)) - 1) AS sc
      FROM dbc GROUP BY b)
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(sum(c * sc) AS DOUBLE) / sum(c) AS dsir_score
    FROM dbc JOIN sc USING (b)
    GROUP BY doc_id
    ORDER BY dsir_score DESC, doc_id
    LIMIT $DsirTopN"""

  // ----------------------------------------------------- curate_classifier
  private val ClsBuckets = 16384
  private val ClsNgram = 3
  private val ClsEpochs = 4
  private val ClsLr = 0.05

  /** Trained quality/domain classifier (the fastText-shaped filter of
    * CCNet/GPT-3/LLaMA pipelines): logistic regression over hashed
    * trigram count features, fit ON the engine
    * ([[graft.operators.Classifier]] — driver-held bucket-bounded
    * weights, one map-side-combined gradient aggregation per epoch)
    * to predict membership in the target slice (English), then swept
    * over the corpus. Trigrams because the fixture's languages share
    * one vocabulary and an order-2 generator: the bigram NB ceiling
    * is 0.67 at sf0.1 while trigrams reach 0.96
    * (tools/ProfileClassifier). Training = naive-Bayes log-odds warm
    * start (one aggregation — full-batch GD from zero stalls far
    * below the NB ceiling at corpus size) + [[ClsEpochs]] GD
    * calibration epochs. The train/score split this fixture can't
    * express (labels everywhere) is the production shape: fit on the
    * labeled sample, sweep the 100 TB corpus with the
    * broadcast-weights score pass.
    *
    * HASH-EXACT since r12 (VERDICT r10 #3 / r11 #2): TRAINING is
    * bit-deterministic since r10 (fixed-point DECIMAL gradient
    * reduce — ClassifierSpec asserts identical weights across
    * partition counts), so the GD-calibrated weights are quantized to
    * 2^30 fixed point and persisted as a sidecar exactly like the NB
    * twin's ([[ensureClsNbStore]]), and the corpus sweep is the same
    * ALL-INTEGER dot product (score_bits = Σ count·w_bits +
    * bias_bits) the DuckDB oracle replays from the sidecar. σ is
    * monotone, so `pred` ≡ σ(w·x) > 0.5 ⟺ score_bits > 0 — the
    * decision function is unchanged (the 2^-30 weight quantization is
    * orders below the gradient noise the epoch budget tolerates), and
    * the calibration QUALITY stays separately gated by the accuracy
    * floor in RecallGateSpec. */
  private def classifier(s: SparkSession, d: String): DataFrame =
    scoreQuantized(s, d, ensureClsGdStore(s, d))

  private def clsGdPath(d: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_clsgd_v1_${graft.Sidecar.key(d)}").toString

  /** Train NB warm start + [[ClsEpochs]] GD calibration epochs once
    * per sfDir and persist the 2^30-quantized weights — the
    * deterministic-replay sidecar discipline (probe over a persisted
    * artifact, as for every ANN store). */
  private def ensureClsGdStore(s: SparkSession, d: String): String = {
    val p = clsGdPath(d)
    CurationQueries.synchronized {
      if (!new java.io.File(p, "_SUCCESS").exists()) {
        val (featU, freeFeat0, labels) = clsFeat(s, d)
        val feat = featU.persist()
        try {
          val cls = graft.operators.Classifier
          val w0 = cls.nbLogOdds(s, feat, labels, ClsBuckets + 1, ClsBuckets)
          freeFeat0() // feat is materialized by the NB pass; the
          // pre-union aggregate's blocks are dead from here on
          val w = cls.trainLogReg(
            s, feat, labels, ClsBuckets + 1, ClsEpochs, ClsLr, init = w0)
          import s.implicits._
          w.zipWithIndex.toSeq
            .map { case (v, b) => (b, Math.round(v * ClsNbScale)) }
            .toDF("b", "wq").coalesce(1)
            .write.mode("overwrite").parquet(p)
        } finally {
          feat.unpersist()
          // unpersist is idempotent: the mid-try call releases the
          // aggregate's blocks early on the happy path, this one
          // guarantees release when nbLogOdds throws (ADVICE r17)
          freeFeat0()
        }
      }
    }
    p
  }

  /** Split bench: `_build` = full retrain (sidecar cleared first so
    * the one-time training cost is measured, not amortized away),
    * `_probe` = the broadcast-weights corpus sweep — the half that
    * touches 100 TB. */
  def classifierBench(s: SparkSession, d: String): (() => Unit, () => DataFrame) = {
    val build = () => {
      val base = new java.io.File(clsGdPath(d))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      CurationQueries.synchronized { rm(base) }
      ensureClsGdStore(s, d); ()
    }
    (build, () => classifier(s, d))
  }

  /** Hashed-trigram count features (+ per-doc bias row) and labels —
    * shared by [[classifier]] and [[classifierNb]]. Tokens projected
    * before the shingle HOF (see dsir's trap note).
    *
    * r17 (guide §1.2 "don't compute things you throw away"): the bias
    * union references the trigram aggregate TWICE (once per union
    * branch), and Spark does not share common subtrees — the train
    * builds used to tokenize + explode + aggregate the corpus twice
    * to materialize one feature frame. The aggregate is now persisted
    * and materialized once (count()) before the union reads it from
    * cache; rows are identical, so the trained weights (and the
    * hash-gated scoring sweeps) are bit-unchanged. Callers unpersist
    * via the returned thunk once their own materialization is done. */
  private[graft] def clsFeat(s: SparkSession, d: String): (DataFrame, () => Unit, DataFrame) = {
    // repartition-up (r10, the Lloyd-fix discipline): the trigram
    // explode is the classifier's corpus-scale map stage, and a
    // single-file fixture would run it on one core. Counts are
    // integers and the GD accumulates in decimal, so partitioning
    // cannot move any result.
    val feat0 = docsWide(s, d)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        explode(shingles(col("tk"), ClsNgram)).as("w"))
      .groupBy(col("doc_id"), (hash64(col("w")) % ClsBuckets).cast("int").as("b"))
      .agg(count(lit(1)).cast("double").as("x"))
      .persist()
    feat0.count() // materialize: one tokenize pass, not one per union branch
    val feat = feat0
      .unionAll(feat0.select(col("doc_id")).distinct()
        .select(col("doc_id"), lit(ClsBuckets).as("b"), lit(1.0).as("x"))) // bias
      .repartition(col("doc_id")) // epochs reuse this partitioning: no per-epoch shuffle
    val labels = Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    (feat, () => { feat0.unpersist(); () }, labels)
  }

  // -------------------------------------------- curate_classifier_nb
  /** The classifier's naive-Bayes scoring sweep on the HASH-EXACT
    * gate (VERDICT r9 #6 stretch): the NB warm-start weights are
    * bit-deterministic (integer-count histogram — IEEE addition of
    * integer-valued doubles is exact in any order), so the engine
    * quantizes them to 2^30 fixed point, persists them as a sidecar,
    * and scores the corpus with an ALL-INTEGER dot product
    * (score_bits = Σ count·w_bits + bias_bits; pred = sign) — the
    * DuckDB oracle recomputes the trigram features relationally,
    * reads the sidecar, and replays the sum exactly. This oracles the
    * CORPUS-SCALE half of the classifier family (the broadcast-
    * weights sweep — the part that touches 100 TB); the GD
    * calibration refinement stays accuracy-gated under
    * curate_classifier. */
  private def clsNbPath(d: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_clsnb_v1_${graft.Sidecar.key(d)}").toString

  private val ClsNbScale = 1L << 30

  private def ensureClsNbStore(s: SparkSession, d: String): String = {
    val p = clsNbPath(d)
    CurationQueries.synchronized {
      if (!new java.io.File(p, "_SUCCESS").exists()) {
        val (featU, freeFeat0, labels) = clsFeat(s, d)
        val feat = featU.persist()
        try {
          val w0 = graft.operators.Classifier
            .nbLogOdds(s, feat, labels, ClsBuckets + 1, ClsBuckets)
          import s.implicits._
          w0.zipWithIndex.toSeq
            .map { case (v, b) => (b, Math.round(v * ClsNbScale)) }
            .toDF("b", "wq").coalesce(1)
            .write.mode("overwrite").parquet(p)
        } finally { feat.unpersist(); freeFeat0() }
      }
    }
    p
  }

  private def classifierNb(s: SparkSession, d: String): DataFrame =
    scoreQuantized(s, d, ensureClsNbStore(s, d))

  /** The quantized-weights corpus sweep shared by the GD and NB
    * entries: trigram features → broadcast sidecar join → ONE
    * map-side-combined integer sum per doc.
    *
    * Shuffle shape (r12): Σ_b count_b·wq_b ≡ Σ_occurrences wq — an
    * integer sum either way, so the per-(doc, bucket) COUNT pre-agg
    * (a full extra exchange) is dropped: each exploded shingle maps
    * straight through the broadcast weight join and partial-aggregates
    * into the per-doc sum map-side. With [[docsWide]]'s doc_id
    * partitioning up front, the final groupBy(doc_id) reuses it —
    * the whole sweep runs parallel with ZERO non-presentation
    * exchanges (measured: 2 exchanges + single-partition explode
    * before; the sf1.0 probe row is the gauge). Order-free integer
    * arithmetic: the hash-exact oracle (which still replays via
    * counts) is unchanged. */
  private def scoreQuantized(s: SparkSession, d: String, path: String): DataFrame = {
    val wt = s.read.parquet(path)
    val bias = wt.filter(col("b") === ClsBuckets).select(col("wq")).head.getLong(0)
    docsWide(s, d)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        explode(shingles(col("tk"), ClsNgram)).as("w"))
      .select(col("doc_id"), (hash64(col("w")) % ClsBuckets).cast("int").as("b"))
      .join(broadcast(wt), "b")
      .groupBy(col("doc_id"))
      .agg((sum(col("wq")) + bias).as("score_bits"))
      .join(Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("lang") === "en", 1).otherwise(0).as("y")), "doc_id")
      .select(col("doc_id"), col("y"), col("score_bits"),
        (col("score_bits") > 0).cast("int").as("pred"))
      .orderBy(col("doc_id"))
  }

  private def classifierNbSql(d: String): String =
    quantizedScoreSql(clsNbPath(d))

  private def classifierSql(d: String): String =
    quantizedScoreSql(clsGdPath(d))

  private def quantizedScoreSql(p: String): String = {
    s"""
    WITH toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
    f AS (
      SELECT doc_id, ${hash64Sql("w")} % $ClsBuckets AS b, count(*) AS c
      FROM (SELECT doc_id, unnest(${shinglesSql("t", ClsNgram)}) AS w FROM toks)
      GROUP BY 1, 2),
    wt AS (SELECT b, wq FROM read_parquet('$p/*.parquet')),
    sc AS (
      SELECT f.doc_id,
             CAST(sum(f.c * w.wq) +
                  (SELECT wq FROM wt WHERE b = $ClsBuckets) AS BIGINT) AS score_bits
      FROM f JOIN wt w USING (b)
      GROUP BY f.doc_id)
    SELECT sc.doc_id,
           CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
           sc.score_bits,
           CAST(sc.score_bits > 0 AS INT) AS pred
    FROM sc JOIN documents d ON d.doc_id = sc.doc_id
    ORDER BY sc.doc_id"""
  }

  /** def, not val: classifierNbSql embeds the
    * [[graft.OracleEnv.sfDir]]-derived weight-sidecar path, resolved
    * at dump time (see VectorQueries.defs). */
  def defs: Map[String, QueryDef] = Map(
    "curate_classifier" -> QueryDef(classifier _,
      classifierSql(graft.OracleEnv.sfDir)),
    "curate_classifier_nb" -> QueryDef(classifierNb _,
      classifierNbSql(graft.OracleEnv.sfDir)),
    "curate_dsir"    -> QueryDef(dsir _, dsirSql),
    "pii_scan"       -> QueryDef(piiScan _, piiScanSql),
    "curate_funnel"  -> QueryDef(funnel _, funnelSql),
    "mix_sample"     -> QueryDef(mixSample _, mixSampleSql),
    "sample_stratified" -> QueryDef(sampleStratified _, sampleStratifiedSql),
    "mix_temperature" -> QueryDef(mixTemperature _, mixTemperatureSql),
    "decontam_ngram" -> QueryDef(decontam _, decontamSql),
    "decontam_semantic" -> QueryDef(decontamSemantic _, decontamSemanticSql),
    "decontam_bloom" -> QueryDef(decontamBloom _, decontamBloomSql),
    "pack_tokens"    -> QueryDef(packTokens _, packTokensSql),
  )
}
