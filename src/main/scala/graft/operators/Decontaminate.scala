package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share any
  * word n-gram with an evaluation/benchmark set (the GPT-3 appendix-C
  * style 13-gram rule, parameterized; the right n depends on corpus
  * token entropy).
  *
  * Scale shape: the benchmark side is small by nature (eval sets are
  * thousands of documents, the corpus is billions), so its distinct
  * shingle-hash set is BROADCAST and the corpus side never shuffles
  * for the join — scan → per-row shingle explode → broadcast
  * semi-join → partial-agg count per doc. The only wide op is the
  * final per-doc aggregation, keyed on the (already exploded) doc id
  * with map-side combine. No all-pairs anything; a hot shingle can't
  * blow up the join because the bench set is deduplicated and the
  * corpus side is `array_distinct`-ed per document before exploding.
  *
  * Determinism: shingles are hashed with the cross-engine
  * [[graft.functions.TextFunctions.hash64]]; a 60-bit collision would
  * flag identically in both engines. `contam_ratio` is one IEEE
  * division of two exact integers.
  */
object Decontaminate {

  // Shape rules, measured at sf0.1 (see Dedup.sharedSpans):
  //  - tokens live in their own projection, and the explode sits
  //    DIRECTLY over the shingle HOF — an intermediate `sh` alias
  //    between them lets filter pushdown (InferFiltersFromGenerate)
  //    substitute through both aliases and inline split() into every
  //    element_at of the lambda: one regex run per element access,
  //    measured 40× on this operator.
  //  - n_shingles is count(*) of the exploded rows, NOT size(sh)
  //    beside the explode — that double reference re-evaluates the
  //    HOF once per OUTPUT row.
  private def gramRows(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("tk"))
      .select(col(idCol), explode(array_distinct(shingles(col("tk"), n))).as("s"))
      .select(col(idCol), hash64(col("s")).as("h"))

  /** Corpus docs (idCol) that share ≥1 distinct word `n`-gram with
    * `bench`(textCol): (id, n_shingles, n_overlap, contam_ratio). */
  def overlaps(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    def gramRows(df: DataFrame) =
      Decontaminate.gramRows(df, idCol, textCol, n)
    val benchSet = gramRows(bench).select(col("h")).distinct()
    // the left join keeps every shingle row so count(*) still equals
    // size(sh); the post-agg filter restores the inner-join row set
    gramRows(corpus)
      .join(broadcast(benchSet.withColumn("hit", lit(1L))), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .filter(col("n_overlap") > 0)
      .withColumn("contam_ratio",
        col("n_overlap").cast("double") / col("n_shingles").cast("double"))
  }

  /** Bloom-filter variant of [[overlaps]] — the shape for when the
    * benchmark shingle set outgrows an exact broadcast (10⁷+ shingles
    * → a compact bitmap instead of a 500 MB hash set; see
    * [[graft.functions.Bloom]]). Error is ONE-SIDED: every truly
    * contaminated doc is flagged with `n_maybe_overlap ≥` its true
    * overlap (Bloom filters have no false negatives); a clean doc is
    * false-flagged with probability ≤ n_shingles · fpp (union bound).
    * Output: (id, n_shingles, n_maybe_overlap) for flagged docs.
    *
    * Since r10 the filter is the engine's own DETERMINISTIC bitmap
    * (integer sizing + Kirsch–Mitzenmacher positions on hash64, see
    * [[graft.functions.Bloom]]) — so the false-positive SET itself is
    * replayable and [[bloomOverlapsSql]] puts this entry on the
    * hash-exact oracle gate; the zero-false-negative property stays
    * separately gated in RecallGateSpec as belt-and-braces. */
  def bloomOverlaps(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val benchSet = gramRows(bench, idCol, textCol, n).select(col("h")).distinct()
    val f = graft.functions.Bloom.build(benchSet, "h")
    gramRows(corpus, idCol, textCol, n)
      .withColumn("hit",
        when(graft.functions.Bloom.mightContain(col("h"), f), 1L).otherwise(0L))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"), sum(col("hit")).as("n_maybe_overlap"))
      .filter(col("n_maybe_overlap") > 0)
  }

  /** DuckDB twin of [[bloomOverlaps]]: rebuilds the exact bitmap
    * relationally (bench keys × range(k) → DISTINCT positions) and
    * replays membership as a k-way position join — a corpus shingle
    * "hits" iff all k of its probe positions were set by some bench
    * key, exactly the engine's bit test. */
  def bloomOverlapsSql(idCol: String, textCol: String, n: Int,
      benchPred: String): String = {
    val bpk = graft.functions.Bloom.BitsPerKey
    val k = graft.functions.Bloom.K
    s"""
    WITH tok AS (SELECT $idCol, ${tokensSql(textCol)} AS tk FROM documents),
    t AS (SELECT $idCol, list_distinct(${shinglesSql("tk", n)}) AS sh FROM tok),
    bench AS (SELECT DISTINCT ${hash64Sql("s")} AS h
              FROM (SELECT unnest(sh) AS s FROM t WHERE $benchPred)),
    msize AS (SELECT CAST(1 AS BIGINT) << length(bin(greatest($bpk * COUNT(*), 64) - 1)) AS m
              FROM bench),
    benchpos AS (
      SELECT DISTINCT (b.h % s.m + i.range * (2 * ((b.h // s.m) % (s.m // 2)) + 1)) % s.m AS pos
      FROM bench b CROSS JOIN msize s CROSS JOIN range($k) i),
    corpus AS (SELECT $idCol, ${hash64Sql("s")} AS h
               FROM (SELECT $idCol, unnest(sh) AS s FROM t WHERE NOT ($benchPred))),
    cpos AS (
      SELECT c.$idCol, c.h,
             (c.h % s.m + i.range * (2 * ((c.h // s.m) % (s.m // 2)) + 1)) % s.m AS pos
      FROM corpus c CROSS JOIN msize s CROSS JOIN range($k) i),
    hits AS (
      SELECT $idCol, h FROM cpos JOIN benchpos USING (pos)
      GROUP BY $idCol, h HAVING COUNT(*) = $k)
    SELECT c.$idCol,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(ht.h) AS BIGINT) AS n_maybe_overlap
    FROM corpus c LEFT JOIN hits ht ON ht.$idCol = c.$idCol AND ht.h = c.h
    GROUP BY c.$idCol HAVING count(ht.h) > 0
    ORDER BY c.$idCol"""
  }

  /** DuckDB twin over a `documents`-shaped view: bench = rows where
    * `benchPred`, corpus = the rest. */
  def overlapsSql(idCol: String, textCol: String, n: Int, benchPred: String): String = s"""
    WITH tok AS (SELECT $idCol, ${tokensSql(textCol)} AS tk FROM documents),
    t AS (SELECT $idCol, list_distinct(${shinglesSql("tk", n)}) AS sh FROM tok),
    bench AS (SELECT DISTINCT ${hash64Sql("s")} AS h
              FROM (SELECT unnest(sh) AS s FROM t WHERE $benchPred)),
    corpus AS (SELECT $idCol, CAST(len(sh) AS BIGINT) AS n_shingles,
                      ${hash64Sql("s")} AS h
               FROM (SELECT $idCol, sh, unnest(sh) AS s FROM t WHERE NOT ($benchPred)))
    SELECT c.$idCol,
           max(c.n_shingles) AS n_shingles,
           CAST(count(*) AS BIGINT) AS n_overlap,
           CAST(count(*) AS DOUBLE) / CAST(max(c.n_shingles) AS DOUBLE) AS contam_ratio
    FROM corpus c JOIN bench b USING (h)
    GROUP BY c.$idCol"""
}
