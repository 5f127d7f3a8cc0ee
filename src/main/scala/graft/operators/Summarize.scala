package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic extractive summarization — the zero-egress stand-in
  * for the reference's per-hit ChatGPT summarize stage
  * (SSEOpenAIController.java:143-230): split a document into
  * sentences, score each sentence by query-term overlap with an
  * earlier-position tie-break, keep the top-m per document.
  *
  * Everything is integer arithmetic over per-row expressions (the only
  * wide op is one tiny per-document window), so results are bit-exact
  * across engines and partitionings — `vs_search_summarize` oracles
  * this operator against DuckDB.
  *
  * Sentence splitters:
  *  - [[tokenWindows]]: fixed token windows — the right splitter for
  *    unpunctuated corpora (this repo's synthetic documents), and a
  *    reasonable length normalizer generally.
  *  - [[punctSentences]]: split on a literal separator (". " for
  *    prose). Literal, not regex: the DuckDB twin is `str_split`, and
  *    RE2 has no lookbehind, so a literal separator is the shared
  *    cross-engine contract.
  *
  * Scale shape: applied after a top-k search the input is k rows
  * (broadcast-joined); applied corpus-wide it stays a shuffle-free
  * per-row pipeline plus one window keyed by document id.
  */
object Summarize {

  /** Fixed `w`-token pseudo-sentences of a token-array column, as
    * posexplode-ready array<string>. */
  def tokenWindows(toks: Column, w: Int): Column = {
    // clamp: on an empty array sequence(0, -1) would yield [0, -1]
    // (Spark sequences run descending when start > stop) — two phantom
    // windows where the DuckDB twin's range(0, 0) yields none
    val last = greatest(floor((size(toks) - 1) / w), lit(0)).cast("int")
    when(size(toks) === 0, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0), last),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
  }

  /** Literal-separator sentences of a text column. */
  def punctSentences(text: Column, separator: String = ". "): Column =
    split(text, java.util.regex.Pattern.quote(separator))

  /** Per-document extractive summary rows.
    *
    * Input: `docs` with (idCol, sentence-array column `sentsCol`) —
    * built with [[tokenWindows]] or [[punctSentences]]; every other
    * column is carried through. Output: one row per selected sentence
    * with (`pos` 1-based, `sentence`, `overlap`), ordered within each
    * document by position.
    *
    * Scoring: overlap = how many of `terms` appear in the sentence's
    * whitespace tokens; top-`m` sentences by (overlap DESC, pos ASC).
    */
  def extract(docs: DataFrame, idCol: String, sentsCol: String,
      terms: Seq[String], m: Int): DataFrame = {
    val sents = docs
      .select(col("*"), posexplode(col(sentsCol)).as(Seq("pos0", "sentence")))
      .drop(sentsCol)
      .withColumn("pos", (col("pos0") + 1).cast("long"))
      .drop("pos0")
    val toks = graft.functions.TextFunctions.tokens(col("sentence"))
    val overlap = terms.map(t =>
      when(array_contains(toks, t), lit(1L)).otherwise(lit(0L)))
      .reduceOption(_ + _).getOrElse(lit(0L))
    val w = Window.partitionBy(col(idCol)).orderBy(col("overlap").desc, col("pos"))
    sents.withColumn("overlap", overlap)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= m)
      .drop("rn")
  }
}
