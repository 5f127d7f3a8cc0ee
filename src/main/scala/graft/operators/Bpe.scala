package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as distributed DataFrame
  * iteration (Sennrich et al., ACL 2016 — the GPT-2/RoBERTa corpus
  * tokenizer family), the tokenizer-fitting pass of an LLM data
  * pipeline.
  *
  * Scale design: the ONLY corpus-scale work is one tokenize +
  * `groupBy(word)` count (map-side combined — the same aggregation
  * every real BPE trainer starts with). Every training round then
  * runs on the VOCAB-scale (word, count, symbols) table — Heaps' law
  * keeps the distinct-word table sublinear in corpus size — as:
  * one adjacent-pair count aggregation, ONE collected argmax row
  * (driver metadata, like a Lloyd's round's centroids), and one
  * higher-order-function merge map, materialized per round through
  * [[Materializer]] so deep trainings never accumulate lineage.
  * A 100 TB corpus pays one scan; 30 rounds of BPE touch only the
  * vocabulary.
  *
  * Determinism: the argmax breaks ties (count DESC, lhs ASC, rhs
  * ASC); merge application is greedy LEFT-TO-RIGHT ("aaa" under
  * merge (a,a) → ["aa","a"]); training words are restricted to
  * `^[a-z]+$` so character semantics are unambiguous across engines.
  * No end-of-word marker — merges cannot cross word boundaries by
  * construction (the word table IS the boundary), which is the
  * variant that needs no sentinel symbol.
  */
object Bpe {

  /** One corpus-scale aggregation: lowercase-alpha word counts. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Initial symbol table: every word split to characters. */
  def charSymbols(words: DataFrame): DataFrame =
    words.withColumn("symbols",
      expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))"))

  /** Adjacent-pair counts over the (wc, symbols) table, weighted by
    * word count — vocab-scale, map-side combined. */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.filter(size(col("symbols")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, size(symbols)-1)," +
          " i -> struct(symbols[i-1] AS lhs, symbols[i] AS rhs))")).as("p"))
      .select(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"), col("wc"))
      .groupBy("lhs", "rhs").agg(sum(col("wc")).as("pair_count"))

  /** Replace every adjacent (a, b) with the merged symbol, greedy
    * left-to-right, as one fold over the symbol array (`aggregate`
    * HOF — per-row, shuffle-free). The accumulator's last element is
    * read with the 0-based null-safe `get` (NULL on the empty
    * accumulator, so the merge branch is never taken for the first
    * symbol — `element_at(acc, -1)` would THROW there under ANSI). */
  def applyMerge(syms: DataFrame, a: String, b: String): DataFrame =
    syms.withColumn("symbols",
      aggregate(col("symbols"), array().cast("array<string>"),
        (acc, s) =>
          when(get(acc, size(acc) - 1) === lit(a) && s === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(s)))))

  final case class Merge(rank: Int, lhs: String, rhs: String,
      merged: String, pairCount: Long)

  /** Train `numMerges` merges. Returns the learned merge sequence and
    * the final (word, wc, symbols) table — which IS the trained
    * tokenization of the training vocabulary. Stops early if no pair
    * repeats. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      mat: Materializer = Materializer.local()): (Seq[Merge], DataFrame) = {
    var syms = mat.mat(charSymbols(wordCounts(docs, textCol)), "bpe_init")
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val top = pairCounts(syms)
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, a, b, a + b, c)
        val next = mat.mat(applyMerge(syms, a, b), s"bpe_round_$r")
        mat.release(syms)
        syms = next
        r += 1
      }
    }
    (merges.toSeq, syms)
  }

  /** Apply a learned merge sequence to ANY (word, …) table — the
    * tokenize path for words outside the training vocabulary. Replays
    * merges in rank order as a chain of per-row HOF folds; intended
    * for vocab-scale tables (chain depth = merge count — materialize
    * periodically for long merge lists). */
  def tokenize(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.sortBy(_.rank).foldLeft(charSymbols(words)) {
      (df, m) => applyMerge(df, m.lhs, m.rhs)
    }
}
