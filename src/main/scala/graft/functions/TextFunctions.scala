package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline (SURVEY.md
  * §2): tokenization, a cross-engine 64-bit string hash, word
  * shingles, language-ID scoring, quality metrics.
  *
  * Every primitive exists twice: as a Spark `Column` and as a DuckDB
  * SQL fragment generator, defined side by side so the oracle can
  * never drift from the engine. The shared hash is the first 60 bits
  * of md5 (both engines produce identical lowercase hex md5), so all
  * downstream hashing (minhash, simhash, buckets, fingerprints) is
  * bit-identical across engines.
  */
object TextFunctions {

  /** Mersenne prime 2^31-1 for minhash permutations — products of two
    * residues stay under 2^62, no BIGINT overflow in either engine. */
  val MinhashP = 2147483647L

  // ------------------------------------------------------------ tokenize
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokensSql(col: String): String =
    s"string_split_regex(trim($col), '\\s+')"

  // ------------------------------------------------------- 64-bit hash
  /** First 15 hex nibbles of md5 as a non-negative BIGINT (60 bits). */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hash64Sql(col: String): String =
    s"CAST(('0x' || substr(md5($col), 1, 15)) AS BIGINT)"

  /** JVM-side twin of [[hash64]] for plan-time constants (same md5,
    * same first-60-bits contract). */
  def hash64Scala(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  // ------------------------------------------------------------ shingles
  /** Space-joined word n-grams (positional, may repeat). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))

  /** DuckDB twin of [[shingles]] over a list column named `t`. */
  def shinglesSql(t: String, n: Int): String = {
    val parts = (0 until n).map(k => s"$t[i+$k]").mkString(", ")
    s"CASE WHEN len($t) >= $n THEN list_transform(range(1, len($t) - ${n - 1} + 1), i -> concat_ws(' ', $parts)) ELSE [] END"
  }

  // ----------------------------------------------------------- language ID
  /** Tiny public stopword lists; the heuristic scores membership and
    * takes the argmax (first language in `langs` order wins ties). */
  val langDicts: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "it", "that", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que", "por", "con"),
    "fr" -> Seq("le", "les", "des", "est", "une", "dans", "pour", "sur", "avec", "ce"),
    "zh" -> Seq("的", "是", "了", "在", "有", "我", "他", "这", "中", "大"),
  )

  def langScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  def langScoreSql(t: String, words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter($t, x -> x IN ($list)))"
  }

  // ------------------------------------------------------- quality metrics
  /** Characters matched by a pattern (identical RE2/Java semantics for
    * plain ASCII classes). */
  def patternCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  def patternCountSql(col: String, pattern: String): String =
    s"len(regexp_extract_all($col, '$pattern'))"
}
