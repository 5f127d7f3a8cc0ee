package graft

import graft.operators.Summarize
import org.apache.spark.sql.functions._

/** The extractive summarizer as a standalone operator: selection
  * semantics, both splitters, and tie-breaks. (Cross-engine
  * exactness is carried by the vs_search_summarize oracle.) */
class SummarizeSpec extends SparkSpec {

  test("top-m by term overlap with earlier-position tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "nothing here. vector join here. one vector. also nothing"),
      (2L, "plain text. more plain text")
    ).toDF("id", "text")
      .select(col("id"), Summarize.punctSentences(col("text")).as("sents"))
    val got = Summarize.extract(docs, "id", "sents",
      terms = Seq("vector", "join"), m = 2)
      .select(col("id"), col("pos"), col("sentence"), col("overlap"))
      .orderBy(col("id"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // doc 1: "vector join here" (overlap 2) + "one vector" (overlap 1)
    assert(got.filter(_._1 == 1L).toSeq ==
      Seq((1L, 2L, "vector join here", 2L), (1L, 3L, "one vector", 1L)))
    // doc 2: all overlap 0 → first two sentences by position
    assert(got.filter(_._1 == 2L).map(_._2).toSeq == Seq(1L, 2L))
  }

  test("tokenWindows covers every token and concatenates losslessly") {
    import spark.implicits._
    val df = Seq((1L, (1 to 30).map(i => s"t$i").mkString(" ")))
      .toDF("id", "text")
      .select(col("id"),
        Summarize.tokenWindows(
          graft.functions.TextFunctions.tokens(col("text")), 12).as("w"))
    val windows = df.select(explode(col("w"))).collect().map(_.getString(0))
    assert(windows.length == 3) // 12 + 12 + 6
    assert(windows.mkString(" ") == (1 to 30).map(i => s"t$i").mkString(" "))
  }

  test("tokenWindows of an empty token array is empty (no phantom windows)") {
    import spark.implicits._
    // sequence(0, -1) would yield [0, -1] (descending) → two phantom
    // empty windows where DuckDB's range(0, 0) yields none
    val df = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(Summarize.tokenWindows(col("toks"), 12).as("w"))
    assert(df.head.getSeq[String](0).isEmpty)
  }

  test("punctSentences splits on the literal separator only (no regex surprises)") {
    import spark.implicits._
    val df = Seq((1L, "a.b. c? d. e")).toDF("id", "text")
      .select(Summarize.punctSentences(col("text")).as("s"))
    // "." without a following space is NOT a boundary; "?" is not the separator
    assert(df.head.getSeq[String](0) == Seq("a.b", "c? d", "e"))
  }
}
