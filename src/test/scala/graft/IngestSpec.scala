package graft

import graft.pipeline.Ingest

class IngestSpec extends SparkSpec {

  private val P = Set('.', ':', ';', '?', '!', ' ')

  test("short text is a single chunk") {
    assert(Ingest.splitText("hello world", 120, 30, P) == Seq("hello world"))
  }

  test("split lands on the last punctuation in the look-back window") {
    // maxLen 10, lookback 4: scan 0-based chars 7..10 for punct
    val text = "abcdef gh ijklmn"
    val got = Ingest.splitText(text, 10, 4, P)
    // chars 7..10 = "h i" → last space at index 9 → chunk = first 9 chars
    assert(got == Seq("abcdef gh", " ijklmn"))
    assert(got.mkString == text)
  }

  test("no punctuation in window → hard cut at maxLen - lookback") {
    val text = "a" * 25
    val got = Ingest.splitText(text, 10, 4, P)
    assert(got.head.length == 6)
    assert(got.mkString == text)
  }

  test("chunks always reassemble to the input") {
    val texts = Seq(
      "x" * 500,
      ("word " * 100).trim,
      "a.b.c.d." * 40,
      "?" * 11)
    for (t <- texts) {
      assert(Ingest.splitText(t, 50, 10, P).mkString == t)
    }
  }

  test("pagenumber is the true source page; chunks of a long page share it") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pages = Seq(
      (1L, 2L, "alpha beta gamma " * 20, "f1"), // long page → several chunks
      (1L, 3L, "short doc", "f1")
    ).toDF("doc_id", "page_number", "text", "source")
    val store = Ingest.toVectorStore(
      pages, "doc_id", "text", "source", pageCol = Some("page_number"))
    val p2 = store.filter(col("pagenumber") === 2L)
    assert(p2.count() > 1) // reference semantics: chunks of one page share pagenumber
    assert(p2.select("chunk_idx").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until p2.count()).toSeq)
    assert(store.filter(col("pagenumber") === 3L).count() == 1)
    assert(store.select("id").distinct().count() == store.count())
  }

  test("chunkByLang halves the budget for zh and matches the fixed chunker elsewhere") {
    import spark.implicits._
    val long = (Seq.fill(40)("word").mkString(" ") + ".") // 200 chars
    val docs = Seq((1L, long, "en"), (2L, long, "zh"), (3L, long, "fr")).toDF("doc_id", "text", "lang")
    val got = Ingest.chunkByLang(docs, "doc_id", "text", "lang",
        Map("zh" -> (60, 15)), (120, 30), " ")
      .select("doc_id", "lang", "chunk_idx", "chunk").collect()
    val byDoc = got.groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(3)).toSeq).toMap
    // en/fr use the (120, 30) budget — identical to the fixed chunker
    val fixed = Ingest.splitText(long, 120, 30, Set(' '))
    assert(byDoc(1L) == fixed && byDoc(3L) == fixed)
    // zh gets the (60, 15) budget: more, shorter chunks
    val zh = Ingest.splitText(long, 60, 15, Set(' '))
    assert(byDoc(2L) == zh)
    assert(byDoc(2L).length > byDoc(1L).length)
    assert(byDoc(2L).forall(_.length <= 60))
  }

  test("vector store pipeline produces the reference schema") {
    val docs = Tables.documents(spark, Sf).limit(20)
    val store = Ingest.toVectorStore(docs, "doc_id", "text", "source")
    assert(store.columns.toSet ==
      Set("id", "embedding", "origntext", "filename", "pagenumber", "chunk_idx", "status"))
    val n = store.count()
    assert(n >= 20)
    // embeddings are unit-normalized 64-dim
    val r = store.select("embedding").head.getSeq[Double](0)
    assert(r.length == 64)
    assert(math.abs(math.sqrt(r.map(x => x * x).sum) - 1.0) < 1e-9)
  }
}
