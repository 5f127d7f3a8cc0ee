package graft

import graft.operators.{Decontaminate, Pack, Pii}
import org.apache.spark.sql.functions._

/** Curation operators as standalone units: PII scan/redact semantics,
  * decontamination overlap counting and its broadcast shape, packing
  * placement arithmetic. (Cross-engine exactness is carried by the
  * pii_scan / decontam_ngram / pack_tokens oracles.) */
class CurationSpec extends SparkSpec {

  test("Pii.redact replaces every span of every type; counts are per-type on raw text") {
    import spark.implicits._
    val df = Seq(
      "mail a@b.io and c.d@e.org call 555-123-4567 twice 555-123-4567 from 10.0.0.1",
      "clean row with number 123 and word.dot",
    ).toDF("t")
    val cols = Pii.redact(col("t")).as("r") +:
      Pii.counts(col("t")).map { case (n, c) => c.as(n) }
    val got = df.select(cols: _*).collect()
    assert(got(0).getString(0) ==
      "mail <EMAIL> and <EMAIL> call <PHONE> twice <PHONE> from <IP>")
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3)) == ((2L, 2L, 1L)))
    assert(got(1).getString(0) == "clean row with number 123 and word.dot")
    assert((got(1).getLong(1), got(1).getLong(2), got(1).getLong(3)) == ((0L, 0L, 0L)))
  }

  test("Decontaminate.overlaps counts distinct shared n-grams, ignores bench-internal dupes") {
    import spark.implicits._
    // corpus doc 1 shares the 3-gram "a b c" (once, despite appearing
    // twice in doc 1 — distinct per doc) and "b c d"; doc 2 shares none
    val corpus = Seq(
      (1L, "a b c a b c d"), // distinct 3-grams: "a b c","b c a","c a b","b c d"
      (2L, "x y z w"),
    ).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c d e"), (10L, "a b c x")).toDF("doc_id", "text")
    val got = Decontaminate.overlaps(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: 4 distinct shingles, 2 shared ("a b c", "b c d")
    assert(got.toSeq == Seq((1L, 4L, 2L)))
  }

  test("Decontaminate corpus side joins against a broadcast bench set (no corpus shuffle)") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c")).toDF("doc_id", "text")
    val plan = Decontaminate.overlaps(corpus, bench, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("Mix.sample keeps exactly the rows the hash predicate selects; unknown sources drop") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "zzz")).toDF("doc_id", "source")
    val rates = Seq("a" -> 10000, "b" -> 0) // a: keep always, b/unknown: never
    val got = graft.operators.Mix.sample(docs, "doc_id", "source", rates, "s1")
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(got.forall(_.getDouble(3) == 1.0)) // weight = 10000/10000
    // selection is the documented pure function of (seed, id)
    val kept = graft.functions.TextFunctions.hash64Scala("s1:3") % 10000 < 0
    assert(!kept)
  }

  test("Mix.sample is reproducible and partitioning-independent") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val rates = Seq("src0" -> 3000, "src1" -> 7000, "src2" -> 500)
    def ids(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Mix.sample(df, "doc_id", "source", rates, "seed-x")
        .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val a = ids(docs)
    assert(a == ids(docs.repartition(7)))
    // and matches the JVM twin of the hash rule exactly
    val rateMap = rates.toMap
    val expect = (1L to 200L).filter { i =>
      val bp = rateMap(s"src${i % 3}")
      graft.functions.TextFunctions.hash64Scala(s"seed-x:$i") % 10000 < bp
    }
    assert(a == expect)
  }

  test("Dedup.sharedSpans flags only cross-document verbatim windows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t u"),        // shares window "q r s" span with doc 2
      (2L, "z q r s t y"),
      (3L, "a a a b b b"),        // within-doc only — no cross-doc window
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.sharedSpans(docs, "doc_id", "text", w = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1+2 share "q r s" and "r s t" (2 of each's 4 windows); doc 3 absent
    assert(got.toSeq == Seq((1L, 4L, 2L), (2L, 4L, 2L)))
  }

  test("Pack.pack places docs on the concatenated stream; boundary-crossing doc spans bins") {
    import spark.implicits._
    val docs = Seq(
      ("s1", 1L, 6L), ("s1", 2L, 3L), ("s1", 3L, 5L), // stream: 0..6, 6..9, 9..14
      ("s2", 1L, 10L),                                 // groups pack independently
    ).toDF("source", "doc_id", "n_tokens")
    val got = Pack.pack(docs, "source", "doc_id", "n_tokens", budget = 8L)
      .orderBy("source", "doc_id")
      .select("source", "start_off", "end_off", "first_bin", "last_bin", "bins_spanned")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("s1", 0L, 6L, 0L, 0L, 1L),
      ("s1", 6L, 9L, 0L, 1L, 2L),  // crosses the 8-token cut
      ("s1", 9L, 14L, 1L, 1L, 1L),
      ("s2", 0L, 10L, 0L, 1L, 2L),
    ))
  }

  test("Pack.pack zero-length doc sits at its boundary without underrunning first_bin") {
    import spark.implicits._
    val docs = Seq(("s", 1L, 8L), ("s", 2L, 0L), ("s", 3L, 1L)).toDF("source", "doc_id", "n_tokens")
    val got = Pack.pack(docs, "source", "doc_id", "n_tokens", budget = 8L)
      .orderBy("doc_id")
      .select("first_bin", "last_bin", "bins_spanned")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 2: start=end=8 → bin 1, zero extent, never last_bin < first_bin
    assert(got.toSeq == Seq((0L, 0L, 1L), (1L, 1L, 1L), (1L, 1L, 1L)))
  }
}
