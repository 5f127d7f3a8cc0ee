package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical normalized text") {
    val d = Dedup.exact(docs(
      1L -> "the quick brown fox",
      2L -> "  the quick brown fox  ",
      3L -> "something else"), "doc_id", "text")
    val m = d.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(m(1L) == (1L, false))
    assert(m(2L) == (1L, true))
    assert(m(3L) == (3L, false))
  }

  test("minhash LSH finds a planted near-duplicate") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 59).map(i => s"tok$i").mkString(" ") + " changed"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val pairs = Dedup.minhashLsh(docs(1L -> base, 2L -> nearDup, 3L -> other),
      "doc_id", "text", shingleN = 3, numHashes = 64, bands = 16, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("simhash pairs catches small hamming perturbations only") {
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val near = (1 to 79).map(i => s"tok$i").mkString(" ") + " tokX"
    val far = (200 to 280).map(i => s"z$i").mkString(" ")
    val got = Dedup.simhashPairs(docs(1L -> base, 2L -> near, 3L -> far),
      "doc_id", "text", tau = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.contains((1L, 3L)))
  }

  test("connected components merges chains and keeps separate clusters apart") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3) plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("ngram jaccard is exact on hand-computed sets") {
    // doc1: shingles {a b, b c, c d}; doc2: {a b, b c, c e}
    // shared 2, union 4 → jaccard 0.5
    val got = Dedup.ngramJaccard(docs(1L -> "a b c d", 2L -> "a b c e"),
      "doc_id", "text", shingleN = 2, tau = 0.4)
      .collect()
    assert(got.length == 1)
    assert(got.head.getDouble(2) == 0.5)
  }

  test("connected components converge on a 64-node chain within 20 rounds (pointer jumping)") {
    import spark.implicits._
    // diameter 63: plain min-label propagation needs ~63 rounds and
    // would hit the maxIters=20 require(); the adaptive shortcut
    // rounds must converge logarithmically, all labels → 0
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain, maxIters = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 64)
    assert(got.forall(_._2 == 0L), s"non-min labels: ${got.filter(_._2 != 0L).take(5).toSeq}")
  }
}
