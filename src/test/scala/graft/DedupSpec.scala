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

  test("clone-collapsed ngram pairs: g-clone groups emit one rep pair with group sizes") {
    val a = (1 to 30).map(i => s"tok$i").mkString(" ")
    val aNear = (1 to 29).map(i => s"tok$i").mkString(" ") + " changed"
    val other = (100 to 130).map(i => s"w$i").mkString(" ")
    // 3 exact clones of a, 2 of its near-dup, 1 unrelated
    val d = docs(1L -> a, 2L -> a, 3L -> ("  " + a + " "),
      4L -> aNear, 5L -> aNear, 6L -> other)
    val pairs = Dedup.ngramJaccardCollapsed(d, "doc_id", "text",
      shingleN = 3, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // raw pairing would emit 3·2=6 cross pairs (+ 3+1 within-group);
    // collapsed: exactly ONE pair (rep 1, rep 4) carrying the sizes
    assert(pairs.toSeq == Seq((1L, 4L, 3L, 2L)))
  }

  test("clone-collapsed IVF embedding pairs: identical vectors emit one rep pair with group sizes") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    // 3 bit-identical copies of vA, 2 of its near-dup vB (cos≈0.96),
    // 1 orthogonal singleton. Raw pairing inside a shared cell would
    // emit 3+1 within-group cos=1.0 pairs and 3·2 cross pairs; the
    // collapsed contract emits exactly ONE rep pair carrying sizes.
    val vA = Seq(1.0f, 0.0f)
    val vB = Seq(0.96f, 0.28f)
    val vC = Seq(0.0f, 1.0f)
    val emb = Seq(1L -> vA, 2L -> vA, 3L -> vA, 4L -> vB, 5L -> vB, 6L -> vC)
      .toDF("vec_id", "embedding")
    // spill 2 of nlist 2: every rep joins both cells, so the blocking
    // cannot miss a pair — the assertion isolates the collapse logic
    val pairs = Dedup.embeddingNearDupIvf(emb, "vec_id", "embedding",
      VectorFunctions.cosineSimilarity, tau = 0.9, nlist = 2, spill = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(pairs.toSeq == Seq((1L, 4L, 3L, 2L)))
  }

  test("ngramSurvivors: per-doc survivor mapping, linear output, clones + near-dups merged") {
    val a = (1 to 30).map(i => s"tok$i").mkString(" ")
    val aNear = (1 to 29).map(i => s"tok$i").mkString(" ") + " changed"
    val other = (100 to 130).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> a, 2L -> a, 4L -> aNear, 6L -> other)
    val m = Dedup.ngramSurvivors(d, "doc_id", "text", shingleN = 3, tau = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(m(1L) == (1L, false)) // cluster root
    assert(m(2L) == (1L, true))  // exact clone of 1
    assert(m(4L) == (1L, true))  // near-dup joins 1's cluster
    assert(m(6L) == (6L, false)) // untouched singleton
    assert(m.size == 4)
  }

  test("pairCap bounds pairs per doc and keeps the strongest; non-binding cap is identity") {
    // doc 1 is near-dup of 2, 3, 4 at descending jaccard
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d1 = (1 to 39).map(i => s"tok$i").mkString(" ") + " x"   // closest
    val d2 = (1 to 37).map(i => s"tok$i").mkString(" ") + " x y z"
    val d3 = (1 to 35).map(i => s"tok$i").mkString(" ") + " p q r s t"
    val d = docs(1L -> base, 2L -> d1, 3L -> d2, 4L -> d3)
    val uncapped = Dedup.ngramJaccard(d, "doc_id", "text", shingleN = 3, tau = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val doc1Pairs = uncapped.filter(_._1 == 1L)
    assert(doc1Pairs.length == 3)
    val capped = Dedup.ngramJaccard(d, "doc_id", "text", shingleN = 3, tau = 0.1,
      pairCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val capped1 = capped.filter(_._1 == 1L)
    assert(capped1.length == 2, s"cap must bind: ${capped1.toSeq}")
    // the kept two are doc 1's strongest pairs
    val strongest = doc1Pairs.sortBy(p => (-p._3, p._2)).take(2).map(_._2).toSet
    assert(capped1.map(_._2).toSet == strongest)
    val nonBinding = Dedup.ngramJaccard(d, "doc_id", "text", shingleN = 3, tau = 0.1,
      pairCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(nonBinding.map(p => (p._1, p._2)).toSeq == uncapped.map(p => (p._1, p._2)).toSeq)
    // capPairs reconstructs sim as 1−(1−sim): exact for sim ≥ 0.5
    // (Sterbenz), within an ulp below — tolerance, not bit-equality
    nonBinding.zip(uncapped).foreach { case (nb, u) =>
      assert(math.abs(nb._3 - u._3) < 1e-12, s"$nb vs $u") }
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
