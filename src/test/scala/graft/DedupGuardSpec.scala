package graft

import graft.operators.{Dedup, Materializer}
import org.apache.spark.sql.functions._

/** The 100 TB skew guards: hot-shingle df pruning and hot-bucket caps
  * must bound candidate generation on a pathologically skewed corpus
  * while leaving results untouched when they don't bind. */
class DedupGuardSpec extends SparkSpec {

  // 40 docs sharing one ubiquitous boilerplate sentence + unique tails
  private lazy val skewed = {
    import spark.implicits._
    (0 until 40).map { i =>
      (i.toLong, "the common boilerplate header line shared by every document " +
        s"unique tail $i alpha${i * 7} beta${i * 13} gamma${i * 29} delta${i * 31}")
    }.toDF("doc_id", "text")
  }

  test("hot-shingle df pruning bounds shared-shingle candidates") {
    val sh = Dedup.shingleRows(skewed, "doc_id", "text", 3)
    val unbounded = Dedup.shingleCandidates(sh).count()
    val bounded = Dedup.shingleCandidates(sh, maxDf = 5).count()
    assert(unbounded == 40L * 39 / 2) // boilerplate shingles pair everyone
    assert(bounded == 0) // unique tails share nothing under the cap
  }

  test("hot-bucket cap bounds LSH candidates") {
    import spark.implicits._
    // all docs in one band bucket (identical band key)
    val bands = (0 until 40).map(i => (i.toLong, 0, 12345L)).toDF("doc_id", "band_id", "band_key")
    assert(Dedup.candidatePairs(bands).count() == 40L * 39 / 2)
    assert(Dedup.candidatePairs(bands, maxBucket = 10).count() == 0)
  }

  test("caps that do not bind leave results identical (oracle safety)") {
    val docs = Tables.documents(spark, Sf)
    val base = Dedup.ngramJaccard(docs, "doc_id", "text", 4, 0.65)
      .collect().map(_.toSeq).toSeq
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", 4, 0.65, maxShingleDf = 50)
      .collect().map(_.toSeq).toSeq
    assert(base == capped)
    assert(base.nonEmpty) // the comparison must not be vacuous
  }

  test("pruned candidates still verify jaccard on FULL shingle sets") {
    import spark.implicits._
    // two docs: near-identical except tails; plus a hot shingle in all
    val docs = Seq(
      (1L, "alpha beta gamma delta aa bb cc dd ee ff gg hh"),
      (2L, "alpha beta gamma delta aa bb cc dd ee ff gg iy"),
      (3L, "alpha beta gamma delta zz yy xx ww vv uu tt ss")
    ).toDF("doc_id", "text")
    val full = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
    val pruned = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5, maxShingleDf = 2)
    // the boilerplate 3-grams (df=3 > 2) are pruned from candidate
    // generation, but docs 1-2 still share sub-cap shingles and their
    // jaccard (computed on full sets) is unchanged
    val f = full.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val p = pruned.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(f == p)
    assert(f.map(t => (t._1, t._2)) == Seq((1L, 2L)))
  }

  test("hot-block cap bounds embedding near-dup pairs; non-binding cap is identity") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    // one degenerate block (all 40 vectors share blk=0): the
    // within-block join is O(k²) without the guard
    val vecs = (0 until 40).map(i => (i.toLong, 0, Seq(1.0f, 0.0f + i * 1e-4f)))
      .toDF("vec_id", "label", "embedding")
    val unbounded = Dedup.embeddingNearDup(vecs, "vec_id", "embedding",
      "label", VectorFunctions.cosineSimilarity, tau = 0.99)
    assert(unbounded.count() == 40L * 39 / 2) // near-parallel vectors: all pairs
    val capped = Dedup.embeddingNearDup(vecs, "vec_id", "embedding",
      "label", VectorFunctions.cosineSimilarity, tau = 0.99, maxBlock = 10)
    assert(capped.count() == 0) // over-cap block dropped before the join
    // oracle safety on the real corpus: a cap above every block size
    // (labels at sf0.001 hold ~64 vectors) must not change results
    val emb = Tables.embeddings(spark, Sf)
    val base = Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      "label", VectorFunctions.cosineSimilarity, tau = 0.35)
      .collect().map(_.toSeq).toSeq
    val safe = Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      "label", VectorFunctions.cosineSimilarity, tau = 0.35, maxBlock = 10000)
      .collect().map(_.toSeq).toSeq
    assert(base == safe)
    assert(base.nonEmpty)
  }

  test("Materializer.local frees the blocks it owns") {
    // compare ID DELTAS, not absolute sizes: the ContextCleaner may
    // concurrently unpersist stale RDDs from earlier suites
    val sc = spark.sparkContext
    val mat = Materializer.local()
    val before = sc.getPersistentRDDs.keySet.toSet
    val df = mat.mat(Tables.documents(spark, Sf).limit(10), "t")
    assert(df.count() == 10)
    val added = sc.getPersistentRDDs.keySet.toSet -- before
    assert(added.nonEmpty)
    mat.release(df)
    assert((sc.getPersistentRDDs.keySet.toSet & added).isEmpty)
  }

  test("Materializer.parquet persists a restart-survivable table with identical rows") {
    val root = java.nio.file.Files.createTempDirectory("mat").toString
    val mat = Materializer.parquet(root)
    val src = Tables.documents(spark, Sf).select("doc_id", "text").limit(25)
    val m = mat.mat(src, "docs")
    assert(m.collect().map(_.getLong(0)).sorted.toSeq ==
      src.collect().map(_.getLong(0)).sorted.toSeq)
    // the table survives independently of the source lineage
    val reread = spark.read.parquet(s"$root/docs-0")
    assert(reread.count() == 25)
  }

  test("connectedComponents over a parquet materializer matches the local one") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val root = java.nio.file.Files.createTempDirectory("ccmat").toString
    val local = Dedup.connectedComponents(pairs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val persisted = Dedup.connectedComponents(pairs, mat = Materializer.parquet(root))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(local == persisted)
    assert(local == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
  }
}
