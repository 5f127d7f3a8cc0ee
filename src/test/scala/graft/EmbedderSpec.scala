package graft

import graft.operators.Knn
import graft.pipeline.{FeatureHashEmbedder, Ingest, Word2VecEmbedder}
import org.apache.spark.sql.functions._

/** The embedding seam: swapping the model must change ONLY the
  * embedding column — ids, chunks, status, pagination all stay put —
  * and a swapped-in trained model must work end-to-end through
  * toVectorStore → Knn (the reference's ingest → search round trip
  * with a different brain). */
class EmbedderSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf).limit(40)

  test("default embedder IS FeatureHashEmbedder: bit-identical store rows") {
    val a = Ingest.toVectorStore(docs, "doc_id", "text", "source")
      .orderBy(col("id")).collect()
    val b = Ingest.toVectorStore(docs, "doc_id", "text", "source",
        embedder = FeatureHashEmbedder(64))
      .orderBy(col("id")).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("FeatureHashEmbedExpr is bit-identical to the HOF composition (incl. empty input)") {
    import spark.implicits._
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val base = docs.select(col("text"))
      .union(Seq("", "one").toDF("text"))
      .select(Ingest.tokenDimHashes(toks, 64).as("hs"))
      // a genuinely token-free row ("" still split()s to [""]): the
      // zero-safe contract makes it the ZERO vector in BOTH forms
      .union(Seq(Seq.empty[Long]).toDF("hs"))
    val hof = base.select(Ingest.embedFromHashes(col("hs"), 64).as("e"))
      .collect().map(_.getSeq[Double](0))
    val fused = base.select(toColumn(
        graft.functions.FeatureHashEmbedExpr(toExpression(col("hs")), 64)).as("e"))
      .collect().map(_.getSeq[Double](0))
    assert(hof.length == fused.length)
    // zero-safe contract: no NaN anywhere — empty inputs are zero vectors
    assert(!fused.flatten.exists(_.isNaN), "NaN leaked from the fused embedder")
    assert(fused.exists(_.forall(_ == 0.0)), "expected a zero-vector row for empty input")
    for ((a, b) <- hof.zip(fused)) {
      assert(a.length == b.length)
      for ((x, y) <- a.zip(b))
        assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y),
          s"bit mismatch: $x vs $y")
    }
  }

  test("swapping embedders changes only the embedding column") {
    val fh = Ingest.toVectorStore(docs, "doc_id", "text", "source")
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val w2v = Word2VecEmbedder.fit(docs.select(toks.as("toks")), "toks", dims = 16)
    val sw = Ingest.toVectorStore(docs, "doc_id", "text", "source", embedder = w2v)
    def meta(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "origntext", "filename", "pagenumber", "chunk_idx", "status")
      .orderBy(col("id")).collect().toSeq
    assert(meta(fh) == meta(sw))
    assert(sw.select(size(col("embedding"))).head.getInt(0) == 16)
    assert(fh.select(size(col("embedding"))).head.getInt(0) == 64)
  }

  test("trained word2vec embedder works end-to-end: store -> knn self-retrieval") {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val w2v = Word2VecEmbedder.fit(docs.select(toks.as("toks")), "toks", dims = 16)
    val store = Ingest.toVectorStore(docs, "doc_id", "text", "source",
      embedder = w2v).cache()
    // query with a stored chunk's own embedding: the chunk itself must
    // come back first at distance ~0 (L2-normalized vectors)
    val probe = store.orderBy(col("id")).limit(1)
      .select(col("id").as("probe_id"), col("embedding").as("qvec")).collect().head
    val hits = Knn.topK(store, "id", "embedding",
      store.orderBy(col("id")).limit(1).select(col("embedding").as("qvec")),
      "qvec", graft.functions.VectorFunctions.l2Distance, 3).collect()
    assert(hits.head.getString(0) == probe.getString(0),
      s"self-retrieval failed: ${hits.map(_.getString(0)).mkString(",")}")
    assert(hits.head.getDouble(1) < 1e-9)
    store.unpersist()
  }

  test("zero-vocabulary-overlap rows embed to the zero vector, not null/NaN") {
    import spark.implicits._
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val w2v = Word2VecEmbedder.fit(docs.select(toks.as("toks")), "toks", dims = 8)
    val odd = Seq(("x1", "zzzqqqxyzzy nonvocab", "f")).toDF("doc_id", "text", "source")
    val row = Ingest.toVectorStore(odd, "doc_id", "text", "source", embedder = w2v)
      .select(col("embedding")).head.getSeq[Double](0)
    assert(row.length == 8 && row.forall(v => v == 0.0))
  }
}
