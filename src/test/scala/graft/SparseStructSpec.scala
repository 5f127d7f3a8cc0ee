package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{SparseVec, VectorDistance}

/** The ONE-COLUMN sparsevec type (r17): a stored
  * `struct<indices, values, dims>` column carries pgvector's
  * sparsevec semantics end-to-end — the verbatim
  * `sparse_col <-> '...'::sparsevec` operator forms, the
  * vector↔sparsevec casts, and bit-exact agreement with the
  * (indices, values) pair kernels the indexes serve. */
class SparseStructSpec extends SparkSpec {

  private val Dims = 64

  /** Deterministic small sparse fixture: id, pair layout, and the
    * struct column assembled from it. Indices are 1-based mod-Dims
    * buckets like the vs_sparsevec_col store. */
  private def fixture(s: SparkSession): DataFrame = {
    import graft.functions.TextFunctions._
    Tables.documents(s, Sf)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), (hash64(col("w")) % Dims + 1).as("ix"))
      .agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), struct(col("ix").as("h"), col("tf").cast("double").as("v")).as("p"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("p"))).as("ps"))
      .select(col("doc_id"),
        transform(col("ps"), p => p("h")).as("si"),
        transform(col("ps"), p => p("v")).as("sv"))
  }

  private def structCol = SparseVec.toStructColumn(col("si"), col("sv"), Dims)

  private val qPairs: Seq[(Long, Double)] = Seq(3L -> 2.0, 17L -> 1.0, 40L -> 3.0)
  private val qText = qPairs.map { case (i, v) => s"$i:${v.toLong}" }
    .mkString("{", ",", "}") + s"/$Dims"

  test("struct kernels are bit-identical to the pair kernels") {
    val df = fixture(spark)
    val qi = qPairs.map(_._1).toArray
    val qv = qPairs.map(_._2).toArray
    val both = df.select(col("doc_id"),
      SparseVec.structDist(structCol, SparseVec.structLiteral(qText),
        VectorDistance.L2).as("s_l2"),
      SparseVec.l2Distance(col("si"), col("sv"), qi, qv).as("p_l2"),
      SparseVec.structDist(structCol, SparseVec.structLiteral(qText),
        VectorDistance.L1).as("s_l1"),
      SparseVec.l1Distance(col("si"), col("sv"), qi, qv).as("p_l1"),
      SparseVec.structDist(structCol, SparseVec.structLiteral(qText),
        VectorDistance.Dot).as("s_dot"),
      SparseVec.dot(col("si"), col("sv"), qi, qv).as("p_dot"),
      SparseVec.structDist(structCol, SparseVec.structLiteral(qText),
        VectorDistance.CosineSim).as("s_cos"),
      SparseVec.cosineSimilarity(col("si"), col("sv"), qi, qv).as("p_cos"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"l2 mismatch at ${r.get(0)}")
      assert(r.getDouble(3) == r.getDouble(4), s"l1 mismatch at ${r.get(0)}")
      assert(r.getDouble(5) == r.getDouble(6), s"dot mismatch at ${r.get(0)}")
      assert(r.getDouble(7) == r.getDouble(8), s"cos mismatch at ${r.get(0)}")
    }
  }

  test("mismatched dims raise pgvector's error") {
    val df = fixture(spark).limit(1)
    val err = intercept[Exception] {
      df.select(SparseVec.structDist(structCol,
        SparseVec.structLiteral(s"{1:1}/${Dims + 1}"), VectorDistance.L2)).collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root(t.getCause)
    assert(root(err).getMessage.contains(
      s"different sparsevec dimensions $Dims and ${Dims + 1}"))
  }

  // --------------------------------------- verbatim SQL operator forms
  private def withExtSession[T](f: SparkSession => T): T = {
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("pgvector's one-column operator forms run verbatim on a struct column") {
    withExtSession { s =>
      fixture(s).select(col("doc_id"), structCol.as("sv"))
        .createOrReplaceTempView("sparse_docs")
      // the DataFrame-API ground truth for each operator
      val want = fixture(s).select(col("doc_id"),
        SparseVec.structDist(structCol, SparseVec.structLiteral(qText),
          VectorDistance.L2).as("l2"),
        SparseVec.structDist(structCol, SparseVec.structLiteral(qText),
          VectorDistance.Dot).as("dot"),
        SparseVec.structDist(structCol, SparseVec.structLiteral(qText),
          VectorDistance.CosineDist).as("cosd"),
        SparseVec.structDist(structCol, SparseVec.structLiteral(qText),
          VectorDistance.L1).as("l1"))
        .orderBy(col("l2"), col("doc_id")).limit(5).collect()
      val got = s.sql(
        s"""SELECT doc_id,
                   sv <-> '$qText'::sparsevec AS l2,
                   -(sv <#> '$qText'::sparsevec) AS dot,
                   sv <=> '$qText'::sparsevec AS cosd,
                   sv <+> '$qText'::sparsevec AS l1
            FROM sparse_docs
            ORDER BY l2, doc_id
            LIMIT 5""").collect()
      assert(got.length == want.length && got.nonEmpty)
      got.zip(want).foreach { case (g, w) =>
        assert(g.getLong(0) == w.getLong(0))
        (1 to 4).foreach(i => assert(g.getDouble(i) == w.getDouble(i),
          s"operator column $i differs at doc ${g.getLong(0)}"))
      }
    }
  }

  test("SparseColumnRule swaps the dense kernel for struct operands") {
    withExtSession { s =>
      // the builder path can't see types here: VectorDistance.l2 builds
      // the DENSE expr over struct operands; only the injected
      // resolution rule makes this analyzable + correct
      val df = fixture(s).select(col("doc_id"),
        VectorDistance.l2(structCol, SparseVec.structLiteral(qText)).as("d"))
      assert(df.queryExecution.optimizedPlan.expressions.exists(
        _.exists(_.isInstanceOf[graft.functions.SparseStructDistExpr])))
      val viaRule = df.orderBy(col("d"), col("doc_id")).limit(3).collect()
      val direct = fixture(s).select(col("doc_id"),
        SparseVec.structDist(structCol, SparseVec.structLiteral(qText),
          VectorDistance.L2).as("d"))
        .orderBy(col("d"), col("doc_id")).limit(3).collect()
      assert(viaRule.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        direct.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    }
  }

  test("vector::sparsevec and sparsevec::vector casts round-trip") {
    withExtSession { s =>
      // dense -> sparse: zeros dropped, 1-based indices, dims = length
      val sv = s.sql(
        "SELECT vec_dims(ARRAY(0.0D, 1.5D, 0.0D, -2.0D)::sparsevec) AS d, " +
          "(ARRAY(0.0D, 1.5D, 0.0D, -2.0D)::sparsevec).indices AS i, " +
          "(ARRAY(0.0D, 1.5D, 0.0D, -2.0D)::sparsevec).values AS v").head
      assert(sv.getInt(0) == 4)
      assert(sv.getSeq[Long](1) == Seq(2L, 4L))
      assert(sv.getSeq[Double](2) == Seq(1.5, -2.0))
      // sparse -> dense: literal text through both casts
      val dense = s.sql("SELECT '{1:1.5,3:2}/5'::sparsevec::vector AS v").head
      assert(dense.getSeq[Double](0) == Seq(1.5, 0.0, 2.0, 0.0, 0.0))
      // pgvector's vector dim cap refuses a wide expansion
      val err = intercept[Exception] {
        s.sql("SELECT '{1:1}/16001'::sparsevec::vector").collect()
      }
      def root(t: Throwable): Throwable =
        if (t.getCause == null || t.getCause == t) t else root(t.getCause)
      assert(root(err).getMessage.contains(
        "vector cannot have more than 16000 dimensions"))
    }
  }

  test("vs_sparsevec_col matches its oracle shape at spec scale") {
    // the oracled entry itself runs against sf0.001 here as a smoke
    // (the driver's DuckDB gate is authoritative at sf0.01)
    val rows = SparkEntry.queries("vs_sparsevec_col")(spark, Sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getDouble(1)).toSeq.sliding(2).forall(p => p.head <= p.last))
  }
}
