package graft

import org.apache.spark.sql.functions._

/** Contracts of the two r12 inventory additions, beyond the oracle
  * hash: the margin semantics of contrastive pair mining and the
  * slice-membership semantics of incremental dedup. */
class PairMiningSpec extends SparkSpec {

  test("emb_pairs: margin contract — pos < 0.7 ≤ 0.8 ≤ neg, pos ≠ neg, anchors distinct") {
    val rows = SparkEntry.queries("emb_pairs")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, pId, pD, nId, nD) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(pD < 0.7, s"anchor $a: positive dist $pD not inside the margin")
      assert(nD >= 0.8, s"anchor $a: negative dist $nD inside the margin")
      assert(pD <= nD, s"anchor $a: positive farther than negative")
      assert(pId != nId && pId != a && nId != a,
        s"anchor $a: degenerate pair ($pId, $nId)")
    }
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "one pair per anchor")
    // the positive really is the anchor's global nearest: any doc
    // strictly closer than pos_dist would contradict the argmin
    import graft.functions.VectorFunctions.cosineDistance
    val a1 = rows.head.getLong(0)
    val p1 = rows.head.getDouble(2)
    val anchorVec = Tables.embeddings(spark, Sf)
      .filter(col("vec_id") === a1).select(col("embedding")).head.getSeq[Float](0)
    val closer = Tables.embeddings(spark, Sf)
      .filter(col("vec_id") =!= a1)
      .select(cosineDistance(col("embedding"),
        typedLit(anchorVec.toSeq)).as("d"))
      .filter(col("d") < p1)
      .count()
    assert(closer == 0, s"anchor $a1: $closer docs closer than its positive")
  }

  test("dedup_incremental: every pair crosses the batch/corpus slice boundary at jaccard ≥ τ") {
    val rows = SparkEntry.queries("dedup_incremental")(spark, Sf).collect()
    assert(rows.nonEmpty, "fixture must plant at least one cross-slice near-dup")
    rows.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a % 10 == 0, s"doc_a $a is not in the new batch")
      assert(b % 10 != 0, s"doc_b $b is not in the corpus slice")
      assert(j >= 0.8, s"pair ($a,$b) below tau: $j")
    }
  }
}
