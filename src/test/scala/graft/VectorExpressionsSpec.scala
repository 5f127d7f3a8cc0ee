package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The fused codegen expression must be bit-identical to the
  * declarative HOF spec (and therefore to the DuckDB oracle) on real
  * float embeddings. */
class VectorExpressionsSpec extends SparkSpec {

  private lazy val pairs = {
    val e = Tables.embeddings(spark, Sf)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    e.filter(col("vec_id") =!= 0).crossJoin(q).limit(200)
  }

  test("codegen l2 == HOF l2, bitwise, on float embeddings") {
    val diff = pairs.select(
      VectorFunctions.l2Distance(col("embedding"), col("qvec")).as("a"),
      VectorFunctions.l2DistanceHof(col("embedding"), col("qvec")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("codegen cosine distance == HOF, bitwise") {
    val diff = pairs.select(
      VectorFunctions.cosineDistance(col("embedding"), col("qvec")).as("a"),
      VectorFunctions.cosineDistanceHof(col("embedding"), col("qvec")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("codegen dot == HOF dot, bitwise") {
    val diff = pairs.select(
      VectorFunctions.dot(col("embedding"), col("qvec")).as("a"),
      VectorFunctions.dotHof(col("embedding"), col("qvec")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("dimension mismatch raises (pgvector/DuckDB parity), never truncates") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.l2Distance(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("interpreted eval matches codegen path") {
    // force interpreted: evaluate via collect on a tiny frame where
    // codegen may fall back; compare both metric modes by hand
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, 0.25f, 2.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")),
      VectorFunctions.l2Distance(col("a"), col("b"))).head
    val exp = 1.0f.toDouble * 0.5f.toDouble + 2.0f.toDouble * 0.25f.toDouble + 3.0f.toDouble * 2.0f.toDouble
    assert(r.getDouble(0) == exp)
  }

  test("NearestCellsExpr == sort-based reference on random inputs (incl. ties, spill > nlist)") {
    // the insertion-selection kernel vs a trivially-correct full sort,
    // across random geometry, duplicate centroids (dist ties), float
    // and double inputs, and spill clamped past nlist
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 30) {
      val dims = 1 + rnd.nextInt(8)
      val nlist = 1 + rnd.nextInt(12)
      val spill = 1 + rnd.nextInt(6) // sometimes > nlist
      // low-entropy coordinates force real distance ties
      val cents = Array.tabulate(nlist)(_ =>
        Array.fill(dims)(rnd.nextInt(3).toDouble))
      val ids = Array.tabulate(nlist)(i => i * 3 + 1) // non-contiguous ids
      val vecs = Seq.fill(40)(Seq.fill(dims)(rnd.nextInt(3).toFloat))
      def ref(v: Seq[Float]): Seq[Int] =
        cents.zip(ids).map { case (c, id) =>
          val d = math.sqrt(v.map(_.toDouble).zip(c)
            .map { case (x, y) => (x - y) * (x - y) }.sum)
          (d, id)
        }.sortBy(identity).take(spill).map(_._2).toSeq
      val got = vecs.toDF("v")
        .select(toColumn(graft.functions.NearestCellsExpr(
          toExpression(col("v")), ids, cents, spill)).as("cells"))
        .collect().map(_.getSeq[Int](0).toSeq)
      for ((v, g) <- vecs.zip(got))
        assert(g == ref(v), s"trial $trial dims=$dims nlist=$nlist spill=$spill: $g vs ${ref(v)}")
    }
  }
}
