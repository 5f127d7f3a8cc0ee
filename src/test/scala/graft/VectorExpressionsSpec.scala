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

  test("l1 distance: codegen == interpreted == hand-computed; oracle-order accumulation") {
    import spark.implicits._
    val a = Seq(1.5f, -2.25f, 0.0f, 3.125f)
    val b = Seq(-0.5f, 2.0f, 1.0f, 3.125f)
    val expected = a.zip(b).map { case (x, y) => math.abs(x.toDouble - y.toDouble) }.sum
    val df = Seq((a, b)).toDF("a", "b")
    val codegen = df.select(
      graft.functions.VectorDistance.l1(col("a"), col("b"))).head.getDouble(0)
    assert(codegen == expected)
    // interpreted path (eval) via a filter that defeats codegen fusion is
    // covered by the generic interpreted-vs-codegen test idiom; here use
    // the expression's eval directly
    val expr = graft.functions.VectorDistanceExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      graft.functions.VectorDistance.L1.id)
    assert(expr.eval(null) == expected)
  }

  test("Half: binary16 round-trip is idempotent and within relative 2^-11 on normals") {
    import graft.functions.Half
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 2000) {
      val x = (rnd.nextFloat() - 0.5f) * 100f
      val h = Half.fromHalfBits(Half.toHalfBits(x))
      // idempotent: a half-representable value survives exactly
      assert(Half.fromHalfBits(Half.toHalfBits(h)) == h)
      if (math.abs(x) > 1e-3f)
        assert(math.abs(h - x) <= math.abs(x) * (1.0f / 1024f),
          s"$x -> $h error too large")
    }
    // exact specials
    assert(Half.fromHalfBits(Half.toHalfBits(0.0f)) == 0.0f)
    assert(Half.fromHalfBits(Half.toHalfBits(1.0f)) == 1.0f)
    assert(Half.fromHalfBits(Half.toHalfBits(-2.5f)) == -2.5f)
    assert(Half.fromHalfBits(Half.toHalfBits(65504f)) == 65504f)
    assert(Half.fromHalfBits(Half.toHalfBits(1e30f)).isInfinite)
    // subnormal half range round-trips to within an ulp of 2^-24
    val sub = 3.1e-5f
    assert(math.abs(Half.fromHalfBits(Half.toHalfBits(sub)) - sub) <= 6e-8f)
  }

  test("HalfPackExpr/HalfDistExpr: packed L2 == L2 over dequantized doubles") {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    import spark.implicits._
    import graft.functions.{Half, HalfDistExpr, HalfPackExpr, VectorDistance}
    val rnd = new scala.util.Random(41)
    val vecs = Seq.fill(50)(Seq.fill(32)((rnd.nextFloat() - 0.5f) * 4f))
    val q = Array.fill(32)((rnd.nextDouble() - 0.5) * 4)
    val qHalf = Half.unpackToDouble(Half.pack(q))
    val df = vecs.toDF("v")
      .select(col("v"), toColumn(HalfPackExpr(toExpression(col("v")))).as("hv"))
    val got = df.select(
      toColumn(HalfDistExpr(toExpression(col("hv")), qHalf, VectorDistance.L2.id)).as("d"))
      .collect().map(_.getDouble(0))
    val expected = vecs.map { v =>
      val hv = v.map(x => Half.fromHalfBits(Half.toHalfBits(x)).toDouble)
      math.sqrt(hv.zip(qHalf).map { case (x, y) => (x - y) * (x - y) }.sum)
    }
    got.zip(expected).foreach { case (g, e) => assert(g == e) }
  }

  test("HalfDistExpr cosine clamps similarity to [-1,1]: self-distance is never negative (r17, ADVICE r16)") {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    import spark.implicits._
    import graft.functions.{Half, HalfDistExpr, HalfPackExpr, VectorDistance}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val rnd = new scala.util.Random(43)
    // query = each vector itself: dot/(|x||q|) lands exactly at 1 up
    // to rounding, the regime where the unclamped formula can emit a
    // (tiny) negative distance that pgvector/DuckDB would clamp away.
    // Direct expression eval — the kernel under test, no job per case.
    (1 to 500).foreach { _ =>
      val v = Array.fill(48)((rnd.nextDouble() - 0.5) * 8)
      val packed = Half.pack(v)
      val qHalf = Half.unpackToDouble(packed)
      val d = HalfDistExpr(
        Literal(packed, org.apache.spark.sql.types.BinaryType),
        qHalf, VectorDistance.CosineDist.id).eval(null).asInstanceOf[Double]
      assert(d >= 0.0 && d <= 2.0, s"cosine distance out of [0,2]: $d")
    }
    // and one Spark-side end-to-end case through HalfPackExpr
    // (16 × 2.0: ‖x‖² = 64, √64 = 8 exact, so sim is exactly 1 and
    // the clamped distance exactly 0 — no rounding escape hatch)
    val v0 = Seq(Seq.fill(16)(2.0f))
    val qh = Half.unpackToDouble(Half.pack(v0.head.map(_.toDouble).toArray))
    val d0 = v0.toDF("v")
      .select(toColumn(HalfPackExpr(toExpression(col("v")))).as("hv"))
      .select(toColumn(HalfDistExpr(toExpression(col("hv")), qh,
        VectorDistance.CosineDist.id)).as("d"))
      .head.getDouble(0)
    assert(d0 == 0.0, s"identical-vector cosine distance must clamp to exactly 0, got $d0")
  }

  test("VecLiteralExpr array input: null elements raise the pgvector error, not an NPE (r17, ADVICE r16)") {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    val df = spark.sql("SELECT array(1.0D, cast(null as double), 3.0D) AS a")
    val e = intercept[Exception] {
      df.select(toColumn(graft.functions.VecLiteralExpr(
        toExpression(col("a"))))).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("array must not contain nulls"),
      s"expected the pgvector nulls error, got: ${rootMsg(e)}")
    // null-free arrays still cast (the r16 real[]::vector path)
    val ok = spark.sql("SELECT array(1.0D, 2.0D) AS a")
      .select(toColumn(graft.functions.VecLiteralExpr(toExpression(col("a")))))
      .head.getSeq[Double](0)
    assert(ok == Seq(1.0, 2.0))
  }

  test("SparseDistExpr: two-pointer merge == brute-force map lookup on random sparse vectors") {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    import spark.implicits._
    import graft.functions.{SparseVec, VectorDistance}
    val rnd = new scala.util.Random(59)
    for (trial <- 0 until 20) {
      // random sorted index sets with partial overlap, integer values
      val universe = (0 until 40).map(_ => rnd.nextLong() % 1000).distinct.sorted
      val aPairs = universe.filter(_ => rnd.nextBoolean())
        .map(i => (i, (1 + rnd.nextInt(9)).toDouble))
      val qPairs = universe.filter(_ => rnd.nextBoolean())
        .map(i => (i, (1 + rnd.nextInt(9)).toDouble))
      val qi = qPairs.map(_._1).toArray
      val qv = qPairs.map(_._2).toArray
      val qMap = qPairs.toMap
      val expDot = aPairs.map { case (i, v) => v * qMap.getOrElse(i, 0.0) }.sum
      val aNorm = math.sqrt(aPairs.map(p => p._2 * p._2).sum)
      val qNorm = math.sqrt(qPairs.map(p => p._2 * p._2).sum)
      val df = Seq((aPairs.map(_._1), aPairs.map(_._2))).toDF("sidx", "sval")
      val gotDot = df.select(
        SparseVec.dot(col("sidx"), col("sval"), qi, qv)).head.getDouble(0)
      assert(gotDot == expDot, s"trial $trial dot: $gotDot vs $expDot")
      if (aPairs.nonEmpty && qPairs.nonEmpty) {
        val gotCos = df.select(
          SparseVec.cosineSimilarity(col("sidx"), col("sval"), qi, qv)).head.getDouble(0)
        val expCos = math.max(-1.0, math.min(1.0, expDot / (aNorm * qNorm)))
        assert(gotCos == expCos, s"trial $trial cos: $gotCos vs $expCos")
      }
    }
    // empty corpus vector: dot 0, cosine 0 (zero-safe, no NaN)
    val empty = Seq((Seq.empty[Long], Seq.empty[Double])).toDF("sidx", "sval")
    assert(empty.select(SparseVec.dot(col("sidx"), col("sval"),
      Array(1L), Array(1.0))).head.getDouble(0) == 0.0)
    assert(empty.select(SparseVec.cosineSimilarity(col("sidx"), col("sval"),
      Array(1L), Array(1.0))).head.getDouble(0) == 0.0)
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
