package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: a session with GraftExtensions can run the
  * reference's search query shape in pure SQL. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate reuses the shared test session (extensions only
    // apply at construction) → use the runtime registration API
    val s = SparkSpec.session
    GraftExtensions.register(s)
    s
  }

  test("pgvector search shape runs as pure SQL") {
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("embeddings")
    val rows = spark.sql("""
      SELECT e.vec_id,
             vec_l2(e.embedding, q.embedding) AS dist,
             vec_cos_dist(e.embedding, q.embedding) AS cos_d,
             -vec_dot(e.embedding, q.embedding) AS neg_ip
      FROM embeddings e
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE e.vec_id <> 0
      ORDER BY dist, e.vec_id
      LIMIT 5""").collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getDouble(1) > 0 && r.getDouble(2) > 0))
    // ascending by distance
    assert(rows.map(_.getDouble(1)).toSeq == rows.map(_.getDouble(1)).sorted.toSeq)
  }

  test("vec_cos_sim + vec_cos_dist sum to ~1") {
    val r = spark.sql("""
      SELECT vec_cos_sim(array(1.0D, 2.0D), array(2.0D, 3.0D)) AS s,
             vec_cos_dist(array(1.0D, 2.0D), array(2.0D, 3.0D)) AS d""").head
    assert(math.abs(r.getDouble(0) + r.getDouble(1) - 1.0) < 1e-12)
  }

  test("array_max_count runs as pure SQL") {
    val r = spark.sql(
      "SELECT array_max_count(array('a','b','a','a')) AS m, " +
      "array_max_count(cast(array() AS array<string>)) AS e").head
    assert(r.getInt(0) == 3)
    assert(r.isNullAt(1))
  }

  test("vec_l1 is the pgvector <+> taxicab distance") {
    val r = spark.sql(
      "SELECT vec_l1(array(1.0D, 5.0D, -2.0D), array(2.0D, 3.0D, 1.0D)) AS d").head
    assert(r.getDouble(0) == 1.0 + 2.0 + 3.0)
  }

  test("vec_norm / vec_l2_normalize: unit output, zero vector passes through") {
    val r = spark.sql("""
      SELECT vec_norm(array(3.0D, 4.0D)) AS n,
             vec_norm(vec_l2_normalize(array(3.0D, 4.0D))) AS un,
             vec_l2_normalize(array(0.0D, 0.0D)) AS z""").head
    assert(r.getDouble(0) == 5.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getSeq[Double](2) == Seq(0.0, 0.0))
  }

  test("vec_binary_quantize + vec_hamming / vec_jaccard match hand counts") {
    // signs: (+,-,+,+) vs (+,+,-,+): differ at positions 1 and 2
    val r = spark.sql("""
      SELECT vec_hamming(vec_binary_quantize(array(1.0D, -1.0D, 2.0D, 3.0D)),
                         vec_binary_quantize(array(5.0D, 1.0D, -2.0D, 3.0D))) AS h,
             vec_jaccard(vec_binary_quantize(array(1.0D, -1.0D, 2.0D, 3.0D)),
                         vec_binary_quantize(array(5.0D, 1.0D, -2.0D, 3.0D))) AS j""").head
    assert(r.getInt(0) == 2)
    // union bits = 4 (positions 0,1,2,3), intersection = 2 → 1 - 2/4
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12)
  }

  test("vec_subvector is 1-based like pgvector; vec_dims counts elements") {
    val r = spark.sql("""
      SELECT vec_subvector(array(10.0D, 20.0D, 30.0D, 40.0D), 2, 2) AS s,
             vec_dims(array(10.0D, 20.0D, 30.0D)) AS d""").head
    assert(r.getSeq[Double](0) == Seq(20.0, 30.0))
    assert(r.getInt(1) == 3)
  }

  test("vec_half round-trips through binary16 with bounded error") {
    val r = spark.sql("""
      SELECT vec_half_l2(vec_half(array(1.0D, 2.0D, 3.0D)), array(1.0D, 2.0D, 3.0D)) AS self,
             vec_half_dot(vec_half(array(1.0D, 0.5D)), array(2.0D, 4.0D)) AS dot""").head
    // exactly representable halves → zero self-distance, exact dot
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 4.0)
  }

  test("sparse_dot / sparse_cos_sim walk sorted indices") {
    val r = spark.sql("""
      SELECT sparse_dot(array(1L, 5L, 9L), array(2.0D, 3.0D, 4.0D),
                        array(5L, 9L), array(10.0D, 1.0D)) AS d,
             sparse_cos_sim(array(3L), array(2.0D), array(3L), array(5.0D)) AS c""").head
    assert(r.getDouble(0) == 3.0 * 10.0 + 4.0 * 1.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("quantized kernels refuse non-literal query arguments at analysis") {
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("embeddings")
    val err = intercept[Exception] {
      spark.sql("""
        SELECT vec_hamming(vec_binary_quantize(embedding),
                           vec_binary_quantize(embedding)) AS h
        FROM embeddings""").collect()
    }
    assert(err.getMessage.contains("literal"), s"got: ${err.getMessage}")
  }

  test("integer-array query literals widen to bigint; non-integer arrays raise clearly") {
    // int literals (array(1, 5)) previously hit an opaque
    // ClassCastException inside ArrayData.toLongArray (ADVICE r8)
    val wide = spark.sql(
      """SELECT sparse_dot(array(1L, 5L), array(1.0D, 2.0D),
                           array(1, 5), array(1.0D, 2.0D)) AS d""").head.getDouble(0)
    val long0 = spark.sql(
      """SELECT sparse_dot(array(1L, 5L), array(1.0D, 2.0D),
                           array(1L, 5L), array(1.0D, 2.0D)) AS d""").head.getDouble(0)
    assert(wide == long0)
    val err = intercept[Exception] {
      spark.sql(
        """SELECT sparse_dot(array(1L), array(1.0D),
                             array('a'), array(1.0D)) AS d""").head
    }
    assert(err.getMessage.contains("integer array literal"),
      s"got: ${err.getMessage}")
  }
}
