package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {

  private def row(a: Seq[Double], b: Seq[Double]) = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
  }

  test("dot product is the sequential double fold") {
    val d = row(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))
      .select(dot(col("a"), col("b"))).head.getDouble(0)
    assert(d == 32.0)
  }

  test("l2 distance matches hand computation") {
    val d = row(Seq(1.0, 2.0), Seq(4.0, 6.0))
      .select(l2Distance(col("a"), col("b"))).head.getDouble(0)
    assert(d == 5.0)
  }

  test("cosine of parallel vectors is 1, distance 0") {
    val c = row(Seq(1.0, 2.0), Seq(2.0, 4.0))
      .select(cosineSimilarity(col("a"), col("b")), cosineDistance(col("a"), col("b"))).head
    assert(math.abs(c.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(c.getDouble(1)) < 1e-12)
  }

  test("negative inner product orders max-inner-product first") {
    val d = row(Seq(1.0, 1.0), Seq(3.0, 4.0))
      .select(negativeInnerProduct(col("a"), col("b"))).head.getDouble(0)
    assert(d == -7.0)
  }

  test("l2Normalize yields unit norm") {
    val n = row(Seq(3.0, 4.0), Seq(0.0, 0.0))
      .select(norm(l2Normalize(col("a")))).head.getDouble(0)
    assert(math.abs(n - 1.0) < 1e-12)
  }

  test("float arrays are cast per element before accumulating") {
    import spark.implicits._
    val d = Seq((Seq(0.1f, 0.2f), Seq(0.3f, 0.4f))).toDF("a", "b")
      .select(dot(col("a"), col("b"))).head.getDouble(0)
    val expected = 0.1f.toDouble * 0.3f.toDouble + 0.2f.toDouble * 0.4f.toDouble
    assert(d == expected)
  }
}
