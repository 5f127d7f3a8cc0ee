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
}
