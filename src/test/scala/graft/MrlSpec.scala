package graft

import org.apache.spark.sql.functions._

/** The Matryoshka two-phase contract: the coarse pass reads ONLY the
  * (id, head-prefix) sidecar — MrlHead/dims of the full-precision
  * scan IO — and the exact re-rank reaches the
  * corpus through a pushed `In` filter over the constant-size
  * shortlist. Same IO story as BinaryQuantSpec, with an exact (not
  * lossy) coarse metric, so the whole pipeline is bit-reproducible.
  */
class MrlSpec extends SparkSpec {

  test("coarse pass scans the head sidecar only — ReadSchema excludes the full embedding") {
    val plan = queries.VectorQueries.mrlShortlistPlan(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), s"expected a file scan:\n$plan")
    assert(plan.contains("head"), s"coarse pass must read the head prefix:\n$plan")
    assert(!plan.contains("embedding"),
      s"coarse pass must not touch the full-precision column:\n$plan")
  }

  test("re-rank reaches the corpus via a pushed In filter and is run-to-run identical") {
    val q = SparkEntry.queries("vs_mrl_knn")
    val df = q(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(vec_id"),
      s"shortlist ids must push into the full-precision scan:\n$plan")
    val a = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = q(spark, Sf).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, "two-phase MRL search must be deterministic")
    assert(a.nonEmpty && a.map(_._2).sameElements(a.map(_._2).sorted))
  }
}
