package graft

import graft.operators.Salt
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.events(spark, Sf)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    val salted = Salt.saltedSumCount(
      ev, Seq("event_type"), col("event_id"), salts = 8,
      Map("sum_value" -> col("value").cast("decimal(18,6)")))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("double-typed sum expressions are rejected (order-dependent addition)") {
    val ev = Tables.events(spark, Sf)
    val e = intercept[IllegalArgumentException] {
      Salt.saltedSumCount(ev, Seq("event_type"), col("event_id"), salts = 8,
        Map("sum_value" -> col("value")))
    }
    assert(e.getMessage.contains("decimal"))
  }

  test("salt is deterministic and in range") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
      .select(Salt.saltOf(col("id"), 8).as("s"))
    val a = df.collect().map(_.getInt(0))
    val b = df.collect().map(_.getInt(0))
    assert(a.toSeq == b.toSeq)
    assert(a.forall(s => s >= 0 && s < 8))
    assert(a.distinct.length == 8)
  }
}
