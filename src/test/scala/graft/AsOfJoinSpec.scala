package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("backward as-of picks the latest right row at or before left ts") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (2L, 15L)).toDF("u", "ts")
    val right = Seq((1L, 5L, 100.0), (1L, 18L, 200.0), (2L, 20L, 300.0))
      .toDF("u", "ts", "v")
    val got = AsOfJoin.backward(left, right, Seq("u"), "ts", Seq("v"))
      .orderBy("u", "ts")
      .select("u", "ts", "ts_asof", "v_asof")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, 10L, Some(5L), Some(100.0)),
      (1L, 20L, Some(18L), Some(200.0)),
      (2L, 15L, None, None)))
  }

  test("payload name colliding with a left column is a hard error") {
    import spark.implicits._
    val left = Seq((1L, 10L, 9.0)).toDF("u", "ts", "v")
    val right = Seq((1L, 5L, 100.0)).toDF("u", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("u"), "ts", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("equal timestamps match inclusively") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("u", "ts")
    val right = Seq((1L, 10L, 7.0)).toDF("u", "ts", "v")
    val got = AsOfJoin.backward(left, right, Seq("u"), "ts", Seq("v"))
      .select("v_asof").head
    assert(got.getDouble(0) == 7.0)
  }
}
