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

  test("output name colliding with a left column is a hard error") {
    import spark.implicits._
    val left = Seq((1L, 10L, 9.0)).toDF("u", "ts", "v_asof")
    val right = Seq((1L, 5L, 100.0)).toDF("u", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("u"), "ts", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("left column sharing a payload name is untouched (payload rides the struct)") {
    import spark.implicits._
    val left = Seq((1L, 10L, 9.0)).toDF("u", "ts", "v")
    val right = Seq((1L, 5L, 100.0)).toDF("u", "ts", "v")
    val got = AsOfJoin.backward(left, right, Seq("u"), "ts", Seq("v"))
      .select("v", "v_asof").head
    assert(got.getDouble(0) == 9.0 && got.getDouble(1) == 100.0)
  }

  test("match is atomic: a NULL in the newest right row does not fall back to an older row") {
    import spark.implicits._
    val left = Seq((1L, 30L)).toDF("u", "ts")
    val right = Seq(
      (1L, 5L, Option(100.0), Option("old")),
      (1L, 20L, Option.empty[Double], Option("new"))).toDF("u", "ts", "v", "tag")
    val got = AsOfJoin.backward(left, right, Seq("u"), "ts", Seq("v", "tag"))
      .select("ts_asof", "v_asof", "tag_asof").head
    // both payload columns come from the ts=20 row; its NULL v stays NULL
    assert(got.getLong(0) == 20L && got.isNullAt(1) && got.getString(2) == "new")
  }

  test("right rows tying on (keys, ts) resolve deterministically") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("u", "ts")
    val right = Seq((1L, 10L, 7.0), (1L, 10L, 3.0), (1L, 10L, 5.0)).toDF("u", "ts", "v")
    val got = (1 to 3).map { _ =>
      AsOfJoin.backward(left, right.repartition(4), Seq("u"), "ts", Seq("v"))
        .select("v_asof").head.getDouble(0)
    }
    assert(got.distinct.size == 1 && got.head == 7.0) // max payload struct wins
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
