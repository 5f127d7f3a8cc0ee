package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded matches the declared inequality join, incl. band boundaries") {
    // times straddle the power-of-two band boundary at 1024 (w=1000 →
    // k=10) and include negatives (floor-shift, not truncation)
    val left = Seq((1L, "a", 1000L), (2L, "a", 1024L), (3L, "b", 2048L),
      (4L, "b", -8L), (5L, "c", 100L))
      .toDF("lid", "key", "lt")
    val right = Seq((10L, "a", 24L), (11L, "a", 1023L), (12L, "a", 1024L),
      (13L, "b", 2047L), (14L, "b", -1000L), (15L, "b", -1009L),
      (16L, "c", 101L), (17L, "z", 100L))
      .toDF("rid", "key", "rt")

    val got = RangeJoin.banded(left, right, Seq("key"), "lt", "rt",
        lo = -1000L, hi = 0L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet

    val want = left.join(right, Seq("key"))
      .filter(col("rt") > col("lt") - 1000 && col("rt") <= col("lt"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet

    assert(got == want, s"banded $got vs inequality $want")
    // sanity on the fixture itself: boundary rows actually exercised
    assert(want.contains((1L, 10L)) && want.contains((2L, 11L)) &&
      !want.contains((1L, 12L)) && want.contains((4L, 14L)) &&
      !want.contains((4L, 15L)))
  }

  test("plan is an equi-join on (keys, band): no nested loop, no cartesian") {
    val ev = Tables.events(spark, Sf).withColumn("ts_us", expr("ts DIV 1000"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("click_us"), col("value"))
    val plan = RangeJoin.banded(p, c, Seq("user_id"), "ts_us", "click_us",
        -3600000000L, 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join degenerated to a per-key scan:\n$plan")
  }

  test("forward and point windows: lo/hi sign conventions") {
    val left = Seq((1L, "a", 0L)).toDF("lid", "key", "lt")
    val right = Seq((10L, "a", 0L), (11L, "a", 1L), (12L, "a", 500L),
      (13L, "a", 501L)).toDF("rid", "key", "rt")
    // forward window (0, 500]: strictly-after up to +500
    val fwd = RangeJoin.banded(left, right, Seq("key"), "lt", "rt", 0L, 500L)
      .select("rid").as[Long].collect().toSet
    assert(fwd == Set(11L, 12L))
  }

  test("inputs carrying the reserved __band column are rejected, not silently overwritten") {
    val clean = Seq((1L, "a", 0L)).toDF("lid", "key", "lt")
    val dirty = Seq((10L, "a", 0L, 7L)).toDF("rid", "key", "rt", "__band")
    intercept[IllegalArgumentException] {
      RangeJoin.banded(clean, dirty, Seq("key"), "lt", "rt", 0L, 500L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.banded(dirty.withColumnRenamed("rid", "lid2"), clean,
        Seq("key"), "lt", "rt", 0L, 500L)
    }
  }
}
