package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {

  private def ns(sec: Long): Long = sec * 1000000000L

  test("streaming windowed counts match the batch twin on a replay") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc_out")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ns(100), 1, "click", 1.0),
        Event(2, ns(200), 1, "click", 2.0),
        Event(3, ns(3700), 2, "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close both windows
      input.addData(Event(4, ns(100000), 3, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("wc_out")
        .select("bucket_start", "event_type", "n_events")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got.contains((0L, "click", 2L)))
      assert(got.contains((3600L, "view", 1L)))
    } finally q.stop()
  }

  test("streaming windowed KLL quantiles stay within rank-error bound of the exact batch") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedQuantiles(input.toDF())
      .writeStream.format("memory").queryName("wq_out")
      .outputMode("append").start()
    val rnd = new scala.util.Random(17)
    val vals = Array.fill(3000)(rnd.nextGaussian() * 50 + 10)
    try {
      // two micro-batches into the SAME window: the second batch's
      // sketch must MERGE with the first's state-store buffer
      input.addData(vals.take(1500).zipWithIndex.map { case (v, i) =>
        Event(i.toLong, ns(100 + i % 600), i.toLong % 7, "click", v) }.toSeq)
      q.processAllAvailable()
      input.addData(vals.drop(1500).zipWithIndex.map { case (v, i) =>
        Event(9000L + i, ns(700 + i % 600), i.toLong % 7, "click", v) }.toSeq)
      q.processAllAvailable()
      // advance the watermark to close the window
      input.addData(Event(99999L, ns(1000000), 1, "flush", 0.0))
      q.processAllAvailable()
      val got = spark.table("wq_out")
        .filter(col("event_type") === "click")
        .collect().map(r => (r.getDouble(2), r.getDouble(3))).toMap
      assert(got.keySet == Set(0.5, 0.95))
      val sorted = vals.sorted
      for ((p, est) <- got) {
        val rank = sorted.count(_ <= est).toDouble / sorted.length
        assert(math.abs(rank - p) <= 0.03,
          f"streaming sketch rank error at p=$p: ${math.abs(rank - p)}%.4f")
      }
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks within the hour") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStream.clickToPurchase(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("cp_out")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(1, ns(9000), 7, "click", 0.0),  // 1000s before → inside the hour
        Event(2, ns(4000), 7, "click", 0.0))  // 6000s before → outside the hour
      purchases.addData(Event(10, ns(10000), 7, "purchase", 99.0))
      q.processAllAvailable()
      val got = spark.table("cp_out")
        .select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((10L, 1L)))
    } finally q.stop()
  }

  test("stateful sessionization splits on the idle gap") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // one user: two events 10 min apart, then a 2-hour gap, then one more
      input.addData(
        Event(1, ns(0), 7, "click", 1.0),
        Event(2, ns(600), 7, "click", 2.0),
        Event(3, ns(600 + 7200), 7, "click", 3.0))
      q.processAllAvailable()
      val got = spark.table("sess_out").as[SessionOut].collect()
      // first session closed by the gap; second still open in state
      assert(got.length == 1)
      assert(got.head == SessionOut(7, 1, 2, 0, 600, 3.0))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits abandoned clicks after the watermark closes") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStream.abandonedClicks(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("aband_out")
      .outputMode("append").start()
    try {
      // user 1 clicks then buys within the hour; user 2 clicks and never buys
      clicks.addData(Event(1, ns(100), 1, "click", 0), Event(2, ns(200), 2, "click", 0))
      purchases.addData(Event(3, ns(1000), 1, "purchase", 9.0))
      q.processAllAvailable()
      // push both watermarks far past the join horizon so the unmatched
      // click is provably unmatched and must emit with a null
      clicks.addData(Event(4, ns(100000), 9, "click", 0))
      purchases.addData(Event(5, ns(100000), 9, "purchase", 0))
      q.processAllAvailable()
      val got = spark.table("aband_out")
        .filter($"user_id".isin(1L, 2L))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toSet
      assert(got.contains((1L, 1L, 3L, false)), s"matched click missing: $got")
      assert(got.contains((2L, 2L, -1L, true)), s"abandoned click missing: $got")
    } finally q.stop()
  }

  test("streaming trending top-k merges sketch state across micro-batches") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.trendingTopK(input.toDF(), capacity = 16, k = 2)
      .writeStream.format("memory").queryName("trend_out")
      .outputMode("append").start()
    try {
      // window [0, 3600): 3 clicks in batch 1, then 2 views + 1 click in
      // batch 2 — the merged sketch must rank click(4) > view(2)
      input.addData(
        Event(1, ns(100), 1, "click", 0), Event(2, ns(200), 2, "click", 0),
        Event(3, ns(300), 3, "click", 0))
      q.processAllAvailable()
      input.addData(
        Event(4, ns(400), 4, "view", 0), Event(5, ns(500), 5, "view", 0),
        Event(6, ns(600), 6, "click", 0))
      q.processAllAvailable()
      // advance the watermark far enough to close the window
      input.addData(Event(7, ns(100000), 9, "error", 0))
      q.processAllAvailable()
      val rows = spark.table("trend_out")
        .filter($"bucket_start" === 0L)
        .selectExpr("explode(top) AS t").select("t.item", "t.cnt")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("click", 4L), ("view", 2L)), s"$rows")
    } finally q.stop()
  }

  test("streaming EWMA matches the sequential recurrence across micro-batches") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.ewmaStream(input.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("update").start()
    try {
      // batch 1 delivered out of order WITHIN the batch (sorted by the
      // operator); batch 2 continues the same user's state
      input.addData(
        Event(2, ns(200), 7, "click", 8.0),
        Event(1, ns(100), 7, "click", 4.0),
        Event(3, ns(300), 9, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(4, ns(400), 7, "click", 2.0))
      q.processAllAvailable()
      val rows = spark.table("ewma_out")
        .groupBy("user_id").agg(max_by(struct($"n_events", $"ewma"), $"n_events").as("st"))
        .select($"user_id", $"st.n_events", $"st.ewma")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      // user 7: e0=4 → e1=.5*8+.5*4=6 → e2=.5*2+.5*6=4
      assert(rows(7L) == ((3L, 4.0)))
      assert(rows(9L) == ((1L, 1.0)))
    } finally q.stop()
  }
}
