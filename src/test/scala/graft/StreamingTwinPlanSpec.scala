package graft

import graft.streaming.EventStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the PHYSICAL streaming operators behind the r10 twins
  * (PLANS.md r10 section): the interval joins must plan as
  * StreamingSymmetricHashJoin (state keyed on user_id, watermark
  * eviction both sides), dedup as streaming deduplicate-within-
  * watermark, ewma as FlatMapGroupsWithState — i.e. state-keyed
  * incremental operators, never a corpus-buffered batch fallback. */
class StreamingTwinPlanSpec extends SparkSpec {

  private def planOf(out: DataFrame, mode: String, name: String): String = {
    implicit val sqlCtx = spark.sqlContext
    val q = out.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    try {
      q.processAllAvailable()
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
        q.explain()
      }
      bos.toString("UTF-8")
    } finally q.stop()
  }

  private def eventsDf = Tables.events(spark, Sf)
    .select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))

  private def memStreamOfEvents(): (org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event], DataFrame) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    ms.addData(eventsDf.as[EventStream.Event].collect().toIndexedSeq)
    (ms, ms.toDF())
  }

  test("ewmaStream plans as FlatMapGroupsWithState") {
    import spark.implicits._
    val (_, df) = memStreamOfEvents()
    val plan = planOf(
      EventStream.ewmaStream(df.as[EventStream.Event])(spark).toDF(),
      "update", "stp_ewma")
    assert(plan.contains("FlatMapGroupsWithState"), plan.take(800))
  }

  test("dedupStream plans as streaming deduplicate within watermark") {
    val (_, df) = memStreamOfEvents()
    val in = df
      .withColumn("ts_ts", timestamp_micros(expr("ts DIV 1000")))
      .withColumn("content", concat_ws("|", col("user_id"), col("event_type")))
    val plan = planOf(
      EventStream.dedupStream(in, "ts_ts", "content", horizon = "365 days"),
      "append", "stp_dedup")
    assert(plan.contains("StreamingDeduplicateWithinWatermark"), plan.take(800))
  }

  test("both interval joins plan as StreamingSymmetricHashJoin") {
    val (_, df) = memStreamOfEvents()
    val clicks = df.filter(col("event_type") === "click")
    val purchases = df.filter(col("event_type") === "purchase")
    val inner = planOf(EventStream.clickToPurchase(clicks, purchases),
      "append", "stp_c2b")
    assert(inner.contains("StreamingSymmetricHashJoin"), inner.take(800))
    val outer = planOf(EventStream.abandonedClicks(clicks, purchases),
      "append", "stp_aband")
    assert(outer.contains("StreamingSymmetricHashJoin"), outer.take(800))
    assert(outer.contains("LeftOuter"), outer.take(800))
  }
}
