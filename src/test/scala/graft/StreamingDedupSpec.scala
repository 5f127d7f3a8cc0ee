package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {

  test("streaming dedup drops re-delivered content across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = EventStream.dedupStream(
        input.toDF().toDF("ts", "text"), "ts", "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def t(s: Long) = new java.sql.Timestamp(s * 1000)
      input.addData((t(0), "doc a"), (t(1), "doc b"), (t(2), "doc a"))
      q.processAllAvailable()
      input.addData((t(3), "doc b"), (t(4), "doc c"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("text")
        .collect().map(_.getString(0)).sorted
      assert(got.toSeq == Seq("doc a", "doc b", "doc c"))
    } finally q.stop()
  }
}
