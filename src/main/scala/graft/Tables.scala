package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take an `sfDir` so the same plan runs at any scale
  * factor; reads are plain parquet scans so Catalyst pushes filters
  * and prunes columns at the source.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  /** events.ts: every query downstream does epoch arithmetic on a
    * nanos-since-epoch long (matching DuckDB's floor(epoch(ts))
    * bit-for-bit), but the fixture's parquet precision has drifted
    * across driver regenerations — TIMESTAMP(NANOS) originally,
    * TIMESTAMP(MICROS) now. Adapt on the loaded dtype rather than
    * assuming either:
    *   - LongType: nanosAsLong kicked in on a NANOS fixture — already
    *     the raw nanos long, pass through.
    *   - Timestamp / TimestampNTZ: a MICROS fixture — exact integer
    *     µs→ns via unix_micros * 1000. The NTZ→TIMESTAMP cast is the
    *     identity on the stored micros because every entry point pins
    *     spark.sql.session.timeZone=UTC (Verify/Bench/SparkSpec).
    * FixtureSchemaSpec guards this contract against the next silent
    * regeneration. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case other =>
        sys.error(s"events.ts: unsupported parquet type $other (expected nanos long or timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
