package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced event analytics (SURVEY.md §2 extension): as-of enrich,
  * sliding windows, deterministic quantiles — the time-series side of
  * an analytics engine, each with an exact DuckDB oracle.
  */
object AnalyticsQueries {

  // ------------------------------------------------------------- as-of
  /** For each error event, the most recent prior click by the same
    * user (backward as-of on raw nanos — ties are measure-zero). */
  private def asofEnrich(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clk = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    AsOfJoin.backward(err, clk, Seq("user_id"), "ts", Seq("value"))
      .select(
        col("event_id"), col("user_id"),
        expr("ts DIV 1000000000").as("err_ts_s"),
        coalesce(expr("ts_asof DIV 1000000000"), lit(-1L)).as("click_ts_s"),
        coalesce(col("value_asof"), lit(-1.0)).as("click_value"))
      .orderBy(col("event_id"))
  }

  private val asofEnrichSql = """
    WITH err AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
    clk AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id,
           CAST(floor(epoch(e.ts)) AS BIGINT) AS err_ts_s,
           coalesce(CAST(floor(epoch(c.ts)) AS BIGINT), -1) AS click_ts_s,
           coalesce(c.value, -1.0) AS click_value
    FROM err e ASOF LEFT JOIN clk c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    ORDER BY event_id"""

  // ----------------------------------------------------- sliding window
  /** 2-hour windows sliding by 1 hour via Spark's native window();
    * each event lands in exactly two buckets. */
  private def slidingAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("ts_ts", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window(col("ts_ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  private val slidingAggSql = """
    WITH e AS (SELECT event_type, value,
                      CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hr
               FROM events),
    exploded AS (
      SELECT event_type, value, hr - 3600 AS win_start FROM e
      UNION ALL
      SELECT event_type, value, hr AS win_start FROM e)
    SELECT win_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM exploded
    GROUP BY win_start, event_type
    ORDER BY win_start, event_type"""

  // ---------------------------------------------------------- quantiles
  /** Exact p50/p95 of value per event type, deterministic rank pick
    * (row_number over (value, event_id), element at ceil(p·n)) — the
    * same algorithm in both engines, so no interpolation drift. */
  private def quantiles(s: SparkSession, d: String): DataFrame = {
    val ranked = Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    // single pass: each row emits whichever p-levels it is the rank
    // pick for (a row can be both p50 and p95 in tiny groups)
    ranked
      .select(col("event_type"), col("value"),
        explode(filter(array(lit(0.5), lit(0.95)),
          p => col("rn") === ceil(p * col("n")).cast("long"))).as("p"))
      .select(col("event_type"), col("p"), col("value"))
      .orderBy(col("event_type"), col("p"))
  }

  private val quantilesSql = """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events)
    SELECT event_type, p, value
    FROM ranked
    CROSS JOIN (SELECT unnest([0.5, 0.95]) AS p)
    WHERE rn = CAST(ceil(p * n) AS BIGINT)
    ORDER BY event_type, p"""

  val defs: Map[String, QueryDef] = Map(
    "events_asof_enrich" -> QueryDef(asofEnrich _, asofEnrichSql),
    "events_sliding_agg" -> QueryDef(slidingAgg _, slidingAggSql),
    "events_quantiles"   -> QueryDef(quantiles _, quantilesSql),
  )
}
