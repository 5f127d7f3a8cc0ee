package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling for pipeline QA (SURVEY.md §2): per-column
  * completeness, cardinality, and range in ONE scan — the pre-flight
  * check before a 100 TB transform.
  *
  * One wide aggregation row computes every statistic map-side
  * (count/count-nulls/min/max are partial-aggregable;
  * approx_count_distinct is an HLL sketch so the single pass holds at
  * any scale), then the row unpivots to the (column, stat…) shape.
  */
object Profiler {

  /** (column, n_rows, n_null, approx_distinct, min_s, max_s), one row
    * per profiled column; min/max rendered as strings so mixed column
    * types coexist. */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        count(lit(1)).as(s"__n_$c"),
        approx_count_distinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n_rows"),
        (col(s"__n_$c") - col(s"__cnt_$c")).as("n_null"),
        col(s"__d_$c").as("approx_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    row.select(explode(array(entries: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }

  /** Exact-distinct variant (one scan per... no — still one scan, but
    * exact distincts force a shuffle per column; use for the oracled
    * query at test scale, prefer [[describe]] at 100 TB). */
  def describeExact(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        count(lit(1)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n_rows"),
        (col(s"__n_$c") - col(s"__cnt_$c")).as("n_null"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    row.select(explode(array(entries: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }
}
