package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling for pipeline QA (SURVEY.md §2): per-column
  * completeness, cardinality, and range in ONE scan — the pre-flight
  * check before a 100 TB transform.
  *
  * One wide aggregation row computes every statistic map-side
  * (count/count-nulls/min/max are partial-aggregable), then the row
  * unpivots to the (column, stat…) shape. [[describe]] uses an HLL
  * sketch for cardinality (single pass at any scale); [[describeExact]]
  * uses exact distincts (oracle-friendly, but shuffles per column).
  */
object Profiler {

  def describe(df: DataFrame, cols: Seq[String]): DataFrame =
    profile(df, cols, c => approx_count_distinct(col(c)), "approx_distinct")

  def describeExact(df: DataFrame, cols: Seq[String]): DataFrame =
    profile(df, cols, c => countDistinct(col(c)), "n_distinct")

  /** (column, n_rows, n_null, <distinctName>, min_s, max_s), one row
    * per profiled column; min/max rendered as strings so mixed column
    * types coexist. */
  private def profile(df: DataFrame, cols: Seq[String],
      distinctAgg: String => Column, distinctName: String): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        distinctAgg(c).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__d_$c").as(distinctName),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    row.select(explode(array(entries: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }
}
