package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` on the same keys — the time-series enrich
  * operator Spark lacks natively.
  *
  * Spark-first composition (no custom SparkPlan): tag both sides,
  * union by name, and carry the last-seen right payload forward with
  * an ignore-nulls `last()` over a (keys)-partitioned window ordered
  * by (ts, side) — right rows sort before left rows at equal ts, so
  * the match is inclusive. One shuffle on the join keys, linear scan
  * within each partition; at 100 TB this is the sort-merge-join
  * shape with no pairwise explosion (unlike a range-join + top-1).
  */
object AsOfJoin {

  /** left columns + `<payload>_asof` columns (+ `<tsCol>_asof`). */
  def backward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String,
      payload: Seq[String]): DataFrame = {
    // unionByName would silently align a same-named left column into
    // the carried payload → corrupted enrichment, so collisions are a
    // hard error
    val reserved = payload ++ Seq("__side", "__r_ts", s"${tsCol}_asof", "__r_ts_asof") ++
      payload.map(p => s"${p}_asof")
    val collisions = left.columns.toSet & reserved.toSet
    require(collisions.isEmpty,
      s"left frame columns collide with as-of payload/internal names: $collisions")
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select((keys :+ tsCol).map(col) ++ payload.map(col): _*)
      .withColumnRenamed(tsCol, "__r_ts")
      .withColumn(tsCol, col("__r_ts"))
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (payload :+ "__r_ts").foldLeft(u) { (df, p) =>
      df.withColumn(s"${p}_asof", last(col(p), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .drop("__side" +: "__r_ts" +: payload: _*)
      .withColumnRenamed("__r_ts_asof", s"${tsCol}_asof")
  }
}
