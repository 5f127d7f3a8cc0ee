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

  /** left columns + `<payload>_asof` columns (+ `<tsCol>_asof`).
    *
    * The whole right payload travels as ONE struct carried by a single
    * ignore-nulls `last()`: a per-column carry could assemble the
    * enriched row from different right rows whenever the newest right
    * row holds a NULL in one payload column (that column would fall
    * back to an older row — a torn match). The struct makes the match
    * atomic; NULLs inside the winning right row stay NULL, exactly as
    * a join would produce. Right rows that tie on (keys, ts) are
    * ordered by the payload struct itself (field-lexicographic), so
    * the winner is deterministic without requiring a caller-supplied
    * unique id. */
  def backward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String,
      payload: Seq[String]): DataFrame = {
    // unionByName would silently align a same-named left column into
    // the carried payload → corrupted enrichment, so collisions are a
    // hard error
    val reserved = Seq("__side", "__m", s"${tsCol}_asof") ++ payload.map(p => s"${p}_asof")
    val collisions = left.columns.toSet & reserved.toSet
    require(collisions.isEmpty,
      s"left frame columns collide with as-of payload/internal names: $collisions")
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select(keys.map(col) :+ col(tsCol) :+
        struct(col(tsCol).as("__r_ts") +: payload.map(col): _*).as("__m"): _*)
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      // right rows (__side 0) sort before left rows at equal ts →
      // inclusive match; __m breaks right-vs-right ties deterministically
      .orderBy(col(tsCol), col("__side"), col("__m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        (col("__m.__r_ts").as(s"${tsCol}_asof") +:
          payload.map(p => col(s"__m.$p").as(s"${p}_asof"))): _*)
  }
}
