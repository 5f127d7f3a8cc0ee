package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (SURVEY.md §4): two-phase salted
  * aggregation and salted broadcast-join helpers.
  *
  * A single hot key (one viral document, one null-ish user id) makes
  * one reducer take the whole shuffle at 100 TB. Salting splits each
  * key into `salts` sub-keys for the first (map-heavy) phase, then
  * reduces the per-salt partials — the second shuffle carries only
  * keys × salts rows. AQE's skew-join handles the join case at
  * runtime; salting is for aggregations and deterministic plans.
  */
object Salt {

  /** Deterministic row salt in [0, salts). Derived from a stable row
    * expression (not rand()) so retried tasks produce identical
    * results — a lost-executor retry with rand() double-counts. */
  def saltOf(stable: Column, salts: Int): Column =
    pmod(hash(stable), lit(salts))

  /** groupBy(keys).agg(sum/count) with two-phase salting. `sums` maps
    * output column name → the expression to sum.
    *
    * Determinism contract: the two-phase reduce re-associates the
    * addition, so DOUBLE sum expressions can differ bitwise from an
    * unsalted groupBy (floating-point addition is order-dependent).
    * Pass DECIMAL-typed (or integral) sum expressions when the result
    * must be bit-exact (e.g. feeds an oracled query) and cast to
    * double only after the phase-2 sum — enforced here for doubles. */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], stable: Column, salts: Int,
      sums: Map[String, Column]): DataFrame = {
    val floaty = df.select(sums.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }: _*)
      .schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.DoubleType ||
          f.dataType == org.apache.spark.sql.types.FloatType => f.name
      }
    require(floaty.isEmpty,
      s"float-typed sum expressions ${floaty.mkString(",")} would make the salted result " +
        "order-dependent (re-associated addition); cast to decimal and back instead")
    val phase1 = df
      .withColumn("__salt", saltOf(stable, salts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        count(lit(1)).as("__n"),
        sums.toSeq.sortBy(_._1).map { case (n, c) => sum(c).as(s"__s_$n") }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__n")).as("n_rows"),
        sums.keys.toSeq.sorted.map(n => sum(col(s"__s_$n")).as(n)): _*)
  }
}
