package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One inventory entry (SURVEY.md §2): a Spark query over an sfDir plus
  * the equivalent DuckDB oracle SQL (None → rows-only check).
  *
  * Oracle-parity rules (SURVEY.md §3): identical column names via
  * explicit aliases, total ORDER BY, bit-deterministic numerics
  * (decimal-exact sums cast to double; sequential-fold vector math).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(fn, Some(sql))
}
