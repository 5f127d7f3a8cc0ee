package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus mixing — weighted per-source sampling, the
  * pass that turns curated sources into a training mixture with
  * declared proportions.
  *
  * Selection is HASH-based, not `rand()`-based: a row is kept iff
  * `hash64(seed ':' id) % 10000 < rate_bp(source)`. That makes the
  * sample a pure function of (seed, id, rates) — bit-reproducible
  * across runs, engines, partitionings, and retries (a failed 100 TB
  * job resumes to the SAME sample; `rand()` would silently change the
  * mixture under task retry). `weight` = 10000/rate_bp carries the
  * inverse-propensity factor loss reweighting needs.
  *
  * Scale shape: pure per-row projection+filter — no shuffle, scan
  * bound, trivially parallel.
  */
object Mix {

  /** Keep rows of `docs` per-source at `rates` basis points (out of
    * 10000), selected by hash of `seed` and the id column. */
  def sample(docs: DataFrame, idCol: String, sourceCol: String,
      rates: Seq[(String, Int)], seed: String): DataFrame = {
    require(rates.nonEmpty && rates.forall { case (_, bp) => bp >= 0 && bp <= 10000 },
      s"rates must be 0..10000 bp: $rates")
    val rate = rates.tail.foldLeft(
      when(col(sourceCol) === rates.head._1, lit(rates.head._2.toLong))) {
      case (acc, (src, bp)) => acc.when(col(sourceCol) === src, lit(bp.toLong))
    }.otherwise(lit(0L))
    docs
      .withColumn("rate_bp", rate)
      .withColumn("bucket",
        hash64(concat(lit(seed), lit(":"), col(idCol).cast("string"))) % 10000)
      .filter(col("bucket") < col("rate_bp"))
      .withColumn("weight", lit(10000.0) / col("rate_bp").cast("double"))
      .drop("bucket")
  }

  /** DuckDB twin of the selection predicate + weight columns. */
  def sampleSql(idCol: String, sourceCol: String,
      rates: Seq[(String, Int)], seed: String): (String, String) = {
    val rate = rates.map { case (src, bp) =>
      s"WHEN $sourceCol = '$src' THEN CAST($bp AS BIGINT)"
    }.mkString("CASE ", " ", " ELSE CAST(0 AS BIGINT) END")
    val bucket = s"${hash64Sql(s"'$seed:' || CAST($idCol AS VARCHAR)")} % 10000"
    (rate, bucket)
  }
}
