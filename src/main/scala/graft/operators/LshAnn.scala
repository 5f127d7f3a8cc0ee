package graft.operators

import graft.functions.{TextFunctions, VectorDistance, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for cosine ANN — the bucket alternative to
  * [[IvfIndex]] (SURVEY.md §2 similarity-search scale path).
  *
  * Each of `tables` hash tables holds `bits` hyperplanes; a vector's
  * signature bit b is sign(v · h_b). Hyperplane components are
  * deterministic ±1 derived from the cross-engine md5 hash of
  * "table:bit:dim" — but since they are plan-time constants they are
  * materialized as literal arrays once (Scala md5 ≡ engine md5), so
  * each signature bit is one fused-codegen dot product against a
  * constant, not per-element hashing.
  *
  * Search recall comes from multiple tables (candidates = union of
  * same-bucket vectors in any table); the final exact re-rank only
  * touches candidates. At 100 TB the corpus is stored bucketed by
  * (table_id, sig) so a probe reads single buckets, not the corpus.
  */
object LshAnn {

  /** Plan-time ±1 hyperplane for (table, bit) over `dims` components,
    * from the same md5→60-bit formula the engines share. */
  def plane(table: Int, bit: Int, dims: Int): Array[Double] =
    Array.tabulate(dims) { d =>
      if (TextFunctions.hash64Scala(s"$table:$bit:$d") % 2 == 0) 1.0 else -1.0
    }

  /** Signature of a vector column for one table: an integer whose bit
    * b is set when v · h_b > 0. */
  def signature(vec: Column, table: Int, bits: Int, dims: Int): Column =
    (0 until bits).map { b =>
      when(VectorDistance.dot(vec, typedLit(plane(table, b, dims))) > 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (id, vec, table_id, sig) bucket rows — the bucketed storage
    * layout (write partitioned/bucketed by (table_id, sig) at scale). */
  def bucketRows(corpus: DataFrame, idCol: String, vecCol: String,
      tables: Int, bits: Int, dims: Int): DataFrame = {
    val sigs = (0 until tables).map { t =>
      struct(lit(t).as("table_id"), signature(col(vecCol), t, bits, dims).as("sig"))
    }
    corpus.select(col(idCol), col(vecCol), explode(array(sigs: _*)).as("ts"))
      .select(col(idCol), col(vecCol), col("ts.table_id"), col("ts.sig"))
  }

  /** ANN top-k: bucket-join candidates in any table, exact cosine
    * re-rank of the (small) candidate set.
    *
    * `multiprobe`: probe buckets within Hamming distance `multiprobe`
    * of the query's signature in each table (0 = classic single
    * bucket). A near neighbor that lands one hyperplane on the wrong
    * side sits in an adjacent bucket; probing those recovers it at
    * the cost of (1 + bits·multiprobe…) bucket reads per table —
    * query-side fan-out only, the corpus layout is untouched. The
    * standard recall/probe-count lever when adding tables (more
    * stored copies) is the more expensive axis. */
  def search(corpus: DataFrame, idCol: String, vecCol: String,
      queryVec: DataFrame, qVecCol: String, dims: Int,
      k: Int, tables: Int = 8, bits: Int = 4, multiprobe: Int = 0): DataFrame =
    searchBuckets(bucketRows(corpus, idCol, vecCol, tables, bits, dims),
      idCol, vecCol, queryVec, qVecCol, dims, k, tables, bits, multiprobe)

  /** Probe PRE-BUILT bucket rows (the persisted layout — at scale the
    * corpus is stored bucketed once, not re-hashed per query): the
    * query computes its own signatures, fans out to the multiprobe
    * neighborhood, bucket-joins, and exactly re-ranks candidates. */
  def searchBuckets(corpusBuckets: DataFrame, idCol: String, vecCol: String,
      queryVec: DataFrame, qVecCol: String, dims: Int,
      k: Int, tables: Int = 8, bits: Int = 4, multiprobe: Int = 0): DataFrame = {
    val baseQuery = bucketRows(
      queryVec.select(lit(0L).as("qid"), col(qVecCol)), "qid", qVecCol, tables, bits, dims)
      .select(col("table_id"), col("sig"), col(qVecCol))
    // signature perturbations up to Hamming distance `multiprobe`
    val masks: Seq[Long] = {
      def flips(d: Int): Seq[Long] =
        if (d == 0) Seq(0L)
        else flips(d - 1).flatMap(m =>
          (0 until bits).map(b => m | (1L << b))).distinct.filter(java.lang.Long.bitCount(_) == d)
      (0 to math.min(multiprobe, bits)).flatMap(flips)
    }
    val queryBuckets =
      if (masks.size == 1) baseQuery
      else baseQuery
        .select(col("table_id"),
          explode(array(masks.map(m => col("sig").bitwiseXOR(lit(m))): _*)).as("sig"),
          col(qVecCol))
    val candidates = corpusBuckets
      .join(broadcast(queryBuckets), Seq("table_id", "sig"))
      .select(col(idCol), col(vecCol), col(qVecCol))
      .dropDuplicates(idCol)
    candidates
      .select(col(idCol),
        VectorFunctions.cosineDistance(col(vecCol), col(qVecCol)).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
