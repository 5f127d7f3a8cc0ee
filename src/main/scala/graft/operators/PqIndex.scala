package graft.operators

import graft.functions.VectorDistance
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — compressed vector codes for
  * memory-resident ANN at 100 TB (a 64-dim float vector becomes m
  * sub-codebook ids; with m=8, ksub=16 that is 256 bits → 4 bytes:
  * 64× compression).
  *
  * Train: the vector space is split into m contiguous subspaces; each
  * subspace gets a ksub-centroid codebook via the same DataFrame
  * Lloyd's as [[IvfIndex]], trained on a deterministic sample. The
  * finished codebooks are metadata (m × ksub × dsub doubles ≈ KBs)
  * and are collected once to the driver to become plan-time literals —
  * the corpus itself never concentrates.
  *
  * Encode: per subspace, argmin over ksub literal centroids — pure
  * codegen expressions, no shuffle, no UDF.
  *
  * Search (ADC — asymmetric distance computation): the query builds an
  * m × ksub distance table (driver-side, tiny); corpus distance is a
  * table lookup-sum over the code array — one fused pass per row.
  */
object PqIndex {

  final case class Codebooks(m: Int, ksub: Int, dsub: Int,
      centroids: Array[Array[Array[Double]]]) // [subspace][code][dsub]

  /** Slice subspace s (0-based) out of a vector column. */
  private def sub(vec: Column, s: Int, dsub: Int): Column =
    slice(vec, s * dsub + 1, dsub)

  /** Train all m subspace codebooks in ONE grouped Lloyd's pass
    * (subspace is just another grouping key), instead of m sequential
    * k-means job chains — same math, 1/m the job count. */
  def train(corpus: DataFrame, vecCol: String, dims: Int,
      m: Int = 8, ksub: Int = 16, iters: Int = 2,
      trainFraction: Double = 0.5,
      mat: Materializer = Materializer.local()): Codebooks = {
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val dsub = dims / m
    val sample =
      if (trainFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, trainFraction, seed = 42)
    // (sid, sp, sv): every vector contributes one row per subspace
    val subRows = mat.mat(sample
      .select(monotonically_increasing_id().as("sid"),
        col(vecCol).cast("array<double>").as("v"))
      .select(col("sid"), explode(array((0 until m).map { s =>
        struct(lit(s).as("sp"), sub(col("v"), s, dsub).as("sv"))
      }: _*)).as("x"))
      .select(col("sid"), col("x.sp").as("sp"), col("x.sv").as("sv")), "pq-subrows")

    val initW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sp")).orderBy(col("sid"))
    var centroids = subRows
      .withColumn("rn", row_number().over(initW))
      .filter(col("rn") <= ksub)
      .select(col("sp"), (col("rn") - 1).as("cid"), col("sv").as("centroid"))

    val asgW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sp"), col("sid")).orderBy(col("cdist"), col("cid"))
    for (_ <- 0 until iters) {
      val assigned = subRows
        .join(broadcast(centroids), Seq("sp"))
        .select(col("sp"), col("sid"), col("sv"), col("cid"),
          VectorDistance.l2(col("sv"), col("centroid")).as("cdist"))
        .withColumn("rn", row_number().over(asgW))
        .filter(col("rn") === 1)
      centroids = assigned
        .select(col("sp"), col("cid"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sp"), col("cid"), col("pos"))
        .agg(avg(col("x")).as("mv"))
        .groupBy(col("sp"), col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(col("sp"), col("cid"),
          transform(col("pm"), p => p.getField("mv")).as("centroid"))
    }

    val rows = centroids.orderBy(col("sp"), col("cid")).collect()
    mat.release(subRows) // codebooks are driver-side now; free the blocks
    require(rows.nonEmpty,
      s"PQ training produced no centroids — corpus empty or trainFraction=$trainFraction sampled zero rows")
    val books = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Array[Double]])
    rows.foreach { r =>
      books(r.getInt(0)) += r.getSeq[Double](2).toArray
    }
    // Lloyd's can leave a cell empty (duplicate seed subvectors);
    // pad to ksub with copies of the last centroid — a duplicate is
    // never the unique argmin, so encode stays well-defined
    val padded = books.map { b =>
      (b ++ Seq.fill(ksub - b.length)(b.last.clone())).toArray
    }
    Codebooks(m, ksub, dsub, padded)
  }

  /** Nearest-code expression for one subspace: argmin over literal
    * centroids with first-match (lowest code) tie-break. */
  private def codeExpr(vec: Column, cb: Codebooks, s: Int): Column = {
    val dists = array((0 until cb.ksub).map { c =>
      VectorDistance.l2(sub(vec, s, cb.dsub), typedLit(cb.centroids(s)(c)))
    }: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Corpus → (original columns + `codes` array<int> of length m). */
  def encode(corpus: DataFrame, vecCol: String, cb: Codebooks): DataFrame =
    corpus.withColumn("codes",
      array((0 until cb.m).map(s => codeExpr(col(vecCol), cb, s)): _*))

  /** ADC distance table for one query vector: [subspace][code] →
    * squared L2 between the query subvector and that centroid. */
  def distanceTable(query: Array[Double], cb: Codebooks): Array[Array[Double]] =
    Array.tabulate(cb.m) { s =>
      val q = query.slice(s * cb.dsub, (s + 1) * cb.dsub)
      Array.tabulate(cb.ksub) { c =>
        val cent = cb.centroids(s)(c)
        var acc = 0.0
        var i = 0
        while (i < cb.dsub) { val d = q(i) - cent(i); acc += d * d; i += 1 }
        acc
      }
    }

  /** Approximate top-k over encoded corpus via table lookup-sum.
    *
    * `rerank > 0` adds the standard ADC accuracy stage: take the top
    * `rerank` candidates by compressed distance, then score just those
    * with the EXACT vector (still present on the encoded rows) and
    * return the exact top-k of the shortlist. The corpus-wide pass
    * still only reads the m-byte codes; the full vectors are touched
    * for `rerank` rows — recall approaches exact search while the scan
    * cost stays compressed (output column is then `dist`, an exact
    * distance, instead of `approx_dist`). */
  def search(encoded: DataFrame, idCol: String,
      query: Array[Double], cb: Codebooks, k: Int,
      rerank: Int = 0, vecCol: String = "embedding"): DataFrame = {
    val tbl = typedLit(distanceTable(query, cb).map(_.toSeq).toSeq)
    val approxDist = sqrt(aggregate(
      zip_with(col("codes"), sequence(lit(1), lit(cb.m)),
        (code, s) => element_at(element_at(tbl, s), code + 1)),
      lit(0.0), (acc, x) => acc + x))
    if (rerank <= 0) {
      encoded
        .select(col(idCol), approxDist.as("approx_dist"))
        .orderBy(col("approx_dist"), col(idCol))
        .limit(k)
    } else {
      encoded
        .select(col(idCol), col(vecCol), approxDist.as("approx_dist"))
        .orderBy(col("approx_dist"), col(idCol))
        .limit(math.max(k, rerank))
        .select(col(idCol),
          VectorDistance.l2(col(vecCol), typedLit(query.toSeq)).as("dist"))
        .orderBy(col("dist"), col(idCol))
        .limit(k)
    }
  }
}
