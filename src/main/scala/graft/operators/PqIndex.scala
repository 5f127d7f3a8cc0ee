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
    * k-means job chains — same math, 1/m the job count.
    *
    * Scale shape (the [[IvfIndex]] r6 discipline): codebooks are
    * driver metadata from the very first round — each Lloyd iteration
    * assigns codes with the flat-array kernel
    * ([[graft.functions.NearestCellsExpr]] per subspace: no join, no
    * window, no exchange; the pre-r6 shape joined subrows × ksub
    * centroids and argmin'd through a per-(sp, sid) window — a
    * ksub×-volume exchange per round), then ONE map-side-combined
    * mean aggregation emits the m·ksub·dsub cell means (KB scale)
    * back to the driver. A cell that attracts no points keeps its
    * previous centroid (it stays a valid, never-winning duplicate),
    * so codebooks are always full — no end-of-train padding. */
  def train(corpus: DataFrame, vecCol: String, dims: Int,
      m: Int = 8, ksub: Int = 16, iters: Int = 2,
      trainFraction: Double = 0.5,
      mat: Materializer = Materializer.local()): Codebooks = {
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val dsub = dims / m
    val sample =
      if (trainFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, trainFraction, seed = 42)
    val sampleD = mat.mat(
      sample.select(col(vecCol).cast("array<double>").as("v")), "pq-train")
    // init: the first ksub sample vectors seed every subspace (the
    // kernel's id tie-break keeps duplicates harmless), padded by
    // cycling when the sample is smaller than ksub
    val seedRows = sampleD.limit(ksub).collect()
    require(seedRows.nonEmpty,
      s"PQ training produced no centroids — corpus empty or trainFraction=$trainFraction sampled zero rows")
    var books: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      Array.tabulate(ksub) { c =>
        seedRows(c % seedRows.length).getSeq[Double](0)
          .slice(s * dsub, (s + 1) * dsub).toArray
      }
    }
    for (_ <- 0 until iters) {
      val cb = Codebooks(m, ksub, dsub, books)
      val means = encode(sampleD, "v", cb)
        .select(explode(array((0 until m).map { s =>
          struct(lit(s).as("sp"),
            element_at(col("codes"), s + 1).as("cid"),
            sub(col("v"), s, dsub).as("sv"))
        }: _*)).as("e"))
        .select(col("e.sp"), col("e.cid"), posexplode(col("e.sv")).as(Seq("pos", "x")))
        .groupBy(col("sp"), col("cid"), col("pos"))
        .agg(avg(col("x")).as("mv"))
        .collect() // m·ksub·dsub rows — KB scale
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      books = next
    }
    mat.release(sampleD)
    Codebooks(m, ksub, dsub, books)
  }

  /** Nearest-code expression for one subspace: single-pass argmin via
    * the flat-array kernel ([[graft.functions.NearestCellsExpr]]),
    * lowest code on ties. */
  private def codeExpr(vec: Column, cb: Codebooks, s: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    element_at(toColumn(graft.functions.NearestCellsExpr(
      toExpression(sub(vec, s, cb.dsub)),
      Array.tabulate(cb.ksub)(identity), cb.centroids(s), 1)), 1)
  }

  /** Corpus → (original columns + `codes` array<int> of length m). */
  def encode(corpus: DataFrame, vecCol: String, cb: Codebooks): DataFrame =
    corpus.withColumn("codes",
      array((0 until cb.m).map(s => codeExpr(col(vecCol), cb, s)): _*))

  /** Persist trained codebooks as a tiny (sp, cid, pos, c) parquet —
    * m·ksub·dsub rows, KB scale — so a search (and the r9 replay
    * oracle) can re-open them without retraining. */
  def writeCodebooks(spark: SparkSession, cb: Codebooks, path: String): Unit = {
    import spark.implicits._
    (for {
      s <- 0 until cb.m
      c <- 0 until cb.ksub
      p <- 0 until cb.dsub
    } yield (s, c, p, cb.centroids(s)(c)(p)))
      .toDF("sp", "cid", "pos", "c")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readCodebooks(spark: SparkSession, path: String): Codebooks = {
    val rows = spark.read.parquet(path)
      .orderBy("sp", "cid", "pos").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    val dsub = rows.map(_.getInt(2)).max + 1
    val cents = Array.fill(m, ksub, dsub)(0.0)
    rows.foreach(r => cents(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
    Codebooks(m, ksub, dsub, cents)
  }

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
