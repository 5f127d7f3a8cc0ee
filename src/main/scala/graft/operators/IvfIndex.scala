package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the 100 TB scale
  * path for the reference's `ORDER BY embedding <-> q LIMIT k`
  * (SURVEY.md §4).
  *
  * Build: Lloyd's k-means expressed purely as DataFrame ops —
  * assignment is a broadcast join + per-vector argmin window, the
  * centroid update is a posexplode + groupBy(cell, pos) average. No
  * driver-side collect of the corpus; only the nlist centroid rows
  * ever concentrate.
  *
  * Search: the query ranks the nlist centroids (broadcast, tiny),
  * probes the nprobe nearest cells, and scans only those — at scale
  * the corpus is written `partitionBy("centroid_id")`
  * ([[writePartitioned]]) so the probe is a partition-pruned read of
  * nprobe/nlist of the data, no shuffle, while exact top-k within the
  * probed cells is a TakeOrderedAndProject.
  *
  * Determinism: init = the nlist vectors with smallest ids; argmin
  * ties break on centroid id; means are decimal-free but only used
  * for bucketing (approximation, never compared to an oracle).
  */
object IvfIndex {

  /** (centroid_id, centroid) frame after `iters` Lloyd rounds. */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int): DataFrame = {
    // init = the nlist smallest-id vectors. Only nlist rows survive the
    // limit, so numbering them via one global collect_list aggregate is
    // O(nlist) and avoids a partition-less global window (which funnels
    // through a single task AND logs a scale warning).
    var centroids = corpus
      .orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("__init_id"), asDouble(col(vecCol)).as("centroid"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("__init_id"), col("centroid")))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("centroid_id", "x")))
      .select(col("centroid_id"), col("x.centroid").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assign(corpus, idCol, vecCol, centroids)
      centroids = corpus
        .join(assigned, idCol)
        .select(col("centroid_id"), posexplode(asDouble(col(vecCol))).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"),
          transform(col("pm"), x => x.getField("m")).as("centroid"))
    }
    centroids
  }

  /** (idCol, centroid_id) nearest-centroid assignment. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("cdist"), col("centroid_id"))
    corpus
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col("centroid_id"),
        l2Distance(col(vecCol), col("centroid")).as("cdist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("centroid_id"))
  }

  /** Spilled (SOAR-style) multi-assignment: each vector lands in its
    * `spill` nearest cells, and every row carries `primary_cell` (the
    * rank-1 cell). The spare copies buy boundary recall — the chance
    * that SOME stored copy of a true neighbor sits in a probed cell
    * grows with spill — at exactly `spill`× storage and candidate
    * volume. `primary_cell` is what makes probe-time DEDUP free: a
    * probe keeps a row iff its cell is probed AND (it is the primary
    * row OR the primary cell was NOT probed), which selects exactly
    * one copy per vector as a per-row predicate — no shuffle, no
    * distinct. */
  def assignSpill(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, spill: Int): DataFrame = {
    // the primary/spare probe-dedup predicate is exact only with ONE
    // spare copy: at spill ≥ 3, a probe covering several spare cells
    // but not the primary would keep every spare (duplicate ids in
    // top-k). Generalizing needs each row to carry the full ranked
    // cell list; bound the API until something needs that.
    require(spill >= 1 && spill <= 2,
      s"spill must be 1 or 2 (got $spill): probe dedup is primary/spare")
    val w = Window.partitionBy(col(idCol)).orderBy(col("cdist"), col("centroid_id"))
    corpus
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col("centroid_id"),
        l2Distance(col(vecCol), col("centroid")).as("cdist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= spill)
      .withColumn("primary_cell",
        first(col("centroid_id")).over(w)) // frame ends at current row → rank-1 cell
      .select(col(idCol), col("centroid_id"), col("primary_cell"))
  }

  /** Corpus + centroid_id (+ `primary_cell` when spill > 1), ready to
    * write partitioned by cell. `spill` > 1 stores each vector in its
    * spill nearest cells for boundary recall (see [[assignSpill]]);
    * the default 1 keeps the classic single-copy layout. */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2, trainFraction: Double = 0.25,
      mat: Materializer = Materializer.local(), spill: Int = 1): (DataFrame, DataFrame) = {
    // standard IVF recipe: train centroids on a sample (quantizer
    // quality needs ~100s of points per cell, not the corpus), then
    // assign everything; materialize the nlist centroid rows once —
    // otherwise every downstream action replays the Lloyd's lineage.
    // Materializer.parquet makes the build restartable (VERDICT r1 #3/#4)
    val train =
      if (trainFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, trainFraction, seed = 42)
    val centroids = mat.mat(trainCentroids(train, idCol, vecCol, nlist, iters), "ivf-centroids")
    val assigned =
      if (spill <= 1) assign(corpus, idCol, vecCol, centroids)
      else assignSpill(corpus, idCol, vecCol, centroids, spill)
    (corpus.join(assigned, idCol), centroids)
  }

  /** Persist the index partitioned by cell so probes prune partitions. */
  def writePartitioned(indexed: DataFrame, path: String): Unit =
    indexed.write.mode("overwrite").partitionBy("centroid_id").parquet(path)

  /** Per-cell bounding radius — index statistics for SOUND range-query
    * cell pruning: dist(q, member) ≥ dist(q, centroid) − radius by the
    * triangle inequality, so a cell with dist(q,c) − radius > τ
    * provably holds no point within τ of the query and can be skipped
    * without changing results (unlike nprobe knn probing, which is
    * approximate by construction). One aggregation at build time;
    * KB-scale output. */
  def cellRadii(indexed: DataFrame, vecCol: String, centroids: DataFrame): DataFrame =
    indexed.join(broadcast(centroids), "centroid_id")
      .groupBy(col("centroid_id"))
      .agg(max(l2Distance(col(vecCol), col("centroid"))).as("radius"))

  /** Incremental index maintenance: assign a stream of new vectors to
    * the existing (frozen) centroids and append them into the
    * cell-partitioned store — the index stays fresh without retraining
    * (retrain is an offline decision when cell balance drifts).
    * Exactly-once via the streaming checkpoint.
    *
    * Every appended batch invalidates the [[graft.plans.IvfCatalog]]
    * registration for `path`: the catalog's per-cell radii were
    * computed over the corpus at register time, and an appended vector
    * may land OUTSIDE its cell's recorded bounding ball (centroids are
    * frozen; assignment distance is unbounded) — stale radii would
    * make the range rewrite's "sound" pruning silently drop that
    * vector. Invalidation falls back to exact scans until the store is
    * re-registered with fresh statistics ([[cellRadii]]); knn probing
    * through the explicit search API is unaffected. (compact() keeps
    * content identical and delete() only shrinks cells, so existing
    * radii stay valid upper bounds there — only appends invalidate.) */
  def streamAssign(
      newVectors: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String,
      centroids: org.apache.spark.sql.DataFrame, path: String, checkpoint: String,
      spill: Int = 1) // MUST match the store's build spill, or probes
                      // over mixed files dedup inconsistently
      : org.apache.spark.sql.streaming.StreamingQuery =
    newVectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val assigned =
            if (spill <= 1) assign(batch, idCol, vecCol, centroids)
            else assignSpill(batch, idCol, vecCol, centroids, spill)
          batch.join(assigned, idCol)
            .write.mode("append").partitionBy("centroid_id").parquet(path)
          graft.plans.IvfCatalog.invalidate(path)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Batch ANN: many query vectors at once against the cell-assigned
    * corpus — the scale path where even one corpus scan per query is
    * too much.
    *
    * Shape: each query ranks the broadcast centroids and keeps its
    * nprobe cells (a window over queries × nlist rows — query-side
    * work only); the candidate set is then the CELL-BUCKET JOIN of
    * (query, cell) pairs with the corpus on `centroid_id`, never a
    * full cross. Candidate volume is queries × nprobe × (N/nlist)
    * versus the brute-force queries × N — an nlist/nprobe reduction —
    * and with a store written `partitionBy("centroid_id")` the corpus
    * side is already co-located on the join key. Per-query exact
    * top-k within the candidates runs through the bounded
    * [[graft.functions.TopKAggregate]] (map-side ≤ k rows per query
    * per partition cross the shuffle).
    *
    * Output: (qIdCol, idCol, dist) ordered by (qid, dist, id);
    * approximate with the usual IVF cell recall.
    *
    * `excludeSelf` drops candidates whose corpus id equals the query
    * id — ONLY meaningful when queries and corpus share an id space
    * (corpus-vs-itself dedup/nearest-neighbor graphs). Leave it false
    * for external queries: an external qid that coincidentally equals
    * a corpus id would otherwise silently lose a legitimate neighbor.
    * The comparison is null-unsafe (a NULL id on either side never
    * matches, so NULL-id rows are kept). */
  def searchBatch(
      indexed: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queries: DataFrame, qIdCol: String, qVecCol: String,
      distance: (Column, Column) => Column, k: Int, nprobe: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cdist"), col("centroid_id"))
    val probes = queries
      .crossJoin(broadcast(centroids))
      .select(col(qIdCol), col(qVecCol), col("centroid_id"),
        distance(col(qVecCol), col("centroid")).as("cdist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col(qIdCol), col(qVecCol), col("centroid_id"))
    val joined = indexed.join(broadcast(probes), Seq("centroid_id"))
    // spilled-store dedup (one surviving copy per (query, vector)): a
    // copy survives iff it is the primary row, or ITS query did not
    // probe the primary cell. Pure broadcast-join + per-row predicate.
    val candidates =
      if (!indexed.columns.contains("primary_cell")) joined
      else {
        val mark = probes.select(col(qIdCol).as("__mqid"),
          col("centroid_id").as("__probed_pc")).distinct()
        joined
          .join(broadcast(mark),
            col(qIdCol) === col("__mqid") &&
              col("primary_cell") === col("__probed_pc"), "left_outer")
          .filter(col("primary_cell").isNull ||
            col("centroid_id") === col("primary_cell") || col("__probed_pc").isNull)
          .drop("__mqid", "__probed_pc")
      }
    (if (excludeSelf) candidates.filter(col(idCol) =!= col(qIdCol)) else candidates)
      .groupBy(col(qIdCol))
      .agg(graft.functions.TopKAggregate.topK(
        distance(col(vecCol), col(qVecCol)), col(idCol).cast("long"), k).as("topk"))
      .select(col(qIdCol), explode(col("topk")).as("p"))
      .select(col(qIdCol), col("p.id").as(idCol), col("p.dist").as("dist"))
      .orderBy(col(qIdCol), col("dist"), col(idCol))
  }

  /** The probe's candidate set: rows of the nprobe nearest cells,
    * deduplicated for spilled stores. Factored out so composite
    * indexes (IVF-PQ: ADC-score only these candidates) reuse the
    * probe + dedup machinery. */
  def probeCandidates(
      indexed: DataFrame, centroids: DataFrame, queryVec: DataFrame,
      qVecCol: String, distance: (Column, Column) => Column, nprobe: Int): DataFrame = {
    // rank cells with the SAME metric used for final scoring: ranking
    // by L2 when the caller searches by cosine/inner-product can probe
    // the wrong cells on unnormalized vectors (recall loss beyond the
    // normal IVF approximation)
    val probed = centroids
      .crossJoin(broadcast(queryVec))
      .select(col("centroid_id"), distance(col("centroid"), col(qVecCol)).as("cdist"))
      .orderBy(col("cdist"), col("centroid_id"))
      .limit(nprobe)
      .select(col("centroid_id"))
    val scanned = indexed
      // broadcast semi-join on the probed cell ids: with a
      // cell-partitioned store this is partition pruning at the source
      .join(broadcast(probed), Seq("centroid_id"), "left_semi")
    // spilled-store dedup: keep the primary row, or a spare whose
    // primary cell was not probed (see [[assignSpill]]) — a per-row
    // predicate via one more broadcast of the nprobe-row cell list
    if (!indexed.columns.contains("primary_cell")) scanned
    else scanned
      .join(broadcast(probed.withColumnRenamed("centroid_id", "__probed_pc")),
        col("primary_cell") === col("__probed_pc"), "left_outer")
      .filter(col("primary_cell").isNull ||
        col("centroid_id") === col("primary_cell") || col("__probed_pc").isNull)
      .drop("__probed_pc")
  }

  /** Probe search: scan only the nprobe cells nearest to the query. */
  def search(
      indexed: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queryVec: DataFrame, qVecCol: String,
      distance: (Column, Column) => Column, k: Int, nprobe: Int): DataFrame =
    probeCandidates(indexed, centroids, queryVec, qVecCol, distance, nprobe)
      .crossJoin(broadcast(queryVec))
      .select(col(idCol), distance(col(vecCol), col(qVecCol)).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
}
