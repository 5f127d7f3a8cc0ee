package graft

import graft.functions.VectorFunctions
import graft.operators.{IvfIndex, Knn}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantified error gates for every approximate (non-oracled)
  * inventory entry: each test computes brute-force ground truth with
  * the oracle-proven exact operator ([[Knn.topK]]/[[Knn.topKBatch]] /
  * `count(DISTINCT)`), prints the measured recall@k or relative
  * error, and FAILS below a stated floor — turning "rows-only" driver
  * checks into bounded-error guarantees.
  *
  * On floors: this synthetic corpus is ISOTROPIC — measured on
  * sf0.001, the mean pairwise L2 distance within a label (1.4147)
  * equals the cross-label mean (1.4126), i.e. there is no cluster
  * structure for a partitioning index to exploit, and expected recall
  * for ANY cell/bucket index ≈ the fraction of the corpus probed
  * (the documented pgvector recall/probes tradeoff, at its
  * worst-case corpus). So the gates here are two-layered:
  *
  *  - HARD structural gates: the probe must be bit-EXACT within the
  *    cells it chose, and a full probe (nprobe = nlist) must equal
  *    brute force exactly — the index machinery may lose nothing
  *    beyond its declared cell selection. These detect regressions
  *    with zero flake margin.
  *  - Recall floors at the shipped operating point (measured, then
  *    fixed with margin below). r5 operating point: nlist 32,
  *    spill 2 (SOAR-style multi-assignment with ranked-cells probe
  *    dedup), nprobe 6 — mean recall@10 ≈ 0.83 over 20 queries
  *    (tools/ProfileRecall) → floors 0.7. On a clustered real-world
  *    corpus the same machinery measures far higher; the floor is a
  *    property of corpus geometry, not index quality.
  *
  * PQ is the exception: its ADC+re-rank pipeline re-scores the
  * shortlist with exact vectors, so ≥ 0.9 holds even here.
  */
class RecallGateSpec extends SparkSpec {

  private val Nlist = graft.queries.VectorQueries.IvfNlist
  private val Nprobe = graft.queries.VectorQueries.IvfNprobe
  private val Spill = graft.queries.VectorQueries.IvfSpill

  private def ids(df: DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSeq

  private def corpus = Tables.embeddings(spark, Sf).filter(col("vec_id") =!= 0)
  private def queryVec = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
    .select(col("embedding").as("qvec"))

  private def exactTopK(metric: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column, k: Int): Seq[Long] =
    ids(Knn.topK(corpus, "vec_id", "embedding", queryVec, "qvec", metric, k))

  private def recall(approx: Seq[Long], exact: Seq[Long]): Double =
    (approx.toSet & exact.toSet).size.toDouble / exact.size

  private lazy val builtIndex =
    IvfIndex.buildIndex(Tables.embeddings(spark, Sf), "vec_id", "embedding",
      nlist = Nlist, spill = Spill)

  test("vs_ivf_knn: exact within probed cells (hard) + recall@10 floor") {
    val approx = ids(SparkEntry.queries("vs_ivf_knn")(spark, Sf))
    val (indexed, centroids) = builtIndex
    // the cells the probe ranks, reproduced with the search's own metric
    val probedCells = centroids.crossJoin(broadcast(queryVec))
      .select(col("centroid_id"),
        VectorFunctions.l2Distance(col("centroid"), col("qvec")).as("cdist"))
      .orderBy(col("cdist"), col("centroid_id")).limit(Nprobe)
      .collect().map(_.getInt(0))
    // brute force restricted to the VECTORS with a copy in a probed
    // cell — the probe's exactness domain (the spilled store holds
    // duplicate rows, so membership is a distinct-id semi-join, and
    // the dedup predicate must surface each member exactly once)
    val members = indexed
      .filter(col("centroid_id").isin(probedCells: _*))
      .select(col("vec_id")).distinct()
    val restricted = ids(Knn.topK(
      Tables.embeddings(spark, Sf)
        .join(members, Seq("vec_id"), "left_semi")
        .filter(col("vec_id") =!= 0),
      "vec_id", "embedding", queryVec, "qvec", VectorFunctions.l2Distance, 10))
    assert(approx == restricted,
      s"probe is not exact within its own cells: $approx vs $restricted")
    val r = recall(approx, exactTopK(VectorFunctions.l2Distance, 10))
    info(f"vs_ivf_knn recall@10 = $r%.2f at spill $Spill nprobe $Nprobe/$Nlist (isotropic corpus: candidate fraction ${Spill.toDouble * Nprobe / Nlist}%.2f)")
    assert(r >= 0.7, f"vs_ivf_knn recall@10 $r%.2f below floor 0.7")
  }

  test("IVF full probe (nprobe = nlist) equals brute force exactly (spilled dedup)") {
    val (indexed, centroids) = builtIndex
    // with every cell probed, the primary_cell predicate must keep
    // exactly the primary copy of every vector — any dedup defect
    // shows as duplicate or missing ids here
    val full = ids(IvfIndex.search(indexed.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", centroids, queryVec, "qvec",
      VectorFunctions.l2Distance, k = 10, nprobe = Nlist))
    val exact = exactTopK(VectorFunctions.l2Distance, 10)
    assert(full == exact, s"full probe lost rows: $full vs $exact")
  }

  test("vs_ivf_auto: recall@10 floor (pruned probe, same cells as vs_ivf_knn)") {
    val auto = SparkEntry.queries("vs_ivf_auto")(spark, Sf)
    // the gate is meaningless if the optimizer did not actually prune
    assert("PartitionFilters: \\[[^\\]]*centroid_id[^\\]]*IN".r
      .findFirstIn(auto.queryExecution.executedPlan.toString).isDefined,
      "vs_ivf_auto plan is not partition-pruned")
    val got = ids(auto)
    assert(got.distinct == got, "spilled-store probe returned duplicate ids")
    val r = recall(got, exactTopK(VectorFunctions.l2Distance, 10))
    info(f"vs_ivf_auto recall@10 = $r%.2f at spill $Spill nprobe $Nprobe/$Nlist")
    assert(r >= 0.7, f"vs_ivf_auto recall@10 $r%.2f below floor 0.7")
  }

  test("vs_sq_knn: recall@10 floor 0.9 (SQ8 shortlist × exact re-rank)") {
    val got = ids(SparkEntry.queries("vs_sq_knn")(spark, Sf))
    assert(got.distinct == got)
    val r = recall(got, exactTopK(VectorFunctions.l2Distance, 10))
    info(f"vs_sq_knn recall@10 = $r%.2f (per-dim 8-bit, rerank 64)")
    assert(r >= 0.9, f"vs_sq_knn recall@10 $r%.2f below floor 0.9")
  }

  test("vs_ivf_txn: recall@10 floor (GraftTable store, probe + file skip)") {
    // plan-shape + exact file-skip bound live in IvfGraftSpec; this
    // gate quantifies the end recall of the inventory entry
    val got = ids(SparkEntry.queries("vs_ivf_txn")(spark, Sf))
    assert(got.distinct == got, "single-copy store returned duplicate ids")
    val r = recall(got, exactTopK(VectorFunctions.l2Distance, 10))
    info(f"vs_ivf_txn recall@10 = $r%.2f at spill 1 " +
      f"nprobe ${graft.queries.VectorQueries.TxnNprobe}/$Nlist")
    assert(r >= 0.6, f"vs_ivf_txn recall@10 $r%.2f below floor 0.6 (spill-1 store)")
  }

  test("vs_knn_filtered_auto: probe + metadata filter, recall floor vs exact filtered") {
    val auto = SparkEntry.queries("vs_knn_filtered_auto")(spark, Sf)
    val plan = auto.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*centroid_id[^\\]]*IN".r.findFirstIn(plan).isDefined,
      s"filtered auto plan is not partition-pruned:\n$plan")
    assert("PushedFilters: \\[[^\\]]*label".r.findFirstIn(plan).isDefined,
      s"label predicate did not reach the scan:\n$plan")
    val got = ids(auto)
    assert(got.distinct == got, "filtered spilled probe returned duplicate ids")
    // exact twin: brute-force top-10 within the SAME metadata filter
    val exact = ids(Knn.topK(
      corpus.filter(col("label") === 3),
      "vec_id", "embedding", queryVec, "qvec", VectorFunctions.l2Distance, 10))
    val r = recall(got, exact)
    info(f"vs_knn_filtered_auto recall@10 = $r%.2f at spill $Spill nprobe $Nprobe/$Nlist (label = 3)")
    assert(r >= 0.7, f"vs_knn_filtered_auto recall@10 $r%.2f below floor 0.7")
  }

  test("vs_knn_filtered_iter: adaptive probe width, recall floor vs exact filtered") {
    val got = ids(SparkEntry.queries("vs_knn_filtered_iter")(spark, Sf))
    assert(got.distinct == got, "iterative probe returned duplicate ids")
    val exact = ids(Knn.topK(
      corpus.filter(col("label") === 3),
      "vec_id", "embedding", queryVec, "qvec", VectorFunctions.l2Distance, 10))
    // the iterative scan widens until k predicate-passing rows are in
    // the probed cells, so it must return as many rows as exist
    assert(got.size == math.min(10, exact.size),
      s"iterative scan under-returned: ${got.size} of ${exact.size} available")
    val r = recall(got, exact)
    info(f"vs_knn_filtered_iter recall@10 = $r%.2f (adaptive width, label = 3)")
    assert(r >= 0.7, f"vs_knn_filtered_iter recall@10 $r%.2f below floor 0.7")
  }

  test("spill=3 raises the recall floor to 0.85 at the same nprobe (generalized dedup)") {
    // VERDICT r5 #7: the ranked-cells layout supports any spill; the
    // third copy pushes candidate fraction to 3·6/32 ≈ 0.56 on this
    // isotropic corpus, which must clear 0.85 where spill 2 clears 0.7
    val (indexed, centroids) = IvfIndex.buildIndex(
      Tables.embeddings(spark, Sf), "vec_id", "embedding",
      nlist = Nlist, spill = 3)
    val got = ids(IvfIndex.search(indexed.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", centroids, queryVec, "qvec",
      VectorFunctions.l2Distance, k = 10, nprobe = Nprobe))
    assert(got.distinct == got, "spill=3 probe returned duplicate ids")
    val r = recall(got, exactTopK(VectorFunctions.l2Distance, 10))
    info(f"spill=3 recall@10 = $r%.2f at nprobe $Nprobe/$Nlist (candidate fraction ${3.0 * Nprobe / Nlist}%.2f)")
    assert(r >= 0.85, f"spill=3 recall@10 $r%.2f below floor 0.85")
  }

  test("vs_ivf_batch: mean recall@5 floor vs brute-force batch") {
    val approx = SparkEntry.queries("vs_ivf_batch")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val q = Tables.embeddings(spark, Sf).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Knn.topKBatch(Tables.embeddings(spark, Sf), "vec_id", "embedding",
        q, "qid", "qvec", VectorFunctions.l2Distance, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.toSeq.sortBy(_._1).map { case (qid, ex) =>
      (approx.getOrElse(qid, Set.empty[Long]) & ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    info(f"vs_ivf_batch mean recall@5 = $mean%.2f (per-query ${recalls.map(r => f"$r%.1f").mkString(",")})")
    assert(mean >= 0.7, f"vs_ivf_batch mean recall@5 $mean%.2f below floor 0.7")
  }

  test("vs_ivfpq_knn: recall@10 floor 0.7 (cell probe × ADC shortlist × exact re-rank)") {
    val got = ids(SparkEntry.queries("vs_ivfpq_knn")(spark, Sf))
    assert(got.distinct == got, "composite probe returned duplicate ids")
    val r = recall(got, exactTopK(VectorFunctions.l2Distance, 10))
    info(f"vs_ivfpq_knn recall@10 = $r%.2f (spill $Spill nprobe $Nprobe/$Nlist, m=16 ADC, rerank 64)")
    assert(r >= 0.7, f"vs_ivfpq_knn recall@10 $r%.2f below floor 0.7")
  }

  test("vs_hnsw_knn: recall@10 ≥ 0.9 (graph beam search, isotropy-immune)") {
    val got = ids(SparkEntry.queries("vs_hnsw_knn")(spark, Sf))
    assert(got.distinct == got)
    val r = recall(got, exactTopK(VectorFunctions.l2Distance, 10))
    info(f"vs_hnsw_knn recall@10 = $r%.2f (m=${graft.queries.VectorQueries.HnswM}, ef=${graft.queries.VectorQueries.HnswEf}, 8 partition graphs)")
    assert(r >= 0.9, f"vs_hnsw_knn recall@10 $r%.2f below floor 0.9")
  }

  test("vs_hnsw_sparse: distance-recall@10 ≥ 0.8 vs the exact two-pointer scan") {
    // sparse tf vectors tie heavily on cosine (integer weights), so
    // the gate compares DISTANCE multisets, not ids — the ranking
    // contract an ANN serves under ties (the bit-graph discipline)
    val got = SparkEntry.queries("vs_hnsw_sparse")(spark, Sf)
      .collect().map(_.getDouble(1)).sorted.toSeq
    val (qi, qv) = graft.functions.SparseVec.queryOf(
      graft.queries.VectorQueries.SparseQueryTerms)
    val exact = graft.queries.VectorQueries.sparseTf(spark, Sf)
      .select((org.apache.spark.sql.functions.lit(1.0) -
        graft.functions.SparseVec.cosineSimilarity(
          org.apache.spark.sql.functions.col("sidx"),
          org.apache.spark.sql.functions.col("sval"), qi, qv)).as("dist"),
        org.apache.spark.sql.functions.col("doc_id"))
      .orderBy("dist", "doc_id").limit(10)
      .collect().map(_.getDouble(0)).sorted.toSeq
    val agree = got.zip(exact).count { case (a, b) => a == b }
    info(s"vs_hnsw_sparse distance agreement $agree/10: $got vs $exact")
    assert(agree >= 8, s"sparse graph distance-recall $agree/10 below 0.8")
  }

  test("vs_hnsw_filtered: widened-beam filtered graph search, recall floor vs exact filtered") {
    val got = ids(SparkEntry.queries("vs_hnsw_filtered")(spark, Sf))
    assert(got.distinct == got)
    val exact = ids(Knn.topK(
      corpus.filter(col("label") === 3),
      "vec_id", "embedding", queryVec, "qvec", VectorFunctions.l2Distance, 10))
    val r = recall(got, exact)
    info(f"vs_hnsw_filtered recall@10 = $r%.2f (widen 8, label = 3)")
    assert(r >= 0.7, f"vs_hnsw_filtered recall@10 $r%.2f below floor 0.7")
  }

  test("emb_pairs_blocked: positive-pair recall floor vs the exact per-anchor argmin") {
    // the blocked variant finds each sampled anchor's nearest positive
    // THROUGH shared spill cells; the gate measures how often that
    // equals the exact (full-pass) nearest positive
    import org.apache.spark.sql.functions._
    val blocked = SparkEntry.queries("emb_pairs_blocked")(spark, Sf)
      .select(col("anchor_id"), col("pos_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact positives for the same md5-sampled anchor set (one corpus
    // pass per anchor — test-only, the shape the operator avoids)
    val anchors = Tables.embeddings(spark, Sf)
      .filter(conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % graft.queries.VectorQueries.PairSampleMod === 0)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("avec"))
    val exact = Tables.embeddings(spark, Sf)
      .join(broadcast(anchors), col("vec_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("vec_id"),
        VectorFunctions.cosineDistance(col("embedding"), col("avec")).as("dist"))
      .filter(col("dist") < 0.7)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("anchor_id"))
          .orderBy(col("dist"), col("vec_id"))))
      .filter(col("rn") === 1)
      .select(col("anchor_id"), col("vec_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty, "no exact positives — fixture drifted")
    val hits = exact.count { case (a, p) => blocked.get(a).contains(p) }
    val r = hits.toDouble / exact.size
    info(f"emb_pairs_blocked exact-positive recall = $r%.2f over ${exact.size} anchors " +
      s"(spill ${graft.queries.VectorQueries.PairCellSpill})")
    assert(r >= 0.7, f"blocked positive recall $r%.2f below floor 0.7")
  }

  test("vs_lsh_knn: recall@10 ≥ 0.9 (Hamming-1 multiprobe)") {
    val approx = ids(SparkEntry.queries("vs_lsh_knn")(spark, Sf))
    val r = recall(approx, exactTopK(VectorFunctions.cosineDistance, 10))
    info(f"vs_lsh_knn recall@10 = $r%.2f (8 tables × 4 bits, multiprobe 1 — was 0.70 single-bucket)")
    assert(r >= 0.9, f"vs_lsh_knn recall@10 $r%.2f below floor 0.9")
  }

  test("vs_pq_knn: recall@10 ≥ 0.9 (ADC shortlist + exact re-rank)") {
    val approx = ids(SparkEntry.queries("vs_pq_knn")(spark, Sf))
    val r = recall(approx, exactTopK(VectorFunctions.l2Distance, 10))
    info(f"vs_pq_knn recall@10 = $r%.2f (rerank 192)")
    assert(r >= 0.9, f"vs_pq_knn recall@10 $r%.2f below floor 0.9")
  }

  test("vs_bq_knn: recall@10 ≥ 0.9 (sign-bit hamming shortlist + exact re-rank)") {
    val approx = ids(SparkEntry.queries("vs_bq_knn")(spark, Sf))
    assert(approx.distinct == approx)
    val r = recall(approx, exactTopK(VectorFunctions.l2Distance, 10))
    info(f"vs_bq_knn recall@10 = $r%.2f (64-bit sign sketch, rerank 192)")
    assert(r >= 0.9, f"vs_bq_knn recall@10 $r%.2f below floor 0.9")
  }

  test("vs_hnsw_routed: recall@10 ≥ 0.85 (nprobe cell graphs, spill-2 boundary copies)") {
    val approx = ids(SparkEntry.queries("vs_hnsw_routed")(spark, Sf))
    assert(approx.distinct == approx)
    val r = recall(approx, exactTopK(VectorFunctions.l2Distance, 10))
    info(f"vs_hnsw_routed recall@10 = $r%.2f (nprobe 4/16, spill 2 — ≤4 graphs walked vs 8-16 flat)")
    assert(r >= 0.85, f"vs_hnsw_routed recall@10 $r%.2f below floor 0.85")
  }

  test("vs_knn_half: recall@10 ≥ 0.9 (float16 store, half-rounded query)") {
    val approx = ids(SparkEntry.queries("vs_knn_half")(spark, Sf))
    assert(approx.distinct == approx)
    val r = recall(approx, exactTopK(VectorFunctions.l2Distance, 10))
    info(f"vs_knn_half recall@10 = $r%.2f (binary16 elements, 2x scan IO saved)")
    assert(r >= 0.9, f"vs_knn_half recall@10 $r%.2f below floor 0.9")
  }

  test("lossy RGB jpeg path: dims exact (hard), per-channel mean pixel error ≤ 3.0 vs lossless truth") {
    // mm_jpeg_decode itself moved to the hash gate in r13 (grayscale
    // block-constant tiles at quality 1.0 roundtrip exactly); this
    // gate keeps the LOSSY color-jpeg decode path covered — the
    // RGB-ramp jpegs exercise YCbCr conversion + chroma subsampling +
    // AC quantization, bounded-error by nature
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val specs = Tables.documents(spark, Sf)
      .select(col("doc_id"),
        (lit(16) + length(col("text")) % 48).cast("int").as("width"),
        (lit(8) + length(col("text")) % 24).cast("int").as("height"),
        ((graft.functions.TextFunctions.hash64(col("text")) % 128 + 128) % 128)
          .cast("int").as("base"))
      .as[graft.pipeline.Multimodal.ImageSpec]
    val jpeg = graft.pipeline.Multimodal.decodeImages(
        graft.pipeline.Multimodal.synthesizeJpegs(specs))
      .collect().map(f => f.doc_id ->
        (f.width, f.height, f.n_px, f.sum_r, f.sum_g, f.sum_b)).toMap
    val png = SparkEntry.queries("mm_image_decode")(spark, Sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(jpeg.keySet == png.keySet, "every doc must decode")
    var worst = 0.0
    for ((id, (jw, jh, jn, jr, jg, jb)) <- jpeg) {
      val (pw, ph, pn, pr, pg, pb) = png(id)
      assert((jw, jh, jn) == (pw, ph, pn),
        s"doc $id: JPEG dims ($jw,$jh) != exact ($pw,$ph) — container-level defect")
      // mean per-pixel deviation per channel: |Σdecoded − Σexact| / n
      val errs = Seq(jr - pr, jg - pg, jb - pb).map(d => math.abs(d).toDouble / jn)
      worst = math.max(worst, errs.max)
      assert(errs.forall(_ <= 3.0),
        s"doc $id channel mean error ${errs.map(e => f"$e%.2f")} exceeds 3.0")
    }
    info(f"lossy jpeg worst per-channel mean pixel error = $worst%.3f (bound 3.0, ${jpeg.size} docs)")
  }

  test("events_quantiles_sketch: rank error of every estimate ≤ 0.025 (KLL k=200)") {
    val est = SparkEntry.queries("events_quantiles_sketch")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(est.nonEmpty)
    // exact CDF per event type: realized rank of each estimate must
    // sit within ±0.025 of its target p (the KLL guarantee at k=200
    // is ~1.3%; the floor leaves margin for the deterministic
    // compaction variant)
    val values = Tables.events(spark, Sf)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    val errs = est.map { case (t, p, q) =>
      val vs = values(t)
      val rank = vs.count(_ <= q).toDouble / vs.length
      (t, p, math.abs(rank - p))
    }
    val maxErr = errs.map(_._3).max
    info(f"events_quantiles_sketch max rank error = $maxErr%.4f over ${errs.length} estimates")
    assert(maxErr <= 0.025,
      s"rank error above floor: ${errs.filter(_._3 > 0.025).mkString(", ")}")
  }

  test("KLL sketch merge is lossless in weight and bounded in rank error") {
    // unit-level: split a deterministic stream into 8 partial
    // sketches, merge, and compare vs a single-sketch build — the
    // merge path is what crosses the shuffle in production
    val rnd = new scala.util.Random(11)
    val data = Array.fill(40000)(rnd.nextGaussian() * 100 + 7)
    val whole = new graft.functions.KllSketch(200)
    data.foreach(whole.update)
    val parts = data.grouped(5000).map { chunk =>
      val s = new graft.functions.KllSketch(200); chunk.foreach(s.update); s
    }.toSeq
    val merged = parts.reduce(_ merge _)
    assert(merged.n == data.length && whole.n == data.length)
    val sorted = data.sorted
    for (p <- Seq(0.05, 0.25, 0.5, 0.75, 0.95, 0.99)) {
      val q = merged.quantile(p)
      val rank = sorted.count(_ <= q).toDouble / sorted.length
      assert(math.abs(rank - p) <= 0.025, f"merged rank error at p=$p: ${math.abs(rank - p)}%.4f")
    }
  }

  test("text_topk_sketch: exact top-10 recovered; every count within its err bound") {
    val got = SparkEntry.queries("text_topk_sketch")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 20)
    val exact = Tables.documents(spark, Sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // SpaceSaving guarantee: estimate ∈ [true, true + err]
    for ((w, est, err) <- got) {
      val truth = exact.getOrElse(w, 0L)
      assert(est >= truth && est - truth <= err,
        s"count bound violated for '$w': est=$est true=$truth err=$err")
    }
    val exactTop10 = exact.toSeq.sortBy { case (w, c) => (-c, w) }.take(10).map(_._1).toSet
    val gotTop10 = got.sortBy { case (w, c, _) => (-c, w) }.take(10).map(_._1).toSet
    val overlap = (exactTop10 & gotTop10).size
    info(s"text_topk_sketch top-10 overlap with exact = $overlap/10")
    assert(overlap >= 9, s"top-10 set drifted: $gotTop10 vs $exactTop10")
  }

  test("SpaceSaving merge with eviction keeps est ≥ true (absent-side floor, not 0)") {
    // tiny capacity forces eviction INSIDE each partial: a heavy item
    // split across partials and evicted from one must not be
    // undercounted by the merge (the absent side contributes its
    // minimum-count floor, per Mergeable Summaries)
    val rnd = new scala.util.Random(23)
    // zipfish stream over 40 items, heavy mass on items 0-3
    val stream = Array.fill(20000)(s"w${math.min(39, math.abs(rnd.nextGaussian() * 8).toInt)}")
    val truth = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val parts = stream.grouped(2500).map { chunk =>
      val s = new graft.functions.SpaceSaving(16); chunk.foreach(s.update); s
    }.toSeq
    val merged = parts.reduce(_ merge _)
    assert(merged.n == stream.length)
    for ((item, est, err) <- merged.topK(16)) {
      val t = truth.getOrElse(item, 0L)
      assert(est >= t, s"undercount after merge for $item: est=$est true=$t")
      assert(est - t <= err, s"err bound broken for $item: est=$est true=$t err=$err")
    }
    // presence guarantee: every item above n/capacity must be reported
    val floor = stream.length / 16
    val reported = merged.topK(16).map(_._1).toSet
    truth.filter(_._2 > floor).keys.foreach { hh =>
      assert(reported.contains(hh), s"heavy hitter $hh (count ${truth(hh)}) missing")
    }
  }

  test("events_approx_distinct: relative error vs exact distinct ≤ 3×rsd") {
    val approx = SparkEntry.queries("events_approx_distinct")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = Tables.events(spark, Sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val maxErr = exact.map { case (et, n) =>
      math.abs(approx(et) - n).toDouble / n }.max
    info(f"events_approx_distinct max relative error = $maxErr%.4f (rsd 1.04/sqrt(4096) = 0.0163)")
    assert(maxErr <= 0.05, f"engine HLL error $maxErr%.4f above 0.05 (3x rsd)")
  }

  test("decontam_bloom: zero false negatives (hard) + bounded false-flag rate") {
    import graft.operators.Decontaminate
    val docs = Tables.documents(spark, Sf)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val exact = Decontaminate
      .overlaps(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id", "n_overlap")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = SparkEntry.queries("decontam_bloom")(spark, Sf)
      .select("doc_id", "n_maybe_overlap")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // HARD one-sided contract: every truly contaminated doc is
    // flagged, with maybe-count ≥ its true overlap — a Bloom filter
    // cannot miss a member, so any violation is a code bug.
    exact.foreach { case (id, n) =>
      assert(bloom.getOrElse(id, 0L) >= n,
        s"doc $id: bloom ${bloom.getOrElse(id, 0L)} < exact $n (false negative)")
    }
    // False-flag bound: clean docs flag with P ≤ n_shingles·fpp
    // (union bound) — at fpp 1e-5 and ~200 shingles/doc the expected
    // false-flag count over this corpus is ≪ 1; gate at 1% of the
    // clean population (plus a small-count floor).
    val falseFlags = (bloom.keySet -- exact.keySet).size
    val clean = corpus.count() - exact.size
    info(s"decontam_bloom: ${exact.size} true hits all flagged, " +
      s"$falseFlags false flags over $clean clean docs")
    assert(falseFlags <= math.max(3L, clean / 100),
      s"$falseFlags false-flagged docs over $clean clean (fpp budget blown)")
  }

  test("dedup_embedding_ivf: exact precision (hard) + pair recall floor vs all-pairs") {
    val emb = Tables.embeddings(spark, Sf)
    // ground truth: exact ALL-PAIRS cosine >= tau — no label crutch.
    // Computed over distinct-vector representatives (min vec_id per
    // bit-identical embedding) to match the operator's clone-collapsed
    // pair contract; on this fixture the corpus has no exact clones,
    // so rep-level and raw-level truth coincide.
    val reps = emb.groupBy(col("embedding"))
      .agg(min(col("vec_id")).as("vec_id"))
    val a = reps.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = reps.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")) >= 0.35)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("dedup_embedding_ivf")(spark, Sf)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // HARD: every reported pair really is >= tau (the cell block only
    // limits WHICH pairs are scored, never how) — same expression,
    // same operand order as ground truth, so set containment is exact
    assert((got -- exact).isEmpty,
      s"false pairs reported: ${(got -- exact).take(5)}")
    // Floor 0.7 under measured 0.856 (nlist 16, spill 3,
    // tools/ProfileSemDedup): every true pair on this fixture sits at
    // cos 0.35-0.45 — the isotropic worst case, same geometry story
    // as the IVF knn floors above.
    val rec = (got & exact).size.toDouble / math.max(exact.size, 1)
    info(f"dedup_embedding_ivf pair recall = $rec%.3f over ${exact.size} true pairs (floor 0.7)")
    assert(rec >= 0.7, f"pair recall $rec%.3f below 0.7")
  }

  /** "text_bpe_train" / "text_bpe_apply" gate: the distributed
    * trainer is not relationally expressible (greedy argmax loop), so
    * the gate is EXACT equality against an independent in-memory
    * reference implementation run on the same corpus — same
    * determinism contract (tie-break count DESC, lhs, rhs; greedy
    * left-to-right merge), zero tolerance. The apply path is then
    * checked end-to-end: the persisted vocabulary tokenization must
    * round-trip (concat of symbols == word) and the per-doc BPE token
    * counts must equal a from-scratch in-memory tokenization of every
    * document. */
  test("BPE trainer matches an independent in-memory reference exactly") {
    import graft.operators.Bpe
    // ---- independent reference: plain Scala on collected word counts
    val wc = Bpe.wordCounts(Tables.documents(spark, Sf), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    var syms: Array[(String, Array[String], Long)] =
      wc.map { case (w, c) => (w, w.map(_.toString).toArray, c) }
    def applyRef(ss: Array[String], a: String, b: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      ss.foreach { sy =>
        if (out.nonEmpty && out.last == a && sy == b) out(out.length - 1) = a + b
        else out += sy
      }
      out.toArray
    }
    val ref = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (r <- 1 to 20) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (_, ss, c) =>
        var i = 0
        while (i < ss.length - 1) {
          counts((ss(i), ss(i + 1))) = counts.getOrElse((ss(i), ss(i + 1)), 0L) + c
          i += 1
        }
      }
      val ((a, b), c) = counts.minBy { case ((l, rr), cnt) => (-cnt, l, rr) }
      ref += ((r, a, b, a + b, c))
      syms = syms.map { case (w, ss, c2) => (w, applyRef(ss, a, b), c2) }
    }
    // ---- the distributed trainer's output, exactly
    val got = SparkEntry.queries("text_bpe_train")(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == ref.toSeq,
      s"trainer diverged from the reference:\n got=${got.take(5).mkString(", ")}\n ref=${ref.take(5).mkString(", ")}")

    // ---- apply path: vocabulary round-trip + per-doc count equality
    val (_, symsP) = graft.queries.TextQueries.ensureBpe(spark, Sf)
    val vocabRows = spark.read.parquet(symsP)
      .select(col("word"), col("symbols")).collect()
    vocabRows.foreach { r =>
      val w = r.getString(0); val ss = r.getSeq[String](1)
      assert(ss.mkString == w, s"round-trip broke for '$w': $ss")
    }
    val refLen = syms.map { case (w, ss, _) => w -> ss.length }.toMap
    val sparkLen = vocabRows.map(r => r.getString(0) -> r.getSeq[String](1).length).toMap
    assert(sparkLen == refLen, "vocabulary tokenization lengths diverge")
    val expected = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect().flatMap { r =>
        val ws = r.getString(1).trim.split("\\s+").filter(_.matches("^[a-z]+$"))
        if (ws.isEmpty) None
        else Some((r.getLong(0), ws.length.toLong, ws.map(w => refLen(w).toLong).sum))
      }.sortBy(_._1).toSeq
    val gotApply = SparkEntry.queries("text_bpe_apply")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotApply == expected,
      s"apply counts diverge: got ${gotApply.take(3)}, want ${expected.take(3)}")
  }

  test("vs_knn_join: mean recall@5 ≥ 0.85 vs the exact all-pairs ranking") {
    // Floor 0.85 under measured 0.97 (blocked init + 2 NN-Descent
    // rounds at a 3k internal frontier — tools/ProfileKnnJoin; the
    // un-widened descent plateaus at 0.67 on this isotropic corpus).
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, Sf)
    val approx = SparkEntry.queries("vs_knn_join")(spark, Sf)
      .select(col("vec_id"), col("neighbor_id"))
    val a = emb.select(col("vec_id").as("qa"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("qb"), col("embedding").as("vb"))
    val w = Window.partitionBy(col("qa")).orderBy(col("dist"), col("qb"))
    val exact = a.join(b, col("qa") =!= col("qb"))
      .select(col("qa"), col("qb"),
        VectorFunctions.l2Distance(col("va"), col("vb")).as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qa").as("vec_id"), col("qb").as("neighbor_id"))
    val hit = approx.intersect(exact).count().toDouble
    val total = exact.count().toDouble
    val recall = hit / total
    info(f"knn-join mean recall@5: $recall%.3f")
    assert(recall >= 0.85, f"recall $recall%.3f below the 0.85 floor")
  }

  test("curate_classifier: training accuracy ≥ 0.9 on the target-language label") {
    // Floor 0.9 under measured 0.98 at the shipped operating point
    // (trigram counts, NB warm start + 4 GD calibration epochs —
    // tools/ProfileClassifier; 0.92 at sf0.1's 5000 docs, so the
    // accuracy is learned signal, not small-corpus memorization);
    // gradient sums reassociate float addition, so the gate is a
    // measured floor, not a bit-exact replay. Majority baseline on
    // this fixture is 0.564.
    val out = SparkEntry.queries("curate_classifier")(spark, Sf)
    val agg = out.agg(
      avg((col("pred") === col("y").cast("int")).cast("double")).as("acc"),
      count(lit(1)).as("n")).head
    val acc = agg.getDouble(0)
    info(f"classifier training accuracy: $acc%.3f over ${agg.getLong(1)} docs")
    assert(agg.getLong(1) > 0)
    assert(acc >= 0.9, f"accuracy $acc%.3f below the 0.9 floor")
  }
}
