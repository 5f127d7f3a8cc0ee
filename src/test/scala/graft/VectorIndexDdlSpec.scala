package graft

import graft.plans.{HnswSqlCatalog, IvfCatalog, VectorIndexDdl}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** pgvector index DDL (VERDICT r9 missing #1): the full migration —
  * DDL then DML, both verbatim — runs on one GraftExtensions session:
  * `CREATE INDEX ... USING ivfflat (embedding vector_l2_ops) WITH
  * (lists=N)` builds + registers the cell store and rebinds the table
  * name, and the reference-shaped SELECT
  * (SSEOpenAIController.java:316) then plans the PARTITION-PRUNED
  * probe over it. */
class VectorIndexDdlSpec extends SparkSpec {

  // ---------------------------------------------------------- grammar
  test("grammar: pgvector DDL variants parse; non-index SQL does not") {
    val s1 = VectorIndexDdl.parse(
      "CREATE INDEX ON items USING ivfflat (embedding vector_l2_ops) WITH (lists = 100)").get
    assert(s1 == VectorIndexDdl.Stmt(ifNotExists = false, None, "items",
      "ivfflat", "embedding", Some("vector_l2_ops"), Map("lists" -> "100")))

    val s2 = VectorIndexDdl.parse(
      """CREATE INDEX IF NOT EXISTS idx_e ON items
         USING hnsw (embedding vector_cosine_ops)
         WITH (m = 16, ef_construction = 64);""").get
    assert(s2.ifNotExists && s2.name.contains("idx_e") && s2.method == "hnsw" &&
      s2.options == Map("m" -> "16", "ef_construction" -> "64"))

    // opclass and WITH are optional (pgvector defaults)
    val s3 = VectorIndexDdl.parse("create index on t using ivfflat (v)").get
    assert(s3.opclass.isEmpty && s3.options.isEmpty && s3.column == "v")

    assert(VectorIndexDdl.parse("SELECT * FROM t").isEmpty)
    assert(VectorIndexDdl.parse("CREATE TABLE t (a INT)").isEmpty)
    assert(VectorIndexDdl.parse("CREATE INDEX ON t (a)").isEmpty) // btree: not ours
  }

  test("pgvector 0.7+ opclass families: halfvec/sparsevec metric from suffix; kernel-less opclasses refused") {
    withExtSession { s =>
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_half")
      s.sql("""CREATE INDEX idx_half ON ddl_half
               USING hnsw (embedding halfvec_cosine_ops)
               WITH (m = 8, ef_construction = 32, parts = 2, id = 'vec_id')""")
      assert(HnswSqlCatalog.get("idx_half").exists(e =>
        e.metric == "cosine" && e.storage == "halfvec"))
      s.sql("DROP INDEX idx_half")
      // sparsevec: the engine's sparse kernels are the explicit
      // (indices, values) API — a dense-array sparsevec index would
      // silently densify, so the DDL refuses with the opclass named
      // (documented deviation from pgvector's hnsw-sparsevec)
      val eSparse = intercept[Exception] {
        s.sql("""CREATE INDEX idx_sparse ON ddl_half
                 USING hnsw (embedding sparsevec_ip_ops)
                 WITH (m = 8, ef_construction = 32, parts = 2, id = 'vec_id')""")
      }
      assert(eSparse.getMessage.contains("sparsevec_ip_ops"))
      // unknown families still fail loudly
      val e = intercept[Exception] {
        s.sql("CREATE INDEX ON ddl_half USING hnsw (embedding quadvec_l2_ops)")
      }
      assert(e.getMessage.contains("quadvec_l2_ops"))
      // ADVICE r12: an opclass is accepted ONLY when the method has a
      // matching build/probe kernel. Bit metrics have no index build
      // kernel (builds run real-vector arithmetic) — named refusal:
      val eBit = intercept[Exception] {
        s.sql("CREATE INDEX ON ddl_half USING hnsw (embedding bit_hamming_ops)")
      }
      assert(eBit.getMessage.contains("bit_hamming_ops"))
      // pgvector parity: ivfflat has no l1 and no sparsevec opclass
      val eL1 = intercept[Exception] {
        s.sql("CREATE INDEX ON ddl_half USING ivfflat (embedding vector_l1_ops)")
      }
      assert(eL1.getMessage.contains("vector_l1_ops"))
      val eSp = intercept[Exception] {
        s.sql("CREATE INDEX ON ddl_half USING ivfflat (embedding sparsevec_l2_ops)")
      }
      assert(eSp.getMessage.contains("sparsevec_l2_ops"))
      // hnsw DOES have the l1 kernel (vector_l1_ops is hnsw-only,
      // exactly as in pgvector)
      s.sql("""CREATE INDEX idx_l1 ON ddl_half
               USING hnsw (embedding vector_l1_ops)
               WITH (m = 8, ef_construction = 32, parts = 2, id = 'vec_id')""")
      assert(HnswSqlCatalog.get("idx_l1").exists(_.metric == "l1"))
      s.sql("DROP INDEX idx_l1")
    }
  }

  test("halfvec hnsw DDL: graph blobs store binary16 (half the bytes), SELECT served, gated recall") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_halfroute")
      s.sql("""CREATE INDEX idx_hw ON ddl_halfroute
               USING hnsw (embedding vector_l2_ops)
               WITH (m = 8, ef_construction = 32, parts = 2, id = 'vec_id')""")
      s.sql("""CREATE INDEX idx_hh ON ddl_halfroute
               USING hnsw (embedding halfvec_l2_ops)
               WITH (m = 8, ef_construction = 32, parts = 2, id = 'vec_id')""")
      def blobBytes(name: String): Long = {
        val e = HnswSqlCatalog.get(name).get
        graft.operators.Hnsw.readGraphs(s, e.path)
          .select(org.apache.spark.sql.functions.sum(length(col("graph"))))
          .head.getLong(0)
      }
      val wide = blobBytes("idx_hw"); val half = blobBytes("idx_hh")
      info(s"graph store bytes: vector=$wide halfvec=$half (${half.toDouble / wide}%)")
      assert(half < (wide * 0.8).toLong,
        s"halfvec graph store $half not meaningfully smaller than $wide — " +
          "the opclass prefix must select storage width")
      // the deserialized index carries the half flag and rounded vecs
      val blob = graft.operators.Hnsw.readGraphs(
        s, HnswSqlCatalog.get("idx_hh").get.path)
        .select(col("graph")).head.getAs[Array[Byte]](0)
      assert(graft.operators.Hnsw.deser(blob).half)
      // verbatim SELECT served from the half graph, recall gated
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      s.sql("DROP INDEX idx_hw") // leave only the half index to serve
      val df = s.sql(
        s"""SELECT vec_id FROM ddl_halfroute
            ORDER BY embedding <-> '${vec.mkString("[", ",", "]")}'::vector
            LIMIT 10""")
      val got = df.collect().map(_.getLong(0)).toSeq
      assert(got.length == 10)
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      val probed = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case In(a: AttributeReference, _) if a.name == "vec_id" => true }
      }.flatten.nonEmpty
      assert(probed, "halfvec hnsw index did not serve the <-> sort")
      val exact = graft.operators.Knn.topK(
        Tables.embeddings(s, Sf), "vec_id", "embedding",
        Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
          .select(col("embedding").as("qvec")),
        "qvec", graft.functions.VectorFunctions.l2Distance, 10)
        .collect().map(_.getLong(0)).toSet
      val recall = got.count(exact.contains).toDouble / 10
      info(f"halfvec hnsw DDL recall@10 = $recall%.2f")
      assert(recall >= 0.8, s"halfvec recall $recall below gate")
      s.sql("DROP INDEX idx_hh")
    }
  }

  test("halfvec ivfflat DDL: store scan reads the packed sidecar (ReadSchema), probe fires") {
    withExtSession { s =>
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_halfivf")
      s.sql("""CREATE INDEX idx_hivf ON ddl_halfivf
               USING ivfflat (embedding halfvec_l2_ops)
               WITH (lists = 8, probes = 8, id = 'vec_id')""")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      val df = s.sql(
        s"""SELECT vec_id FROM ddl_halfivf
            WHERE vec_id <> 0
            ORDER BY embedding <-> '${vec.mkString("[", ",", "]")}'::vector
            LIMIT 5""")
      val got = df.collect().map(_.getLong(0)).toSeq
      assert(got.length == 5)
      val scans = df.queryExecution.executedPlan.collect {
        case sc: FileSourceScanExec if sc.relation.location.rootPaths
          .exists(_.toString.contains("graft_sqlindex_ivfflat")) => sc }
      assert(scans.nonEmpty, "store scan missing")
      // ReadSchema reads the 2-byte packed column, never a wide vector
      val rs = scans.map(_.metadata.getOrElse("ReadSchema", ""))
      assert(rs.exists(_.contains("__hv_embedding")),
        s"packed sidecar not in ReadSchema: $rs")
      assert(!rs.exists(_.contains("embedding:array")),
        s"wide vector column still read: $rs")
      // the cell probe fired as a partition filter
      assert(scans.exists(_.partitionFilters.exists(_.toString.contains("centroid_id"))),
        "no centroid_id partition filter")
      // full probe (probes = lists): exact top-k under HALFVEC
      // distances — compare against brute force over half-rounded
      // values (pgvector's halfvec column semantics)
      import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
      def halfRounded(dfe: org.apache.spark.sql.DataFrame) =
        dfe.withColumn("embedding", toColumn(graft.functions.HalfUnpackExpr(
          graft.functions.HalfPackExpr(toExpression(col("embedding"))))))
      val want = graft.operators.Knn.topK(
        halfRounded(Tables.embeddings(s, Sf)).filter(col("vec_id") =!= 0),
        "vec_id", "embedding",
        halfRounded(Tables.embeddings(s, Sf).filter(col("vec_id") === 0))
          .select(col("embedding").as("qvec")),
        "qvec", graft.functions.VectorFunctions.l2Distance, 5)
        .collect().map(_.getLong(0)).toSeq
      assert(got == want, s"got $got, want $want (half-distance exact)")
      s.sql("DROP INDEX idx_hivf")
      assert(!s.table("ddl_halfivf").columns.contains("centroid_id"))
    }
  }

  test("duplicate CREATE INDEX name fails loudly; original restore closure survives") {
    withExtSession { s =>
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_dup")
      s.sql("""CREATE INDEX idx_dup ON ddl_dup
               USING ivfflat (embedding) WITH (lists = 4, id = 'vec_id')""")
      // ADVICE r12 medium: a second CREATE under the live name would
      // capture the store-backed binding in the restore closure — then
      // DROP would "restore" a view over the deleted store. pgvector
      // errors with `relation "name" already exists`; so do we.
      val e = intercept[Exception] {
        s.sql("""CREATE INDEX idx_dup ON ddl_dup
                 USING ivfflat (embedding) WITH (lists = 4, id = 'vec_id')""")
      }
      assert(e.getMessage.contains("already exists"))
      // IF NOT EXISTS no-ops on the live name
      s.sql("""CREATE INDEX IF NOT EXISTS idx_dup ON ddl_dup
               USING ivfflat (embedding) WITH (lists = 4, id = 'vec_id')""")
      // DROP restores the ORIGINAL pre-index binding and the table
      // still reads the fixture (not the deleted store)
      s.sql("DROP INDEX idx_dup")
      assert(!s.table("ddl_dup").columns.contains("centroid_id"),
        "original binding not restored")
      assert(s.table("ddl_dup").count() > 0, "restored table reads nothing")
    }
  }

  test("hnsw cosine/ip DDL: graph built AND walked with the opclass metric, gated recall") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_hnsw_met")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      val vecText = vec.mkString("[", ",", "]")
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def probed(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, _) if a.name == "vec_id" => true
            }
        }.flatten.nonEmpty
      def recallVs(got: Seq[Long],
          distFn: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double = {
        val exact = graft.operators.Knn.topK(
          Tables.embeddings(s, Sf), "vec_id", "embedding",
          Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
            .select(col("embedding").as("qvec")),
          "qvec", distFn, 10)
          .collect().map(_.getLong(0)).toSet
        got.count(exact.contains).toDouble / 10
      }

      // --- cosine: ADVICE r12 high — the graph must be BUILT with the
      // opclass distance, not descend an L2 graph under a cosine sort
      s.sql("""CREATE INDEX idx_hnsw_cos ON ddl_hnsw_met
               USING hnsw (embedding vector_cosine_ops)
               WITH (m = 8, ef_construction = 48, parts = 4, id = 'vec_id')""")
      val entCos = HnswSqlCatalog.get("idx_hnsw_cos").get
      val blob = graft.operators.Hnsw.readGraphs(s, entCos.path)
        .select(col("graph")).head.getAs[Array[Byte]](0)
      assert(graft.operators.Hnsw.deser(blob).metric == graft.operators.Hnsw.Metric.Cosine,
        "graph blob does not carry the cosine kernel")
      val dfCos = s.sql(
        s"""SELECT vec_id FROM ddl_hnsw_met
            ORDER BY embedding <=> '$vecText'::vector LIMIT 10""")
      val gotCos = dfCos.collect().map(_.getLong(0)).toSeq
      assert(probed(dfCos), "cosine index did not serve the <=> sort")
      val rCos = recallVs(gotCos, graft.functions.VectorFunctions.cosineDistance)
      info(f"hnsw cosine DDL recall@10 = $rCos%.2f")
      assert(rCos >= 0.8, s"cosine recall $rCos below gate")
      s.sql("DROP INDEX idx_hnsw_cos")

      // --- inner product: the metric pgvector warns L2 descent never
      // serves (favors large-norm vectors)
      s.sql("""CREATE INDEX idx_hnsw_ip ON ddl_hnsw_met
               USING hnsw (embedding vector_ip_ops)
               WITH (m = 8, ef_construction = 48, parts = 4, id = 'vec_id')""")
      val dfIp = s.sql(
        s"""SELECT vec_id FROM ddl_hnsw_met
            ORDER BY embedding <#> '$vecText'::vector LIMIT 10""")
      val gotIp = dfIp.collect().map(_.getLong(0)).toSeq
      assert(probed(dfIp), "ip index did not serve the <#> sort")
      val rIp = recallVs(gotIp,
        (a, b) => org.apache.spark.sql.functions.negate(graft.functions.VectorFunctions.dot(a, b)))
      info(f"hnsw ip DDL recall@10 = $rIp%.2f")
      assert(rIp >= 0.8, s"ip recall $rIp below gate")
      s.sql("DROP INDEX idx_hnsw_ip")
    }
  }

  test("bit hnsw DDL: hamming/jaccard graphs over a packed column serve verbatim <~> / <%>") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      // the indexed table: a STORED packed-words column (the engine's
      // bit(n)) — pgvector likewise indexes bit columns, not casts
      val bqDir = java.nio.file.Files
        .createTempDirectory("graft_ddl_bits").toString + "/t"
      graft.operators.BinaryQuant.writeStore(
        Tables.embeddings(s, Sf).filter(col("vec_id") =!= 0),
        "vec_id", "embedding", bqDir)
      s.read.parquet(bqDir).createOrReplaceTempView("ddl_bits")
      val vecText = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0).mkString("[", ",", "]")
      val qWords = graft.operators.BinaryQuant.pack(
        Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>"))
          .head.getSeq[Double](0).toArray)
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def probed(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, _) if a.name == "vec_id" => true
            }
        }.flatten.nonEmpty
      import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}

      // --- hamming (<~> ↔ bit_hamming_ops)
      s.sql("""CREATE INDEX idx_bits_ham ON ddl_bits
               USING hnsw (bq bit_hamming_ops)
               WITH (m = 8, ef_construction = 48, parts = 2, id = 'vec_id')""")
      val ent = HnswSqlCatalog.get("idx_bits_ham").get
      assert(ent.metric == "hamming" && ent.storage == "bit")
      // the graph carries the hamming kernel and 0/1 half-stored bits
      val ix = graft.operators.Hnsw.deser(
        graft.operators.Hnsw.readGraphs(s, ent.path)
          .select(col("graph")).head.getAs[Array[Byte]](0))
      assert(ix.metric == graft.operators.Hnsw.Metric.Hamming && ix.half)
      assert(ix.vecs.head.forall(v => v == 0.0 || v == 1.0))
      val dfHam = s.sql(
        s"""SELECT vec_id FROM ddl_bits
            ORDER BY bq <~> vec_binary_quantize('$vecText'::vector)
            LIMIT 10""")
      val gotHam = dfHam.collect().map(_.getLong(0)).toSeq
      assert(probed(dfHam), "hamming index did not serve the <~> sort")
      // distance-level gate (hamming ties make id recall ambiguous;
      // the distance multiset is deterministic): the served top-10
      // distances must match the exact top-10 in ≥ 8 positions
      def dists(ids: Seq[Long], expr: org.apache.spark.sql.Column): Seq[Double] =
        s.read.parquet(bqDir).filter(col("vec_id").isin(ids: _*))
          .select(expr.cast("double")).collect().map(_.getDouble(0)).sorted.toSeq
      val hamCol = toColumn(graft.functions.HammingDistExpr(
        toExpression(col("bq")), qWords))
      val exactHam = s.read.parquet(bqDir)
        .select(col("vec_id"), hamCol.cast("double").as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .collect().map(_.getDouble(1)).sorted.toSeq
      val gotHamD = dists(gotHam, hamCol)
      val agree = gotHamD.zip(exactHam).count { case (a, b) => a == b }
      info(s"bit hamming DDL: served dists $gotHamD vs exact $exactHam")
      assert(agree >= 8, s"hamming distance agreement $agree/10 below gate")
      s.sql("DROP INDEX idx_bits_ham")

      // --- jaccard (<%> ↔ bit_jaccard_ops)
      s.sql("""CREATE INDEX idx_bits_jac ON ddl_bits
               USING hnsw (bq bit_jaccard_ops)
               WITH (m = 8, ef_construction = 48, parts = 2, id = 'vec_id')""")
      val dfJac = s.sql(
        s"""SELECT vec_id FROM ddl_bits
            ORDER BY bq <%> vec_binary_quantize('$vecText'::vector)
            LIMIT 10""")
      val gotJac = dfJac.collect().map(_.getLong(0)).toSeq
      assert(probed(dfJac), "jaccard index did not serve the <%> sort")
      val jacCol = toColumn(graft.functions.JaccardDistExpr(
        toExpression(col("bq")), qWords))
      val exactJac = s.read.parquet(bqDir)
        .select(col("vec_id"), jacCol.cast("double").as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .collect().map(_.getDouble(1)).sorted.toSeq
      val gotJacD = dists(gotJac, jacCol)
      val agreeJ = gotJacD.zip(exactJac).count { case (a, b) => a == b }
      info(s"bit jaccard DDL: served dists $gotJacD vs exact $exactJac")
      assert(agreeJ >= 8, s"jaccard distance agreement $agreeJ/10 below gate")
      s.sql("DROP INDEX idx_bits_jac")

      // a bit opclass on a float vector column is refused with the
      // type named (pgvector rejects bit opclasses on vector columns)
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_bits_float")
      val eT = intercept[Exception] {
        s.sql("""CREATE INDEX idx_bits_bad ON ddl_bits_float
                 USING hnsw (embedding bit_hamming_ops)
                 WITH (parts = 2, id = 'vec_id')""")
      }
      assert(eT.getMessage.contains("array<bigint>") &&
        eT.getMessage.contains("bit_hamming_ops"))
    }
  }

  test("ivfflat bit_hamming_ops DDL: k-majority store serves verbatim <~> (r14)") {
    withExtSession { s =>
      graft.plans.IvfCatalog.clear()
      val bqDir = java.nio.file.Files
        .createTempDirectory("graft_ddl_ivfbit").toString + "/t"
      graft.operators.BinaryQuant.writeStore(
        Tables.embeddings(s, Sf).filter(col("vec_id") =!= 0),
        "vec_id", "embedding", bqDir)
      s.read.parquet(bqDir).createOrReplaceTempView("ddl_ivfbit")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0).toArray
      val vecText = vec.mkString("[", ",", "]")
      // pgvector parity refusal: ivfflat has no jaccard opclass
      val eJ = intercept[Exception] {
        s.sql("""CREATE INDEX ON ddl_ivfbit
                 USING ivfflat (bq bit_jaccard_ops) WITH (id = 'vec_id')""")
      }
      assert(eJ.getMessage.contains("bit_jaccard_ops") &&
        eJ.getMessage.contains("hnsw"))
      // full-width probe (probes = lists): the DDL+SELECT result is
      // EXACT integer hamming top-k — zero recall flake margin
      s.sql("""CREATE INDEX idx_ivfbit ON ddl_ivfbit
               USING ivfflat (bq bit_hamming_ops)
               WITH (lists = 8, probes = 8, id = 'vec_id')""")
      val q = s"""SELECT vec_id FROM ddl_ivfbit
            ORDER BY bq <~> vec_binary_quantize('$vecText'::vector), vec_id
            LIMIT 10"""
      val df = s.sql(q)
      val scans = df.queryExecution.executedPlan.collect {
        case sc: FileSourceScanExec => sc }
      assert(scans.exists(_.partitionFilters.exists(_.toString.contains("centroid_id"))),
        s"no centroid_id partition filter:\n${df.queryExecution.executedPlan}")
      assert(scans.exists(_.relation.location.rootPaths.exists(
        _.toString.contains("graft_sqlindex_ivfflat"))))
      val got = df.collect().map(_.getLong(0)).toSeq
      import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
      val qWords = graft.operators.BinaryQuant.pack(vec)
      val want = s.read.parquet(bqDir)
        .select(col("vec_id"), toColumn(graft.functions.HammingDistExpr(
          toExpression(col("bq")), qWords)).cast("long").as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSeq
      assert(got == want, s"full-width bit probe not exact: $got vs $want")
      // SET ivfflat.probes narrows the injected cell list (the
      // pgvector session knob works on the bit store too)
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def probedCells(d: org.apache.spark.sql.DataFrame): Int =
        d.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, list) if a.name == "centroid_id" =>
                list.size
            }
        }.flatten.headOption.getOrElse(0)
      s.conf.set("ivfflat.probes", "2")
      try assert(probedCells(s.sql(q)) == 2,
        "SET ivfflat.probes=2 not honored on the bit store")
      finally s.conf.unset("ivfflat.probes")
      // DROP restores the plain scan (no cell filter, original binding)
      s.sql("DROP INDEX idx_ivfbit")
      assert(probedCells(s.sql(q)) == 0, "probe still firing after DROP INDEX")
      assert(!s.table("ddl_ivfbit").columns.contains("centroid_id"))
    }
  }

  test("sparsevec hnsw DDL: sparse graphs build from an (indices, values) pair (r14)") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      val tfDir = java.nio.file.Files
        .createTempDirectory("graft_ddl_sparse").toString + "/t"
      graft.queries.VectorQueries.sparseTf(s, Sf)
        .write.mode("overwrite").parquet(tfDir)
      s.read.parquet(tfDir).createOrReplaceTempView("ddl_sparse")
      // pgvector parity refusal: sparsevec is hnsw-only
      val eI = intercept[Exception] {
        s.sql("""CREATE INDEX ON ddl_sparse
                 USING ivfflat (sidx sparsevec_l2_ops) WITH (id = 'doc_id')""")
      }
      assert(eI.getMessage.contains("hnsw only"))
      // the values column must be named (the engine's sparsevec is an
      // (indices, values) pair — the documented deviation)
      val eV = intercept[Exception] {
        s.sql("""CREATE INDEX ON ddl_sparse
                 USING hnsw (sidx sparsevec_cosine_ops) WITH (id = 'doc_id')""")
      }
      assert(eV.getMessage.contains("values"))
      s.sql("""CREATE INDEX idx_sparse ON ddl_sparse
               USING hnsw (sidx sparsevec_cosine_ops)
               WITH (m = 8, ef_construction = 48, parts = 2,
                     id = 'doc_id', values = 'sval')""")
      val ent = HnswSqlCatalog.get("idx_sparse").get
      assert(ent.storage == "sparsevec" && ent.metric == "cosine")
      // the persisted graphs are sparse, cosine-kerneled, full-width
      val ix = graft.operators.Hnsw.deser(
        graft.operators.Hnsw.readGraphs(s, ent.path)
          .select(col("graph")).head.getAs[Array[Byte]](0))
      assert(ix.sparse && !ix.half &&
        ix.metric == graft.operators.Hnsw.Metric.Cosine)
      assert(ix.idxs.head.length == ix.vecs.head.length)
      // the index answers the standard sparse query with the same
      // ranking as the exact two-pointer scan (top-1 must agree —
      // integer weights make distances exact, no flake margin)
      val (qi, qv) = graft.functions.SparseVec.queryOf(
        graft.queries.VectorQueries.SparseQueryTerms)
      val served = graft.operators.Hnsw.searchSparse(
        graft.operators.Hnsw.readGraphs(s, ent.path), qi, qv, 10, ef = 96)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val exact = s.read.parquet(tfDir)
        .select(col("doc_id"),
          (lit(1.0) - graft.functions.SparseVec.cosineSimilarity(
            col("sidx"), col("sval"), qi, qv)).as("dist"))
        .orderBy(col("dist"), col("doc_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(served.nonEmpty && served.head._1 == exact.head._1,
        s"sparse graph top-1 ${served.head} != exact ${exact.head}")
      val agree = served.map(_._2).toSet.intersect(exact.map(_._2).toSet).size
      assert(agree >= 6, s"sparse graph top-10 distance agreement $agree/10")
      // the PROBE RULE serves the engine-side sparse sort key against
      // the indexed TABLE: `1 - sparse_cos_sim(...)` ascending plans
      // an id-IN candidate filter from the graph walk (r14)
      val probedDf = s.table("ddl_sparse")
        .select(col("doc_id"),
          (org.apache.spark.sql.functions.lit(1.0) -
            graft.functions.SparseVec.cosineSimilarity(
              col("sidx"), col("sval"), qi, qv)).as("dist"))
        .orderBy(col("dist"), col("doc_id"))
        .limit(10)
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      val hasIdIn = probedDf.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case In(a: AttributeReference, _) if a.name == "doc_id" => true
          }
      }.flatten.nonEmpty
      assert(hasIdIn, "sparse sort key not served by the hnsw probe rule:\n" +
        probedDf.queryExecution.optimizedPlan)
      // served-through-the-rule results match the direct graph walk's
      // candidate re-rank (exact distances; integer weights)
      val ruleServed = probedDf.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(ruleServed.map(_._2).toSeq == served.map(_._2).sorted.take(10).toSeq ||
        ruleServed.head._1 == exact.head._1,
        s"rule-served ranking diverged: ${ruleServed.toSeq} vs ${served.toSeq}")
      s.sql("DROP INDEX idx_sparse")
      assert(HnswSqlCatalog.get("idx_sparse").isEmpty)
      // after DROP the exact plan returns
      val after = s.table("ddl_sparse")
        .select(col("doc_id"),
          (org.apache.spark.sql.functions.lit(1.0) -
            graft.functions.SparseVec.cosineSimilarity(
              col("sidx"), col("sval"), qi, qv)).as("dist"))
        .orderBy(col("dist"), col("doc_id")).limit(10)
      val stillProbed = after.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case In(a: AttributeReference, _) if a.name == "doc_id" => true
          }
      }.flatten.nonEmpty
      assert(!stillProbed, "sparse probe still firing after DROP INDEX")
    }
  }

  test("sparse sort keys get the filtered over-fetch widening too (r15, VERDICT r14 #6)") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      val tfDir = java.nio.file.Files
        .createTempDirectory("graft_ddl_sparse_w").toString + "/t"
      graft.queries.VectorQueries.sparseTf(s, Sf)
        .write.mode("overwrite").parquet(tfDir)
      s.read.parquet(tfDir).createOrReplaceTempView("ddl_sparse_w")
      s.sql("""CREATE INDEX idx_sparse_w ON ddl_sparse_w
               USING hnsw (sidx sparsevec_cosine_ops)
               WITH (m = 8, ef_construction = 48, parts = 2,
                     id = 'doc_id', values = 'sval')""")
      val (qi, qv) = graft.functions.SparseVec.queryOf(
        graft.queries.VectorQueries.SparseQueryTerms)
      def sorted(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"),
          (lit(1.0) - graft.functions.SparseVec.cosineSimilarity(
            col("sidx"), col("sval"), qi, qv)).as("dist"))
        .orderBy(col("dist"), col("doc_id")).limit(5)
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def inListSize(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, list) if a.name == "doc_id" => list.size
            }
        }.flatten.foldLeft(0)(math.max)
      val plainList = inListSize(sorted(s.table("ddl_sparse_w")))
      assert(plainList > 0, "sparse probe inactive on the plain top-k")
      // a metadata predicate between sort and scan widens the sparse
      // fetch ×8 exactly as the dense path does (iterative-scan aware)
      val filteredList = inListSize(
        sorted(s.table("ddl_sparse_w").filter(col("doc_id") < 200)))
      assert(filteredList > plainList,
        s"sparse filtered query did not over-fetch: $filteredList vs $plainList")
      // and iterative_scan=off disables it, same as dense
      s.conf.set("hnsw.iterative_scan", "off")
      try {
        val offList = inListSize(
          sorted(s.table("ddl_sparse_w").filter(col("doc_id") < 200)))
        assert(offList <= plainList,
          s"iterative_scan=off did not shrink the sparse fetch: $offList")
      } finally s.conf.unset("hnsw.iterative_scan")
      s.sql("DROP INDEX idx_sparse_w")
    }
  }

  test("SET ivfflat.iterative_scan / max_probes (pgvector 0.8 knobs, r15)") {
    withExtSession { s =>
      IvfCatalog.clear()
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_ivf_it")
      s.sql("""CREATE INDEX idx_ivf_it ON ddl_ivf_it
               USING ivfflat (embedding vector_l2_ops)
               WITH (lists = 8, probes = 1, id = 'vec_id')""")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      // a FILTERED query: default (relaxed_order) widens probes ×
      // filteredWiden (2), pgvector 0.8's iterative widening
      val q = s"""SELECT vec_id FROM ddl_ivf_it
                  WHERE label = 3
                  ORDER BY embedding <-> '${vec.mkString("[", ",", "]")}'::vector
                  LIMIT 5"""
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def probedCells(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, list) if a.name == "centroid_id" => list.size
            }
        }.flatten.foldLeft(0)(math.max)
      assert(probedCells(s.sql(q)) == 2,
        "filtered query did not widen probes (default relaxed_order)")
      // off: pgvector's off-mode — fixed probes, may under-fill k
      s.conf.set("ivfflat.iterative_scan", "off")
      try assert(probedCells(s.sql(q)) == 1,
        "iterative_scan=off did not pin the probe width to probes=1")
      finally s.conf.unset("ivfflat.iterative_scan")
      // max_probes caps the widening, never below the base probes
      s.conf.set("ivfflat.max_probes", "1")
      try assert(probedCells(s.sql(q)) == 1,
        "ivfflat.max_probes=1 did not cap the iterative widening")
      finally s.conf.unset("ivfflat.max_probes")
      // pgvector parity: ivfflat has no strict_order mode, and invalid
      // enum values are rejected, not silently defaulted
      s.conf.set("ivfflat.iterative_scan", "strict_order")
      try {
        val eStrict = intercept[Exception] { s.sql(q).collect() }
        assert(eStrict.getMessage.contains("strict_order"))
      } finally s.conf.unset("ivfflat.iterative_scan")
      s.conf.set("ivfflat.iterative_scan", "strict")
      try {
        val eBad = intercept[Exception] { s.sql(q).collect() }
        assert(eBad.getMessage.contains("invalid value"))
      } finally s.conf.unset("ivfflat.iterative_scan")
      s.sql("DROP INDEX idx_ivf_it")
    }
  }

  test("hnsw knob scoping (r15): invalid iterative_scan rejected; max_scan_tuples bounds only iterative scans") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_hnsw_sc")
      s.sql("""CREATE INDEX idx_hnsw_sc ON ddl_hnsw_sc
               USING hnsw (embedding vector_l2_ops)
               WITH (m = 8, ef_construction = 32, parts = 4, id = 'vec_id')""")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      val plain = s"""SELECT vec_id FROM ddl_hnsw_sc
                  ORDER BY embedding <-> '${vec.mkString("[", ",", "]")}'::vector
                  LIMIT 5"""
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def inListSize(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, list) if a.name == "vec_id" => list.size
            }
        }.flatten.foldLeft(0)(math.max)
      val defaultList = inListSize(s.sql(plain))
      assert(defaultList > 0, "probe inactive on the plain top-k")
      // ADVICE r14: the cap bounds ONLY iterative (filtered) scans —
      // an unfiltered top-k with max_scan_tuples below k must still
      // fetch its full candidate list, as pgvector's GUC scoping does
      s.conf.set("hnsw.max_scan_tuples", "2")
      try assert(inListSize(s.sql(plain)) == defaultList,
        "max_scan_tuples capped a NON-iterative plain top-k")
      finally s.conf.unset("hnsw.max_scan_tuples")
      // ADVICE r14: a typo must not silently behave as relaxed_order
      s.conf.set("hnsw.iterative_scan", "strict")
      try {
        val eBad = intercept[Exception] { s.sql(plain).collect() }
        assert(eBad.getMessage.contains("invalid value"))
      } finally s.conf.unset("hnsw.iterative_scan")
      // r15: numeric GUCs reject like pgvector too — malformed and
      // out-of-range values throw instead of silently defaulting
      s.conf.set("hnsw.ef_search", "abc")
      try {
        val eNum = intercept[Exception] { s.sql(plain).collect() }
        assert(eNum.getMessage.contains("invalid value"))
      } finally s.conf.unset("hnsw.ef_search")
      s.conf.set("hnsw.ef_search", "5000") // pgvector range is 1..1000
      try {
        val eRange = intercept[Exception] { s.sql(plain).collect() }
        assert(eRange.getMessage.contains("outside the valid range"))
      } finally s.conf.unset("hnsw.ef_search")
      s.sql("DROP INDEX idx_hnsw_sc")
    }
  }

  test("hnsw iterative_scan strict_order vs relaxed_order differ observably (VERDICT r15 #3)") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_hnsw_so")
      s.sql("""CREATE INDEX idx_hnsw_so ON ddl_hnsw_so
               USING hnsw (embedding vector_l2_ops)
               WITH (m = 8, ef_construction = 32, parts = 4, id = 'vec_id')""")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      // a FILTERED query — iterative_scan applies to iterative scans
      // only (both modes behave identically on a plain top-k)
      val q = s"""SELECT vec_id FROM ddl_hnsw_so
                  WHERE label = 3
                  ORDER BY embedding <-> '${vec.mkString("[", ",", "]")}'::vector
                  LIMIT 5"""
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def inList(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, list) if a.name == "vec_id" =>
                list.map(_.asInstanceOf[org.apache.spark.sql.catalyst
                  .expressions.Literal].value.asInstanceOf[Long])
            }
        }.flatten.maxByOption(_.size).getOrElse(Nil)
      try {
        // first capture the UNTRUNCATED per-graph union (a budget far
        // above the 4 graphs' combined fetch) — the reference set the
        // two truncation modes are prefixes/quotas of
        s.conf.set("hnsw.iterative_scan", "relaxed_order")
        s.conf.set("hnsw.max_scan_tuples", "100000")
        val union = inList(s.sql(q))
        // tight budget so truncation semantics become visible:
        // per-graph fetch = min(k*8, ef, max_scan_tuples) = 7
        s.conf.set("hnsw.max_scan_tuples", "7")
        val relaxed = inList(s.sql(q))
        s.conf.set("hnsw.iterative_scan", "strict_order")
        val strict = inList(s.sql(q))
        // r17 (VERDICT r16 #3): the budget is GLOBAL in BOTH modes —
        // pgvector's single-index max_scan_tuples. strict truncates
        // the distance-ordered merge; relaxed divides the budget
        // across the probed graphs (waterfall quotas summing to the
        // budget), each graph truncated in its own ascending order.
        assert(strict.size == 7, s"strict budget not global: ${strict.size}")
        assert(relaxed.size <= 7,
          s"relaxed fetched past the global budget: ${relaxed.size}")
        // supply suffices (4 graphs × top-7 ≥ budget), so relaxed
        // fills the budget exactly
        assert(relaxed.size == 7,
          s"relaxed under-filled an available budget: ${relaxed.size}")
        assert(relaxed.toSet.subsetOf(union.toSet) &&
          strict.toSet.subsetOf(union.toSet),
          "truncated candidate sets must come from the per-graph union")
        // strict's candidate set is the GLOBAL distance-ordered prefix
        // of the union (walk distance = exact L2 here)
        val exact = Tables.embeddings(s, Sf)
          .select(col("vec_id"), col("embedding").cast("array<double>"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
        def d2(id: Long): Double =
          exact(id).zip(vec).map { case (a, b) => (a - b) * (a - b) }.sum
        val wantStrict = union.sortBy(id => (d2(id), id)).take(7).toSet
        assert(strict.toSet == wantStrict,
          s"strict_order is not the global distance prefix: got " +
            s"${strict.sorted}, want ${wantStrict.toSeq.sorted}")
        // both modes emit in exact ascending distance order (Spark's
        // Sort re-ranks survivors — ordered emission in BOTH modes)
        val rows = s.sql(q).collect().map(_.getLong(0)).toSeq
        assert(rows == rows.sortBy(id => (d2(id), id)),
          "strict_order emission not distance-ordered")
      } finally {
        s.conf.unset("hnsw.iterative_scan")
        s.conf.unset("hnsw.max_scan_tuples")
      }
      s.sql("DROP INDEX idx_hnsw_so")
    }
  }

  test("sparsevec_l2_ops / l1_ops serve their sort keys (r15, ADVICE r14 dead-weight fix)") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      val tfDir = java.nio.file.Files
        .createTempDirectory("graft_ddl_sparse_l2").toString + "/t"
      graft.queries.VectorQueries.sparseTf(s, Sf)
        .write.mode("overwrite").parquet(tfDir)
      s.read.parquet(tfDir).createOrReplaceTempView("ddl_sparse_l2")
      s.sql("""CREATE INDEX idx_sparse_l2 ON ddl_sparse_l2
               USING hnsw (sidx sparsevec_l2_ops)
               WITH (m = 8, ef_construction = 48, parts = 2,
                     id = 'doc_id', values = 'sval')""")
      val ent = HnswSqlCatalog.get("idx_sparse_l2").get
      assert(ent.storage == "sparsevec" && ent.metric == "l2")
      val ix = graft.operators.Hnsw.deser(
        graft.operators.Hnsw.readGraphs(s, ent.path)
          .select(col("graph")).head.getAs[Array[Byte]](0))
      assert(ix.sparse && ix.metric == graft.operators.Hnsw.Metric.L2)
      val (qi, qv) = graft.functions.SparseVec.queryOf(
        graft.queries.VectorQueries.SparseQueryTerms)
      // the sparse L2 sort key is now recognized and served by the
      // probe rule (the index is no longer silent dead weight)
      val probedDf = s.table("ddl_sparse_l2")
        .select(col("doc_id"),
          graft.functions.SparseVec.l2Distance(col("sidx"), col("sval"), qi, qv)
            .as("dist"))
        .orderBy(col("dist"), col("doc_id"))
        .limit(10)
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def hasIdIn(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, _) if a.name == "doc_id" => true
            }
        }.flatten.nonEmpty
      assert(hasIdIn(probedDf), "sparse L2 sort key not served:\n" +
        probedDf.queryExecution.optimizedPlan)
      // top-1 agreement with the exact union-merge scan (integer
      // weights: distances are exact)
      val exact = s.read.parquet(tfDir)
        .select(col("doc_id"),
          graft.functions.SparseVec.l2Distance(col("sidx"), col("sval"), qi, qv)
            .as("dist"))
        .orderBy(col("dist"), col("doc_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val served = probedDf.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(served.head._1 == exact.head._1,
        s"sparse L2 top-1 ${served.head} != exact ${exact.head}")
      s.sql("DROP INDEX idx_sparse_l2")
      // L1 twin: DDL accepted AND its sort key recognized
      s.sql("""CREATE INDEX idx_sparse_l1 ON ddl_sparse_l2
               USING hnsw (sidx sparsevec_l1_ops)
               WITH (m = 8, ef_construction = 48, parts = 2,
                     id = 'doc_id', values = 'sval')""")
      val ent1 = HnswSqlCatalog.get("idx_sparse_l1").get
      assert(ent1.metric == "l1")
      val probedL1 = s.table("ddl_sparse_l2")
        .select(col("doc_id"),
          graft.functions.SparseVec.l1Distance(col("sidx"), col("sval"), qi, qv)
            .as("dist"))
        .orderBy(col("dist"), col("doc_id"))
        .limit(10)
      assert(hasIdIn(probedL1), "sparse L1 sort key not served")
      assert(probedL1.collect().nonEmpty)
      s.sql("DROP INDEX idx_sparse_l1")
    }
  }

  test("one-column sparsevec DDL: struct column indexed, verbatim SQL served (r17)") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      val D = 64
      // bounded mod-D index space so the pgvector text literal can
      // express the query (hash64 term ids exceed the 1e9 dims cap)
      import graft.functions.TextFunctions.{hash64, tokens}
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ddl_sparse_struct").toString + "/t"
      Tables.documents(s, Sf)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .groupBy(col("doc_id"), (hash64(col("w")) % D + 1).as("ix"))
        .agg(count(lit(1)).as("tf"))
        .select(col("doc_id"),
          struct(col("ix").as("h"), col("tf").cast("double").as("v")).as("p"))
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(col("p"))).as("ps"))
        .select(col("doc_id"),
          graft.functions.SparseVec.toStructColumn(
            transform(col("ps"), p => p("h")),
            transform(col("ps"), p => p("v")), D).as("sv"))
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir).createOrReplaceTempView("ddl_sparse_struct")
      // no WITH (values = …): the struct column IS the sparsevec
      s.sql("""CREATE INDEX idx_sp_struct ON ddl_sparse_struct
               USING hnsw (sv sparsevec_l2_ops)
               WITH (m = 8, ef_construction = 48, parts = 2, id = 'doc_id')""")
      val ent = HnswSqlCatalog.get("idx_sp_struct").get
      assert(ent.storage == "sparsevec" && ent.vecCol == "sv" && ent.metric == "l2")
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def hasIdIn(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, _) if a.name == "doc_id" => true
            }
        }.flatten.nonEmpty
      val qText = "{3:2,17:1,40:3}/" + D
      // pgvector's verbatim one-column form, served from the graph
      val served = s.sql(
        s"""SELECT doc_id, sv <-> '$qText'::sparsevec AS dist
            FROM ddl_sparse_struct
            ORDER BY dist, doc_id
            LIMIT 10""")
      assert(hasIdIn(served), "struct sparsevec sort key not served:\n" +
        served.queryExecution.optimizedPlan)
      val exact = s.read.parquet(dir)
        .select(col("doc_id"),
          graft.functions.SparseVec.structDist(col("sv"),
            graft.functions.SparseVec.structLiteral(qText),
            graft.functions.VectorDistance.L2).as("dist"))
        .orderBy(col("dist"), col("doc_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val got = served.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.head == exact.head,
        s"struct sparsevec top-1 ${got.head} != exact ${exact.head}")
      // kind consistency: a cosine struct key must NOT serve the l2
      // index (opclass-metric match, pgvector parity)
      val cosKey = s.sql(
        s"""SELECT doc_id, sv <=> '$qText'::sparsevec AS dist
            FROM ddl_sparse_struct
            ORDER BY dist, doc_id LIMIT 10""")
      assert(!hasIdIn(cosKey), "cosine sort key served an l2 opclass index")
      // col-vs-col distances carry no literal query — exact scan stays
      val colCol = s.table("ddl_sparse_struct").as("a")
        .crossJoin(s.table("ddl_sparse_struct").as("b").limit(1))
        .select(graft.functions.SparseVec.structDist(
          col("a.sv"), col("b.sv"), graft.functions.VectorDistance.L2).as("d"))
      assert(colCol.limit(3).collect().forall(!_.isNullAt(0)))
      s.sql("DROP INDEX idx_sp_struct")
    }
  }

  test("halfvec hnsw DDL serves the packed-sidecar HalfDistExpr sort key (r17, VERDICT r16 #7)") {
    withExtSession { s =>
      import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
      graft.plans.HnswSqlCatalog.clear()
      val dir = java.nio.file.Files.createTempDirectory("ddl_hv_sidecar").toString
      // the vs_knn_half/vs_half_cos sidecar shape: (vec_id, hv) with
      // hv an already-PACKED binary16 column — before r17 this column
      // had no index-servable sort key (only the float-column operator
      // with storage-side rounding was recognized)
      Tables.embeddings(s, Sf)
        .select(col("vec_id"), toColumn(graft.functions.HalfPackExpr(
          toExpression(col("embedding").cast("array<double>")))).as("hv"))
        .write.mode("overwrite").parquet(s"$dir/hv")
      s.read.parquet(s"$dir/hv").createOrReplaceTempView("ddl_hv_sidecar")
      s.sql("""CREATE INDEX idx_hv_sidecar ON ddl_hv_sidecar
               USING hnsw (hv halfvec_l2_ops)
               WITH (m = 8, ef_construction = 32, parts = 4, id = 'vec_id')""")
      val ent = HnswSqlCatalog.get("idx_hv_sidecar").get
      assert(ent.storage == "halfvec" && ent.vecCol == "hv")
      val q = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toArray
      val qHalf = graft.functions.Half.unpackToDouble(graft.functions.Half.pack(q))
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def hasIdIn(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, _) if a.name == "vec_id" => true
            }
        }.flatten.nonEmpty
      def knnDf(mode: Int) = s.table("ddl_hv_sidecar")
        .select(col("vec_id"), toColumn(graft.functions.HalfDistExpr(
          toExpression(col("hv")), qHalf, mode)).as("dist"))
        .orderBy(col("dist"), col("vec_id")).limit(5)
      val l2 = knnDf(graft.functions.VectorDistance.L2.id)
      assert(hasIdIn(l2), "packed-sidecar HalfDistExpr L2 sort not served:\n" +
        l2.queryExecution.optimizedPlan)
      // the graph holds exactly the rounded doubles HalfDistExpr
      // dequantizes, so the beam walk ranks with the scan's own
      // arithmetic — top-1 agreement with the exact sidecar scan
      val exact = knnDf(graft.functions.VectorDistance.L2.id)
      s.conf.set(graft.plans.HnswProbeRule.EvalKey, "false")
      val exactRows = try exact.collect().map(r => (r.getLong(0), r.getDouble(1)))
        finally s.conf.unset(graft.plans.HnswProbeRule.EvalKey)
      val servedRows = l2.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(servedRows.head == exactRows.head,
        s"halfvec sidecar top-1 ${servedRows.head} != exact ${exactRows.head}")
      // opclass parity: the cosine operator (vs_half_cos's shape) must
      // NOT be served by an l2 index — an index serves only its
      // opclass's operator
      assert(!hasIdIn(knnDf(graft.functions.VectorDistance.CosineDist.id)),
        "an l2 halfvec index must not serve the cosine operator (opclass parity)")
      // kind-consistency the other way: a forged same-path entry with
      // DENSE storage must not serve the HalfDistExpr key — its graph
      // would hold unrounded doubles, not what the scan dequantizes
      HnswSqlCatalog.put("idx_hv_sidecar",
        ent.copy(storage = "vector"))
      assert(!hasIdIn(knnDf(graft.functions.VectorDistance.L2.id)),
        "a HalfDistExpr sort key must only walk a halfvec-storage graph")
      HnswSqlCatalog.put("idx_hv_sidecar", ent)
      s.sql("DROP INDEX idx_hv_sidecar")
    }
  }

  // ------------------------------------------------- end-to-end ivfflat
  private def withExtSession[T](f: SparkSession => T): T = {
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      f(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("ivfflat DDL + verbatim SELECT: store registered, probe partition-pruned, full probe exact") {
    withExtSession { s =>
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_items")
      // full probe (probes = lists) makes the DDL+SELECT result EXACT:
      // the assertion has zero recall flake margin
      s.sql("""CREATE INDEX ON ddl_items
               USING ivfflat (embedding vector_l2_ops)
               WITH (lists = 8, probes = 8, id = 'vec_id')""")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      val vecText = vec.mkString("[", ",", "]")
      val df = s.sql(
        s"""SELECT vec_id FROM ddl_items
            WHERE vec_id <> 0
            ORDER BY embedding <-> '$vecText'::vector
            LIMIT 5""")
      // the probe fired and reached the scan as a PARTITION filter
      // over the DDL-built store (the IvfGraftSpec assertion shape)
      val scans = df.queryExecution.executedPlan.collect {
        case sc: FileSourceScanExec => sc }
      assert(scans.nonEmpty)
      assert(scans.exists(_.partitionFilters.exists(_.toString.contains("centroid_id"))),
        s"no centroid_id partition filter:\n${df.queryExecution.executedPlan}")
      assert(scans.exists(_.relation.location.rootPaths.exists(
        _.toString.contains("graft_sqlindex_ivfflat"))))
      val want = graft.operators.Knn.topK(
        Tables.embeddings(s, Sf).filter(col("vec_id") =!= 0), "vec_id", "embedding",
        Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
          .select(col("embedding").as("qvec")),
        "qvec", graft.functions.VectorFunctions.l2Distance, 5)
        .collect().map(_.getLong(0)).toSeq
      assert(df.collect().map(_.getLong(0)).toSeq == want)
    }
  }

  test("ivfflat IF NOT EXISTS is idempotent; re-CREATE rebuilds") {
    withExtSession { s =>
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_ine")
      s.sql("""CREATE INDEX idx_ine ON ddl_ine
               USING ivfflat (embedding) WITH (lists = 4, id = 'vec_id')""")
      val store = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_sqlindex_ivfflat_idx_ine")
      val stamp = new java.io.File(store, "_SUCCESS").lastModified()
      assert(stamp > 0)
      s.sql("""CREATE INDEX IF NOT EXISTS idx_ine ON ddl_ine
               USING ivfflat (embedding) WITH (lists = 4, id = 'vec_id')""")
      assert(new java.io.File(store, "_SUCCESS").lastModified() == stamp,
        "IF NOT EXISTS rebuilt an existing registered index")
    }
  }

  // ---------------------------------------------------- end-to-end hnsw
  test("hnsw DDL builds + persists + registers partitioned graphs") {
    withExtSession { s =>
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_hnsw_t")
      s.sql("""CREATE INDEX idx_hnsw ON ddl_hnsw_t
               USING hnsw (embedding vector_l2_ops)
               WITH (m = 8, ef_construction = 32, parts = 4, id = 'vec_id')""")
      val e = HnswSqlCatalog.get("idx_hnsw").get
      assert(e.table == "ddl_hnsw_t" && e.vecCol == "embedding" &&
        e.m == 8 && e.efConstruction == 32 && e.metric == "l2")
      val graphs = graft.operators.Hnsw.readGraphs(s, e.path)
      assert(graphs.count() == 4)
      val q = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0).toArray
      val got = graft.operators.Hnsw.search(graphs, q, k = 5, ef = 64)
      assert(got.count() == 5)
    }
  }

  // ----------------------------------------- hnsw probe rule (r12)
  test("hnsw DDL + verbatim SELECT: graph path serves it (deser ≤ parts), gated recall") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_hnsw_probe")
      s.sql("""CREATE INDEX idx_hnsw_probe ON ddl_hnsw_probe
               USING hnsw (embedding vector_l2_ops)
               WITH (m = 8, ef_construction = 32, parts = 4, id = 'vec_id')""")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      val vecText = vec.mkString("[", ",", "]")
      val acc = s.sparkContext.longAccumulator("hnsw_probe_deser")
      graft.plans.HnswProbeRule.deserCounter = Some(acc)
      try {
        val df = s.sql(
          s"""SELECT vec_id FROM ddl_hnsw_probe
              ORDER BY embedding <-> '$vecText'::vector
              LIMIT 5""")
        val got = df.collect().map(_.getLong(0)).toSeq
        // the graph walk ran, loading each of the 4 partition graphs
        // exactly once (the rewrite-time job IS the index probe)
        assert(acc.value > 0 && acc.value <= 4,
          s"graph path not taken or over-read: ${acc.value} deserializations")
        // the candidate filter reached the optimized plan as an IN on
        // the id column over the ORIGINAL table scan (hnsw never
        // rebinds the table)
        import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
        val inLists = df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, list) if a.name == "vec_id" => list.size
            }
        }.flatten
        assert(inLists.nonEmpty, s"no injected vec_id IN filter:\n${df.queryExecution.optimizedPlan}")
        val scans = df.queryExecution.executedPlan.collect {
          case sc: FileSourceScanExec => sc }
        assert(scans.exists(_.relation.location.rootPaths.exists(
          _.toString.contains("embeddings"))), "scan is not the original table")
        // gated recall vs exact brute force (exact rerank of graph
        // candidates, so ≥ the vs_hnsw_knn gate)
        val exact = graft.operators.Knn.topK(
          Tables.embeddings(s, Sf), "vec_id", "embedding",
          Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
            .select(col("embedding").as("qvec")),
          "qvec", graft.functions.VectorFunctions.l2Distance, 5)
          .collect().map(_.getLong(0)).toSet
        val recall = got.count(exact.contains).toDouble / 5
        info(f"hnsw DDL probe recall@5 = $recall%.2f")
        assert(recall >= 0.8, s"recall $recall below gate (got $got, want $exact)")
      } finally {
        graft.plans.HnswProbeRule.deserCounter = None
      }
    }
  }

  test("hnsw probe soundness: metric mismatch and probeEval=false keep the exact plan") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_hnsw_neg")
      // l2 index — a COSINE-ordered query must NOT be served by it
      // (pgvector: an index serves only its opclass's operator)
      s.sql("""CREATE INDEX idx_hnsw_neg ON ddl_hnsw_neg
               USING hnsw (embedding vector_l2_ops)
               WITH (m = 8, ef_construction = 32, parts = 2, id = 'vec_id')""")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      val vecText = vec.mkString("[", ",", "]")
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def probed(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, _) if a.name == "vec_id" => true
            }
        }.flatten.nonEmpty
      val cosine = s.sql(
        s"""SELECT vec_id FROM ddl_hnsw_neg
            ORDER BY embedding <=> '$vecText'::vector LIMIT 5""")
      assert(!probed(cosine), "cosine query served by an l2 hnsw index")
      assert(cosine.collect().length == 5) // exact plan still answers
      // eval gate off: same l2 query, no rewrite-time job, exact plan
      s.conf.set(graft.plans.HnswProbeRule.EvalKey, "false")
      try {
        val gated = s.sql(
          s"""SELECT vec_id FROM ddl_hnsw_neg
              ORDER BY embedding <-> '$vecText'::vector LIMIT 5""")
        assert(!probed(gated), "probe fired with probeEval=false")
        assert(gated.collect().length == 5)
      } finally s.conf.unset(graft.plans.HnswProbeRule.EvalKey)
      // gate back on: the same text IS served
      val served = s.sql(
        s"""SELECT vec_id FROM ddl_hnsw_neg
            ORDER BY embedding <-> '$vecText'::vector LIMIT 5""")
      assert(probed(served), "probe did not fire after re-enabling")
      s.sql("DROP INDEX idx_hnsw_neg")
    }
  }

  test("SET hnsw.ef_search caps the candidate list (pgvector session knob)") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_hnsw_ef")
      s.sql("""CREATE INDEX idx_hnsw_ef ON ddl_hnsw_ef
               USING hnsw (embedding vector_l2_ops)
               WITH (m = 8, ef_construction = 32, parts = 4, id = 'vec_id')""")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      val q = s"""SELECT vec_id FROM ddl_hnsw_ef
                  ORDER BY embedding <-> '${vec.mkString("[", ",", "]")}'::vector
                  LIMIT 5"""
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def inListSize(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, list) if a.name == "vec_id" => list.size
            }
        }.flatten.max
      val wide = s.sql(q)
      assert(wide.collect().length == 5)
      val wideList = inListSize(wide)
      s.conf.set("hnsw.ef_search", "1")
      try {
        // SAME query text: per-graph candidates now capped at 1, so
        // the injected IN list shrinks to ≤ parts ids
        val narrow = s.sql(q)
        val rows = narrow.collect()
        val narrowList = inListSize(narrow)
        assert(narrowList <= 4 && narrowList < wideList,
          s"ef_search=1 IN list $narrowList !< default $wideList")
        assert(rows.length <= 4, s"ef_search=1 returned ${rows.length} rows")
      } finally s.conf.unset("hnsw.ef_search")
    }
  }

  test("SET hnsw.iterative_scan / max_scan_tuples (pgvector 0.8 knobs, r14)") {
    withExtSession { s =>
      graft.plans.HnswSqlCatalog.clear()
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_hnsw_it")
      s.sql("""CREATE INDEX idx_hnsw_it ON ddl_hnsw_it
               USING hnsw (embedding vector_l2_ops)
               WITH (m = 8, ef_construction = 32, parts = 4, id = 'vec_id')""")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      // a FILTERED query: default (relaxed_order) over-fetches ×8
      val q = s"""SELECT vec_id FROM ddl_hnsw_it
                  WHERE label = 3
                  ORDER BY embedding <-> '${vec.mkString("[", ",", "]")}'::vector
                  LIMIT 5"""
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
      def inListSize(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, list) if a.name == "vec_id" => list.size
            }
        }.flatten.foldLeft(0)(math.max)
      val wideList = inListSize(s.sql(q))
      assert(wideList > 5, s"filtered over-fetch inactive by default ($wideList)")
      // off: no widening — the pgvector off-mode may under-fill k
      s.conf.set("hnsw.iterative_scan", "off")
      try {
        val offList = inListSize(s.sql(q))
        assert(offList < wideList && offList <= 5 * 4,
          s"iterative_scan=off did not shrink the fetch: $offList vs $wideList")
      } finally s.conf.unset("hnsw.iterative_scan")
      // max_scan_tuples caps the per-graph fetch below the widened size
      s.conf.set("hnsw.max_scan_tuples", "2")
      try {
        val capped = inListSize(s.sql(q))
        assert(capped <= 2 * 4, s"max_scan_tuples=2 not honored: $capped")
      } finally s.conf.unset("hnsw.max_scan_tuples")
    }
  }

  test("SET ivfflat.probes changes the partition-filter width at rewrite time") {
    withExtSession { s =>
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_probes")
      s.sql("""CREATE INDEX idx_probes ON ddl_probes
               USING ivfflat (embedding vector_l2_ops)
               WITH (lists = 8, probes = 2, id = 'vec_id')""")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      val q = s"""SELECT vec_id FROM ddl_probes
                  ORDER BY embedding <-> '${vec.mkString("[", ",", "]")}'::vector
                  LIMIT 5"""
      def probedCells(df: org.apache.spark.sql.DataFrame): Int = {
        import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
        df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect {
              case In(a: AttributeReference, list) if a.name == "centroid_id" => list.size
            }
        }.flatten.max
      }
      assert(probedCells(s.sql(q)) == 2, "CREATE-time probes=2 not honored")
      s.conf.set("ivfflat.probes", "5")
      try {
        // SAME query text, wider session probe width (pgvector's
        // `SET ivfflat.probes`) → 5 cells in the injected filter
        assert(probedCells(s.sql(q)) == 5, "SET ivfflat.probes=5 not read at rewrite")
      } finally s.conf.unset("ivfflat.probes")
      assert(probedCells(s.sql(q)) == 2, "unset did not restore CREATE-time width")
    }
  }

  test("DROP INDEX replans the plain scan; IF EXISTS tolerates absence") {
    withExtSession { s =>
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_drop")
      s.sql("""CREATE INDEX idx_drop ON ddl_drop
               USING ivfflat (embedding vector_l2_ops)
               WITH (lists = 8, probes = 2, id = 'vec_id')""")
      val vec = Tables.embeddings(s, Sf).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      val q = s"""SELECT vec_id FROM ddl_drop
                  ORDER BY embedding <-> '${vec.mkString("[", ",", "]")}'::vector
                  LIMIT 5"""
      // indexed: probe fires over the store
      val before = s.sql(q)
      before.collect()
      assert(before.queryExecution.executedPlan.collect {
        case sc: FileSourceScanExec => sc
      }.exists(_.partitionFilters.exists(_.toString.contains("centroid_id"))))

      s.sql("DROP INDEX idx_drop")
      // same text: plain exact scan over the ORIGINAL fixture — no
      // probe filter, no store path, and centroid_id is gone from the
      // rebound-then-restored table
      val after = s.sql(q)
      assert(after.collect().length == 5)
      val scans = after.queryExecution.executedPlan.collect {
        case sc: FileSourceScanExec => sc }
      assert(!scans.exists(_.partitionFilters.exists(_.toString.contains("centroid_id"))),
        "probe still fires after DROP INDEX")
      assert(!scans.exists(_.relation.location.rootPaths.exists(
        _.toString.contains("graft_sqlindex"))), "scan still reads the dropped store")
      assert(!s.table("ddl_drop").columns.contains("centroid_id"),
        "original binding not restored")

      // hnsw drop unregisters the graphs
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_drop_h")
      s.sql("""CREATE INDEX idx_drop_h ON ddl_drop_h
               USING hnsw (embedding) WITH (parts = 2, id = 'vec_id')""")
      assert(HnswSqlCatalog.get("idx_drop_h").isDefined)
      s.sql("DROP INDEX idx_drop_h")
      assert(HnswSqlCatalog.get("idx_drop_h").isEmpty)

      // absence: named error without IF EXISTS, silence with
      val e = intercept[Exception] { s.sql("DROP INDEX idx_missing") }
      assert(e.getMessage.contains("idx_missing"))
      s.sql("DROP INDEX IF EXISTS idx_missing") // no throw
    }
  }

  test("malformed WITH options fail with a named error, not MatchError") {
    // bare key, no value
    val e1 = intercept[IllegalArgumentException] {
      VectorIndexDdl.parse("CREATE INDEX ON t USING ivfflat (v) WITH (lists)")
    }
    assert(e1.getMessage.contains("lists") && e1.getMessage.contains("key = value"))
    // one good, one bad
    val e2 = intercept[IllegalArgumentException] {
      VectorIndexDdl.parse(
        "CREATE INDEX ON t USING hnsw (v) WITH (m = 16, ef_construction)")
    }
    assert(e2.getMessage.contains("ef_construction"))
    // whitespace / quoted variants parse
    val ok = VectorIndexDdl.parse(
      """CREATE INDEX ON t USING ivfflat (v) WITH ( "lists" = '100' ,probes=2 )""").get
    assert(ok.options == Map("lists" -> "100", "probes" -> "2"))
    // non-integer value surfaces the option name at run time
    withExtSession { s =>
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_badopt")
      val e3 = intercept[Exception] {
        s.sql("CREATE INDEX ON ddl_badopt USING ivfflat (embedding) WITH (lists = many)")
      }
      assert(e3.getMessage.contains("lists") && e3.getMessage.contains("many"))
    }
  }

  test("unsupported opclass fails loudly, table untouched") {
    withExtSession { s =>
      Tables.embeddings(s, Sf).createOrReplaceTempView("ddl_bad")
      val e = intercept[Exception] {
        s.sql("CREATE INDEX ON ddl_bad USING ivfflat (embedding jsonb_ops)")
      }
      assert(e.getMessage.contains("jsonb_ops"))
      // the view still reads the raw fixture (no rebind happened)
      assert(!s.table("ddl_bad").columns.contains("centroid_id"))
    }
  }
}
