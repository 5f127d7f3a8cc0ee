package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructType}

/** Sparse vector kernels — the pgvector `sparsevec` analogue (≥0.7).
  *
  * Representation: an (indices, values) array pair per row — indices
  * are sorted-ascending int64 term/dimension ids (here: [[TextFunctions
  * .hash64]] of the term — a sparse space needs no dense [0, dims)
  * range), values are float64 weights. This is the layout a
  * lexical/hybrid retrieval store materializes once and serves any
  * query from, and it stays columnar in parquet (two arrays, no
  * per-row maps).
  *
  * Distance vs ONE query follows the house pattern for literal-query
  * kernels ([[HammingDistExpr]], [[NearestCellsExpr]]): the query's
  * (indices, values) ride along as driver metadata, the corpus pass
  * is a two-pointer merge over the sorted index arrays —
  * O(nnz_corpus + nnz_query) per row, no explode, no join, full
  * pushdown-friendly scan shape.
  *
  * Determinism contract (SURVEY.md §3): products of MATCHED index
  * pairs accumulate sequentially in ascending index order; the norm
  * accumulators fold values in array order. With integer-valued
  * weights the sums are exact in any engine; with real weights the
  * DuckDB oracle reproduces the same order via
  * `list_sum(list_transform(list_sort(...)))`.
  */
object SparseVec {
  import GraftSqlBridge.{toColumn, toExpression}

  /** Σ aᵢ·qᵢ over shared indices. */
  def dot(idx: Column, vals: Column, qIdx: Array[Long], qVal: Array[Double]): Column =
    toColumn(SparseDistExpr(toExpression(idx), toExpression(vals),
      qIdx, qVal, VectorDistance.Dot.id))

  /** dot / (‖a‖·‖q‖), clamped to [-1, 1] like the dense kernel. */
  def cosineSimilarity(idx: Column, vals: Column, qIdx: Array[Long], qVal: Array[Double]): Column =
    toColumn(SparseDistExpr(toExpression(idx), toExpression(vals),
      qIdx, qVal, VectorDistance.CosineSim.id))

  /** √Σ(aᵢ−qᵢ)² over the UNION of indices (unmatched terms count
    * against zero) — pgvector sparsevec `<->` (r15, ADVICE r14: the
    * sparsevec_l2_ops DDL was accepted but had no servable sort-key
    * shape). Same merged-ascending accumulation as the graph kernel
    * ([[graft.operators.Hnsw]] sparseDist). */
  def l2Distance(idx: Column, vals: Column, qIdx: Array[Long], qVal: Array[Double]): Column =
    toColumn(SparseDistExpr(toExpression(idx), toExpression(vals),
      qIdx, qVal, VectorDistance.L2.id))

  /** Σ|aᵢ−qᵢ| over the union of indices — pgvector sparsevec `<+>`. */
  def l1Distance(idx: Column, vals: Column, qIdx: Array[Long], qVal: Array[Double]): Column =
    toColumn(SparseDistExpr(toExpression(idx), toExpression(vals),
      qIdx, qVal, VectorDistance.L1.id))

  /** Structural recognizer for the engine's ONE-COLUMN sparsevec —
    * `struct<indices: array<bigint>, values: array<double>, dims: int>`
    * (the [[SparseLiteralExpr]] output shape). Nullability is ignored
    * on purpose: `struct()` assembled from table columns carries
    * nullable fields, and a parquet round-trip flips containsNull. */
  def isSparseStructType(t: DataType): Boolean = t match {
    case StructType(fs) if fs.length == 3 =>
      fs(0).name == "indices" && fs(1).name == "values" && fs(2).name == "dims" &&
        (fs(0).dataType match { case ArrayType(LongType, _) => true; case _ => false }) &&
        (fs(1).dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) &&
        fs(2).dataType == IntegerType
    case _ => false
  }

  import org.apache.spark.sql.functions.{lit, struct}

  /** Assemble the one-column sparsevec from an (indices, values)
    * column pair + declared dims — the bridge from the columnar pair
    * layout the stores use to pgvector's one-column type surface. */
  def toStructColumn(idx: Column, vals: Column, dims: Int): Column =
    struct(idx.as("indices"), vals.as("values"), lit(dims).as("dims"))

  /** One-column sparsevec distance (pgvector's verbatim
    * `sparse_col <-> '...'::sparsevec` operand shape). Modes:
    * [[VectorDistance]] ids — Dot, L2, L1, CosineDist, CosineSim. */
  def structDist(a: Column, b: Column, mode: VectorDistance.Mode): Column =
    toColumn(SparseStructDistExpr(toExpression(a), toExpression(b), mode.id))

  /** pgvector's `'{i:v,...}/dims'::sparsevec` literal as a Column —
    * the DataFrame-API twin of the SQL cast ([[SparseLiteralExpr]]). */
  def structLiteral(text: String): Column =
    toColumn(SparseLiteralExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(text)))

  /** Driver-side helper: sorted (indices, values) for a term→weight
    * query, indices = [[TextFunctions.hash64Scala]] of each term. */
  def queryOf(terms: Seq[(String, Double)]): (Array[Long], Array[Double]) = {
    val sorted = terms
      .map { case (t, w) => (TextFunctions.hash64Scala(t), w) }
      .sortBy(_._1)
    (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }

  /** pgvector's documented sparsevec bounds: at most 1e9 declared
    * dimensions, at most 16000 stored (non-zero) elements. */
  val MaxDims = 1000000000
  val MaxNnz = 16000

  /** Parse pgvector's sparsevec text format — `'{i:v, i:v, ...}/dims'`
    * with 1-based indices — into sorted (indices, values, dims).
    * Validation follows pgvector's sparsevec_in: strictly ascending
    * indices (which also rejects duplicates), every index in
    * [1, dims], dims in [1, 1e9], nnz ≤ 16000, and ZERO VALUES ARE
    * DROPPED (sparsevec stores only non-zero elements, so
    * `'{1:0,2:3}/4'` equals `'{2:3}/4'`). `typmod > 0` is the declared
    * dimension from `::sparsevec(n)`; a mismatch raises pgvector's
    * "expected N dimensions, not M". Error strings are pgvector-shaped
    * but not byte-identical (we don't replicate its message catalog). */
  def parseLiteral(text: String, typmod: Int = -1): (Array[Long], Array[Double], Int) = {
    val s = text.trim
    def bad(): Nothing = throw new IllegalArgumentException(
      s"""invalid input syntax for type sparsevec: "$text"""")
    val slash = s.lastIndexOf('/')
    if (!s.startsWith("{") || slash < 0 || !s.substring(0, slash).trim.endsWith("}")) bad()
    val dims =
      try s.substring(slash + 1).trim.toInt
      catch { case _: NumberFormatException => bad() }
    require(dims >= 1, "sparsevec must have at least 1 dimension")
    require(dims <= MaxDims,
      s"sparsevec cannot have more than $MaxDims dimensions")
    val bodyEnd = s.substring(0, slash).trim
    val body = bodyEnd.substring(1, bodyEnd.length - 1).trim
    val idxB = Array.newBuilder[Long]
    val valB = Array.newBuilder[Double]
    var prev = 0L // indices are 1-based, so 0 is below every legal index
    var nnz = 0
    if (body.nonEmpty) body.split(",").foreach { tok =>
      val colon = tok.indexOf(':')
      if (colon < 0) bad()
      val (i, v) =
        try (tok.substring(0, colon).trim.toLong, tok.substring(colon + 1).trim.toDouble)
        catch { case _: NumberFormatException => bad() }
      // pgvector's sparsevec_in rejects non-finite values outright
      // (Scala toDouble happily parses 'NaN'/'Infinity', and NaN != 0.0
      // would otherwise store it and poison every downstream distance)
      if (v.isNaN)
        throw new IllegalArgumentException("NaN not allowed in sparsevec")
      if (v.isInfinite)
        throw new IllegalArgumentException("infinite value not allowed in sparsevec")
      require(i >= 1 && i <= dims, s"sparsevec index out of range: $i (dimensions: $dims)")
      require(i > prev, "sparsevec indexes must be in ascending order")
      prev = i
      if (v != 0.0) { // pgvector stores only non-zero elements
        idxB += i; valB += v; nnz += 1
        require(nnz <= MaxNnz,
          s"sparsevec cannot have more than $MaxNnz non-zero elements")
      }
    }
    if (typmod > 0 && dims != typmod)
      throw new IllegalArgumentException(
        s"expected $typmod dimensions, not $dims")
    (idxB.result(), valB.result(), dims)
  }
}

/** Two-pointer sparse distance against a driver-metadata query.
  * `left` = sorted int64 indices (array<bigint>), `right` = values
  * (array<double>), same length. Modes: Dot, CosineSim (the sparse
  * retrieval pair) and — r15, so every accepted sparsevec opclass has
  * a servable sort key — L2 and L1, which merge over the UNION of
  * indices (an index present on one side only differences against
  * zero, pgvector's sparsevec `<->`/`<+>` semantics and the
  * [[graft.operators.Hnsw]] sparse walk kernel's arithmetic). */
case class SparseDistExpr(left: Expression, right: Expression,
    qIdx: Array[Long], qVal: Array[Double], mode: Int)
    extends BinaryExpression with CodegenFallback {

  require(qIdx.length == qVal.length, "query indices/values length mismatch")
  require(mode == VectorDistance.Dot.id || mode == VectorDistance.CosineSim.id ||
    mode == VectorDistance.L2.id || mode == VectorDistance.L1.id,
    s"unsupported sparse mode $mode")

  // query norm² folded once, driver-side, in array order — the same
  // sequential contract the corpus side uses
  private lazy val qNorm2: Double = {
    var acc = 0.0
    var i = 0
    while (i < qVal.length) { acc += qVal(i) * qVal(i); i += 1 }
    acc
  }

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sparse_dist needs (array<bigint>, array<double>), got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val idx = l.asInstanceOf[ArrayData]
    val vals = r.asInstanceOf[ArrayData]
    val n = idx.numElements()
    if (n != vals.numElements())
      throw new IllegalArgumentException(
        s"sparse vector malformed: ${n} indices vs ${vals.numElements()} values")
    if (mode == VectorDistance.L2.id || mode == VectorDistance.L1.id) {
      // union merge: unmatched terms on either side difference against
      // zero, accumulated in merged-ascending index order (the graph
      // kernel's determinism contract)
      var l2 = 0.0; var l1 = 0.0
      var i = 0; var j = 0
      while (i < n && j < qIdx.length) {
        val a = idx.getLong(i); val b = qIdx(j)
        if (a == b) {
          val d = vals.getDouble(i) - qVal(j); l2 += d * d; l1 += math.abs(d)
          i += 1; j += 1
        } else if (a < b) {
          val v = vals.getDouble(i); l2 += v * v; l1 += math.abs(v); i += 1
        } else {
          val q = qVal(j); l2 += q * q; l1 += math.abs(q); j += 1
        }
      }
      while (i < n) {
        val v = vals.getDouble(i); l2 += v * v; l1 += math.abs(v); i += 1
      }
      while (j < qIdx.length) {
        val q = qVal(j); l2 += q * q; l1 += math.abs(q); j += 1
      }
      if (mode == VectorDistance.L2.id) math.sqrt(l2) else l1
    } else {
      var dot = 0.0
      var aa = 0.0
      var i = 0
      var j = 0
      while (i < n) {
        val ix = idx.getLong(i)
        val v = vals.getDouble(i)
        if (mode == VectorDistance.CosineSim.id) aa += v * v
        while (j < qIdx.length && qIdx(j) < ix) j += 1
        if (j < qIdx.length && qIdx(j) == ix) dot += v * qVal(j)
        i += 1
      }
      if (mode == VectorDistance.Dot.id) dot
      else {
        val denom = math.sqrt(aa) * math.sqrt(qNorm2)
        if (denom == 0.0) 0.0
        else math.max(-1.0, math.min(1.0, dot / denom))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Distance between TWO one-column sparsevecs (r17 — closes the
  * "sparsevec is a column pair" deviation's operator surface): both
  * operands are `struct<indices, values, dims>` values, so pgvector's
  * verbatim `sparse_col <-> '{1:2}/5'::sparsevec` (and col-vs-col
  * distances) type-check with no field plumbing. The vec_* SQL
  * builders and [[graft.plans.SparseColumnRule]] route here whenever
  * an operand is the sparse struct shape.
  *
  * Semantics match pgvector's sparsevec operators: mismatched dims
  * raise ("different sparsevec dimensions a and b", the shape of
  * pgvector's error), `<->`/`<+>` merge over the index UNION
  * (unmatched entries difference against zero), `<#>`/`<=>`
  * accumulate over matches with norms folded in array order — the
  * same determinism contract as [[SparseDistExpr]], so a literal-query
  * plan rewritten to the driver-metadata kernel is bit-identical.
  *
  * Scale note: the exact path is a brute-force scan +
  * TakeOrderedAndProject (CodegenFallback like every sparse kernel).
  * With a literal query this expression is ALSO an index-servable
  * sort key: hnsw sparsevec DDL accepts the struct column directly
  * (no WITH (values=…)) and [[graft.plans.HnswProbeRule]] recognizes
  * the L2/L1/CosineDist modes (and the negated Dot) anchored on the
  * struct attribute. Col-vs-col distances stay on the exact scan. */
case class SparseStructDistExpr(left: Expression, right: Expression, mode: Int)
    extends BinaryExpression with CodegenFallback {

  require(mode == VectorDistance.Dot.id || mode == VectorDistance.CosineSim.id ||
    mode == VectorDistance.CosineDist.id ||
    mode == VectorDistance.L2.id || mode == VectorDistance.L1.id,
    s"unsupported sparse mode $mode")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (SparseVec.isSparseStructType(left.dataType) &&
        SparseVec.isSparseStructType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sparsevec distance needs two struct<indices: array<bigint>, " +
        s"values: array<double>, dims: int> operands, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val da = a.getInt(2); val db = b.getInt(2)
    if (da != db)
      throw new IllegalArgumentException(
        s"different sparsevec dimensions $da and $db")
    val ai = a.getArray(0); val av = a.getArray(1)
    val bi = b.getArray(0); val bv = b.getArray(1)
    val na = ai.numElements(); val nb = bi.numElements()
    if (na != av.numElements() || nb != bv.numElements())
      throw new IllegalArgumentException("sparse vector malformed: " +
        "indices/values length mismatch")
    if (mode == VectorDistance.L2.id || mode == VectorDistance.L1.id) {
      // union merge in ascending index order ([[SparseDistExpr]]'s
      // determinism contract)
      var l2 = 0.0; var l1 = 0.0
      var i = 0; var j = 0
      while (i < na && j < nb) {
        val x = ai.getLong(i); val y = bi.getLong(j)
        if (x == y) {
          val d = av.getDouble(i) - bv.getDouble(j); l2 += d * d; l1 += math.abs(d)
          i += 1; j += 1
        } else if (x < y) {
          val v = av.getDouble(i); l2 += v * v; l1 += math.abs(v); i += 1
        } else {
          val v = bv.getDouble(j); l2 += v * v; l1 += math.abs(v); j += 1
        }
      }
      while (i < na) { val v = av.getDouble(i); l2 += v * v; l1 += math.abs(v); i += 1 }
      while (j < nb) { val v = bv.getDouble(j); l2 += v * v; l1 += math.abs(v); j += 1 }
      if (mode == VectorDistance.L2.id) math.sqrt(l2) else l1
    } else {
      var dot = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0; var j = 0
      while (i < na && j < nb) {
        val x = ai.getLong(i); val y = bi.getLong(j)
        if (x == y) { dot += av.getDouble(i) * bv.getDouble(j); i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      if (mode == VectorDistance.Dot.id) dot
      else {
        // norms folded in array order (= ascending index order), the
        // sequential contract every graft cosine kernel shares
        i = 0
        while (i < na) { val v = av.getDouble(i); aa += v * v; i += 1 }
        j = 0
        while (j < nb) { val v = bv.getDouble(j); bb += v * v; j += 1 }
        val denom = math.sqrt(aa) * math.sqrt(bb)
        val sim =
          if (denom == 0.0) 0.0
          else math.max(-1.0, math.min(1.0, dot / denom))
        if (mode == VectorDistance.CosineSim.id) sim else 1.0 - sim
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The pgvector sparsevec text-format literal — `'{1:1.5,3:2}/5'` —
  * as a struct<indices: array<bigint>, values: array<double>,
  * dims: int> expression ([[graft.plans.PgVectorParser]] rewrites
  * `x::sparsevec` to `vec_sparse_literal(x)` and `x::sparsevec(n)` to
  * `vec_sparse_literal(x, n)`). Foldable when the child is, so the
  * struct collapses to a Literal and the sparse kernels' 3-arg SQL
  * forms (`sparse_dot(i, v, q)` etc.) can extract the query arrays at
  * analysis time. Parsing and validation: [[SparseVec.parseLiteral]].
  *
  * The struct IS the engine's one-column sparsevec type (r17): a
  * STORED column of this shape makes pgvector's verbatim
  * `sparse_col <#> '...'::sparsevec` type-check end-to-end
  * ([[SparseStructDistExpr]] + the vec_* builder dispatch /
  * [[graft.plans.SparseColumnRule]]). The (indices, values) column
  * PAIR remains the index-served storage layout — [[SparseVec
  * .toStructColumn]] bridges pair-layout stores to the one-column
  * surface. */
case class SparseLiteralExpr(child: Expression, expectedDims: Int = -1)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("indices", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("dims", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      // pgvector's `vector::sparsevec` cast (r17): a dense numeric
      // array converts with zeros dropped, dims = the array length
      case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"vec_sparse_literal needs a '{i:v, ...}/dims' string or a " +
          s"float array, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val (idx, vals, dims) = child.dataType match {
      case ArrayType(et, _) =>
        val a = input.asInstanceOf[ArrayData]
        val n = a.numElements()
        if (n < 1)
          throw new IllegalArgumentException(
            "sparsevec must have at least 1 dimension")
        if (expectedDims > 0 && n != expectedDims)
          throw new IllegalArgumentException(
            s"expected $expectedDims dimensions, not $n")
        val idxB = Array.newBuilder[Long]
        val valB = Array.newBuilder[Double]
        var nnz = 0
        var i = 0
        while (i < n) {
          if (a.isNullAt(i))
            throw new IllegalArgumentException("array must not contain nulls")
          val v = if (et == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
          // pgvector's sparsevec rejects non-finite values in every
          // input path (a vector column can't hold them either)
          if (v.isNaN)
            throw new IllegalArgumentException("NaN not allowed in sparsevec")
          if (v.isInfinite)
            throw new IllegalArgumentException("infinite value not allowed in sparsevec")
          if (v != 0.0) {
            idxB += (i + 1).toLong; valB += v; nnz += 1
            if (nnz > SparseVec.MaxNnz)
              throw new IllegalArgumentException(
                s"sparsevec cannot have more than ${SparseVec.MaxNnz} non-zero elements")
          }
          i += 1
        }
        (idxB.result(), valB.result(), n)
      case _ => SparseVec.parseLiteral(input.toString, expectedDims)
    }
    org.apache.spark.sql.catalyst.InternalRow(
      ArrayData.toArrayData(idx), ArrayData.toArrayData(vals), dims)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
