package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build + probe for broadcast membership tests.
  *
  * The scale story: a broadcast semi-join against a distinct key set
  * (the [[graft.operators.Decontaminate.overlaps]] shape) ships the
  * EXACT key set to every executor — fine for thousands of keys, but
  * an eval suite of 10⁷ 64-bit shingle hashes is ~500 MB exact vs
  * ~25 MB as a Bloom filter at fpp 1e-5 (the classic -n·ln p / ln²2
  * bits). The filter trades a one-sided, bounded error (false
  * POSITIVES only — a flagged-clean doc costs an over-drop, never a
  * leaked benchmark doc) for a 20× smaller broadcast, the standard
  * production decontamination shape (GPT-3 appendix C runs exactly
  * this trade).
  *
  * Build is `DataFrameStatFunctions.bloomFilter` — a treeAggregate,
  * map-side combined, one compact bitmap to the driver (the same
  * driver-metadata pattern as [[NearestCellsExpr]]'s centroids).
  * Probe is a codegen'd expression over the serialized filter: one
  * `mightContainLong` bit-test per row, no join, no shuffle on the
  * corpus side.
  */
object Bloom {

  /** Serialized filter over the LongType column `keyCol` of `keys`
    * (distinct-ness not required; sizing counts first). Build needs
    * TWO actions (the count sizes the filter the aggregate then
    * fills), so the key projection is cached across them — without
    * it the caller's whole upstream pipeline (tokenize → shingle →
    * distinct at decontamination scale) executes twice. The cache is
    * scoped to this call: a fresh single-column projection (its plan
    * never aliases the caller's own persists), released before
    * returning. */
  def build(keys: DataFrame, keyCol: String, fpp: Double): Array[Byte] = {
    val keyed = keys.select(keyCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = math.max(keyed.count(), 1L)
      val bf = keyed.stat.bloomFilter(keyCol, n, fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    } finally keyed.unpersist(blocking = false)
  }

  /** Boolean probe column: may the filter contain long `key`? */
  def mightContain(key: Column, bits: Array[Byte]): Column =
    GraftSqlBridge.toColumn(
      BloomMightContainExpr(GraftSqlBridge.toExpression(key), bits))
}

/** One bit-probe per row against a driver-built filter carried as
  * expression metadata. Deserialized once per executor (lazy,
  * transient); `BloomFilterImpl` is Serializable so the generated
  * code references the live filter directly. */
case class BloomMightContainExpr(child: Expression, bits: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs a bigint key, got $t")
    }

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bits))

  override def nullSafeEval(h: Any): Any =
    bf.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $bfRef.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
