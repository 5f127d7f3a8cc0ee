package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

object ZOrder {

  /** Morton key of `cols` (each cast to double upstream) against
    * per-column quantile boundaries — see [[ZOrderExpr]]. */
  def zkey(cols: Seq[Column], bounds: Array[Array[Double]]): Column =
    toColumn(ZOrderExpr(cols.map(toExpression), bounds))
}

/** Morton (Z-order) key against driver-metadata quantile boundaries —
  * the multi-dimensional clustering kernel behind
  * [[graft.sources.GraftTable.cluster]] (the operation Delta ships as
  * OPTIMIZE ZORDER BY; Morton, "A computer oriented geodetic data
  * base", 1966 — bit interleaving makes one sort key locality-
  * preserving in EVERY listed dimension at once, so per-file
  * [min, max] stats stay selective for predicates on any of them).
  *
  * Each child value binary-searches its column's sorted boundary
  * array (driver metadata riding as a plain field, the
  * [[NearestCellsExpr]] discipline — boundaries come from one
  * approxQuantile pass, 2^bits buckets per column) and the bucket
  * bits of all children interleave LSB-first into one long. Quantile
  * buckets rather than equi-width: a skewed column still spreads over
  * all 2^bits buckets, so no dimension's bits degenerate to a
  * constant prefix. NULL maps to bucket 0 (nulls cluster first, the
  * same contract as an ascending NULLS FIRST sort).
  *
  * Interpreted eval (CodegenFallback): the boundary matrix is KB-MB
  * scale driver metadata; embedding it in generated Java would bloat
  * janino for a body that is already a tight flat-array loop.
  */
case class ZOrderExpr(children: Seq[Expression], bounds: Array[Array[Double]])
    extends Expression with CodegenFallback {

  require(children.nonEmpty, "zkey needs at least one column")
  require(bounds.length == children.length,
    s"zkey: ${children.length} columns but ${bounds.length} boundary arrays")

  /** Bits per dimension: enough for every boundary array (bucket
    * count = boundaries + 1), capped so all dimensions fit in 63. */
  private val bitsPer: Int = {
    val need = bounds.map(b => math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(b.length.toLong))).max
    math.min(need, 63 / children.length)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != DoubleType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"zkey needs double inputs (cast upstream), got ${c.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var d = 0
    while (d < children.length) {
      val v = children(d).eval(input)
      val bucket =
        if (v == null) 0L
        else {
          val x = v.asInstanceOf[Double]
          val bs = bounds(d)
          // first boundary > x == count of boundaries <= x == bucket id
          var lo = 0
          var hi = bs.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (bs(mid) <= x) lo = mid + 1 else hi = mid
          }
          math.min(lo.toLong, (1L << bitsPer) - 1)
        }
      // interleave: bit b of dimension d lands at position b*dims + d
      var b = 0
      while (b < bitsPer) {
        z |= ((bucket >>> b) & 1L) << (b * children.length + d)
        b += 1
      }
      d += 1
    }
    z
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
