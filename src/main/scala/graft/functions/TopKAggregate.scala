package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k smallest (dist, id) pairs,
  * ordered lexicographically — a `TypedImperativeAggregate`, so Spark
  * runs it map-side first: each partition shuffles at most k pairs
  * per group instead of every candidate row. This is the 100 TB shape
  * for batched KNN (SURVEY.md §4): |shuffle| = partitions × queries ×
  * k, independent of corpus size — vs the window row_number plan
  * which shuffles corpus × queries rows.
  *
  * Determinism: eviction and output order use (dist, id), matching
  * the oracle's ORDER BY dist, id tie-break exactly.
  */
object TopKAggregate {
  /** Aggregate column: array<struct<dist:double, id:bigint>> of the k
    * smallest pairs, ascending. */
  def topK(dist: Column, id: Column, k: Int): Column = {
    val child = GraftSqlBridge.toExpression(struct(dist.as("dist"), id.as("id")))
    GraftSqlBridge.toColumn(TopKAggExpr(child, k).toAggregateExpression())
  }
}

/** Buffer: an unsorted bounded array; logical max kept by scan (k is
  * small, so O(k) insert beats heap constant factors and serializes
  * trivially). */
final class TopKBuffer(val k: Int) {
  val dists = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  private def worseThan(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  private def worstIdx: Int = {
    var w = 0
    var i = 1
    while (i < size) {
      if (worseThan(dists(i), ids(i), dists(w), ids(w))) w = i
      i += 1
    }
    w
  }

  def insert(d: Double, id: Long): Unit = {
    if (size < k) {
      dists(size) = d; ids(size) = id; size += 1
    } else if (size > 0) {
      val w = worstIdx
      if (worseThan(dists(w), ids(w), d, id)) {
        dists(w) = d; ids(w) = id
      }
    }
  }

  def sortedPairs: Array[(Double, Long)] =
    (0 until size).map(i => (dists(i), ids(i))).toArray
      .sortBy(identity)
}

case class TopKAggExpr(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("dist", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row != null && !row.isNullAt(0) && !row.isNullAt(1)) {
      b.insert(row.getDouble(0), row.getLong(1))
    }
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.size) { b.insert(o.dists(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = b.sortedPairs.map { case (d, id) =>
      new GenericInternalRow(Array[Any](d, id))
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + b.size * 16)
    bb.putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.dists(i)).putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAggExpr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
