package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Sketch aggregates for the dedup pipeline, each a single
  * `TypedImperativeAggregate` column with a primitive-array buffer —
  * replacing 32–60 separate aggregate columns whose generated code
  * dominated runtime (janino compilation + register pressure). Both
  * are map-side partial: one small buffer per group per partition
  * crosses the shuffle.
  *
  * Numeric results are identical to the wide-agg forms: integer
  * bit-sums and modular minima are order-independent.
  */
object SketchAggregates {

  /** 60-bit simhash signature from token-hash values: bit b of the
    * result is set when Σ(±1 per token, sign of hash bit b) > 0. */
  def simhash(tokenHash: Column, bits: Int): Column =
    GraftSqlBridge.toColumn(
      SimhashAggExpr(GraftSqlBridge.toExpression(tokenHash), bits).toAggregateExpression())

  /** Minhash signature: element i = min over rows of (aᵢ·h + bᵢ) mod P. */
  def minhash(shingleHash: Column, numHashes: Int): Column =
    GraftSqlBridge.toColumn(
      MinhashAggExpr(GraftSqlBridge.toExpression(shingleHash), numHashes).toAggregateExpression())
}

case class SimhashAggExpr(
    child: Expression, bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buf(b) += (((h >> b) & 1L) * 2L - 1L)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): SimhashAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimhashAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

case class MinhashAggExpr(
    child: Expression, numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import graft.functions.TextFunctions.MinhashP
  import graft.operators.Dedup.{minhashA, minhashB}

  private lazy val as: Array[Long] = Array.tabulate(numHashes)(minhashA)
  private lazy val bs: Array[Long] = Array.tabulate(numHashes)(minhashB)

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] % MinhashP
      var i = 0
      while (i < numHashes) {
        val p = (as(i) * h + bs(i)) % MinhashP
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinhashAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinhashAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
