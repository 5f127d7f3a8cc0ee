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

  /** KLL quantile sketch over an UNBOUNDED double domain: returns one
    * estimated quantile per requested p, as array<double> aligned with
    * `ps`. Mergeable by construction (map-side partial: one ~3k-item
    * buffer per group per partition crosses the shuffle), rank error
    * ≈ O(1/k) — the scale path where events_quantiles_hist's
    * integer-binnable-range assumption does not hold. */
  def quantileSketch(value: Column, k: Int, ps: Seq[Double]): Column =
    GraftSqlBridge.toColumn(
      KllQuantileAggExpr(GraftSqlBridge.toExpression(value), k, ps).toAggregateExpression())

  /** SpaceSaving heavy hitters: top-k (item, cnt, err) structs; every
    * item with true frequency > N/capacity is guaranteed present and
    * each count overestimates by at most its `err`. The frequency
    * member of the mergeable-sketch family (HLL = distinct, KLL =
    * quantiles) — top tokens/domains/keys at 100 TB without a
    * full-vocabulary shuffle. */
  def heavyHitters(item: Column, capacity: Int, k: Int): Column =
    GraftSqlBridge.toColumn(
      SpaceSavingAggExpr(GraftSqlBridge.toExpression(item), capacity, k).toAggregateExpression())

  /** HyperLogLog distinct-count estimate over pre-hashed values on the
    * md5 hash64 contract (SURVEY §3): `hash64` must be the 60-bit
    * [[TextFunctions.hash64]] column. Register index = top p bits,
    * rho = leading-zero run of the remaining Q = 60−p bits + 1; the
    * m = 2^p byte registers merge by elementwise max (map-side
    * partial, mergeable by construction).
    *
    * The estimate is EXACT INTEGER arithmetic end to end — see
    * [[HllEstimator.estimate]] — so a DuckDB oracle replays the whole
    * estimator relationally (GROUP BY register → MAX(rho) → integer
    * folds) and the entry is hash-exact, not rows-only. */
  def hllDistinct(hash64: Column, p: Int): Column =
    GraftSqlBridge.toColumn(
      HllDistinctAggExpr(GraftSqlBridge.toExpression(hash64), p).toAggregateExpression())
}

/** The integer-exact HLL estimator shared by the aggregate's eval and
  * the oracle-SQL builder (flajolet et al. '07 estimator shape, HLL++
  * small-range linear counting; constants re-expressed as exact
  * rationals so no float reassociation can diverge across engines):
  *
  *  - harmonic sum kept 2^(Q+1)-scaled: S = Σ_j 2^(Q+1−ρ_j) ≤ m·2^(Q+1)
  *    — an exact Long for p ≥ 10 (Q = 60−p);
  *  - alpha_m ≈ 0.7213/(1+1.079/m) as the exact rational
  *    7213000·m / (10^4·(1000m+1079)), so
  *    E_raw = ⌊7213000·m³·2^(Q+1) / (10^4·(1000m+1079)·S)⌋ (BigInt);
  *  - linear counting (V zero registers > 0 and E_raw ≤ 2.5m):
  *    E = ⌊m·lnBits(m,V) / 2^30⌋ with [[lnBits]] a 2^30 fixed-point
  *    ln(m/V) table — written as a parquet sidecar for the oracle,
  *    because ln itself is not bit-portable across libm/JVM. */
object HllEstimator {

  /** round(ln(m/v)·2^30) — StrictMath (fdlibm) so the sidecar content
    * is platform-stable; the oracle reads the sidecar, never libm. */
  def lnBits(m: Int, v: Int): Long =
    Math.round(StrictMath.log(m.toDouble / v) * (1L << 30))

  /** (registerIndex, rho) of one 60-bit hash under precision p. */
  def registerRho(h: Long, p: Int): (Int, Int) = {
    val q = 60 - p
    val reg = (h >>> q).toInt
    val low = h & ((1L << q) - 1L)
    val rho = if (low == 0L) q + 1 else q + 1 - (64 - java.lang.Long.numberOfLeadingZeros(low))
    (reg, rho)
  }

  def estimate(p: Int, registers: Array[Byte]): Long = {
    val m = 1 << p
    val q = 60 - p
    var s = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      val rho = registers(i) & 0xff
      if (rho == 0) zeros += 1
      s += 1L << (q + 1 - rho)
      i += 1
    }
    val num = BigInt(7213000L) * BigInt(m).pow(3) * (BigInt(1) << (q + 1))
    val den = BigInt(10000L) * BigInt(1000L * m + 1079L) * BigInt(s)
    val eRaw = (num / den).toLong
    if (zeros > 0 && 2L * eRaw <= 5L * m.toLong)
      (m.toLong * lnBits(m, zeros)) >> 30
    else eRaw
  }
}

case class HllDistinctAggExpr(
    child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val (reg, rho) = HllEstimator.registerRho(v.asInstanceOf[Long], p)
      if (rho > (buf(reg) & 0xff)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = HllEstimator.estimate(p, buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllDistinctAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllDistinctAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Simplified KLL sketch (Karnin-Lang-Liberty, FOCS'16; layout follows
  * the Apache DataSketches KLL design): `levels(i)` holds items of
  * weight 2^i; when total size exceeds capacity the lowest full level
  * is sorted and every other item promoted one level (the skipped
  * half is discarded — the lossy step whose rank error telescopes to
  * O(1/k)). Deviation from the paper: the odd/even promotion choice
  * alternates with a compaction counter instead of a coin flip —
  * deterministic for a fixed partition/merge order, same telescoping
  * bound in expectation on non-adversarial data (the gate measures
  * the realized error directly). */
final class KllSketch(val k: Int) extends Serializable {
  import scala.collection.mutable.ArrayBuffer
  var n: Long = 0L
  var compactions: Long = 0L
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])

  private def capacity(lvl: Int): Int = {
    val depth = levels.length - 1 - lvl // top level gets k, lower decay 2/3
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)
  }
  private def totalCap: Int = levels.indices.map(capacity).sum
  private def size: Int = levels.map(_.length).sum

  def update(v: Double): Unit = { levels(0) += v; n += 1; compress() }

  private def compress(): Unit = {
    while (size > totalCap) {
      val i = levels.indices.find(i => levels(i).length >= capacity(i)).getOrElse(0)
      val buf = levels(i).sorted
      levels(i).clear()
      if (i + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
      val m = buf.length & ~1 // even prefix: promoted item stands for itself + skipped neighbor
      var j = (compactions & 1L).toInt
      while (j < m) { levels(i + 1) += buf(j); j += 2 }
      if (buf.length % 2 == 1) levels(i) += buf.last // odd leftover keeps its weight
      compactions += 1
    }
  }

  def merge(other: KllSketch): KllSketch = {
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
    for (i <- other.levels.indices) levels(i) ++= other.levels(i)
    n += other.n
    compactions += other.compactions
    compress()
    this
  }

  /** Smallest stored item whose cumulative weight reaches ceil(p·n),
    * for every requested p — the sort/weight pass runs ONCE, not once
    * per percentile. */
  def quantiles(ps: Seq[Double]): Seq[Double] = {
    if (n == 0) return ps.map(_ => Double.NaN)
    val weighted = levels.indices.flatMap(i => levels(i).map(v => (v, 1L << i)))
      .sortBy(_._1)
    val total = weighted.iterator.map(_._2).sum
    ps.map { p =>
      val target = math.max(1L, math.ceil(p * total).toLong)
      var cum = 0L
      var i = 0
      while (i < weighted.length && cum + weighted(i)._2 < target) {
        cum += weighted(i)._2; i += 1
      }
      weighted(math.min(i, weighted.length - 1))._1
    }
  }

  def quantile(p: Double): Double = quantiles(Seq(p)).head

  /** The sketch's full weighted-item state, (value, 2^level) per
    * stored item — what the persisted-sketch oracle replay consumes:
    * [[quantiles]] is exactly the weighted-quantile select over this
    * multiset, which is relational (see
    * AnalyticsQueries.quantilesSketch). */
  def weightedItems: Seq[(Double, Long)] =
    levels.indices.flatMap(i => levels(i).toSeq.map(v => (v, 1L << i)))

  def serialize(): Array[Byte] = {
    val items = levels.map(_.length).sum
    val bb = ByteBuffer.allocate(8 + 8 + 4 + 4 * levels.length + 8 * items)
    bb.putLong(n); bb.putLong(compactions); bb.putInt(levels.length)
    levels.foreach(l => bb.putInt(l.length))
    levels.foreach(_.foreach(bb.putDouble))
    bb.array()
  }
}

object KllSketch {
  def deserialize(k: Int, bytes: Array[Byte]): KllSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new KllSketch(k)
    s.n = bb.getLong(); s.compactions = bb.getLong()
    val nl = bb.getInt()
    val sizes = Array.fill(nl)(bb.getInt())
    s.levels.clear()
    for (i <- 0 until nl) {
      val l = scala.collection.mutable.ArrayBuffer.empty[Double]
      var j = 0
      while (j < sizes(i)) { l += bb.getDouble(); j += 1 }
      s.levels += l
    }
    s
  }
}

case class KllQuantileAggExpr(
    child: Expression, k: Int, ps: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketch] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllSketch = new KllSketch(k)

  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllSketch, b: KllSketch): KllSketch = a.merge(b)

  override def eval(buf: KllSketch): Any =
    new GenericArrayData(buf.quantiles(ps).toArray)

  override def serialize(buf: KllSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch =
    KllSketch.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllQuantileAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantileAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
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

/** SpaceSaving heavy-hitters summary (Metwally et al., ICDT'05;
  * merge per Agarwal et al. "Mergeable Summaries"): at most
  * `capacity` (item → count, err) entries; an unseen item arriving at
  * a full summary inherits the minimum count as its overestimate
  * bound. Guarantee: every item with true frequency > N/capacity is
  * present, and each kept count overestimates the truth by at most
  * its `err`. The count/bucket double index makes update O(1)
  * amortized (no O(capacity) min scan per eviction). */
final class SpaceSaving(val capacity: Int) extends Serializable {
  import scala.collection.mutable
  val counts = mutable.HashMap.empty[String, (Long, Long)] // item -> (count, err)
  private val buckets = new java.util.TreeMap[Long, mutable.HashSet[String]]()
  var n: Long = 0L

  private[functions] def bucketAdd(c: Long, item: String): Unit = {
    val s = buckets.get(c)
    if (s == null) {
      val ns = mutable.HashSet(item); buckets.put(c, ns)
    } else s += item
  }
  private def bucketRemove(c: Long, item: String): Unit = {
    val s = buckets.get(c)
    if (s != null) { s -= item; if (s.isEmpty) buckets.remove(c); () }
  }

  def update(item: String): Unit = {
    n += 1
    counts.get(item) match {
      case Some((c, e)) =>
        counts(item) = (c + 1, e); bucketRemove(c, item); bucketAdd(c + 1, item)
      case None if counts.size < capacity =>
        counts(item) = (1L, 0L); bucketAdd(1L, item)
      case None =>
        val minC = buckets.firstKey()
        val victim = buckets.firstEntry().getValue.head
        bucketRemove(minC, victim); counts.remove(victim)
        counts(item) = (minC + 1, minC); bucketAdd(minC + 1, item)
    }
  }

  /** The floor a summary guarantees for items it does NOT hold: 0
    * while under capacity (absent truly means unseen), else the
    * minimum kept count (an evicted item's true count is ≤ that). */
  private def absentFloor: Long =
    if (counts.size < capacity) 0L else buckets.firstKey()

  /** Merge per Agarwal et al. (Mergeable Summaries): an item absent
    * from one side contributes that side's `absentFloor` to both its
    * count and its error — summing with 0 instead would UNDERCOUNT
    * items evicted from one partial (est ≥ true breaks, and a true
    * heavy hitter split across partials can be truncated away).
    * Union is then cut back to capacity by count. */
  def merge(other: SpaceSaving): SpaceSaving = {
    if (other.counts.nonEmpty || counts.nonEmpty) {
      val floorA = absentFloor
      val floorB = other.absentFloor
      val union = mutable.HashMap.empty[String, (Long, Long)]
      counts.foreach { case (item, (c, e)) =>
        other.counts.get(item) match {
          case Some((c2, e2)) => union(item) = (c + c2, e + e2)
          case None => union(item) = (c + floorB, e + floorB)
        }
      }
      other.counts.foreach { case (item, (c, e)) =>
        if (!counts.contains(item)) union(item) = (c + floorA, e + floorA)
      }
      val kept = union.toSeq.sortBy { case (item, (c, _)) => (-c, item) }.take(capacity)
      counts.clear(); buckets.clear()
      kept.foreach { case (item, (c, e)) => counts(item) = (c, e); bucketAdd(c, item) }
    }
    n += other.n
    this
  }

  /** Top-k by (count desc, item asc): (item, count, err) rows. */
  def topK(k: Int): Seq[(String, Long, Long)] =
    counts.toSeq.map { case (i, (c, e)) => (i, c, e) }
      .sortBy { case (i, c, _) => (-c, i) }.take(k)

  def serialize(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(n); out.writeInt(counts.size)
    counts.foreach { case (i, (c, e)) =>
      out.writeUTF(i); out.writeLong(c); out.writeLong(e)
    }
    out.close(); bos.toByteArray
  }
}

object SpaceSaving {
  def deserialize(capacity: Int, bytes: Array[Byte]): SpaceSaving = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new SpaceSaving(capacity)
    s.n = in.readLong()
    val sz = in.readInt()
    var i = 0
    while (i < sz) {
      val item = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      s.counts(item) = (c, e)
      s.bucketAdd(c, item) // rebuild the count index alongside
      i += 1
    }
    s
  }
}

case class SpaceSavingAggExpr(
    child: Expression, capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSaving] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)

  override def update(buf: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }

  override def merge(a: SpaceSaving, b: SpaceSaving): SpaceSaving = a.merge(b)

  override def eval(buf: SpaceSaving): Any =
    new GenericArrayData(buf.topK(k).map { case (i, c, e) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(i), c, e)
    }.toArray[Any])

  override def serialize(buf: SpaceSaving): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSaving =
    SpaceSaving.deserialize(capacity, bytes)

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
