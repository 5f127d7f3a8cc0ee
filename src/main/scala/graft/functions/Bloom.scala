package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Deterministic Bloom filter build + probe for broadcast membership
  * tests, on the md5 hash64 contract (SURVEY §3).
  *
  * The scale story: a broadcast semi-join against a distinct key set
  * (the [[graft.operators.Decontaminate.overlaps]] shape) ships the
  * EXACT key set to every executor — fine for thousands of keys, but
  * an eval suite of 10⁷ 64-bit shingle hashes is ~500 MB exact vs
  * ~30 MB as a Bloom bitmap. The filter trades a one-sided, bounded
  * error (false POSITIVES only — a flagged-clean doc costs an
  * over-drop, never a leaked benchmark doc) for a ~20× smaller
  * broadcast, the standard production decontamination shape (GPT-3
  * appendix C runs exactly this trade).
  *
  * Determinism (what makes the entry HASH-EXACT, not rows-only):
  * every quantity is integer arithmetic on the 60-bit hash64 key —
  *  - sizing: m = nextPow2(bitsPerKey·n) bits (nextPow2(x) =
  *    1 << bitlen(x−1), replayable as `1 << length(bin(x-1))`),
  *  - probe positions (Kirsch–Mitzenmacher double hashing):
  *    h₁ = h mod m, h₂ = 2·((h div m) mod (m/2)) + 1 (odd, so every
  *    stride is a unit mod the power-of-two m),
  *    posᵢ = (h₁ + i·h₂) mod m for i < k.
  * A DuckDB oracle rebuilds the exact bitmap relationally (bench keys
  * × range(k) → DISTINCT positions) and replays membership as a
  * k-way position join — no murmur3, no engine-private layout.
  *
  * Build is one pass over the key column (mapPartitions bitmap OR,
  * tree-reduced — map-side combined like the old
  * `DataFrameStatFunctions.bloomFilter`, same driver-metadata pattern
  * as `NearestCellsExpr`'s centroids). Probe is a codegen'd
  * expression over the broadcast word array: k bit-tests per row, no
  * join, no shuffle on the corpus side.
  */
object Bloom {

  /** Default sizing: 24 bits/key ≈ the fpp-1e-5 point (-ln p/ln²2 =
    * 23.96), k = 17 ≈ optimal (m/n·ln 2) at the pow2 floor. */
  val BitsPerKey = 24
  val K = 17

  final case class DetBloom(words: Array[Long], mBits: Long, k: Int)
      extends Serializable

  def nextPow2(x: Long): Long =
    if (x <= 2L) 2L else java.lang.Long.highestOneBit(x - 1) << 1

  /** Deterministic filter over the LongType column `keyCol` of `keys`
    * (distinct-ness not required; sizing counts first). Build needs
    * TWO actions (the count sizes the filter, the reduce then fills),
    * so the key projection is cached across them — without it the
    * caller's whole upstream pipeline (tokenize → shingle → distinct
    * at decontamination scale) executes twice. The cache is scoped to
    * this call, released before returning. */
  def build(keys: DataFrame, keyCol: String,
      bitsPerKey: Int = BitsPerKey, k: Int = K): DetBloom = {
    val keyed = keys.select(keyCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = math.max(keyed.count(), 1L)
      // floor at one 64-bit word: below 64 bits nWords rounds to 0 and
      // every probe would index an empty array (hit at n ≤ 2 with the
      // default 24 bits/key)
      val m = nextPow2(math.max(64L, bitsPerKey * n))
      val nWords = (m >> 6).toInt
      import keyed.sparkSession.implicits._
      val words = keyed.as[Long].rdd
        .mapPartitions { it =>
          val w = new Array[Long](nWords)
          it.foreach { h => setBits(w, m, k, h) }
          Iterator.single(w)
        }
        .treeReduce { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        }
      DetBloom(words, m, k)
    } finally { keyed.unpersist(blocking = false); () }
  }

  private def setBits(w: Array[Long], m: Long, k: Int, h: Long): Unit = {
    val h1 = h % m
    val h2 = 2L * ((h / m) % (m >> 1)) + 1L
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) % m
      w((pos >>> 6).toInt) |= 1L << (pos & 63L)
      i += 1
    }
  }

  /** Boolean probe column: may the filter contain long `key`? */
  def mightContain(key: Column, f: DetBloom): Column =
    GraftSqlBridge.toColumn(
      BloomMightContainExpr(GraftSqlBridge.toExpression(key), f))
}

/** k bit-probes per row against a driver-built filter carried as
  * expression metadata (broadcast with the serialized plan; probed
  * directly from generated code). */
case class BloomMightContainExpr(child: Expression, f: Bloom.DetBloom)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs a bigint key, got $t")
    }

  override def nullSafeEval(h: Any): Any =
    BloomMightContainExpr.test(f.words, f.mBits, f.k, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bloomWords", f.words, "long[]")
    nullSafeCodeGen(ctx, ev, h =>
      s"""${ev.value} = graft.functions.BloomMightContainExpr.test(
         |  $wRef, ${f.mBits}L, ${f.k}, $h);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainExpr {
  /** Static so the generated code and interpreted eval share one body. */
  def test(w: Array[Long], m: Long, k: Int, h: Long): Boolean = {
    val h1 = h % m
    val h2 = 2L * ((h / m) % (m >> 1)) + 1L
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) % m
      if ((w((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}
