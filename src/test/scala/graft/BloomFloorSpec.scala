package graft

import graft.functions.Bloom
import graft.functions.TextFunctions._
import graft.operators.Decontaminate
import org.apache.spark.sql.functions._

/** The 64-bit Bloom floor, engine vs oracle (ADVICE r11 medium):
  * Bloom.build floors the bitmap at one 64-bit word, and the DuckDB
  * twin's msize CTE mirrors it with greatest(bpk·n, 64). These tests
  * pin (a) the two sizing formulas identical over the whole small-n
  * regime including n = 0, and (b) full engine ≡ oracle-replay
  * equality of the flagged set at exactly ONE distinct bench shingle —
  * the regime where an unfloored oracle (m = 32) diverges from the
  * floored engine (m = 64). */
class BloomFloorSpec extends SparkSpec {

  /** The oracle's msize arithmetic, verbatim:
    * 1 << length(bin(greatest(bpk·n, 64) − 1)). */
  private def oracleM(nBench: Long, bpk: Int = Bloom.BitsPerKey): Long = {
    val x = math.max(bpk * nBench, 64L) - 1
    1L << (64 - java.lang.Long.numberOfLeadingZeros(x))
  }

  test("oracle msize formula ≡ engine sizing for n = 0..4096") {
    (0L to 4096L).foreach { n =>
      val engine =
        Bloom.nextPow2(math.max(64L, Bloom.BitsPerKey * math.max(n, 1L)))
      assert(oracleM(n) == engine,
        s"n=$n: oracle m=${oracleM(n)} != engine m=$engine")
    }
  }

  test("decontam_bloom engine ≡ oracle replay at ONE distinct bench shingle (m=64 floor)") {
    import spark.implicits._
    val N = 4
    // bench doc has exactly N tokens → exactly one distinct N-shingle
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta trailing words here"), // true overlap
      (2L, "epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
      (5L, "the quick brown fox jumps over the lazy dog again"),
      (6L, "gamma delta alpha beta shuffled so no shared shingle")
    ).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 0L)
    val corpus = docs.filter($"doc_id" =!= 0L)

    def gram(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", tokens($"text").as("tk"))
        .select($"doc_id",
          explode(array_distinct(shingles($"tk", N))).as("s"))
        .select($"doc_id", hash64($"s").as("h"))

    val benchH = gram(bench).select("h").distinct().as[Long].collect()
    assert(benchH.length == 1, s"fixture must yield 1 bench shingle, got ${benchH.length}")
    val m = oracleM(benchH.length.toLong)
    assert(m == 64L, s"one bench key must hit the 64-bit floor, got m=$m")

    // oracle replay in driver Scala: KM positions from the single bench
    // key, then all-k membership per corpus shingle — exactly the
    // bloomOverlapsSql benchpos/cpos/hits algebra at this m
    def positions(h: Long): Set[Long] = {
      val h1 = h % m
      val h2 = 2L * ((h / m) % (m >> 1)) + 1L
      (0 until Bloom.K).map(i => (h1 + i * h2) % m).toSet
    }
    val setPos = benchH.flatMap(positions).toSet
    val corpusRows = gram(corpus).as[(Long, Long)].collect()
    val expected = corpusRows.groupBy(_._1).flatMap { case (id, rows) =>
      val maybe = rows.count { case (_, h) => positions(h).subsetOf(setPos) }
      if (maybe > 0) Some(id -> ((rows.length.toLong, maybe.toLong))) else None
    }

    val engine = Decontaminate
      .bloomOverlaps(corpus, bench, "doc_id", "text", n = N)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(engine == expected,
      s"engine flag set $engine != oracle replay $expected at m=64")
    assert(engine.contains(1L), "the true-overlap doc must be flagged")
  }
}
