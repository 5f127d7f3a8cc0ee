package graft

import graft.functions.{HllEstimator, SketchAggregates, TextFunctions}
import org.apache.spark.sql.functions._

/** Engine HLL sketch (events_approx_distinct): register/rho bit
  * contract, merge-order invariance (the property that makes the
  * DuckDB register-maxima replay sound), and measured accuracy across
  * both estimator branches (linear counting + raw harmonic). */
class HllSpec extends SparkSpec {

  private val P = 12

  test("registerRho: top-p-bit index, leading-zero-run rho on the low 48") {
    // hash = reg<<48 | low: reg 5, low with bitlen 48 -> rho 1
    val h1 = (5L << 48) | (1L << 47)
    assert(HllEstimator.registerRho(h1, P) == ((5, 1)))
    // low = 1 -> bitlen 1 -> rho 48
    assert(HllEstimator.registerRho((5L << 48) | 1L, P) == ((5, 48)))
    // low = 0 -> rho 49 (the all-zeros sentinel)
    assert(HllEstimator.registerRho(5L << 48, P) == ((5, 49)))
    // max 60-bit hash -> top register
    assert(HllEstimator.registerRho((1L << 60) - 1, P)._1 == 4095)
  }

  test("estimate is invariant to partition count (merge ≡ single pass)") {
    import spark.implicits._
    val ids = (1 to 5000).map(i => s"user$i")
    val results = Seq(1, 7, 32).map { parts =>
      ids.toDF("id").repartition(parts)
        .agg(SketchAggregates.hllDistinct(TextFunctions.hash64(col("id")), P))
        .head.getLong(0)
    }
    assert(results.distinct.size == 1, s"partition-dependent estimates: $results")
  }

  test("accuracy across both branches: |est - n|/n within 3x rsd") {
    import spark.implicits._
    // n=150 and n=2000 exercise linear counting; n=30000 the raw
    // harmonic branch (e_raw > 2.5m). rsd = 1.04/sqrt(4096) = 0.0163.
    for (n <- Seq(150, 2000, 30000)) {
      val est = (1 to n).map(i => s"u$i").toDF("id")
        .agg(SketchAggregates.hllDistinct(TextFunctions.hash64(col("id")), P))
        .head.getLong(0)
      val err = math.abs(est - n).toDouble / n
      info(f"n=$n est=$est err=$err%.4f")
      assert(err <= 0.05, f"HLL error $err%.4f above 0.05 at n=$n")
    }
  }

  test("estimator branch selection is the exact-integer predicate") {
    // all-zero registers: V=m, e_raw small -> linear counting with
    // ln(m/m)=0 -> estimate 0
    assert(HllEstimator.estimate(P, new Array[Byte](1 << P)) == 0L)
    // one register at rho 1, rest zero: linear counting of V=m-1
    val one = new Array[Byte](1 << P); one(0) = 1
    val m = 1 << P
    val expected = (m.toLong * HllEstimator.lnBits(m, m - 1)) >> 30
    assert(HllEstimator.estimate(P, one) == expected)
  }
}
