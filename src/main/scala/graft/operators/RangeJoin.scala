package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — the time-window join Spark has no native
  * strategy for: pairs `(l, r)` sharing equi-`keys` with
  * `r.time ∈ (l.time + lo, l.time + hi]`.
  *
  * Declared naively (`ON key AND r.t BETWEEN ...`), Catalyst plans
  * the inequality as a per-key nested loop: every left row scans
  * every right row of its key — quadratic on a hot key, the classic
  * 100 TB straggler. Banding makes it an EQUI-join: bucket both
  * sides into time bands at least one window wide, explode each left
  * row to the (at most 2) consecutive bands its window can touch,
  * join on (keys, band), then apply the exact window predicate.
  * Candidate volume is bounded by same-band co-residents per key —
  * window density, never per-key all-pairs.
  *
  * Band width is the window width rounded UP to a power of two, so
  * banding is `shiftright(t, k)` — arithmetic shift IS floor-division
  * by 2^k, exact for every long including negatives. No double
  * rounding anywhere (a `floor(t / w)` band would silently misplace
  * rows once |t| exceeds 2^53 — raw-nanosecond timestamps already
  * do). The ≤2× wider band admits a few more same-band non-matches;
  * the exact predicate removes them.
  *
  * Column names of `left` and `right` must be disjoint apart from
  * `keys` (standard join hygiene — rename before calling).
  */
object RangeJoin {

  /** Matched pairs (all left columns + right non-key columns) with
    * `right(rTime) ∈ (left(lTime)+lo, left(lTime)+hi]`. Inner join:
    * unmatched left rows are absent (aggregate with a later
    * left-join against `left` for outer semantics). */
  def banded(left: DataFrame, right: DataFrame, keys: Seq[String],
      lTime: String, rTime: String, lo: Long, hi: Long): DataFrame = {
    require(hi > lo, s"empty window: ($lo, $hi]")
    // the helper band column must not collide with caller data — a
    // silent withColumn overwrite would corrupt (then drop) user data
    require(!left.columns.contains("__band") && !right.columns.contains("__band"),
      "__band is reserved by RangeJoin.banded; rename the input column")
    val w = hi - lo
    // ceil log2: smallest k with 2^k >= w (w >= 1 here)
    val k = 64 - java.lang.Long.numberOfLeadingZeros(math.max(w - 1, 1))
    val r = right.withColumn("__band", shiftright(col(rTime), k))
    val l = left.withColumn("__band",
      explode(array_distinct(array(
        shiftright(col(lTime) + lo, k),
        shiftright(col(lTime) + hi, k)))))
    l.join(r, keys :+ "__band")
      .filter(col(rTime) > col(lTime) + lo && col(rTime) <= col(lTime) + hi)
      .drop("__band")
  }
}
