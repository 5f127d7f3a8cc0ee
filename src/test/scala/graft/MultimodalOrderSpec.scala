package graft

/** The mm_* global-order invariant, pinned as a measured fact
  * (ADVICE r11): the decode plans end in `sortWithinPartitions` over
  * range-disjoint partitions, which is a GLOBAL order only while
  * every operator between the `repartitionByRange` exchange and the
  * final sort stays narrow and the consumer reads partitions in index
  * order. A future edit inserting any exchange below the sort would
  * silently demote it to per-partition order — this spec catches that
  * with the cause named, instead of an opaque downstream oracle-hash
  * mismatch. */
class MultimodalOrderSpec extends SparkSpec {

  private def assertGloballySorted(name: String): Unit = {
    val ids = SparkEntry.queries(name)(spark, Sf)
      .select("doc_id").collect().map(_.getLong(0))
    assert(ids.nonEmpty, s"$name returned no rows")
    val sorted = ids.sliding(2).forall(w => w.length < 2 || w(0) <= w(1))
    assert(sorted, s"$name doc_id sequence is not globally sorted — an " +
      "exchange was inserted below the final sortWithinPartitions " +
      "(the range-partition order invariant broke)")
  }

  test("mm_audio_decode output is globally doc_id-sorted (narrow post-exchange invariant)") {
    assertGloballySorted("mm_audio_decode")
  }

  test("mm_image_decode output is globally doc_id-sorted") {
    assertGloballySorted("mm_image_decode")
  }

  test("mm_frame_sample output is globally (doc_id, frame_idx)-sorted") {
    val rows = SparkEntry.queries("mm_frame_sample")(spark, Sf)
      .select("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.sliding(2).forall(w => w.length < 2 ||
      implicitly[Ordering[(Long, Long)]].lteq(w(0), w(1))),
      "mm_frame_sample (doc_id, frame_idx) sequence is not globally sorted")
  }
}
