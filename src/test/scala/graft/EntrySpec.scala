package graft

import graft.pipeline.Multimodal

class EntrySpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every inventory query runs and returns rows at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        if (fn(spark, Sf).count() > 0) None else Some(s"$name: 0 rows")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("every oracle key exists in queries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, orphans.toString)
  }

  test("multimodal decode pipeline preserves rows and emits features") {
    implicit val s = spark
    val media = Multimodal.mediaRecords(Tables.documents(spark, Sf).limit(30))
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 30)
    assert(feats.forall(_.feature.length == Multimodal.DecodeStub.FeatureDim))
    assert(feats.forall(f => f.byte_len > 0 && f.width >= 64 && f.height >= 64))
  }
}
