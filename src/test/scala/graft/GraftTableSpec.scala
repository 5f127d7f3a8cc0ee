package graft

import java.nio.file.Files

import graft.sources.GraftTable
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The ACID table format's contract: atomic commits, snapshot
  * isolation, time travel, serializable mutations vs lock-free
  * appends, copy-on-write delete, checkpoint-bounded replay, vacuum
  * retention, and stat-based file skipping. */
class GraftTableSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft_table_spec").resolve("t").toString

  private def rows(lo: Int, hi: Int): DataFrame = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"doc_$i", i * 2.0)).toDF("id", "name", "score")
  }

  test("create + append are visible; version counts commits") {
    val t = GraftTable.create(spark, fresh(), rows(0, 100), statsCols = Seq("id"))
    assert(t.version == 1L)
    assert(t.read().count() == 100)
    t.append(rows(100, 150))
    assert(t.version == 2L)
    assert(t.read().count() == 150)
    assert(t.read().agg(sum("id")).head.getLong(0) == (0L until 150).sum)
  }

  test("snapshot isolation: a resolved read never sees later commits") {
    val t = GraftTable.create(spark, fresh(), rows(0, 50))
    val snap = t.read() // file list resolved here
    t.append(rows(50, 80))
    assert(snap.count() == 50, "pre-append snapshot must stay at 50 rows")
    assert(t.read().count() == 80)
    assert(t.read(atVersion = 1L).count() == 50, "time travel to v1")
  }

  test("concurrent appends: every committer lands, versions stay contiguous") {
    val t = GraftTable.create(spark, fresh(), rows(0, 10))
    val threads = (0 until 4).map { k =>
      new Thread(() => t.append(rows(100 + k * 10, 110 + k * 10)))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(t.version == 5L, "4 appends after create → version 5")
    assert(t.read().count() == 50)
  }

  test("delete is copy-on-write: untouched files survive by reference") {
    val p = fresh()
    val t = GraftTable.create(spark, p, rows(0, 100).repartition(4), statsCols = Seq("id"))
    val before = t.snapshotMetas().map(_.path).toSet
    assert(before.size == 4)
    // delete rows that live in (at most) a subset of files: find a file's
    // id range from its stats and delete exactly inside it
    val victim = t.snapshotMetas().head
    val lo = victim.stats("id")._1.toLong
    t.delete(col("id") === lo)
    val after = t.snapshotMetas().map(_.path).toSet
    assert((before -- after).size == 1, "exactly the victim file rewritten")
    assert((after -- before).nonEmpty, "survivor rows land in a new file")
    assert(t.read().count() == 99)
    assert(t.read().filter(col("id") === lo).count() == 0)
  }

  test("delete keeps NULL-predicate rows (SQL DELETE semantics)") {
    import spark.implicits._
    val p = fresh()
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("id", "tag")
    val t = GraftTable.create(spark, p, df)
    t.delete(col("tag") === "a")
    val left = t.read().select("id").collect().map(_.getLong(0)).sorted
    assert(left.toSeq == Seq(2L, 3L), "NULL predicate must keep the row")
  }

  test("overwrite replaces content; old version still time-travels") {
    val t = GraftTable.create(spark, fresh(), rows(0, 30))
    t.overwrite(rows(500, 510))
    assert(t.read().count() == 10)
    assert(t.read().agg(min("id")).head.getLong(0) == 500L)
    assert(t.read(atVersion = 1L).count() == 30, "pre-overwrite snapshot intact")
  }

  test("compact preserves content and cuts file count") {
    val t = GraftTable.create(spark, fresh(), rows(0, 40).repartition(8))
    t.append(rows(40, 80).repartition(8))
    assert(t.snapshotMetas().size == 16)
    val sumBefore = t.read().agg(sum("id")).head.getLong(0)
    t.compact(targetBytes = 1L << 30) // everything into one bin
    assert(t.snapshotMetas().size == 1)
    assert(t.read().agg(sum("id")).head.getLong(0) == sumBefore)
  }

  test("serializable mutations: a commit landing after the base snapshot aborts the mutation") {
    val p = fresh()
    val t = GraftTable.create(spark, p, rows(0, 20))
    val t2 = GraftTable.open(spark, p)
    // t2 resolves its base snapshot at v1, then t's append claims v2
    // first — t2's mutation commit at v2 must lose and abort, never
    // silently drop t's rows (the lost-update anomaly)
    val staleBase = t2.version
    t.append(rows(20, 30))
    val e = intercept[java.util.ConcurrentModificationException] {
      t2.commitOnce(Nil, Nil, staleBase)
    }
    assert(e.getMessage.contains("committed concurrently"))
    assert(t.read().count() == 30, "the winning append's rows survive")
  }

  test("vacuum drops unreferenced files; retained time travel still works") {
    val p = fresh()
    val t = GraftTable.create(spark, p, rows(0, 50), checkpointInterval = 100)
    t.overwrite(rows(100, 120)) // v2: v1's files now unreferenced
    t.append(rows(120, 130))    // v3
    val deleted = t.vacuum(retainVersions = 2) // keep v2, v3
    assert(deleted > 0, "v1's files must be physically removed")
    assert(t.read().count() == 30)
    assert(t.read(atVersion = 2L).count() == 20, "retained version readable")
    intercept[Exception] { t.read(atVersion = 1L).count() } // files gone
  }

  test("restore rolls content back as a new commit; history stays travelable") {
    val t = GraftTable.create(spark, fresh(), rows(0, 50), statsCols = Seq("id"))
    t.delete(col("id") < 10)    // v2: COW rewrite
    t.append(rows(100, 120))    // v3
    val v = t.restore(1L)       // v4: content == v1, zero data moved
    assert(v == 4L && t.version == 4L)
    assert(t.read().agg(sum("id")).head.getLong(0) == (0L until 50).sum,
      "restored snapshot must equal version 1's content")
    // the rolled-back history is still THERE (restore ≠ rewind)
    assert(t.read(atVersion = 3L).count() == 60)
    assert(t.read(atVersion = 2L).count() == 40)
    // no-op restore: content already matches
    assert(t.restore(1L) == 4L, "restoring to identical content must not commit")
  }

  test("addColumns: schema-on-read evolution — old rows read NULL, time travel keeps old schema") {
    import org.apache.spark.sql.types._
    val t = GraftTable.create(spark, fresh(), rows(0, 20), statsCols = Seq("id"))
    val v = t.addColumns(StructType(Seq(StructField("lang", StringType))))
    assert(v == 2L)
    // pre-evolution files read with NULL in the new column
    assert(t.read().filter(col("lang").isNull).count() == 20)
    // appends validate against the widened schema and carry the column
    import spark.implicits._
    t.append(Seq((100L, "doc_100", 1.0, "en")).toDF("id", "name", "score", "lang"))
    assert(t.read().filter(col("lang") === "en").count() == 1)
    assert(t.read().count() == 21)
    // the narrow append no longer conforms
    intercept[IllegalArgumentException](t.append(rows(200, 201)))
    // time travel to v1 reads the ORIGINAL schema (no lang column)
    assert(!t.read(atVersion = 1L).columns.contains("lang"))
    assert(t.read(atVersion = 1L).count() == 20)
    // duplicate-name evolution refused
    val e = intercept[IllegalArgumentException](
      t.addColumns(StructType(Seq(StructField("score", DoubleType)))))
    assert(e.getMessage.contains("score"))
  }

  test("restore refuses a vacuumed-away version, naming the file") {
    val t = GraftTable.create(spark, fresh(), rows(0, 30), checkpointInterval = 100)
    t.overwrite(rows(100, 110)) // v2: v1's files unreferenced
    t.append(rows(110, 115))    // v3
    assert(t.vacuum(retainVersions = 2) > 0)
    val e = intercept[IllegalArgumentException](t.restore(1L))
    assert(e.getMessage.contains("vacuumed away"))
    assert(t.read().count() == 15, "failed restore must not change the table")
  }

  test("checkpoint bounds replay: snapshot equals full-log replay") {
    val p = fresh()
    val t = GraftTable.create(spark, p, rows(0, 10), checkpointInterval = 3)
    (1 to 7).foreach(k => t.append(rows(k * 10, k * 10 + 10)))
    assert(t.version == 8L)
    // a ckpt exists at v3 and v6
    val names = new java.io.File(p, "_txlog").list().toSeq
    assert(names.exists(_.endsWith(".ckpt")), s"expected checkpoints in $names")
    // replay-from-checkpoint must equal brute content
    assert(t.read().count() == 80)
    assert(t.read().agg(sum("id")).head.getLong(0) ==
      (0 until 80).map(_.toLong).sum)
    // and the same table opened cold (checkpoint path) agrees
    val cold = GraftTable.open(spark, p)
    assert(cold.snapshotMetas().toSet == t.snapshotMetas().toSet)
  }

  test("data skipping: stats prune the file list before the scan") {
    val p = fresh()
    // three commits with disjoint id ranges → one file each
    val t = GraftTable.create(spark, p, rows(0, 100).coalesce(1), statsCols = Seq("id", "name"))
    t.append(rows(100, 200).coalesce(1))
    t.append(rows(200, 300).coalesce(1))
    assert(t.snapshotMetas().size == 3)
    assert(t.candidateFiles(col("id") === 150L).size == 1)
    assert(t.candidateFiles(col("id") > 250L).size == 1)
    assert(t.candidateFiles(col("id") >= 100L && col("id") < 110L).size == 1)
    assert(t.candidateFiles(col("id") > 999L).isEmpty)
    assert(t.candidateFiles(col("id") === 150L || col("id") === 250L).size == 2)
    // string stats prune too
    assert(t.candidateFiles(col("name") === "doc_150").size < 3)
    // unsupported shapes scan everything (conservative)
    assert(t.candidateFiles(length(col("name")) > 3).size == 3)
    // and the pruned read is exact
    assert(t.readWhere(col("id") === 150L).count() == 1)
    assert(t.readWhere(col("id") > 250L).count() == 49)
    // In lists prune too (r13) — the engine's hot access pattern: every
    // probe rule and the serving doc fetch push literal id In lists
    assert(t.candidateFiles(col("id").isin(150L)).size == 1)
    assert(t.candidateFiles(col("id").isin(50L, 150L)).size == 2)
    assert(t.candidateFiles(col("id").isin(50L, 150L, 250L)).size == 3)
    assert(t.candidateFiles(col("id").isin(1000L, 2000L)).isEmpty)
    assert(t.readWhere(col("id").isin(50L, 150L)).count() == 2)
    // non-literal element → conservative full scan, result still exact
    assert(t.candidateFiles(col("id").isin(col("id"))).size == 3)
  }

  test("appendBatch is idempotent per (appId, batchId) — replayed batches are no-ops") {
    val t = GraftTable.create(spark, fresh(), rows(0, 10))
    assert(t.appendBatch(rows(10, 20), "q1", 0L) == 2L)
    assert(t.appendBatch(rows(10, 20), "q1", 0L) == -1L, "replay must skip")
    assert(t.read().count() == 20, "no duplicate rows from the replay")
    assert(t.appendBatch(rows(20, 30), "q1", 1L) == 3L)
    assert(t.appendBatch(rows(30, 40), "q2", 0L) == 4L, "other writers unaffected")
    assert(t.read().count() == 40)
    assert(t.txnWatermarks() == Map("q1" -> 1L, "q2" -> 0L))
  }

  test("txn watermarks survive checkpoints") {
    val p = fresh()
    val t = GraftTable.create(spark, p, rows(0, 10), checkpointInterval = 2)
    (0 to 4).foreach(b => t.appendBatch(rows(10 + b * 10, 20 + b * 10), "s", b))
    assert(new java.io.File(p, "_txlog").list().exists(_.endsWith(".ckpt")))
    val cold = GraftTable.open(spark, p, checkpointInterval = 2)
    assert(cold.appendBatch(rows(10, 20), "s", 3L) == -1L,
      "watermark must be visible through the checkpoint path")
    assert(cold.read().count() == 60)
  }

  test("streamAppend lands micro-batches exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = GraftTable.create(spark, fresh(), rows(0, 5))
    val input = MemoryStream[(Long, String, Double)]
    val ckpt = Files.createTempDirectory("graft_table_stream").toString
    val q = t.streamAppend(
      input.toDF().toDF("id", "name", "score"), ckpt)
    try {
      input.addData((100L, "a", 1.0), (101L, "b", 2.0))
      q.processAllAvailable()
      assert(t.read().count() == 7)
      input.addData((102L, "c", 3.0))
      q.processAllAvailable()
      assert(t.read().count() == 8)
      assert(t.read().filter(col("id") >= 100L).count() == 3)
    } finally q.stop()
  }

  test("schema is enforced on append") {
    import spark.implicits._
    val t = GraftTable.create(spark, fresh(), rows(0, 10))
    val bad = Seq((1L, "x")).toDF("id", "name") // missing score
    intercept[IllegalArgumentException] { t.append(bad) }
  }

  test("creating over an existing table fails; open round-trips schema") {
    val p = fresh()
    val t = GraftTable.create(spark, p, rows(0, 10))
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, p, rows(0, 5))
    }
    assert(GraftTable.open(spark, p).schema == t.read().schema)
  }

  test("merge upserts: matched rows replaced, unmatched inserted, " +
      "files outside the key envelope carried by reference") {
    import spark.implicits._
    val t = GraftTable.create(spark, fresh(),
      rows(0, 100).repartitionByRange(4, col("id")), statsCols = Seq("id"))
    val before = t.snapshotMetas().map(_.path).toSet
    assert(before.size == 4)
    // one update inside the first range file, one brand-new key
    val src = Seq((5L, "doc_5", -1.0), (200L, "doc_200", 7.0))
      .toDF("id", "name", "score")
    t.merge(src, Seq("id"))
    val after = t.snapshotMetas().map(_.path).toSet
    assert((before -- after).size == 1,
      "exactly the file holding the matched key is rewritten")
    assert((before & after).size == 3,
      "files the touch-detection semi-join clears are carried by reference")
    assert(t.read().count() == 101)
    assert(t.read().filter(col("id") === 5L).head.getDouble(2) == -1.0)
    assert(t.read().filter(col("id") === 200L).count() == 1)
    // the pre-merge version still time-travels to the old content
    assert(t.read(atVersion = 1L).filter(col("id") === 5L)
      .head.getDouble(2) == 10.0)
  }

  test("merge rejects duplicate source keys (SQL MERGE cardinality rule)") {
    import spark.implicits._
    val t = GraftTable.create(spark, fresh(), rows(0, 10))
    val dup = Seq((1L, "a", 0.0), (1L, "b", 1.0)).toDF("id", "name", "score")
    intercept[IllegalArgumentException] { t.merge(dup, Seq("id")) }
    assert(t.version == 1L, "a rejected merge must not commit")
  }

  test("changes() is the churn cone: delete+append surface, carried " +
      "survivors cancel, pure compact is an empty feed") {
    val t = GraftTable.create(spark, fresh(),
      rows(0, 100).repartition(4), statsCols = Seq("id"))
    t.delete(col("id") < 10)   // v2
    t.append(rows(200, 220))   // v3
    val feed = t.changes(1L).cache()
    try {
      val del = feed.filter(col("_change_type") === "delete")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val ins = feed.filter(col("_change_type") === "insert")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(del == (0L until 10L), "deletes are exactly the deleted rows")
      assert(ins == (200L until 220L), "inserts are exactly the appended rows")
    } finally { feed.unpersist(); () }
    t.compact() // v4: repack only — no row-level change
    assert(t.changes(3L).isEmpty, "compaction must yield an empty feed")
    assert(t.changes(1L, 2L).filter(col("_change_type") === "insert").isEmpty,
      "the delete-only hop has no inserts")
  }

  test("cluster (Z-order) preserves content and makes stats prune on " +
      "EVERY listed dimension") {
    import spark.implicits._
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val t = GraftTable.create(spark, fresh(),
      // linear layout: range-partitioned by x alone — selective on x,
      // useless on y (every file spans y's whole range)
      df.repartitionByRange(16, col("x")), statsCols = Seq("x", "y"))
    val yPred = col("y") >= 10L && col("y") <= 11L
    val linearCands = t.candidateFiles(yPred).size
    assert(linearCands == 16, "linear layout cannot prune a y-only predicate")
    val before = t.read()
    t.cluster(Seq("x", "y"), targetBytes = t.snapshotMetas().map(_.bytes).sum / 16)
    assert(t.read().exceptAll(before).isEmpty &&
      before.exceptAll(t.read()).isEmpty, "cluster must not change content")
    val zCands = t.candidateFiles(yPred).size
    assert(zCands < linearCands / 2,
      s"z-ordered layout must prune the y strip (got $zCands of $linearCands)")
    // and the pruned read stays exact
    assert(t.readWhere(yPred).count() == t.read().filter(yPred).count())
  }

  test("autoRecluster: streaming churn widens envelopes, the metadata trigger " +
      "fires, prune selectivity is restored, then it no-ops") {
    import spark.implicits._
    val df = (0L until 4096L).map(i => (i, i % 97)).toDF("id", "v")
    val t = GraftTable.create(spark, fresh(),
      df.repartitionByRange(8, col("id")), statsCols = Seq("id"))
    assert(t.overlapDegree("id") <= 1.01, "range layout must start disjoint")
    assert(t.autoRecluster(Seq("id")).isEmpty,
      "clustered layout must not trigger a rewrite")
    // streaming debris: each micro-batch samples the WHOLE id domain,
    // so every appended file's [min, max] spans everything
    for (k <- 1L to 4L)
      t.append(df.filter(col("id") % 7 === k)
        .withColumn("id", col("id") + lit(100000L)).repartition(2))
    val churned = t.overlapDegree("id")
    assert(churned > 4.0, s"churned overlap degree $churned not > 4")
    // mid-domain point: inside every debris file's envelope
    val pred = col("id") === 102003L
    val candsBefore = t.candidateFiles(pred).size
    assert(candsBefore >= 8, s"churned layout should scan the debris ($candsBefore)")
    val before = t.read()
    val fired = t.autoRecluster(Seq("id"), overlapFactor = 3.0,
      targetBytes = t.snapshotMetas().map(_.bytes).sum / 12)
    assert(fired.isDefined, "trigger must fire past the overlap factor")
    // content preserved, selectivity restored, trigger quiescent
    assert(t.read().exceptAll(before).isEmpty && before.exceptAll(t.read()).isEmpty)
    assert(t.overlapDegree("id") <= 1.5,
      s"reclustered degree ${t.overlapDegree("id")} not ~1")
    val candsAfter = t.candidateFiles(pred).size
    assert(candsAfter <= 2,
      s"point predicate should prune to ~1 file after recluster (got $candsAfter)")
    assert(t.autoRecluster(Seq("id"), overlapFactor = 3.0).isEmpty,
      "freshly reclustered table must no-op")
  }

  test("statsAgg answers count/min/max from the log alone and refuses " +
      "unsound metadata min/max") {
    val t = GraftTable.create(spark, fresh(),
      rows(5, 105).repartition(4), statsCols = Seq("id"))
    t.delete(col("id") >= 100L)
    val r = t.statsAgg(Seq("id")).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((95L, 5L, 99L)))
    // pre-delete snapshot still answers from its own metadata
    val r1 = t.statsAgg(Seq("id"), atVersion = 1L).head
    assert((r1.getLong(0), r1.getLong(2)) == ((100L, 104L)))
    // name has no per-file stats → min/max would be unsound → refuse
    intercept[IllegalArgumentException] { t.statsAgg(Seq("name")).collect() }
  }

  test("zkey interleaves bucket bits: quadrants order SW, SE, NW, NE") {
    import spark.implicits._
    val pts = Seq((0.2, 0.2), (0.7, 0.2), (0.2, 0.7), (0.7, 0.7))
      .toDF("x", "y")
    val z = graft.functions.ZOrder.zkey(
      Seq(col("x"), col("y")), Array(Array(0.5), Array(0.5)))
    val got = pts.select(z.as("z")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L))
  }
}
