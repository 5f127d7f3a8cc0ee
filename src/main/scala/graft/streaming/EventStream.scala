package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twin of the event analytics (SURVEY.md §2):
  * the same tumbling-window aggregation and gap sessionization as the
  * batch queries `events_window_agg` / `events_sessionize`, expressed
  * over an unbounded stream with bounded state.
  *
  * Input contract: an events frame with `ts` as nanos-since-epoch long
  * (Tables.events), `user_id`, `event_type`, `value`.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(sessionId: Long, lastTsSec: Long,
      nEvents: Long, startSec: Long, sumValue: Double)

  final case class SessionOut(user_id: Long, session_id: Long,
      n_events: Long, session_start_s: Long, session_end_s: Long,
      sum_value: Double)

  final case class EwmaState(ewma: Double, n: Long)
  final case class EwmaOut(user_id: Long, n_events: Long, ewma: Double)

  /** Streaming per-user EWMA (α = 1/2): the stateful twin of the
    * batch `events_ewma`. State is two numbers per user — O(users),
    * never O(events); each micro-batch folds its rows in
    * (ts, event_id) order into the recurrence and emits the user's
    * updated smoothed value. The batch query uses the truncated-lag
    * form because its DuckDB replay must be bit-exact; the stream
    * keeps the natural recurrence — per-key sequential state is
    * exactly where the recurrence form is the right shape, and no
    * cross-engine replay contract applies. Out-of-order arrivals
    * WITHIN a micro-batch are sorted; across batches the state
    * evolves in arrival order, the standard streaming trade. */
  def ewmaStream(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[EwmaOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaOut](GroupStateTimeout.NoTimeout) {
        (user, it, state) =>
          var st = state.getOption.getOrElse(EwmaState(0.0, 0L))
          it.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            st =
              if (st.n == 0L) EwmaState(e.value, 1L)
              else EwmaState(0.5 * e.value + 0.5 * st.ewma, st.n + 1L)
          }
          state.update(st)
          EwmaOut(user, st.n, st.ewma)
      }
  }

  /** Streaming trending heavy hitters: per tumbling window, the top-k
    * hottest items (event types here; domains/tokens in production)
    * via the mergeable SpaceSaving sketch
    * ([[graft.functions.SketchAggregates.heavyHitters]]) — the state
    * store holds ONE capacity-bounded sketch per window, not a
    * per-item count map, so cardinality of the item domain never
    * grows state; micro-batch partials merge exactly like the batch
    * twin text_topk_sketch's shuffle combine. Append mode: a window's
    * top-k emits once, when the watermark closes it. */
  def trendingTopK(events: DataFrame, capacity: Int = 64, k: Int = 3): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_ts", "30 minutes")
      .groupBy(window(col("ts_ts"), "1 hour"))
      .agg(graft.functions.SketchAggregates
        .heavyHitters(col("event_type"), capacity, k).as("top"))
      .select(
        unix_timestamp(col("window.start")).as("bucket_start"),
        col("top"))

  /** Streaming exact dedup: drop re-deliveries of the same content
    * hash within the watermark horizon — the streaming twin of
    * Dedup.exact. Uses dropDuplicatesWithinWatermark so the state
    * store actually evicts keys past the horizon (a plain
    * dropDuplicates on the key alone keeps every hash forever).
    * `tsCol` must be a TimestampType event-time column. */
  def dedupStream(docs: DataFrame, tsCol: String, contentCol: String,
      horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("__content_key", graft.operators.Dedup.contentKey(col(contentCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__content_key")
      .drop("__content_key")

  /** Stream-stream interval join: each purchase matched to clicks by
    * the same user within the preceding hour. Both sides carry
    * watermarks and the join condition bounds the time range, so
    * Spark can evict buffered state from both sides — the unbounded-
    * state trap of stream-stream joins is closed by construction. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withColumn("c_ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("c_ts", "1 hour")
      .select(col("user_id").as("c_user"), col("c_ts"),
        col("event_id").as("click_id"))
    val p = purchases
      .withColumn("p_ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("p_ts", "1 hour")
      .select(col("user_id").as("p_user"), col("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"), col("value"))
  }

  /** Abandonment detection: every click matched LEFT OUTER against
    * purchases by the same user within the following hour — clicks
    * with no purchase emit with a null purchase once the watermark
    * proves no match can still arrive (the outer-side emission is
    * watermark-gated by construction; state on both sides is evicted
    * past the horizon, the same bounded-state contract as
    * [[clickToPurchase]]). The streaming form of the funnel's
    * drop-off stage. */
  def abandonedClicks(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withColumn("c_ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("c_ts", "1 hour")
      .select(col("user_id").as("c_user"), col("c_ts"),
        col("event_id").as("click_id"))
    val p = purchases
      .withColumn("p_ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("p_ts", "1 hour")
      .select(col("user_id").as("p_user"), col("p_ts"),
        col("event_id").as("purchase_id"))
    c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("purchase_id").isNull.as("abandoned"))
  }

  /** Tumbling 1-hour windows with a 30-minute watermark: late events
    * beyond the watermark are dropped, so state is bounded by
    * (#windows in watermark horizon) × (#event types). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_ts", "30 minutes")
      .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
      // DECIMAL accumulation: addition is associative+commutative, so
      // the aggregate is bit-identical no matter how micro-batches
      // slice the rows — what puts this twin on the HASH oracle gate
      // (stream_window_agg) instead of a tolerance check
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("__sum_dec"))
      .select(
        unix_timestamp(col("window.start")).as("bucket_start"),
        col("event_type"), col("n_events"),
        col("__sum_dec").cast("double").as("sum_value"))

  /** Windowed streaming quantiles via the KLL sketch aggregate
    * ([[graft.functions.SketchAggregates.quantileSketch]]): the sketch
    * is a TypedImperativeAggregate, so the state store holds ONE
    * ~3k-item serialized buffer per (window × event_type) — bounded
    * state for an unbounded value domain, where an exact streaming
    * quantile would have to buffer every row. Same shape as
    * [[windowedCounts]]; each output row is (bucket, type, p,
    * estimate) with the usual O(1/k) rank error. */
  def windowedQuantiles(events: DataFrame, ps: Seq[Double] = Seq(0.5, 0.95),
      k: Int = 200): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_ts", "30 minutes")
      .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
      .agg(graft.functions.SketchAggregates.quantileSketch(col("value"), k, ps).as("qs"))
      .select(
        unix_timestamp(col("window.start")).as("bucket_start"),
        col("event_type"), posexplode(col("qs")).as(Seq("pos", "value")))
      .select(col("bucket_start"), col("event_type"),
        element_at(typedLit(ps), col("pos") + 1).as("p"), col("value"))

  /** Gap sessionization (30-min idle) with explicit per-user state via
    * flatMapGroupsWithState. In production pass
    * `GroupStateTimeout.ProcessingTimeTimeout` so idle users are
    * evicted (state stays O(active users)); under a synchronous test
    * harness use `NoTimeout` — processing-time timeouts keep the
    * no-data micro-batch loop alive, which stalls
    * `processAllAvailable`. */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val withTimeout = timeout != GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        sessionFn(gapSec, withTimeout))
  }

  /** State transition: events inside the gap extend the open session;
    * a gap emits the closed session and opens a new one. Events must
    * arrive time-ordered per user (upstream watermark + sort, or the
    * batch twin's window ordering).
    *
    * Timeout eviction emits the open session but keeps a zero-event
    * tombstone (the session counter) for one more timeout period, so
    * a returning user continues numbering instead of reusing
    * session_id 1; (user_id, session_start_s) is the globally stable
    * session key either way. */
  def sessionFn(gapSec: Long, withTimeout: Boolean)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    if (state.hasTimedOut) {
      state.getOption match {
        case Some(s) if s.nEvents > 0 =>
          out += SessionOut(userId, s.sessionId, s.nEvents, s.startSec, s.lastTsSec, s.sumValue)
          state.update(s.copy(nEvents = 0, sumValue = 0.0))
          state.setTimeoutDuration(gapSec * 1000)
        case _ =>
          state.remove()
      }
    } else {
      var cur = state.getOption
      events.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
        val sec = e.ts / 1000000000L
        cur match {
          case Some(s) if s.nEvents > 0 && sec - s.lastTsSec <= gapSec =>
            cur = Some(s.copy(lastTsSec = sec, nEvents = s.nEvents + 1,
              sumValue = s.sumValue + e.value))
          case Some(s) =>
            // gap, or a post-timeout tombstone (already emitted):
            // only emit a real open session, always advance the counter
            if (s.nEvents > 0) {
              out += SessionOut(userId, s.sessionId, s.nEvents, s.startSec, s.lastTsSec, s.sumValue)
            }
            cur = Some(SessionState(s.sessionId + 1, sec, 1, sec, e.value))
          case None =>
            cur = Some(SessionState(1, sec, 1, sec, e.value))
        }
      }
      cur.foreach(state.update)
      if (withTimeout) state.setTimeoutDuration(gapSec * 1000)
    }
    out.iterator
  }
}
