package graft.engine.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (X5): the same event-window semantics as the
  * batch queries q25–q27, expressed as streaming transforms, plus a custom
  * stateful sessionizer via flatMapGroupsWithState.
  *
  * All transforms take an *unbounded* DataFrame (from readStream) — or a
  * bounded one for batch twin testing; the logical plan is identical, which
  * is what keeps batch and stream answers consistent.
  *
  * Scale posture: state is keyed by (window, event_type) or user_id — both
  * well-distributed; watermarks bound state size (late data beyond the
  * delay is dropped, on time is merged), so a 100 TB/day stream holds state
  * proportional to the active window count, not the history.
  */
object Streaming {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Not private and with unambiguous field names: the state encoder
    * generates Janino code against this class. */
  final case class SessionAcc(sessStart: Timestamp, sessLast: Timestamp,
      cnt: Long, total: Double)

  /** Tumbling 1-hour counts per event type (streaming twin of q25). The
    * value sum goes through [[graft.engine.relational.Exact.dsum]] (decimal
    * accumulate, double emit) so the answer is bit-identical to the batch
    * twin and its DuckDB oracle regardless of partial-aggregation order. */
  def tumblingCounts(events: DataFrame, watermarkDelay: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(graft.engine.relational.Exact.lcount().as("n_events"),
        graft.engine.relational.Exact.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding windows (streaming twin of q26). */
  def slidingCounts(events: DataFrame, watermarkDelay: String = "10 minutes")
      : DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("n_events"), col("sum_value"))

  /** Built-in session windows per user (streaming twin of q27). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup (X1 on a stream): drop events whose id was
    * already seen, with state bounded by the watermark —
    * `dropDuplicatesWithinWatermark` evicts seen-keys older than the delay,
    * so state is O(events per watermark window), not O(stream history). */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream–static enrichment join (X5): each streaming event picks up its
    * user's dimension attributes. The static side is broadcast, so the
    * unbounded side never shuffles and no join state accumulates (unlike
    * stream–stream joins); the dim is re-resolved per micro-batch, which is
    * exactly the slowly-changing-dimension behavior a 100 TB/day pipeline
    * wants. Left join: events with no dim row pass through with nulls
    * rather than silently dropping. */
  def enrichWithUserDim(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(col("c_custkey").as("user_id"),
        col("c_name"), col("c_nationkey"))),
      Seq("user_id"), "left")

  /** Enriched windowed rollup: tumbling counts per nation — the typical
    * "join then aggregate" streaming shape (twin of running the same plan
    * on the bounded table). */
  def enrichedTumblingByNation(events: DataFrame, customers: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    enrichWithUserDim(events, customers)
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("c_nationkey"))
      .agg(graft.engine.relational.Exact.lcount().as("n_events"),
        graft.engine.relational.Exact.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("c_nationkey"),
        col("n_events"), col("sum_value"))

  /** Stream–stream interval join (X5): attribute each click to the views
    * by the same user within the preceding `joinWindow` of event time.
    * Both sides carry watermarks and the join condition bounds the
    * event-time distance, so the join state store retains only rows inside
    * roughly [watermark − joinWindow, now] on each side — bounded state on
    * unbounded streams, the precondition for running this against a
    * 100 TB/day event feed. Inner join: pairs are emitted as soon as both
    * rows have arrived (the watermark governs state EVICTION, not match
    * emission), so the streamed answer equals the batch twin exactly
    * regardless of micro-batch boundaries.
    */
  def intervalJoin(views: DataFrame, clicks: DataFrame,
      joinWindow: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", watermarkDelay)
    val c = clicks
      .select(col("user_id").as("click_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
      .withWatermark("click_ts", watermarkDelay)
    v.join(c,
        col("user_id") === col("click_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"interval $joinWindow"))
      .drop("click_user_id")
  }

  /** Left-outer variant: views with no click in the window are still
    * emitted (null click columns) — but only once the watermark has passed
    * `view_ts + joinWindow`, because only then can the engine prove no
    * match is coming. Unlike the inner join, output therefore depends on
    * how far the watermark advanced when the stream pauses; the spec
    * drives it with a controlled fixture.
    */
  def intervalJoinLeftOuter(views: DataFrame, clicks: DataFrame,
      joinWindow: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", watermarkDelay)
    val c = clicks
      .select(col("user_id").as("click_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
      .withWatermark("click_ts", watermarkDelay)
    v.join(c,
        col("user_id") === col("click_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"interval $joinWindow"),
        "left_outer")
      .drop("click_user_id")
  }

  /** Custom stateful sessionization: flatMapGroupsWithState keyed by user.
    * A session CLOSES (and is emitted) when a later event arrives more than
    * `gapMinutes` after the session's last event; the open session stays in
    * state. Demonstrates explicit state management where session_window's
    * built-in semantics wouldn't fit (e.g. value-dependent gaps).
    */
  def sessionizeWithState(events: Dataset[Event], gapMinutes: Long = 30)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionAcc]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val closed = Seq.newBuilder[SessionOut]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts.getTime - s.sessLast.getTime < gapMs =>
                cur = Some(SessionAcc(s.sessStart, e.ts, s.cnt + 1, s.total + e.value))
              case Some(s) =>
                closed += SessionOut(userId, s.sessStart, s.sessLast, s.cnt, s.total)
                cur = Some(SessionAcc(e.ts, e.ts, 1L, e.value))
              case None =>
                cur = Some(SessionAcc(e.ts, e.ts, 1L, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
