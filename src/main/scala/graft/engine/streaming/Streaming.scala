package graft.engine.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset}
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

  /** The late predicate of x68's dead-letter router on 1 h tumbling
    * windows, in the engine's own milliseconds algebra: a row is LATE iff
    * its window END (ms) <= the watermark (ms) — the same `<=` eviction
    * comparison the engine applies inside its stateful aggregation
    * (x67's oracle replays it; StreamingSpec pins the router and the
    * engine drop the SAME rows on an exact-boundary fixture). */
  def lateFor(winStart: Column, wmMs: Long): Column =
    (winStart + 3600L) * 1000L <= wmMs

  /** Fold one tick into a REPLAYED watermark: max event-time ms seen so
    * far minus the delay. Event times truncate to milliseconds exactly
    * as the engine's event-time stats do; callers advance AFTER routing
    * a tick, matching the engine's update timing (the watermark used for
    * batch N derives from batches < N). */
  def advanceWatermarkMs(prev: Long, batch: DataFrame, tsCol: String,
      delayMs: Long): Long = {
    val mx = batch.agg(max(floor(unix_micros(col(tsCol)) / 1000))
      .cast("long")).head()
    if (mx.isNullAt(0)) prev else math.max(prev, mx.getLong(0) - delayMs)
  }

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

  /** ALWAYS-ON end-to-end curation — the streaming twin of the q88 batch
    * pipeline, the shape a production training-data ingest actually runs
    * continuously. Per micro-batch (`foreachBatch` is the idiomatic
    * stream→complex-batch-op→versioned-table composition):
    *
    *  1. JSONL lines arrive via the file source under the DECLARED schema;
    *     corrupt lines are routed to a quarantine sink (x58's contract).
    *  2. Exact dedup: within-and-across micro-batches through
    *     `dropDuplicatesWithinWatermark` state (bounded by the watermark),
    *     and against PREVIOUSLY PUBLISHED versions by an anti-join on the
    *     corpus store's content keys.
    *  3. Incremental near-dup against the published BANDED signature
    *     snapshot (q91's store posture: history exists only as its
    *     signature table, and the bucketed band table contributes zero
    *     exchanges to the candidate join). Candidate pairs at estimated
    *     Jaccard ≥ `threshold` are dropped once VERIFIED by content-key
    *     equality against the history keys — the exact regime x59 pins.
    *  4. Survivors append-publish to the SnapshotStore as a new version:
    *     the first batch bootstraps a ck-bucketed store, every later batch
    *     lands through [[graft.engine.sources.SnapshotStore.merge]], so
    *     unchanged buckets are carried over without a rewrite.
    *
    * State/scale posture: stream state is the watermark-bounded seen-key
    * store; the history side never re-signs or re-scans (signatures +
    * band table are read-only snapshots); per-tick store cost is the
    * merge's touched buckets — INCLUDING the cross-version dedup read:
    * the anti-join's store side is pruned to the batch's own `_bucket`
    * set (a directory-level partition filter, never a full corpus-key
    * scan), so the whole tick's store I/O is bounded by touched buckets
    * at any corpus size. The caller owns the fixed event-time column
    * (`ts`) — a real deployment uses arrival time; the harness pins a
    * constant so replays are deterministic.
    *
    * Delivery posture: `foreachBatch` is AT-LEAST-ONCE — a micro-batch
    * whose offsets committed but whose epoch did not is RE-EXECUTED on
    * restart. Every per-tick side effect here is idempotent under that
    * replay: the quarantine write lands in a per-`batchId` directory with
    * overwrite semantics (a retry replaces its own output, never
    * appends a duplicate), and the store publish is key-idempotent — the
    * replayed batch's survivors are all already published, so the
    * cross-version anti-join empties the batch and `merge`'s empty-batch
    * no-op mints no extra version (StreamingSpec kills a committed tick's
    * epoch and proves both).
    *
    * Bootstrap recall guard: the candidate stage truncates existing-side
    * band buckets at `maxBucketSize` (bounded-memory collector), so an
    * overflowing bucket could silently hide a true history duplicate.
    * One job at stream START (never per tick) asserts no `exBanded`
    * bucket exceeds the cap — the verified-drop contract is only claimed
    * when it provably holds.
    *
    * Returns the started query; callers drive it (processAllAvailable)
    * and then read `storeRoot` / `quarantineDir` (quarantine parquet is
    * nested per batch — read it with `recursiveFileLookup`). Pass
    * `checkpointDir` to make the query restartable: a new call with the
    * same checkpoint + store resumes exactly where the last one stopped.
    * WITHOUT a checkpoint the restart guarantees above do NOT hold — a
    * restarted query re-numbers batches from 0, so the per-`batchId`
    * quarantine overwrite rewrites `batch-0..` while the old run's higher
    * `batch-N` dirs linger as stale duplicates, and the store's no-op
    * replay protection never engages (every batch is "new"). A missing
    * checkpoint logs a warning; it is acceptable only for run-once
    * harness drives that never restart.
    *
    * `nBuckets` sizes the bootstrap store's `_bucket` partitioning, which
    * is what the per-tick touched-bucket pruning prunes AGAINST. The
    * default 8 suits the harness corpus; at production scale size it to
    * corpus/tick ratio (buckets >> distinct buckets a tick's keys hash
    * into — e.g. 4096 for a corpus thousands of times a tick), or the
    * "per-tick I/O ∝ touched buckets" posture degenerates to a full scan
    * because every tick touches all 8.
    *
    * `compactEvery` (0 = never) runs [[graft.engine.sources.SnapshotStore
    * .compact]] after every Nth tick's publish, rewriting only buckets
    * past `compactMaxFilesPerBucket` files — the maintenance half of the
    * per-tick merge contract (q104): without it, file counts in hot
    * buckets grow by ≥ 1 per tick forever. Compaction is
    * content-preserving and no-ops when clean, so replays stay safe. */
  def streamingCuration(spark: org.apache.spark.sql.SparkSession,
      inputDir: String, docSchema: org.apache.spark.sql.types.StructType,
      exBanded: DataFrame, exSigs: DataFrame, exKeys: DataFrame,
      storeRoot: String, quarantineDir: String,
      threshold: Double = 1.0, maxBucketSize: Int = 10000,
      readOptions: Map[String, String] = Map.empty,
      checkpointDir: Option[String] = None,
      nBuckets: Int = 8,
      compactEvery: Int = 0,
      compactMaxFilesPerBucket: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(compactEvery >= 0, "compactEvery must be >= 0 (0 = never)")
    if (checkpointDir.isEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "streamingCuration started WITHOUT a checkpointDir: restart " +
          "semantics (store no-op replay, per-batchId quarantine " +
          "idempotence) require one — a restarted query re-numbers " +
          "batches from 0 and leaves the old run's quarantine dirs as " +
          "stale duplicates. Run-once harness use only.")
    import graft.engine.llm.Dedup
    import graft.engine.sources.{Jsonl, SnapshotStore}
    val overflowing = exBanded
      .groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("n_in_bucket"))
      .filter(col("n_in_bucket") > maxBucketSize)
    require(overflowing.isEmpty,
      s"existing-side band buckets overflow maxBucketSize=$maxBucketSize: " +
        "the capped candidate collector would truncate them and a true " +
        "history duplicate could slip through undetected; raise the cap " +
        "or exact-dedup the history first")
    val corrupt = col(Jsonl.corruptCol)
    val stream = Jsonl
      .readJsonlStream(spark, inputDir, docSchema, readOptions)
      .withColumn("ck", Dedup.contentKey(col("text")))
      // constant event time: the watermark bounds state in production; a
      // pinned ts makes the harness replay-deterministic. Dedup key spans
      // both routes — distinct corrupt lines must NOT collapse with docs.
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("dkey",
        when(corrupt.isNull, concat(lit("c:"), col("ck")))
          .otherwise(concat(lit("q:"), md5(corrupt.cast("binary")))))
    val deduped = dedupWithinWatermark(stream, Seq("dkey"))
    val writer = deduped.writeStream
      .outputMode("append")
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        // every later action re-executes the micro-batch plan (file scan +
        // parse + state-store read); checkpoint ONCE so the quarantine
        // write materializes it and everything downstream reads blocks
        val batch = rawBatch.localCheckpoint(eager = false)
        val quarantined = batch.filter(corrupt.isNotNull)
          .select(corrupt.as("raw"))
        // quarantine is rare-by-construction: one file per tick, not one
        // per shuffle partition (narrow coalesce, no extra exchange). Per-
        // batchId dir + overwrite = an at-least-once replay REPLACES its
        // own earlier output instead of appending duplicate raw lines
        quarantined.coalesce(1).write.mode("overwrite")
          .parquet(s"$quarantineDir/batch-$batchId")
        val docs = batch.filter(corrupt.isNull)
          .select(col("doc_id"), col("text"), col("ck"))
        // history near-dups: banded candidates, drops verified by content
        // key (exact regime — identical text implies identical signature
        // implies a guaranteed band collision)
        val inSigs = Dedup.minHashSignatures(docs, "text", "doc_id")
        // At threshold >= 1.0 the estimate stage is provably redundant
        // (identical text => identical signatures => est 1.0, and the
        // content-key verification below is strictly stronger), so the
        // tick runs the candidate stage alone — two signature joins and a
        // zip_with kernel saved per tick. Below 1.0 the full estimated-
        // Jaccard path runs, exactly as q91 pins it.
        val cand =
          if (threshold >= 1.0) Dedup.incrementalNearDupCandidatesBanded(
            inSigs, exBanded, maxBucketSize = maxBucketSize)
          else Dedup.incrementalMinHashNearDupsBanded(
            inSigs, exBanded, exSigs,
            threshold = threshold, maxBucketSize = maxBucketSize)
            .select(col("id_in"), col("id_ex"))
        // candidate pairs are band collisions — bounded per tick at any
        // corpus size — so THEY are the broadcast side of every
        // verification join (AQE can't be relied on inside foreachBatch:
        // it's disabled on the streaming plan); history-sized frames
        // (exKeys) are never broadcast
        val histDrops = broadcast(cand
          .join(docs.select(col("doc_id").as("id_in"), col("ck")), Seq("id_in")))
          .join(exKeys, Seq("id_ex"))
          .filter(col("ck") === col("ck_ex"))
          .select(col("id_in").as("doc_id")).distinct()
        val fresh = docs.join(broadcast(histDrops), Seq("doc_id"), "left_anti")
        // cross-version dedup: anything a PREVIOUS tick already published.
        // The store is ck-bucketed (`_bucket` is a physical partition
        // column), so the anti-join only needs store rows whose bucket a
        // batch ck could hash into: prune the store side to the batch's
        // own bucket set — a directory-level partition filter computed by
        // one tiny census job over the checkpointed batch (docs ⊇ fresh,
        // so its bucket set is a safe superset). Per-tick store I/O is
        // thereby ∝ touched buckets, matching merge's own posture — never
        // a full published-corpus key scan + shuffle
        // spec AND data pinned to ONE version (bucketSpecAt(base) +
        // read(base)): resolved separately, a rebucket landing in
        // between would prune this anti-join by the WRONG buckets —
        // silent duplicate re-admission, not an error
        val survivorsBase = SnapshotStore.currentVersion(storeRoot)
        val survivorsPlan =
          if (survivorsBase == 0L) fresh
          else {
            val (storeKey, nb) =
              SnapshotStore.bucketSpecAt(storeRoot, survivorsBase)
                .getOrElse(throw new IllegalStateException(
                  s"$storeRoot published but not bucketed: the curation " +
                    "stream always bootstraps via publishBucketed"))
            require(storeKey == "ck",
              s"store $storeRoot is bucketed on '$storeKey', expected 'ck'")
            val touched = docs
              .select(SnapshotStore.bucketExpr("ck", nb).as("_bucket"))
              .distinct().collect().map(_.getInt(0)).toSeq
            fresh.join(
              SnapshotStore.read(spark, storeRoot, survivorsBase)
                .filter(col("_bucket").isin(touched.map(Int.box): _*))
                .select(col("ck")),
              Seq("ck"), "left_anti")
          }
        // no emptiness probe, no extra checkpoint: the publish write (or
        // merge's own batch checkpoint + empty-census no-op) materializes
        // the signature+band+anti-join pipeline exactly once per tick.
        // ck-distinctness is structural — the watermark dedup state admits
        // one row per content key
        if (SnapshotStore.currentVersion(storeRoot) == 0L)
          SnapshotStore.publishBucketed(survivorsPlan, storeRoot, "ck",
            nBuckets = nBuckets)
        else SnapshotStore.merge(survivorsPlan, storeRoot,
          keysAreDistinct = true)
        // small-files maintenance: every merge writes >= 1 fresh file into
        // each touched bucket, so an always-on stream fragments its hot
        // buckets without bound. With compactEvery > 0, every Nth tick
        // rewrites ONLY the buckets past compactMaxFilesPerBucket (driver
        // listings find them; `_bucket` directory pruning bounds the read)
        // and hardlinks the rest — work is bounded by the fragmentation
        // the threshold admitted, amortized across the N ticks that built
        // it. Content-preserving, so an at-least-once replay can at worst
        // mint one extra content-equal layout version (compact no-ops when
        // every bucket is already under the threshold).
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          SnapshotStore.compact(spark, storeRoot, compactMaxFilesPerBucket)
        ()
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
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
