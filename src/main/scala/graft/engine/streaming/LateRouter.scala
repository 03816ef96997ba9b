package graft.engine.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The x68/x69 dead-letter router, RESTART-SAFE (VERDICT r15 item 1).
  *
  * The router's only state is the replayed watermark — max event-time ms
  * of PRIOR ticks minus the delay, the same algebra the engine applies
  * inside its stateful aggregation (x67 pins it engine-side). r15 held it
  * in a driver-side `AtomicLong`, which meant a checkpoint-resume replayed
  * the last tick against `Long.MinValue` and routed everything as on-time:
  * the tagged appends kept the WRITES no-ops, but the routing DECISION for
  * the replayed tick differed from the original run. This object closes
  * that gap by checkpointing the watermark with the tick, exactly as a
  * production `foreachBatch` sink checkpoints its own offsets.
  *
  * Mechanics — one tiny ledger file per router, written write-temp +
  * atomic-rename (the SnapshotStore CURRENT pointer discipline, so a
  * reader sees the old or the new record, never a torn one), carrying
  * `(batchId, wmBefore, wmAfter)`:
  *
  *  - `wmBefore` is the watermark tick `batchId` ROUTED WITH (derived from
  *    ticks < batchId);
  *  - `wmAfter` folds tick `batchId`'s own event times in — the watermark
  *    the NEXT tick must route with.
  *
  * Recovery rule ([[wmFor]]), covering both torn positions of a crash
  * inside [[routeTick]] under Structured Streaming's replay-the-last-epoch
  * contract:
  *
  *  - ledger records this very batchId → the crash happened AFTER the
  *    ledger write; the engine replays the tick, and it must route with
  *    `wmBefore` — the same cutoff the original attempt used;
  *  - ledger records an EARLIER batchId → normal progression (or a crash
  *    between the appends and the ledger write — the appends are tagged
  *    no-ops on replay); route with `wmAfter`;
  *  - no ledger → first tick ever: `Long.MinValue` (nothing can be late
  *    before any event time has been seen);
  *  - ledger records a LATER batchId → the caller replayed past the
  *    one-epoch horizon; fail loudly rather than mis-route (the same
  *    horizon contract `SnapshotStore.versionTags` documents for tags).
  *
  * Either way the routing of every tick — live, replayed, or resumed — is
  * a pure function of (ledger, tick), which is what the torn-restart spec
  * pins: kill the router at each torn position, restart, and the
  * replayed+remaining ticks route row-identically to an uninterrupted run.
  */
object LateRouter {

  /** One recorded tick: the watermark it routed with and the one it
    * hands to its successor. */
  final case class WmRecord(batchId: Long, wmBefore: Long, wmAfter: Long)

  private def ledgerFile(ledgerDir: String) = Paths.get(ledgerDir, "WM")

  /** Last recorded tick, None before the first [[record]]. */
  def recover(ledgerDir: String): Option[WmRecord] = {
    val f = ledgerFile(ledgerDir)
    if (!Files.exists(f)) None
    else {
      val raw = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val parts = raw.trim.split("\\s+")
      // loud failure on a malformed ledger (matches wmFor's over-horizon
      // posture): a bare MatchError/NumberFormatException here would hide
      // WHICH file is corrupt and what it held. The write path is
      // tmp+atomic-rename so this indicates external damage, not a torn
      // write — refuse rather than guess a watermark.
      if (parts.length != 3 || !parts.forall(_.matches("-?\\d+")))
        throw new IllegalStateException(
          s"late-router ledger $f is corrupt: expected '<batchId> " +
            s"<wmBefore> <wmAfter>', found '${raw.trim.take(200)}'")
      Some(WmRecord(parts(0).toLong, parts(1).toLong, parts(2).toLong))
    }
  }

  /** Atomically persist tick `batchId`'s watermark transition. */
  def record(ledgerDir: String, batchId: Long, wmBefore: Long,
      wmAfter: Long): Unit = {
    Files.createDirectories(Paths.get(ledgerDir))
    val tmp = Paths.get(ledgerDir, s".WM.tmp.${System.nanoTime()}")
    Files.write(tmp, s"$batchId $wmBefore $wmAfter"
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, ledgerFile(ledgerDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The watermark tick `batchId` must route with — see the recovery rule
    * in the object scaladoc. */
  def wmFor(ledgerDir: String, batchId: Long): Long =
    recover(ledgerDir) match {
      case None => Long.MinValue
      case Some(r) if r.batchId == batchId => r.wmBefore
      case Some(r) if r.batchId < batchId => r.wmAfter
      case Some(r) => throw new IllegalStateException(
        s"late-router ledger at $ledgerDir records batch ${r.batchId} but " +
          s"batch $batchId was replayed — more than one epoch behind; " +
          "streaming replays only the most recent epoch, so this router " +
          "(like SnapshotStore tags) keeps exactly one tick of history")
    }

  /** Route ONE tick through the dead-letter split: rows whose 1 h window
    * already closed under the replayed watermark append to the quarantine
    * store, on-time rows fold window partials into the aggregate store —
    * both as per-tick TAGGED appends (at-least-once replays are no-ops) —
    * then the watermark transition is checkpointed. Idempotent per
    * (batchId, batch): safe to call from a replayed `foreachBatch` epoch.
    *
    * Scale posture unchanged from r15: both stores bucketed on win_start,
    * the quarantine append O(late rows), the agg append O(open windows),
    * the ledger O(1) — never corpus-sized.
    */
  def routeTick(batch: DataFrame, batchId: Long, quarRoot: String,
      aggRoot: String, ledgerDir: String, delayMs: Long = 600000L): Unit = {
    import graft.engine.sources.SnapshotStore
    val b = batch
      .withColumn("win_start",
        (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long"))
      .localCheckpoint()
    val wm = wmFor(ledgerDir, batchId)
    val late = b.filter(Streaming.lateFor(col("win_start"), wm))
    val kept = b.filter(!Streaming.lateFor(col("win_start"), wm))
    if (!late.isEmpty) {
      val rows = late.select(col("event_id"), col("win_start"),
        col("event_type"), col("value"))
      if (SnapshotStore.currentVersion(quarRoot) == 0)
        SnapshotStore.publishBucketed(rows, quarRoot, "win_start",
          nBuckets = 4, tag = Some(s"batch-$batchId"))
      else SnapshotStore.append(rows, quarRoot,
        tag = Some(s"batch-$batchId"))
    }
    val partials = kept
      .groupBy(col("win_start"), col("event_type"))
      .agg(graft.engine.relational.Exact.lcount().as("n_events"),
        graft.engine.relational.Exact.dsumPartial(col("value"))
          .as("sum_dec"))
      .localCheckpoint()
    if (!partials.isEmpty) {
      if (SnapshotStore.currentVersion(aggRoot) == 0)
        SnapshotStore.publishBucketed(partials, aggRoot,
          "win_start", nBuckets = 4, tag = Some(s"batch-$batchId"))
      else SnapshotStore.append(partials, aggRoot,
        tag = Some(s"batch-$batchId"))
    }
    // advance AFTER routing: the cutoff for tick N derives from ticks < N,
    // exactly the engine's watermark timing — and persist the transition
    // so a restart re-derives this tick's cutoff instead of MinValue
    record(ledgerDir, batchId, wm,
      Streaming.advanceWatermarkMs(wm, b, "ts", delayMs))
  }
}
