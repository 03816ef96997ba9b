package graft.engine.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark
import graft.engine.sources.SnapshotStore

/** Torn-restart contract for the x68/x69 dead-letter router (VERDICT r15
  * item 1): kill the router at EITHER torn position inside a tick —
  * after the tagged appends but before the watermark-ledger write, or
  * after the ledger write — restart, replay the last epoch (Structured
  * Streaming's at-least-once contract), and the routing of the replayed
  * AND remaining ticks must be row-identical to an uninterrupted run.
  * The SnapshotStore torn-append spec is the template; here the state
  * under test is the watermark ledger rather than a staged version. */
class LateRouterSpec extends AnyFunSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def ev(id: Long, t: String, typ: String, v: Double) =
    Streaming.Event(id, ts(t), id, typ, v)

  /** Deterministic ticks with KNOWN late rows (10 min delay, 1 h windows):
    * tick 0 advances the watermark to 12:50, so tick 1's event 4 (window
    * 10:00–11:00) is late; tick 1 advances it to 13:50, so tick 2's
    * event 7 (window 12:00–13:00) is late. Events 5/8 stay on-time. */
  private val tick0 = Seq(
    ev(1, "2026-01-01 10:05:00", "view", 1.0),
    ev(2, "2026-01-01 10:35:00", "click", 2.0),
    ev(3, "2026-01-01 13:00:00", "view", 3.0))
  private val tick1 = Seq(
    ev(4, "2026-01-01 10:15:00", "view", 4.0), // LATE under wm=12:50
    ev(5, "2026-01-01 12:30:00", "click", 5.0), // on-time (window open)
    ev(6, "2026-01-01 14:00:00", "view", 6.0)) // advances wm to 13:50
  private val tick2 = Seq(
    ev(7, "2026-01-01 12:10:00", "click", 7.0), // LATE under wm=13:50
    ev(8, "2026-01-01 14:30:00", "view", 8.0))

  private def freshRoots(tag: String): (String, String, String) = {
    val base = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_lrspec_${tag}_${ProcessHandle.current().pid()}"
    SnapshotStore.deleteRecursively(java.nio.file.Paths.get(base))
    (s"$base/quar", s"$base/agg", s"$base/wm")
  }

  private def route(t: Seq[Streaming.Event], batchId: Long,
      roots: (String, String, String)): Unit =
    LateRouter.routeTick(t.toDF(), batchId, roots._1, roots._2, roots._3)

  /** Full observable state: quarantined rows, merged window aggregates,
    * and the version counters of both stores. */
  private def snapshot(roots: (String, String, String))
      : (Set[(Long, Long, String, Double)],
         Set[(Long, String, Long, BigDecimal)], Long, Long) = {
    val (quarRoot, aggRoot, _) = roots
    val quar = SnapshotStore.read(spark, quarRoot)
      .select(col("event_id"), col("win_start"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    val agg = SnapshotStore.read(spark, aggRoot)
      .groupBy(col("win_start"), col("event_type"))
      .agg(sum(col("n_events")).cast("long").as("n"),
        sum(col("sum_dec")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDecimal(3))))
      .toSet
    (quar, agg, SnapshotStore.currentVersion(quarRoot),
      SnapshotStore.currentVersion(aggRoot))
  }

  test("wmFor recovery rule: replayed tick gets wmBefore, next tick " +
      "gets wmAfter, fresh ledger gets MinValue, over-horizon throws") {
    val (_, _, dir) = freshRoots("wmfor")
    assert(LateRouter.wmFor(dir, 0L) == Long.MinValue)
    LateRouter.record(dir, 7L, 100L, 200L)
    assert(LateRouter.wmFor(dir, 7L) == 100L) // replay of the recorded tick
    assert(LateRouter.wmFor(dir, 8L) == 200L) // normal progression
    val e = intercept[IllegalStateException](LateRouter.wmFor(dir, 3L))
    assert(e.getMessage.contains("epoch"))
  }

  test("uninterrupted run: the fixture has teeth — both late events " +
      "quarantined, on-time mass in the agg store") {
    val roots = freshRoots("base")
    route(tick0, 0, roots); route(tick1, 1, roots); route(tick2, 2, roots)
    val (quar, agg, _, _) = snapshot(roots)
    assert(quar.map(_._1) == Set(4L, 7L),
      s"expected events 4 and 7 quarantined, got ${quar.map(_._1)}")
    assert(agg.toSeq.map(_._3).sum == 6L,
      "six on-time events must be in the aggregate store")
  }

  test("torn restart AFTER the ledger write: replaying the last tick " +
      "routes row-identically (wmBefore, not the post-tick watermark)") {
    val base = freshRoots("torn-a-ref")
    route(tick0, 0, base); route(tick1, 1, base); route(tick2, 2, base)
    val torn = freshRoots("torn-a")
    route(tick0, 0, torn)
    route(tick1, 1, torn) // tick completed: appends AND ledger on disk
    // -- crash + restart: the engine replays epoch 1, then proceeds --
    route(tick1, 1, torn)
    route(tick2, 2, torn)
    assert(snapshot(torn) == snapshot(base),
      "replayed routing must be row-identical to the uninterrupted run")
  }

  test("torn restart BEFORE the ledger write (appends landed, watermark " +
      "transition lost): replay still routes row-identically") {
    val base = freshRoots("torn-b-ref")
    route(tick0, 0, base); route(tick1, 1, base); route(tick2, 2, base)
    val torn = freshRoots("torn-b")
    route(tick0, 0, torn)
    // simulate the crash window: run tick 1, then restore the ledger to
    // its pre-tick state — the tagged appends stay, the wm write is lost
    val ledger = java.nio.file.Paths.get(torn._3, "WM")
    val preTick = java.nio.file.Files.readAllBytes(ledger)
    route(tick1, 1, torn)
    java.nio.file.Files.write(ledger, preTick)
    // -- restart: replay epoch 1 (appends are tagged no-ops; the routing
    // decision re-derives the SAME wmAfter-of-tick-0 cutoff), continue --
    route(tick1, 1, torn)
    route(tick2, 2, torn)
    assert(snapshot(torn) == snapshot(base),
      "lost-ledger replay must re-derive the same routing")
  }

  test("corrupt ledger fails LOUDLY, naming the file and its contents") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-router-corrupt").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "WM"),
      "garbage not-a-number".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalStateException] { LateRouter.recover(dir) }
    assert(e.getMessage.contains(dir) &&
      e.getMessage.contains("garbage not-a-number"),
      s"diagnosable error must name ledger and contents: ${e.getMessage}")
  }
}
