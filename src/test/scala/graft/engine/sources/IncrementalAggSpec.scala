package graft.engine.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark
import graft.tools.{PlanAudit, PlanCaptureUtil}

/** IncrementalAgg contracts: refresh-by-refresh maintenance equals a full
  * recompute (nulls and all-null groups included), versions accumulate
  * and time-travel, key mismatches are refused, tagged replays are
  * exactly-once (addition is NOT idempotent — the tag guard is what makes
  * an at-least-once caller safe), and — the scale posture — a refresh
  * whose delta touches one bucket reads the store through a `_bucket`
  * membership filter, audited on the actually-executed plans. */
class IncrementalAggSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"inc_agg_$tag").toString + "/tbl"

  test("three refreshes == one full recompute, exact decimal sums") {
    val root = freshRoot("equality")
    // 90 rows, 9 keys, values with nulls; key 'knull' is ALL-null → s = 0
    val rows = (0 until 90).map { i =>
      val k = if (i % 10 == 9) "knull" else s"k${i % 9}"
      val v: Option[Double] =
        if (i % 10 == 9 || i % 7 == 0) None else Some(i * 0.1)
      (i.toLong, k, v)
    }
    val df = rows.toDF("id", "k", "v")
    for (r <- 0 until 3)
      IncrementalAgg.refresh(df.filter(col("id") % 3 === r).select("k", "v"),
        root, "k", "v")
    val got = IncrementalAgg.read(spark, root).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2))).toMap
    val want = df.groupBy("k")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("v").cast(DecimalType(38, 6))), lit(0))
          .cast(DecimalType(38, 6)).as("s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2))).toMap
    assert(got == want)
    assert(got("knull")._2.compareTo(java.math.BigDecimal.ZERO) == 0,
      "all-null group must read 0, not NULL")
    assert(SnapshotStore.currentVersion(root) == 3L)
    // time travel: v1 is batch-0's aggregate alone
    val v1 = SnapshotStore.read(spark, root, version = 1L)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(v1 == 30L, s"v1 must hold only the first batch's counts, got $v1")
  }

  test("a one-bucket delta reads the store through a _bucket membership " +
      "filter (plan-audited), and untouched buckets hardlink-carry") {
    val root = freshRoot("prune")
    val base = (0 until 64).map(i => (s"key$i", 1.0)).toDF("k", "v")
    IncrementalAgg.refresh(base, root, "k", "v", nBuckets = 16)
    val delta = Seq(("key1", 5.0), ("key1", 7.0)).toDF("k", "v")
    val (_, captured) = PlanCaptureUtil.capturing(spark) {
      IncrementalAgg.refresh(delta, root, "k", "v")
    }
    val violations = captured.flatMap { case (fn, qe) =>
      PlanAudit.unprunedStoreScans(qe.executedPlan, root).map(v => s"[$fn] $v")
    }
    assert(violations.isEmpty,
      s"refresh executed an unpruned store scan:\n${violations.mkString("\n")}")
    assert(captured.exists { case (_, qe) =>
      PlanAudit.storeScans(qe.executedPlan, root).nonEmpty },
      "audit must OBSERVE the pruned store read (nothing captured = " +
        "nothing gated)")
    val updated = IncrementalAgg.read(spark, root)
      .filter(col("k") === "key1").collect().head
    assert(updated.getLong(1) == 3L &&
      updated.getDecimal(2).doubleValue() == 13.0)
  }

  test("a replayed tagged refresh is exactly-once: no double-add") {
    val root = freshRoot("replay")
    val b0 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val b1 = Seq(("a", 10.0)).toDF("k", "v")
    IncrementalAgg.refresh(b0, root, "k", "v", tag = Some("batch-0"))
    IncrementalAgg.refresh(b1, root, "k", "v", tag = Some("batch-1"))
    // the at-least-once replays: same data, same tags — all no-ops
    IncrementalAgg.refresh(b1, root, "k", "v", tag = Some("batch-1"))
    IncrementalAgg.refresh(b0, root, "k", "v", tag = Some("batch-0"))
    assert(SnapshotStore.currentVersion(root) == 2L,
      "replays must mint no versions")
    val out = IncrementalAgg.read(spark, root).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue()))
      .toMap
    assert(out == Map("a" -> ((2L, 11.0)), "b" -> ((1L, 2.0))),
      s"replay double-added: $out")
  }

  test("refreshing with the wrong key column is refused") {
    val root = freshRoot("wrongkey")
    IncrementalAgg.refresh(Seq(("a", 1.0)).toDF("k", "v"), root, "k", "v")
    val ex = intercept[IllegalArgumentException] {
      IncrementalAgg.refresh(Seq((1.0, "a")).toDF("v", "k2"),
        root, "k2", "v")
    }
    assert(ex.getMessage.contains("aggregates by"))
  }

  test("CONCURRENT refreshes of one hot key lose no addition (the " +
      "read-add-merge interleave retries on the pinned base)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.DurationInt
    val root = freshRoot("race")
    IncrementalAgg.refresh(Seq(("hot", 1.0)).toDF("k", "v"),
      root, "k", "v", nBuckets = 4)
    // four writers, three refreshes each, ALL on the same key — without
    // the pinned-base retry, interleaved read-add-merge cycles replace
    // each other's sums (addition is not idempotent: last-writer-wins
    // here is silent data loss, not convergence)
    val writers = (1 to 4).map { w =>
      Future {
        (0 until 3).foreach { i =>
          IncrementalAgg.refresh(
            Seq(("hot", 1.0), (s"w$w", w.toDouble)).toDF("k", "v"),
            root, "k", "v", tag = Some(s"w$w-$i"))
        }
      }
    }
    Await.result(Future.sequence(writers), 180.seconds)
    val out = IncrementalAgg.read(spark, root)
      .select(col("k"), col("n"),
        col("s").cast("double").as("s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("hot") == ((13L, 13.0)),
      s"a concurrent addition was lost: ${out("hot")}")
    (1 to 4).foreach(w =>
      assert(out(s"w$w") == ((3L, w * 3.0)), s"w$w: ${out.get(s"w$w")}"))
  }
}
