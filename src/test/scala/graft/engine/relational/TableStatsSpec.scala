package graft.engine.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** TableStats contracts: exact-mode values against hand-computed truth
  * (nulls included), approx mode's HLL bounds, the one-scan plan shape,
  * and the type refusals. */
class TableStatsSpec extends AnyFunSuite {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")),
    (5L, Some("c")), (6L, None)
  ).toDF("id", "s")

  test("exact profile matches hand-computed stats, nulls counted out") {
    val out = TableStats.profile(df, Seq("id", "s"), exactNdv = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5))).toMap
    assert(out("id") == ((6L, 6L, 6L, "1", "6")))
    assert(out("s") == ((6L, 4L, 3L, "a", "c")),
      "nulls must not count as values, min/max ignore them")
  }

  test("approx profile: counts exact, ndv within HLL tolerance") {
    val wide = (0L until 5000L).map(i => (i, s"v${i % 997}"))
      .toDF("id", "s")
    val out = TableStats.profile(wide, Seq("s")).collect().head
    assert(out.getLong(1) == 5000L && out.getLong(2) == 5000L)
    val ndv = out.getLong(3)
    assert(math.abs(ndv - 997.0) / 997.0 < 0.1, s"ndv $ndv vs 997")
  }

  test("one scan feeds every column's stats (single aggregate, no union)") {
    val plan = TableStats.profile(df, Seq("id", "s"), exactNdv = true)
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.length == 1, s"profile must scan once, saw ${scans.length}")
    assert(!plan.toString.contains("Union"),
      "long format must come from inline, not a per-column UNION of scans")
  }

  test("incremental profile == one-shot profile, across type-mixed " +
      "batches, with tagged replay absorbed") {
    val root = java.nio.file.Files
      .createTempDirectory("tablestats_inc").toString + "/tbl"
    // batch 2 extends both ranges and adds nulls; key orders differ from
    // string order (10 < 9 as longs, "10" < "9" as strings — the typed
    // min/max path is what keeps this correct)
    val b0 = Seq((9L, Some("m")), (10L, Some("b"))).toDF("id", "s")
    val b1 = Seq((2L, None), (40L, Some("z"))).toDF("id", "s")
    val b2 = Seq((1L, Some("a"))).toDF("id", "s")
    TableStats.refreshProfile(b0, root, Seq("id", "s"), tag = Some("t0"))
    TableStats.refreshProfile(b1, root, Seq("id", "s"), tag = Some("t1"))
    TableStats.refreshProfile(b2, root, Seq("id", "s"), tag = Some("t2"))
    TableStats.refreshProfile(b1, root, Seq("id", "s"), tag = Some("t1")) // replay
    val got = TableStats.readProfile(spark, root).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(got("id") == ((5L, 5L, 5L, "1", "40")),
      s"typed long min/max must not be string-ordered: ${got("id")}")
    assert(got("s") == ((5L, 4L, 4L, "a", "z")))
    assert(graft.engine.sources.SnapshotStore.currentVersion(root) == 3L,
      "the replayed tagged refresh must mint no version")
  }

  test("float columns and unknown columns are refused") {
    val f = Seq((1L, 1.5)).toDF("id", "d")
    assert(intercept[IllegalArgumentException] {
      TableStats.profile(f, Seq("d"))
    }.getMessage.contains("string/integral"))
    assert(intercept[IllegalArgumentException] {
      TableStats.profile(f, Seq("nope"))
    }.getMessage.contains("no such columns"))
  }
}
