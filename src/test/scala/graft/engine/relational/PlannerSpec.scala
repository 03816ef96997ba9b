package graft.engine.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** [[Planner]] contracts: the decision ladder is a pure function of the
  * profiles (broadcast beats salt beats sort-merge, side symmetry), the
  * profile reader round-trips a maintained store, and each choice's
  * execution is result-identical with the plan shape it promises. */
class PlannerSpec extends AnyFunSuite {
  import Planner._
  import spark.implicits._

  private val cfg = Config(broadcastMaxRows = 1000L, skewFactor = 4.0,
    shufflePartitions = 32)

  test("ladder: broadcast when the smaller side fits, regardless of skew") {
    assert(chooseJoin(KeyProfile(1000000L, 5L), KeyProfile(999L, 999L),
      cfg) == BroadcastHash)
    // symmetric: small side may arrive as `left`
    assert(chooseJoin(KeyProfile(999L, 999L), KeyProfile(1000000L, 5L),
      cfg) == BroadcastHash)
    // boundary: exactly at the budget still broadcasts
    assert(chooseJoin(KeyProfile(5000L, 100L), KeyProfile(1000L, 100L),
      cfg) == BroadcastHash)
  }

  test("ladder: salted when nothing fits AND the big side's NDV cannot " +
      "fill the shuffle; bucket count spreads keys over the width") {
    chooseJoin(KeyProfile(1000000L, 5L), KeyProfile(2000L, 100L), cfg) match {
      case Salted(b) =>
        assert(b == 7, s"ceil(32/5) buckets expected, got $b") // 32/5 -> 7
      case other => fail(s"expected Salted, got $other")
    }
    // NDV 1 (the degenerate hottest key): full shuffle width
    chooseJoin(KeyProfile(1000000L, 1L), KeyProfile(2000L, 100L), cfg) match {
      case Salted(b) => assert(b == 32)
      case other => fail(s"expected Salted, got $other")
    }
    // the skew test reads the BIG side's NDV, whichever argument it is
    assert(chooseJoin(KeyProfile(2000L, 100L), KeyProfile(1000000L, 5L), cfg)
      .isInstanceOf[Salted])
  }

  test("ladder: sort-merge when nothing fits and the key disperses") {
    assert(chooseJoin(KeyProfile(1000000L, 50000L),
      KeyProfile(2000L, 1999L), cfg) == SortMerge)
    // threshold: NDV == partitions/skewFactor (8) is NOT skewed
    assert(chooseJoin(KeyProfile(1000000L, 8L), KeyProfile(2000L, 100L),
      cfg) == SortMerge)
  }

  test("keyProfile round-trips a maintained TableStats store") {
    val root = s"${System.getProperty("java.io.tmpdir")}/" +
      s"planner_spec_${ProcessHandle.current().pid()}/prof"
    graft.engine.sources.SnapshotStore.deleteRecursively(
      java.nio.file.Paths.get(root))
    val df = (1L to 500L).map(i => (i, s"t${i % 3}")).toDF("id", "kind")
    TableStats.refreshProfile(df, root, Seq("id", "kind"))
    val id = keyProfile(spark, root, "id")
    assert(id.rows == 500L)
    assert(math.abs(id.keyNdv - 500L) <= 25L, s"HLL ndv ~500: ${id.keyNdv}")
    val kind = keyProfile(spark, root, "kind")
    assert(kind.rows == 500L && kind.keyNdv == 3L)
    intercept[IllegalArgumentException] {
      keyProfile(spark, root, "nope")
    }
  }

  test("join: all three shapes produce identical results, each with its " +
      "promised plan") {
    val large = (1L to 5000L).map(i => (i % 40, i.toDouble))
      .toDF("k", "v")
    val small = (0L until 40L).map(k => (k, s"g${k % 4}")).toDF("k", "g")
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(20,1)")).as("s"))
        .orderBy("g").collect().toSeq
    val bc = Planner.join(large, small, "k", BroadcastHash, col("v"))
    val sm = Planner.join(large, small, "k", SortMerge, col("v"))
    val sa = Planner.join(large, small, "k", Salted(6), col("v"))
    assert(bc.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(sm.queryExecution.executedPlan.toString
      .contains("SortMergeJoin"))
    assert(sa.queryExecution.executedPlan.toString.contains("_salt"))
    val expected = rollup(large.join(small, Seq("k")))
    assert(rollup(bc) == expected)
    assert(rollup(sm) == expected)
    assert(rollup(sa) == expected)
  }
}
