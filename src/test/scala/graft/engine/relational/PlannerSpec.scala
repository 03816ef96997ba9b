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

  test("ladder: the BYTE budget gates the broadcast on its own — rows " +
      "within budget but bytes over flip the rung; unknown bytes (0) " +
      "keep the rows-only behavior") {
    // rows fit (999 <= 1000) but 5 MB of payload > the 1 KB budget
    val tightBytes = Config(broadcastMaxRows = 1000L, skewFactor = 4.0,
      shufflePartitions = 32, broadcastMaxBytes = 1024L)
    assert(chooseJoin(KeyProfile(1000000L, 50000L, 80000000L),
      KeyProfile(999L, 999L, 5000000L), tightBytes) == SortMerge)
    // same profiles, roomy byte budget: broadcast again
    assert(chooseJoin(KeyProfile(1000000L, 50000L, 80000000L),
      KeyProfile(999L, 999L, 5000000L), cfg) == BroadcastHash)
    // bytes unknown: the byte gate must not veto what rows allow
    assert(chooseJoin(KeyProfile(1000000L, 50000L),
      KeyProfile(999L, 999L), tightBytes) == BroadcastHash)
    // boundary: exactly at the byte budget still broadcasts
    assert(chooseJoin(KeyProfile(1000000L, 50000L, 80000000L),
      KeyProfile(999L, 999L, 1024L), tightBytes) == BroadcastHash)
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
    // byte facts: id = 8 B x 500 non-nulls; kind = 2 octets x 500 —
    // keyProfile sums the PROFILED COLUMNS (the side's payload), so both
    // columns report the same table-level estimate
    assert(id.bytes == 500L * 8L + 500L * 2L, s"got ${id.bytes}")
    assert(kind.bytes == id.bytes)
    intercept[IllegalArgumentException] {
      keyProfile(spark, root, "nope")
    }
  }

  test("staleness: keyProfile refuses a version-tracked profile the " +
      "source store has advanced past, and an untracked profile when " +
      "asked to prove freshness") {
    import graft.engine.sources.SnapshotStore
    val dir = s"${System.getProperty("java.io.tmpdir")}/" +
      s"planner_stale_${ProcessHandle.current().pid()}"
    SnapshotStore.deleteRecursively(java.nio.file.Paths.get(dir))
    val (src, prof) = (s"$dir/src", s"$dir/prof")
    val batch1 = (1L to 100L).map(i => (i, i % 7)).toDF("id", "grp")
    SnapshotStore.publishBucketed(batch1, src, "id", 2) // src v1
    TableStats.refreshProfile(
      SnapshotStore.read(spark, src).select("id"), prof, Seq("id"),
      sourceVersion = SnapshotStore.currentVersion(src))
    // fresh: the watermark matches CURRENT
    assert(keyProfile(spark, prof, "id", Some(src)).rows == 100L)
    // the store advances; the profile silently describes v1
    SnapshotStore.append(
      (101L to 300L).map(i => (i, i % 7)).toDF("id", "grp"), src) // v2
    val e = intercept[IllegalArgumentException] {
      keyProfile(spark, prof, "id", Some(src))
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // without the source root the read still serves (untracked use)
    assert(keyProfile(spark, prof, "id").rows == 100L)
    // refresh the delta with the new watermark: fresh again, facts merged
    TableStats.refreshProfile(
      SnapshotStore.readSince(spark, src, 1L).get.select("id"),
      prof, Seq("id"), sourceVersion = SnapshotStore.currentVersion(src))
    assert(keyProfile(spark, prof, "id", Some(src)).rows == 300L)
    // an untracked profile cannot prove freshness: asked to, it refuses
    val prof2 = s"$dir/prof2"
    TableStats.refreshProfile(batch1, prof2, Seq("id"))
    val e2 = intercept[IllegalArgumentException] {
      keyProfile(spark, prof2, "id", Some(src))
    }
    assert(e2.getMessage.contains("not version-tracked"), e2.getMessage)
  }

  test("starJoin: dims ordered most-selective-first from the profiles, " +
      "every fitting dim broadcast, result equals the naive join, " +
      "missing keys refused") {
    val fact = (1L to 4000L).map(i => (i % 100, i % 40, i.toDouble))
      .toDF("k1", "k2", "v")
    val d1 = (0L until 100L).map(k => (k, s"a$k")).toDF("k1", "a")
    val d2 = (0L until 10L).map(k => (k, s"b$k")).toDF("k2", "b")
    val dims = Seq(
      // survival fractions: k1 100/100 = 1.0, k2 10/40 = 0.25 — the
      // planner must flip the given order and put k2 first
      Dim(d1, "k1", KeyProfile(4000L, 100L), KeyProfile(100L, 100L)),
      Dim(d2, "k2", KeyProfile(4000L, 40L), KeyProfile(10L, 10L)))
    val (out, choices) = starJoin(fact, dims, col("v"), cfg)
    assert(choices.map(_._1) == Seq("k2", "k1"),
      s"selective-first ordering expected, got $choices")
    assert(choices.forall(_._2 == BroadcastHash))
    val expected = fact.join(d2, Seq("k2")).join(d1, Seq("k1"))
      .groupBy("a").count().orderBy("a").collect().toSeq
    assert(out.groupBy("a").count().orderBy("a").collect().toSeq == expected)
    import graft.tools.PlanAudit
    assert(PlanAudit.hasBroadcastHashJoin(out))
    intercept[IllegalArgumentException] {
      starJoin(fact, Seq(Dim(d1, "nope",
        KeyProfile(1L, 1L), KeyProfile(1L, 1L))), col("v"))
    }
  }

  test("starJoin composes with filteredProfile: a histogram-estimated " +
      "filter flips a dim's ordering AND its broadcast rung") {
    val fact = (1L to 4000L).map(i => (i % 100, i % 40, i.toDouble))
      .toDF("k1", "k2", "v")
    val d1Raw = (0L until 100L).map(k => (k, s"a$k")).toDF("k1", "a")
    val d2 = (0L until 10L).map(k => (k, s"b$k")).toDF("k2", "b")
    // raw, d1 refuses the 50-row budget and sorts LAST (survival 1.0)
    val tight = Config(broadcastMaxRows = 50L)
    val rawD1 = Dim(d1Raw, "k1", KeyProfile(4000L, 100L),
      KeyProfile(100L, 100L))
    val dimD2 = Dim(d2, "k2", KeyProfile(4000L, 40L), KeyProfile(10L, 10L))
    val (_, rawChoices) = starJoin(fact, Seq(rawD1, dimD2), col("v"), tight)
    assert(rawChoices == Seq(
      "k2" -> BroadcastHash, "k1" -> SortMerge))
    // a 20% filter on d1 (the q153 histogram shape): the SAME star call
    // with the filtered frame and its scaled profile now orders d1
    // FIRST (survival 20/100 < 10/40) and broadcasts it
    val d1F = d1Raw.filter(col("k1") < 20L)
    val fDim = Dim(d1F, "k1", rawD1.fact,
      filteredProfile(rawD1.dim, 0.2))
    val (out, fChoices) = starJoin(fact, Seq(fDim, dimD2), col("v"), tight)
    assert(fChoices == Seq(
      "k1" -> BroadcastHash, "k2" -> BroadcastHash))
    val expected = fact.join(d1F, Seq("k1")).join(d2, Seq("k2"))
      .groupBy("b").count().orderBy("b").collect().toSeq
    assert(out.groupBy("b").count().orderBy("b").collect().toSeq
      == expected)
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
    val expected = rollup(large.join(small, Seq("k")))
    assert(rollup(bc) == expected)
    assert(rollup(sm) == expected)
    assert(rollup(sa) == expected)
    // structural plan pins AFTER the actions, so AQE's FINAL plan is
    // what gets walked (q147's idiom — no plan-string matching)
    import graft.tools.PlanAudit
    assert(PlanAudit.hasBroadcastHashJoin(bc))
    assert(PlanAudit.hasSortMergeJoin(sm))
    assert(PlanAudit.hasSaltedJoin(sa))
    assert(!PlanAudit.hasSaltedJoin(bc) && !PlanAudit.hasSortMergeJoin(bc),
      "pins must be selective, not vacuous")
  }
}
