package graft.engine.relational

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** [[Histogram]] contracts: incremental refreshes merge to the one-shot
  * histogram, the range estimate is exact on bin-aligned ranges and
  * within its own straddle bound otherwise (including negative values —
  * the floor-division edge), a drifted bin width refuses, tagged replay
  * no-ops, and [[Planner.filteredProfile]] scales monotonically. */
class HistogramSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val p = Files.createTempDirectory(s"graft-hist-$name")
    Files.delete(p)
    p.toString
  }

  test("three incremental refreshes == one-shot binning; estimates " +
      "exact when aligned, within the straddle bound otherwise") {
    val root = freshRoot("merge")
    // values 0..999, bin width 100 -> 10 bins of exactly 100 rows
    val df = spark.range(1000).select(col("id").as("v"))
    (0L to 2L).foreach { i =>
      Histogram.refresh(df.filter(pmod(col("v"), lit(3L)) === i), root,
        "v", binWidth = 100L, tag = Some(s"b$i"))
    }
    assert(Histogram.binWidth(root) == 100L)
    val bins = Histogram.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins == (0L to 9L).map(_ -> 100L).toMap)
    // aligned [200, 499]: bins 2..4 whole -> exact, zero straddle
    val a = Histogram.estimateRange(spark, root, 200L, 499L)
    assert(a.straddleRows == 0L && a.estimate == 300.0 &&
      a.totalRows == 1000L)
    assert(math.abs(a.fraction - 0.3) < 1e-12)
    // unaligned [250, 549]: true 300; interpolation exact on uniform
    // data, and the self-reported bound covers the two edge bins
    val u = Histogram.estimateRange(spark, root, 250L, 549L)
    assert(u.straddleRows == 200L)
    assert(math.abs(u.estimate - 300.0) <= u.straddleRows.toDouble)
    // out-of-domain range estimates zero
    val z = Histogram.estimateRange(spark, root, 5000L, 6000L)
    assert(z.estimate == 0.0 && z.straddleRows == 0L)
  }

  test("negative values bin by FLOOR division, not truncation") {
    val root = freshRoot("neg")
    // -10..9 at width 10: floor puts -10..-1 in bin -1, 0..9 in bin 0;
    // truncation would smear -9..9 into bin 0
    Histogram.refresh(spark.range(-10, 10).select(col("id").as("v")),
      root, "v", binWidth = 10L)
    val bins = Histogram.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins == Map(-1L -> 10L, 0L -> 10L))
    val e = Histogram.estimateRange(spark, root, -10L, -1L)
    assert(e.straddleRows == 0L && e.estimate == 10.0)
  }

  test("drifted bin width refuses; tagged replay no-ops; nulls drop") {
    val root = freshRoot("drift")
    val df = spark.range(100).select(col("id").as("v"))
    val v1 = Histogram.refresh(df, root, "v", binWidth = 10L,
      tag = Some("t1"))
    // same tag -> replayed epoch returns the applied version, adds nothing
    assert(Histogram.refresh(df, root, "v", binWidth = 10L,
      tag = Some("t1")) == v1)
    assert(Histogram.estimateRange(spark, root, 0L, 99L).totalRows == 100L)
    // a different width is a DIFFERENT histogram: the store key refuses
    val e = intercept[IllegalArgumentException] {
      Histogram.refresh(df, root, "v", binWidth = 20L)
    }
    assert(e.getMessage.contains("bin_20"))
    // null values carry no range information: dropped, not binned
    val withNulls = spark.range(10).select(
      when(col("id") < 5, col("id")).as("v"))
    val root2 = freshRoot("nulls")
    Histogram.refresh(withNulls, root2, "v", binWidth = 10L)
    assert(Histogram.estimateRange(spark, root2, 0L, 9L).totalRows == 5L)
    // non-integral columns refuse (floats are QuantileSketch territory)
    intercept[IllegalArgumentException] {
      Histogram.refresh(spark.range(5).select(col("id").cast("double")
        .as("v")), freshRoot("dbl"), "v", binWidth = 10L)
    }
    // an ALL-NULL batch no-ops at the current version ("empty mints no
    // version"); an empty bootstrap refuses loudly
    val allNull = spark.range(3).select(
      lit(null).cast("bigint").as("v"))
    val vCur = Histogram.refresh(df, root, "v", binWidth = 10L)
    assert(Histogram.refresh(allNull, root, "v", binWidth = 10L) == vCur)
    assert(Histogram.estimateRange(spark, root, 0L, 99L).totalRows == 200L)
    val eb = intercept[IllegalArgumentException] {
      Histogram.refresh(allNull, freshRoot("emptyboot"), "v", binWidth = 10L)
    }
    assert(eb.getMessage.contains("EMPTY batch"))
  }

  test("filteredProfile scales rows/bytes/NDV down, never up, never to 0") {
    import Planner._
    val p = KeyProfile(rows = 1000L, keyNdv = 100L, bytes = 8000L)
    assert(filteredProfile(p, 1.0) == p)
    assert(filteredProfile(p, 0.25) ==
      KeyProfile(rows = 250L, keyNdv = 25L, bytes = 2000L))
    // tiny fraction floors at 1, unknown bytes stay unknown
    assert(filteredProfile(KeyProfile(1000L, 100L), 1e-9) ==
      KeyProfile(1L, 1L, 0L))
    intercept[IllegalArgumentException] { filteredProfile(p, 1.5) }
    // a histogram-estimated fraction flips the ladder: raw refuses the
    // budget, the filtered profile broadcasts
    val cfg = Config(broadcastMaxRows = 500L)
    val fact = KeyProfile(100000L, 1000L)
    assert(chooseJoin(fact, p, cfg) == SortMerge)
    assert(chooseJoin(fact, filteredProfile(p, 0.25), cfg) == BroadcastHash)
  }
}
