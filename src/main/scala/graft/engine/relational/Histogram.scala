package graft.engine.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained EQUI-WIDTH HISTOGRAMS — the range-selectivity
  * fact the [[Planner]]'s profile stores were still missing.
  *
  * [[TableStats]] profiles carry rows / NDV / bytes / min / max, which is
  * enough to budget a join on the RAW tables — but the dim a real
  * pipeline joins is almost always FILTERED ("last 90 days of orders",
  * "docs above the quality cutoff"), and rows×bytes of the raw table
  * wildly over-refuses the broadcast the filtered side would earn. The
  * classic answer (System R's selectivity estimation; Catalyst's own
  * `FilterEstimation` consumes exactly this shape from ANALYZE histogram
  * stats) is a maintained histogram: estimate the filter's survival
  * fraction ahead of time, scale the profile, and budget the join on the
  * side that will actually exist.
  *
  * Design: per-bin row counts over `bin = floor(value / binWidth)`,
  * maintained as an [[graft.engine.sources.IncrementalAgg]] store — bins
  * merge ADDITIVELY under append, so maintenance is delta-cost (each
  * refresh scans its batch once, never history), replay-tagged, and
  * lost-update-safe, all inherited from the one aggregate-maintenance
  * implementation instead of re-derived here. The bin key column is
  * NAMED `bin_<width>`: IncrementalAgg's own store-key check then
  * REFUSES a refresh under a drifted width (mixed-width bins are not a
  * histogram), with no extra spec sidecar to invent.
  *
  * Scale shape: the store holds one row per OCCUPIED bin — bounded by
  * `domain span / binWidth`, a caller-chosen metadata-scale number that
  * is independent of row count (a 100 TB fact table with daily bins over
  * 10 years is ~3,650 rows). [[estimateRange]] is one narrow aggregate
  * over that table, never the data.
  *
  * Estimation contract (provable, not tuned — q153 pins both halves):
  * a bin wholly inside the range contributes its count EXACTLY; a
  * straddled edge bin contributes `count × overlap/width` (the standard
  * uniform-within-bin interpolation). The estimate's absolute error is
  * therefore at most the straddled bins' total rows — [[RangeEstimate]]
  * returns that bound alongside the estimate, so callers assert against
  * arithmetic instead of folklore. Bin-ALIGNED ranges have zero
  * straddle: their estimate is an exact count.
  */
object Histogram {

  private val BinPrefix = "bin_"

  /** The binning expression: `floor(value / width)` in EXACT long
    * arithmetic (`/` would route through double division — lossy past
    * 2^53, i.e. for epoch-microsecond values). `v div w` alone truncates
    * toward zero (wrong for negative values); subtracting the
    * non-negative `pmod` first makes the operand an exact multiple of
    * `w`, where truncation IS floor.
    *
    * Domain: values within `binWidth` of `Long.MinValue` would wrap in
    * the subtraction (and the maximal bin's `bin·w + w` upper edge in
    * [[estimateRange]] would wrap symmetrically) — out of scope for the
    * module's integral-measurement contract (epoch times, sizes, ids),
    * the same posture as ZOrder's documented span bound. */
  private def binExpr(column: String, width: Long): Column = expr(
    s"CAST((CAST(`$column` AS BIGINT) - pmod(CAST(`$column` AS BIGINT), " +
      s"${width}L)) div ${width}L AS BIGINT)")

  /** Fold a batch into the histogram store at `root` (bootstrapping on
    * first use). `column` must be integral (byte/short/int/long —
    * floats belong in [[QuantileSketch]]'s territory); `binWidth` must
    * match the store's recorded width (enforced by the store key name).
    * Addition is not idempotent: at-least-once callers pass `tag`
    * exactly as with [[graft.engine.sources.IncrementalAgg.refresh]].
    * Returns the published store version. */
  def refresh(batch: DataFrame, root: String, column: String,
      binWidth: Long, nBuckets: Int = 8, tag: Option[String] = None): Long = {
    require(binWidth >= 1L, s"binWidth must be positive, got $binWidth")
    require(batch.columns.contains(column), s"no such column: $column")
    val dt = batch.schema(column).dataType
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(dt),
      s"histogram bins integral columns; '$column' is $dt")
    val keyed = batch.filter(col(column).isNotNull)
      .select(binExpr(column, binWidth).as(s"$BinPrefix$binWidth"),
        lit(1L).as("one"))
    // an all-null/empty batch carries no range information: no-op at
    // the current version (the store family's "empty mints no version"
    // posture) rather than reaching IncrementalAgg's merge with an
    // empty delta; an empty BOOTSTRAP has no width-bearing store to
    // return, so refuse loudly at the contract boundary. The probe is
    // take(1)-cheap on any batch with an early non-null row; the
    // full-scan worst case is exactly the all-null batch it exists to
    // catch (hist_refresh measures the refresh flat WITH the probe)
    if (keyed.isEmpty) {
      val cur = graft.engine.sources.SnapshotStore.currentVersion(root)
      require(cur > 0L,
        s"histogram refresh got an EMPTY batch on an unbuilt store " +
          s"($root): fold the first non-empty batch instead")
      return cur
    }
    graft.engine.sources.IncrementalAgg.refresh(keyed, root,
      s"$BinPrefix$binWidth", "one", nBuckets, tag)
  }

  /** The store's recorded bin width, parsed from its key column name —
    * the same fact [[refresh]]'s width check rides on. */
  def binWidth(root: String): Long = {
    val cur = graft.engine.sources.SnapshotStore.currentVersion(root)
    val (key, _) = graft.engine.sources.SnapshotStore.bucketSpecAt(root, cur)
      .getOrElse(throw new IllegalStateException(
        s"$root is not a histogram store (no bucket spec)"))
    require(key.startsWith(BinPrefix),
      s"$root is not a histogram store (key column '$key')")
    key.stripPrefix(BinPrefix).toLong
  }

  /** The current bins: (bin BIGINT, n BIGINT) — bin b covers values
    * `[b·width, (b+1)·width)`. One row per occupied bin. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val w = binWidth(root)
    graft.engine.sources.IncrementalAgg.read(spark, root)
      .select(col(s"$BinPrefix$w").as("bin"), col("n"))
  }

  /** A range estimate with its own provable error bound: `estimate` is
    * exact up to `straddleRows` (the rows of partially-overlapped edge
    * bins — zero for bin-aligned ranges), `totalRows` is the histogram's
    * full census (the selectivity denominator). */
  final case class RangeEstimate(estimate: Double, straddleRows: Long,
      totalRows: Long) {
    /** Clamped to [0, 1]: the floating sum of per-bin contributions can
      * exceed `totalRows` by an ulp, and a fraction of 1 + ε would trip
      * [[Planner.filteredProfile]]'s domain check. */
    def fraction: Double =
      if (totalRows == 0L) 0.0
      else math.min(1.0, estimate / totalRows.toDouble)
  }

  /** Estimate the rows with `lo <= value <= hi` (inclusive, exact long
    * bounds) from the maintained bins: one narrow aggregate over the
    * occupied-bin table, never the data. See the object doc for the
    * exactness/error contract. */
  def estimateRange(spark: SparkSession, root: String, lo: Long,
      hi: Long): RangeEstimate = {
    require(lo <= hi, s"empty range [$lo, $hi]")
    require(hi < Long.MaxValue, "hi = Long.MaxValue would overflow hi + 1")
    val w = binWidth(root)
    val bins = read(spark, root)
    val binLo = col("bin") * lit(w)
    val binHi = binLo + lit(w) // exclusive
    val overlap = greatest(lit(0L),
      least(binHi, lit(hi + 1L)) - greatest(binLo, lit(lo)))
    val straddled = overlap > lit(0L) && overlap < lit(w)
    val r = bins.agg(
      coalesce(sum(col("n").cast(DoubleType) * overlap.cast(DoubleType) /
        lit(w.toDouble)), lit(0.0)).as("est"),
      coalesce(sum(when(straddled, col("n")).otherwise(lit(0L))), lit(0L))
        .as("straddle"),
      coalesce(sum(col("n")), lit(0L)).as("total"))
      .head()
    RangeEstimate(r.getDouble(0), r.getLong(1), r.getLong(2))
  }
}
