package graft.engine.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range joins: point-in-interval and interval-overlap as
  * DISTRIBUTED equi-joins.
  *
  * Spark has no native range-join optimization: `p BETWEEN s AND e` with no
  * equality conjunct plans as BroadcastNestedLoopJoin (when one side fits)
  * or CartesianProduct (when neither does) — O(n·m) comparisons, the exact
  * shape PlanAudit flags as a 100 TB scale-killer. The standard fix is
  * BINNING: quantize the range domain into fixed-width bins, assign each
  * interval to every bin it overlaps (`explode(sequence(...))`) and each
  * point to its single bin, then equi-join on the bin key and re-check the
  * exact predicate on the survivors. The join becomes a plain shuffle
  * hash/sort-merge join partitioned by bin — cost ∝ inputs + true matches
  * (+ the bounded bin-spans), distributed across the cluster, AQE-eligible
  * like any other equi-join.
  *
  * Each (interval, point) pair meets in EXACTLY one bin — the point's — so
  * the inner join needs no dedup. The overlap join explodes both sides, so
  * a pair shares every bin their intersection covers; it is claimed exactly
  * once at the intersection's FIRST bin (`greatest(starts) div width` —
  * always within both sides' bin lists), a filter instead of a
  * corpus-sized `distinct`.
  *
  * Contracts:
  *  - Intervals are HALF-OPEN `[start, end)`; boundary columns and points
  *    are integral (caller quantizes — e.g. `unix_micros`). Binning uses
  *    integer `div` (exact at any magnitude; a double division would
  *    mis-bin near 2^53), which is monotone for negative values too.
  *  - `binWidth` tunes the span/selectivity trade-off: too narrow explodes
  *    intervals into many bin rows, too wide degrades the equi-join's
  *    selectivity toward the naive join. Size it near the TYPICAL interval
  *    span so each interval lands in O(1) bins.
  *  - An interval spanning more than `maxBinsPerInterval` bins (or with
  *    `end` more than a binWidth below `start` — malformed) fails fast
  *    with `raise_error` rather than silently exploding a mega-interval
  *    into millions of rows (the skew analogue of an unpruned scan). Split
  *    outliers or widen the bins.
  *  - The two frames must have DISJOINT column names (rename before the
  *    call) — this keeps self-joins (both sides derived from one table)
  *    free of Spark's ambiguous-lineage resolution entirely.
  *  - Joins are INNER. Outer semantics would re-introduce per-bin
  *    duplicates for unmatched exploded rows; compose them instead by
  *    re-joining the aggregated result to the interval set on its id
  *    (q96's shape), which costs one equi-join on an already-aggregated
  *    frame.
  */
object RangeJoin {

  /** Rows of `points` paired with every row of `intervals` whose
    * `[startCol, endCol)` contains `pointCol`. Output carries both sides'
    * columns; each qualifying pair appears exactly once.
    *
    * `broadcastIntervals = true` is the DIMENSION-interval regime
    * (calendar windows, maintenance windows, holiday tables — interval
    * sets that are broadcast-sized after exploding): the exploded
    * interval side ships to every executor and the join becomes a
    * broadcast hash join on the bin key, so the fact/point side — the
    * 100 TB side — NEVER shuffles (q102 pins that with a plan-contract
    * boolean). Leave it false when intervals are corpus-sized; the
    * default shuffle equi-join partitions both sides by bin. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 4096,
      broadcastIntervals: Boolean = false): DataFrame = {
    requireDisjoint(points, intervals)
    val p = points.withColumn(BinCol, expr(s"`$pointCol` div ${binWidth}L"))
    val ivPlain =
      explodeBins(intervals, startCol, endCol, binWidth, maxBinsPerInterval)
    val iv = if (broadcastIntervals) broadcast(ivPlain) else ivPlain
    p.alias("_rj_p").join(iv.alias("_rj_i"),
        col(s"_rj_p.$BinCol") === col(s"_rj_i.$BinCol") &&
          col(startCol) <= col(pointCol) && col(pointCol) < col(endCol))
      .drop(BinCol) // both sides' bin keys — internal plumbing
  }

  /** Rows of `left` paired with every row of `right` whose half-open
    * interval overlaps — `lStart < rEnd && rStart < lEnd`, the standard
    * SQL overlap predicate. For NON-EMPTY intervals this is exactly
    * set-intersection; an empty interval `[x, x)` behaves as the instant
    * `x` (it pairs with any non-empty interval strictly containing x's
    * position, never with another empty) — the binned plan reproduces the
    * predicate bit-for-bit in both regimes (RangeJoinSpec pins it). Both
    * sides explode to their covered bins; the claim-bin filter keeps each
    * overlapping pair exactly once. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStartCol: String, lEndCol: String,
      rStartCol: String, rEndCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 4096): DataFrame = {
    requireDisjoint(left, right)
    val l = explodeBins(left, lStartCol, lEndCol, binWidth, maxBinsPerInterval)
    val r = explodeBins(right, rStartCol, rEndCol, binWidth, maxBinsPerInterval)
    l.alias("_rj_l").join(r.alias("_rj_r"),
        col(s"_rj_l.$BinCol") === col(s"_rj_r.$BinCol") &&
          col(lStartCol) < col(rEndCol) && col(rStartCol) < col(lEndCol) &&
          col(s"_rj_l.$BinCol") ===
            expr(s"greatest(`$lStartCol`, `$rStartCol`) div ${binWidth}L"))
      .drop(BinCol)
  }

  /** Telemetry for the binWidth dial (the incrementalCapOverflow pattern:
    * measure the regime before trusting the plan): per-bin interval
    * occupancy, descending. A handful of bins carrying most intervals
    * means within-bin pairing degenerates toward the naive join for rows
    * in those bins — widen/narrow `binWidth` toward the typical span, or
    * pre-split the hot range, until the top counts flatten. Runs as one
    * aggregation over the exploded bins (the same rows the join would
    * shuffle), so probing costs no more than one pass of the build side. */
  def binOccupancy(intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 4096): DataFrame =
    explodeBins(intervals, startCol, endCol, binWidth, maxBinsPerInterval)
      .groupBy(col(BinCol).as("bin"))
      .agg(count(lit(1)).as("n_intervals"))
      .orderBy(col("n_intervals").desc, col("bin"))

  private val BinCol = "_rj_bin"

  private def requireDisjoint(a: DataFrame, b: DataFrame): Unit = {
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"rangeJoin requires disjoint column names between the two sides; " +
        s"shared: ${shared.mkString(", ")} — rename before the call")
  }

  /** One row per (interval, covered bin). The guard runs INSIDE the bin
    * expression so it cannot be pruned as dead code: a span over the cap —
    * or a descending `sequence` from a malformed interval, whose length
    * would be just as unbounded — raises with the offending width. */
  private def explodeBins(df: DataFrame, startCol: String, endCol: String,
      binWidth: Long, maxBinsPerInterval: Int): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val nBins =
      expr(s"(`$endCol` div ${binWidth}L) - (`$startCol` div ${binWidth}L) + 1L")
    val bins = when(nBins > maxBinsPerInterval || nBins < lit(1L),
        raise_error(concat(
          lit(s"rangeJoin: interval [`$startCol`, `$endCol`) covers "), nBins,
          lit(s" bins at binWidth=$binWidth (cap $maxBinsPerInterval) — " +
            "widen binWidth, split the interval, or fix end < start"))))
      .otherwise(expr(s"sequence(`$startCol` div ${binWidth}L, " +
        s"`$endCol` div ${binWidth}L)"))
    df.withColumn(BinCol, explode(bins))
  }
}
