package graft.engine.relational

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mergeable QUANTILE sketch columns — the percentile sibling of q93's
  * HLL distinct-count sketches (Spark ships `hll_sketch_agg`/`hll_union`
  * for cardinality but nothing mergeable for quantiles, so this is the
  * custom-`Aggregator` member of the sketch family, next to
  * [[graft.engine.llm.TopK]] and [[FrequentItems]]).
  *
  * Design: the classic Munro–Paterson multilevel buffer summary (the
  * deterministic ancestor of KLL — KLL randomizes the compaction offset
  * to sharpen constants; the deterministic variant keeps the same
  * mergeable structure and a provable worst-case bound, which is what an
  * oracle-checked contract needs). State is a set of size-≤`k` SORTED
  * buffers, each tagged with a level `h`; an item in a level-`h` buffer
  * represents `2^h` original rows. Two buffers at the same level collapse
  * into one at the next: merge-sort the `2k` items, keep the `k` at odd
  * positions. Collapsing preserves TOTAL WEIGHT exactly (`2k·2^h =
  * k·2^(h+1)`), so a sketch's summed weight always equals the true row
  * count — the invariant the estimator and the error bound both ride on.
  *
  * Error bound (pinned in the q110 contract): one collapse at level `h`
  * perturbs any rank by at most `2^h`; at most `⌈n/(k·2^h)⌉` collapses
  * ever happen at level `h`, so the total rank error of any estimate is
  * at most `Σ_h (n/(k·2^h))·2^h = L·n/k` with `L` the highest level
  * present, plus up to `k` for items still sitting unsorted-complete in
  * partial base buffers. [[rankErrorBound]] computes exactly that
  * `L·n/k + k` from the sketch's own shape — no tuning constant to
  * drift out of date.
  *
  * Scale posture: the aggregator partial-aggregates (map-side sketches
  * merge associatively through Spark's standard partial/final plan), the
  * shuffle carries `O(k·log(n/k))` doubles per group instead of the
  * group's rows, per-batch sketch ROWS are storable/publishable like any
  * column (q93's incremental posture: yesterday's sketches are never
  * re-scanned), and estimation explodes only sketch items —
  * `O(k·log(n/k))` rows per group — through a partitioned cumulative-
  * weight window, never the raw data. Merge order across partitions is
  * nondeterministic, so two runs may produce different (equally valid)
  * sketches: estimates are only ever consumed through the rank-error
  * contract, never value-pinned.
  */
object QuantileSketch {

  /** One sorted buffer: `items` each standing for `2^level` rows. */
  final case class Level(level: Int, items: Seq[Double])

  /** Aggregation state: completed buffers + a raw (unsorted, < k) base
    * accumulation buffer. */
  final case class Buf(levels: Seq[Level], raw: Seq[Double])

  private def collapsePair(a: Seq[Double], b: Seq[Double]): Seq[Double] = {
    // merge two sorted size-k runs, keep odd positions (1,3,5,…)
    val merged = (a ++ b).sorted
    (1 until merged.length by 2).map(merged)
  }

  /** Collapse until no level holds two buffers (each level holds 0 or 1
    * buffer afterwards — the canonical MP shape). */
  private def normalize(levels: Seq[Level], k: Int): Seq[Level] = {
    val byLevel = scala.collection.mutable.Map.empty[Int, List[Seq[Double]]]
    levels.foreach(l =>
      byLevel(l.level) = l.items :: byLevel.getOrElse(l.level, Nil))
    var h = 0
    var maxH = if (byLevel.isEmpty) -1 else byLevel.keys.max
    while (h <= maxH) {
      while (byLevel.getOrElse(h, Nil).lengthCompare(2) >= 0) {
        val a :: b :: rest = byLevel(h): @unchecked
        byLevel(h) = rest
        byLevel(h + 1) = collapsePair(a, b) :: byLevel.getOrElse(h + 1, Nil)
        maxH = math.max(maxH, h + 1)
      }
      h += 1
    }
    byLevel.toSeq.sortBy(_._1)
      .flatMap { case (lvl, bufs) => bufs.map(Level(lvl, _)) }
  }

  final class QuantileSketchAggregator(k: Int)
      extends Aggregator[Double, Buf, Seq[Level]] {
    require(k >= 2, "buffer capacity k must be >= 2")

    override def zero: Buf = Buf(Vector.empty, Vector.empty)

    override def reduce(b: Buf, x: Double): Buf = {
      val raw = b.raw :+ x
      if (raw.size < k) b.copy(raw = raw)
      else Buf(normalize(b.levels :+ Level(0, raw.sorted), k), Vector.empty)
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      var raw = b1.raw ++ b2.raw
      var levels = b1.levels ++ b2.levels
      while (raw.size >= k) {
        val (chunk, rest) = raw.splitAt(k)
        levels = levels :+ Level(0, chunk.sorted)
        raw = rest
      }
      Buf(normalize(levels, k), raw)
    }

    /** Leftover raw items ship as one final PARTIAL (size < k) sorted base
      * buffer, deliberately NOT collapsed with anything: a collapse of an
      * odd-combined-length pair would drop one item's weight (alternate-
      * keep halves an odd count unevenly). Keeping every normalized buffer
      * at exactly size k and every partial at level 0 is what makes total
      * weight exactly n — [[SketchMergeAggregator]] routes partials back
      * through the raw path on merge for the same reason. */
    override def finish(b: Buf): Seq[Level] =
      if (b.raw.isEmpty) b.levels
      else b.levels :+ Level(0, b.raw.sorted)

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[Level]] =
      ExpressionEncoder[Seq[Level]]()
  }

  /** Column form: `groupBy(g).agg(sketchAgg(col("x"), k).as("sk"))`. */
  def sketchAgg(value: Column, k: Int): Column =
    udaf(new QuantileSketchAggregator(k), ExpressionEncoder[Double]())
      .apply(value)

  /** Merge ALREADY-BUILT sketch rows (q93's union posture: per-batch
    * sketches stored as columns, folded later without re-scanning any
    * batch). IN = one sketch; merging is buffer concatenation + collapse —
    * associative and commutative up to the (contract-irrelevant) choice
    * of collapse order. */
  final class SketchMergeAggregator(k: Int)
      extends Aggregator[Seq[Level], Buf, Seq[Level]] {
    private val inner = new QuantileSketchAggregator(k)
    override def zero: Buf = inner.zero
    override def reduce(b: Buf, sk: Seq[Level]): Buf = {
      // a published sketch carries at most one PARTIAL (< k) base buffer
      // (see finish); its items re-enter through the raw path so every
      // collapse stays a full-k pair and weight stays exact
      val (partial, full) = sk.partition(l => l.level == 0 && l.items.size < k)
      inner.merge(Buf(b.levels ++ full, b.raw),
        Buf(Vector.empty, partial.flatMap(_.items)))
    }
    override def merge(b1: Buf, b2: Buf): Buf = inner.merge(b1, b2)
    override def finish(b: Buf): Seq[Level] = inner.finish(b)
    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[Level]] =
      ExpressionEncoder[Seq[Level]]()
  }

  def mergeAgg(sketch: Column, k: Int): Column =
    udaf(new SketchMergeAggregator(k), ExpressionEncoder[Seq[Level]]())
      .apply(sketch)

  /** Explode sketch columns `(g, sk)` into per-group weighted quantile
    * ESTIMATES for the given quantiles, plus the self-computed rank-error
    * bound: output `(g, total_weight, max_level, bound, q, estimate)`.
    * The estimate of quantile q is the smallest sketch value whose
    * cumulative weight reaches `ceil(q·W)` — a partitioned window over
    * O(k·log(n/k)) sketch items per group, never the raw rows. */
  def estimate(sketches: DataFrame, groupCol: String, sketchCol: String,
      quantiles: Seq[Double], k: Int): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    val g = col(groupCol)
    val items = sketches
      .select(g, explode(col(sketchCol)).as("lvl"))
      // 2^level as exact long (shiftleft takes only literal bit counts)
      .select(g, pow(lit(2.0), col("lvl.level")).cast(LongType).as("w"),
        explode(col("lvl.items")).as("x"))
    // "wt", not "W": Spark's default resolver is case-insensitive, so a
    // column named W would be ambiguous against the per-item weight w
    val wTot = items.groupBy(g).agg(sum(col("w")).cast(LongType).as("wt"),
      max(log2(col("w"))).cast(LongType).as("max_level"))
    val cum = items
      .withColumn("cw", sum(col("w")).over(
        Window.partitionBy(g).orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(wTot), groupCol)
    quantiles.map { q =>
      cum.filter(col("cw") >= ceil(lit(q) * col("wt")).cast(LongType))
        .groupBy(g).agg(min(col("x")).as("estimate"),
          first(col("wt")).as("total_weight"),
          first(col("max_level")).as("max_level"))
        .withColumn("q", lit(q))
    }.reduce(_ unionByName _)
      .withColumn("bound", rankErrorBound(col("max_level"),
        col("total_weight"), k))
      .select(g, col("total_weight"), col("max_level"), col("bound"),
        col("q"), col("estimate"))
  }

  /** The sketch's own worst-case rank-error bound, `L·W/k + k` (see the
    * object doc) — computed from the merged sketch's observed max level,
    * so it tightens automatically when the data is small. `k` MUST be the
    * capacity the sketches were built with (the [[estimate]] parameter
    * exists to keep that coupling explicit at the call site). */
  def rankErrorBound(maxLevel: Column, totalWeight: Column, k: Int): Column =
    (maxLevel.cast("double") * totalWeight.cast("double") / lit(k))
      .cast(LongType) + lit(k.toLong)
}
