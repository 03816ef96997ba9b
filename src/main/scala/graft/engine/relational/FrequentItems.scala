package graft.engine.relational

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items ("heavy hitters") summary as a mergeable
  * Spark Aggregator — the deterministic member of the sketch family next
  * to HLL (distinct), CMS (point counts) and KLL (ranks) in
  * [[StatsQueries]]: "which items dominate this 100 TB column" without a
  * full GROUP BY.
  *
  * Why not `GROUP BY item ORDER BY count DESC LIMIT k`: that computes
  * exact counts for EVERY distinct item — a corpus-sized shuffle whose
  * reducer state is ∝ NDV, unusable when the column is high-cardinality
  * (user ids, URLs, n-grams). The MG summary holds at most `capacity`
  * counters at every stage: map-side partials are capacity-bounded, the
  * exchange carries O(partitions · capacity) rows, and the final merge
  * keeps the bound (Agarwal et al., "Mergeable Summaries", PODS 2012:
  * merging two MG summaries and retaining the top `capacity` counters
  * after subtracting the (capacity+1)-th preserves the error bound).
  *
  * Guarantees, with n = total items fed and c = capacity:
  *  - NO overcount: est(x) ≤ true(x) for every tracked x;
  *  - bounded undercount: true(x) − est(x) ≤ n/(c+1), counting untracked
  *    items as est 0;
  *  - therefore every x with true(x) > n/(c+1) IS tracked.
  * With c ≥ NDV of the column no counter is ever evicted and the summary
  * is EXACT — the oracle-pinnable regime (q105); the sub-NDV regime's
  * guarantees are pinned as contract booleans against an exact census
  * (q106) and property-tested in FrequentItemsSpec.
  *
  * Null items are the caller's modeling error — filter them first (the
  * encoder rejects null map keys).
  *
  * No counterpart in the reference (whose only aggregation surface is the
  * evaluator, `evaluate_model.py:23`); the algorithm is the public
  * Misra–Gries (1982) / Space-Saving family, hand-rolled against the
  * Aggregator API like [[graft.engine.llm.TopK]]'s capped collectors.
  */
object FrequentItems {

  /** Buffer/output: item → count, never more than `capacity` entries. */
  final class MisraGriesAggregator(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity >= 1, "capacity must be >= 1")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], a: String): Map[String, Long] =
      buf.get(a) match {
        case Some(v) => buf.updated(a, v + 1L)
        case None if buf.size < capacity => buf.updated(a, 1L)
        case None =>
          // classic MG step: decrement every counter, drop the zeroed —
          // O(capacity) on the eviction path only
          buf.iterator.map { case (k, v) => (k, v - 1L) }
            .filter(_._2 > 0L).toMap
      }

    override def merge(b1: Map[String, Long],
        b2: Map[String, Long]): Map[String, Long] = {
      val combined = b2.foldLeft(b1) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      if (combined.size <= capacity) combined
      else {
        // subtract the (capacity+1)-th largest count from everything and
        // keep the survivors (≤ capacity by construction) — the PODS'12
        // mergeable-summaries step; ties may keep fewer, never more
        val t = combined.valuesIterator.toIndexedSeq
          .sorted(Ordering[Long].reverse)(capacity)
        combined.iterator.map { case (k, v) => (k, v - t) }
          .filter(_._2 > 0L).toMap
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: aggregate a string item column to a map<item, est>
    * holding at most `capacity` entries. */
  def frequentItems(capacity: Int, item: Column): Column =
    udaf(new MisraGriesAggregator(capacity), Encoders.STRING).apply(item)
}
