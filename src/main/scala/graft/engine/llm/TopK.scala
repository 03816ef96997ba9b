package graft.engine.llm

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §2.5's anticipated custom
  * `Aggregator[IN, BUF, OUT]`): keeps the k best (cos, nid) pairs, ordered
  * by cosine desc then nid asc.
  *
  * Scale rationale: ranking "top-k neighbors per query" with a window
  * partitions the shuffle by query id — with q queries that is q reducers
  * each receiving the FULL corpus's scored rows. As an aggregate, Spark
  * runs it with map-side partial aggregation: every partition reduces to
  * ≤ k rows per query before the shuffle, so the exchange carries
  * O(partitions · q · k) rows regardless of corpus size.
  */
object TopK {

  final case class Scored(cos: Double, nid: Long)

  private def better(a: Scored, b: Scored): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.nid < b.nid)

  /** Buffer/output are k-bounded sorted lists (k is small; insertion into a
    * size-k vector beats heap constant factors and is trivially encodable). */
  final class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
      if (buf.size >= k && better(buf.last, a)) buf
      else ((buf :+ a).sortWith(better)).take(k)

    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      (b1 ++ b2).sortWith(better).take(k)

    override def finish(r: Seq[Scored]): Seq[Scored] = r

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column form, usable in DataFrame agg (case-class input flattens to
    * its fields: pass the cos and nid columns). */
  def topK(k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Scored]())
      .apply(org.apache.spark.sql.functions.col("cos"),
        org.apache.spark.sql.functions.col("nid"))

  /** `id` is carried as its STRING RENDERING (same engine-portable contract
    * as Curation.hashSample: integral and string ids render identically
    * everywhere; callers keep their native column for the join back). */
  final case class Keyed(sortKey: String, id: String)

  private def earlier(a: Keyed, b: Keyed): Boolean =
    a.sortKey < b.sortKey || (a.sortKey == b.sortKey && a.id < b.id)

  /** Smallest-k rows by (string sortKey, id) — the ascending sibling of
    * [[TopKAggregator]], with the same scale rationale: map-side partials
    * bound every partition's contribution to k rows per group BEFORE the
    * shuffle, where a rank-window would route each group's full row set
    * through one reducer (fatal when the group key is low-cardinality —
    * see Curation.domainCap). */
  final class MinKAggregator(k: Int) extends Aggregator[Keyed, Seq[Keyed], Seq[Keyed]] {
    override def zero: Seq[Keyed] = Vector.empty

    override def reduce(buf: Seq[Keyed], a: Keyed): Seq[Keyed] =
      if (buf.size >= k && earlier(buf.last, a)) buf
      else ((buf :+ a).sortWith(earlier)).take(k)

    override def merge(b1: Seq[Keyed], b2: Seq[Keyed]): Seq[Keyed] =
      (b1 ++ b2).sortWith(earlier).take(k)

    override def finish(r: Seq[Keyed]): Seq[Keyed] = r

    override def bufferEncoder: Encoder[Seq[Keyed]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Keyed]]()
    override def outputEncoder: Encoder[Seq[Keyed]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Keyed]]()
  }

  /** Column form: aggregates (sortKey, id) columns to the k earliest. */
  def minK(k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new MinKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Keyed]())
      .apply(org.apache.spark.sql.functions.col("sortKey"),
        org.apache.spark.sql.functions.col("id"))

  /** Size-capped ascending id collector — the partial-aggregating
    * replacement for `slice(sort_array(collect_list(id)), 1, k)`, which
    * materializes the FULL hot group's list in one aggregation buffer
    * before slicing (the very group a cap exists for can OOM the
    * aggregating task). Here no buffer — map-side partial or final merge —
    * ever holds more than k ids. Same answer: the k smallest, ascending,
    * duplicates retained. */
  final class CappedIdsAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty

    override def reduce(buf: Seq[Long], a: Long): Seq[Long] =
      if (buf.size >= k && buf.last <= a) buf
      else ((buf :+ a).sorted).take(k)

    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
      (b1 ++ b2).sorted.take(k)

    override def finish(r: Seq[Long]): Seq[Long] = r

    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: the k smallest values of `id` per group, ascending. */
  def cappedIds(k: Int, id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new CappedIdsAggregator(k),
      Encoders.scalaLong).apply(id)

  /** A bucket member carrying its payload alongside the id — the struct
    * shape the SimHash bucket collector keeps (the fingerprint rides with
    * the id so pair verification needs no join back to the corpus). */
  final case class IdSim(id: Long, sim: Long)

  private def beforePair(a: IdSim, b: IdSim): Boolean =
    a.id < b.id || (a.id == b.id && a.sim < b.sim)

  /** Struct-capable sibling of [[CappedIdsAggregator]]: the k smallest
    * (id, sim) pairs per group, ascending by (id, sim) — identical output
    * to `slice(sort_array(collect_list(struct(id, sim))), 1, k)` but every
    * partial and merge buffer is bounded by k rows, so a degenerate hot
    * bucket (10^5 near-empty/template documents collapsing to one
    * fingerprint at 100 TB) can never OOM the aggregating task. */
  final class CappedIdSimAggregator(k: Int)
      extends Aggregator[IdSim, Seq[IdSim], Seq[IdSim]] {
    override def zero: Seq[IdSim] = Vector.empty

    override def reduce(buf: Seq[IdSim], a: IdSim): Seq[IdSim] =
      if (buf.size >= k && !beforePair(a, buf.last)) buf
      else ((buf :+ a).sortWith(beforePair)).take(k)

    override def merge(b1: Seq[IdSim], b2: Seq[IdSim]): Seq[IdSim] =
      (b1 ++ b2).sortWith(beforePair).take(k)

    override def finish(r: Seq[IdSim]): Seq[IdSim] = r

    override def bufferEncoder: Encoder[Seq[IdSim]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[IdSim]]()
    override def outputEncoder: Encoder[Seq[IdSim]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[IdSim]]()
  }

  /** Column form: the k smallest (id, sim) pairs per group, as an
    * array<struct<id,sim>> matching the collect_list-of-struct shape. */
  def cappedIdSims(k: Int, id: org.apache.spark.sql.Column,
      sim: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new CappedIdSimAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[IdSim]())
      .apply(id, sim)
}
