package graft.engine.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** RangeJoin contracts: value-equivalence to the naive theta join
  * (boundaries, negatives, empty and multi-bin intervals), exactly-once
  * pair claiming in the overlap join, the mega-interval fail-fast, the
  * disjoint-names contract, and the plan shape the operator exists for —
  * an equi-join where the naive form is nested-loop. */
class RangeJoinSpec extends AnyFunSuite {
  import spark.implicits._

  // deterministic fixture straddling zero, with empty and wide intervals;
  // widths chosen so intervals span 0–4 bins at binWidth = 10
  private lazy val points = (-25L to 40L).map(p => (s"p$p", p))
    .toDF("p_id", "p_v")
  private lazy val intervals = Seq(
    ("i_neg", -23L, -7L), // multi-bin, negative
    ("i_zero", -5L, 5L),  // straddles zero
    ("i_empty", 3L, 3L),  // half-open empty: matches nothing
    ("i_unit", 7L, 8L),   // single point
    ("i_wide", -20L, 19L),
    ("i_edge", 10L, 20L), // boundary: 10 in, 20 out
    ("i_far", 1000L, 1010L) // no points in range
  ).toDF("iv_id", "s_v", "e_v")

  private def collectPairs(df: DataFrame, l: String, r: String) =
    df.select(col(l), col(r)).collect()
      .map(row => (row.getString(0), row.getString(1))).toSet

  test("pointInInterval == naive theta join on the straddling fixture") {
    val naive = points.join(intervals,
      col("s_v") <= col("p_v") && col("p_v") < col("e_v"))
    val binned = RangeJoin.pointInInterval(points, intervals,
      "p_v", "s_v", "e_v", binWidth = 10L)
    val (n, b) = (collectPairs(naive, "iv_id", "p_id"),
      collectPairs(binned, "iv_id", "p_id"))
    assert(b == n, s"missing=${n -- b} spurious=${b -- n}")
    assert(n.nonEmpty && n.contains(("i_edge", "p10")) &&
      !n.contains(("i_edge", "p20")), "half-open boundary sanity")
    assert(!b.exists(_._1 == "i_empty"), "empty interval matches nothing")
    // exactly-once: the pair set has no multiplicity loss to check, but
    // row count must equal pair count (no per-bin duplicates)
    assert(binned.count() == b.size)
  }

  test("intervalOverlap == naive theta join, each pair claimed once") {
    val lhs = intervals.select(col("iv_id").as("l_id"),
      col("s_v").as("ls"), col("e_v").as("le"))
    val rhs = Seq(
      ("r_a", -30L, -20L), ("r_b", -8L, 12L), ("r_c", 4L, 4L),
      ("r_d", 19L, 40L), ("r_e", 500L, 2000L))
      .toDF("r_id", "rs", "re")
    val naive = lhs.join(rhs, col("ls") < col("re") && col("rs") < col("le"))
    val binned = RangeJoin.intervalOverlap(lhs, rhs,
      "ls", "le", "rs", "re", binWidth = 10L)
    val (n, b) = (collectPairs(naive, "l_id", "r_id"),
      collectPairs(binned, "l_id", "r_id"))
    assert(b == n, s"missing=${n -- b} spurious=${b -- n}")
    assert(binned.count() == b.size,
      "a pair sharing several bins must be claimed exactly once")
    // predicate semantics, pinned: an empty interval [x, x) behaves as the
    // instant x (i_empty=[3,3) pairs with r_b=[-8,12) since 3<12 && -8<3),
    // and two empties never pair (x<y && y<x is unsatisfiable)
    assert(n.contains(("i_wide", "r_b")) && n.contains(("i_empty", "r_b")),
      "overlap sanity: wide×wide overlaps; empty interval acts as an instant")
  }

  test("binOccupancy reports per-bin interval load, hot bins first") {
    val occ = RangeJoin.binOccupancy(intervals, "s_v", "e_v", binWidth = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // binning is TRUNCATING div (monotone; -7 div 10 = 0, not floor's -1):
    // i_neg [-23,-7) → -2..0, i_zero → 0, i_empty → 0, i_unit → 0,
    // i_wide [-20,19) → -2..1, i_edge [10,20) → 1..2, i_far → 100..101
    assert(occ.toMap == Map(-2L -> 2L, -1L -> 2L, 0L -> 5L, 1L -> 2L,
      2L -> 1L, 100L -> 1L, 101L -> 1L))
    assert(occ.head == (0L -> 5L), "hot bin must sort first")
    val counts = occ.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("broadcastIntervals: same pairs, broadcast hash join, point side " +
      "unshuffled") {
    val binned = RangeJoin.pointInInterval(points, intervals,
      "p_v", "s_v", "e_v", binWidth = 10L, broadcastIntervals = true)
    val naive = points.join(intervals,
      col("s_v") <= col("p_v") && col("p_v") < col("e_v"))
    assert(collectPairs(binned, "iv_id", "p_id") ==
      collectPairs(naive, "iv_id", "p_id"))
    val plan = binned.queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"expected a broadcast hash join:\n$plan")
    assert(Bucketed.shuffleCount(binned) == 0,
      "the point side must reach the join without any shuffle exchange")
  }

  test("a mega-interval fails fast instead of exploding") {
    val mega = Seq(("huge", 0L, 10_000_000L)).toDF("iv_id", "s_v", "e_v")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, mega, "p_v", "s_v", "e_v",
        binWidth = 10L, maxBinsPerInterval = 100).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("covers")),
      s"expected the bin-cap raise_error, got: $ex")
  }

  test("shared column names are rejected up front") {
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumnRenamed("p_id", "iv_id"),
        intervals, "p_v", "s_v", "e_v", binWidth = 10L)
    }
    assert(ex.getMessage.contains("iv_id"))
  }

  test("the binned plan is an equi-join; the naive plan is nested-loop") {
    def planOps(df: DataFrame): Seq[SparkPlan] = {
      def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: flatten(q.plan)
        case other => other +: other.children.flatMap(flatten)
      }
      flatten(df.queryExecution.executedPlan)
    }
    val naive = points.join(intervals,
      col("s_v") <= col("p_v") && col("p_v") < col("e_v"))
    assert(planOps(naive).exists {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    }, "precondition: the raw theta join really is nested-loop")
    val binned = RangeJoin.pointInInterval(points, intervals,
      "p_v", "s_v", "e_v", binWidth = 10L)
    assert(!planOps(binned).exists {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    }, "the binned range join must plan as an equi-join")
  }
}
