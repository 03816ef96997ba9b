package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, In, InSet}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Static scale-audit of a query's plan: flags the shapes that are correct
  * on testdata but die at 100 TB. Used by PlanAuditSpec over every
  * registered query (the suite fails if a scale-killer lands in the
  * registry) and runnable ad hoc from a REPL/main.
  *
  * Rules:
  *  1. `CartesianProduct` — an unbroadcast cross join is quadratic I/O at
  *     any scale. (`BroadcastNestedLoopJoin` is NOT flagged: a hinted cross
  *     join against a provably-small side is the brute-force-scoring
  *     pattern, e.g. q44.)
  *  2. Window with an EMPTY partition spec over an unbounded input — the
  *     whole dataset flows through one task's sort. Detected on the
  *     OPTIMIZED logical plan (before AQE rewrites); windows whose input is
  *     already a global aggregate (bounded by construction) are allowed.
  *  3. `SortMergeJoin` against a fixed-size dimension (nation / region — 25
  *     and 5 rows at EVERY scale factor): these must be broadcast
  *     explicitly; relying on the size-estimate threshold breaks once
  *     planner stats drift at scale. Run the audit with
  *     `spark.sql.autoBroadcastJoinThreshold = -1` so only EXPLICIT
  *     broadcast hints survive the check.
  */
object PlanAudit {

  /** Tables whose size is constant at every scale factor — joining them
    * any way other than broadcast is never right. */
  private val FixedSizeDims = Seq("nation", "region")

  def violations(df: DataFrame): Seq[String] = {
    val physical = df.queryExecution.executedPlan
    val logical = df.queryExecution.optimizedPlan
    cartesian(physical) ++ globalWindows(logical) ++ smjOverFixedDim(physical)
  }

  private def cartesian(plan: SparkPlan): Seq[String] =
    if (plan.toString.contains("CartesianProduct"))
      Seq("CartesianProduct: unbroadcast cross join (quadratic at scale)")
    else Nil

  /** A window is bounded-input (allowed without partitioning) when its
    * child subtree contains a grouping aggregate with a LOW-cardinality
    * group key or is itself globally aggregated; statically we approximate:
    * any Aggregate below the window means the per-task sort is over
    * aggregated rows, not raw corpus rows. */
  private def globalWindows(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case w: Window if w.partitionSpec.isEmpty && !hasAggregateBelow(w.child) =>
        "Window with no PARTITION BY over un-aggregated input " +
          "(single-task global sort of the corpus)"
    }

  private def hasAggregateBelow(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isDefined

  /** Rule 4 — streaming/foreachBatch maintenance plans: any file scan of
    * a bucketed snapshot-store version under `storeRoot` must carry a
    * `_bucket` partition filter. Without one, a recurring per-tick plan
    * re-reads the FULL published corpus every micro-batch — cost ∝ table
    * history instead of ∝ the tick, the always-on pipeline's
    * scale-killer. Micro-batch plans never surface in the registry (they
    * are built inside `foreachBatch` closures, invisible to the
    * registered-query sweep), so this rule runs over listener-CAPTURED
    * executed plans — see StreamingPlanAuditSpec, which registers a
    * QueryExecutionListener around the streaming run and audits every
    * plan the micro-batches actually executed. */
  def unprunedStoreScans(plan: SparkPlan, storeRoot: String): Seq[String] =
    storeScans(plan, storeRoot)
      .filterNot(_.partitionFilters.exists(isBucketMembership))
      .map(f =>
        s"unpruned store scan: ${f.relation.location.rootPaths.mkString(",")} " +
          "read with no _bucket membership partition filter " +
          "(full corpus re-read per tick)")

  /** A partition filter counts as pruning only if it is a genuine
    * MEMBERSHIP constraint on `_bucket` (`In`/`InSet`/`EqualTo`). A filter
    * that merely REFERENCES the column — `_bucket >= 0`, `isnotnull(
    * _bucket)` — selects every partition and would have satisfied the old
    * references-based check while pruning nothing. */
  private def isBucketMembership(e: Expression): Boolean = e match {
    case In(a: AttributeReference, vs) if vs.nonEmpty => a.name == "_bucket"
    case InSet(a: AttributeReference, _) => a.name == "_bucket"
    case EqualTo(a: AttributeReference, _) => a.name == "_bucket"
    case EqualTo(_, a: AttributeReference) => a.name == "_bucket"
    case _ => false
  }

  /** All snapshot-store file scans under `storeRoot` in the (AQE-expanded)
    * plan, pruned or not — the streaming audit also asserts it actually
    * SAW the cross-version read (a capture that finds no store scan at
    * all would vacuously "pass" while auditing nothing). Root matching is
    * prefix-with-separator-boundary: `/x/tbl` matches `/x/tbl` and
    * `/x/tbl/v=3` but NOT the sibling `/x/tbl2` a substring check would
    * false-match. */
  def storeScans(plan: SparkPlan, storeRoot: String): Seq[FileSourceScanExec] =
    flatten(plan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths
            .exists(p => underRoot(p.toString, storeRoot)) => f
    }

  /** Scheme-insensitive path containment: Hadoop renders local roots as
    * `file:/root/...` while callers pass bare `/root/...` paths. */
  private def underRoot(path: String, root: String): Boolean = {
    def norm(s: String) =
      s.stripPrefix("file://").stripPrefix("file:").stripSuffix("/")
    val (p, r) = (norm(path), norm(root))
    p == r || p.startsWith(r + "/")
  }

  // ---- executed-plan JOIN PINS (q147's structural plan contracts) -----
  // r18 VERDICT item 5: `executedPlan.toString.contains("...Join")` is
  // brittle across Spark plan-string drift; these walk the (AQE-expanded)
  // physical tree instead. Call AFTER an action has run, so AQE's FINAL
  // plan — not the initial one — is what gets pinned.

  /** The executed plan contains a broadcast-hash join. */
  def hasBroadcastHashJoin(df: DataFrame): Boolean =
    flatten(df.queryExecution.executedPlan).exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        true
      case _ => false
    }

  /** The executed plan reads at least one file scan whose PARTITION
    * filters carry a genuine `_bucket` membership constraint — the
    * pruned-lookup contract q145/q146 pin (readKeys touching only the
    * bucket directories the keys hash to). Structural twin of rule 4's
    * per-scan check, replacing the retired `PartitionFilters:`
    * plan-string match (r19 VERDICT: the q147 tree-walk idiom, swept to
    * the last two string-pin sites). Call AFTER an action on `df` so
    * AQE's FINAL plan is what gets walked. */
  def prunesOnBucket(df: DataFrame): Boolean =
    flatten(df.queryExecution.executedPlan).exists {
      case f: FileSourceScanExec =>
        f.partitionFilters.exists(isBucketMembership)
      case _ => false
    }

  /** The executed plan contains a sort-merge join. */
  def hasSortMergeJoin(df: DataFrame): Boolean =
    flatten(df.queryExecution.executedPlan).exists {
      case _: SortMergeJoinExec => true
      case _ => false
    }

  /** The executed plan contains an equi-join whose KEYS include the
    * salting disambiguator (`_salt`) — the structural signature of
    * [[graft.engine.relational.Salting.saltedJoin]]'s (key, salt) join,
    * whatever physical join Spark picks for it. */
  def hasSaltedJoin(df: DataFrame): Boolean =
    flatten(df.queryExecution.executedPlan).exists {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        (j.leftKeys ++ j.rightKeys)
          .exists(_.references.exists(_.name == "_salt"))
      case _ => false
    }

  /** AQE wraps executed subtrees in AdaptiveSparkPlanExec / QueryStageExec
    * whose realized plans are not `children`, so a plain `collect` would
    * miss every scan below them; expand explicitly. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  private def smjOverFixedDim(plan: SparkPlan): Seq[String] =
    plan.collect { case smj: SortMergeJoinExec =>
      FixedSizeDims.filter { dim =>
        smj.left.toString.contains(s"$dim.parquet") ||
          smj.right.toString.contains(s"$dim.parquet")
      }.map(dim =>
        s"SortMergeJoin against fixed-size dim '$dim' (25/5 rows at every " +
          "SF) — must be an explicit broadcast")
    }.flatten
}
