package graft.engine.relational

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}

/** Plan-shape regression tests: the *physical* properties that make these
  * queries scale (pushdown, pruned scans, broadcast dims, top-k without a
  * global sort) are asserted, not just eyeballed — a refactor that silently
  * loses them fails here. */
class PlanShapeSpec extends AnyFunSuite {

  private def planString(q: graft.engine.GraftQuery): String = {
    val df = q.run(spark, sfDir)
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }
  private def explainFormatted(q: graft.engine.GraftQuery): String = {
    val df = q.run(spark, sfDir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q01: shipdate filter is pushed to the parquet scan") {
    val plan = explainFormatted(RelationalQueries.q01)
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThanOrEqual(l_shipdate"), plan.take(2000))
  }

  test("q03: scan reads only the 5 referenced columns") {
    val plan = explainFormatted(RelationalQueries.q03)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_tax"),
      readSchema)
  }

  test("q04: both dimension joins are broadcast") {
    val plan = planString(RelationalQueries.q04)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(2000))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q17: global top-k runs as TakeOrderedAndProject, not a full sort") {
    val plan = planString(RelationalQueries.q17)
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q25: tumbling-window agg is a two-phase hash aggregate (partial + final)") {
    val plan = planString(RelationalQueries.q25)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("ivfTopK: cell join broadcasts the probe side; corpus never sort-merges") {
    import org.apache.spark.sql.functions.col
    import graft.engine.{Tables => T}
    val emb = T.embeddings(spark, sfDir)
    val df = graft.engine.llm.Similarity.ivfTopK(
      emb, emb.filter(col("vec_id") < 4), k = 3, nlist = 8, nprobe = 2)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("stream-static enrichment: dim side is broadcast in the batch twin plan") {
    import graft.engine.{Tables => T}
    val df = graft.engine.streaming.Streaming.enrichedTumblingByNation(
      T.events(spark, sfDir), T.customer(spark, sfDir))
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("contamination: benchmark n-gram set is broadcast; corpus never shuffles on n-grams") {
    import org.apache.spark.sql.functions.col
    import graft.engine.{Tables => T}
    val docs = T.documents(spark, sfDir)
    val df = graft.engine.llm.Curation.contamination(
      docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
      "text", "doc_id", n = 13)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("q65: no window sorts corpus rows on lang alone (histogram ntile)") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = graft.engine.llm.LlmQueries.q65.run(spark, sfDir)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the histogram/tie-class windows")
    windows.foreach { w =>
      val spec = w.partitionSpec.map(_.sql.toLowerCase)
      // a window partitioned on the low-cardinality key alone is only
      // admissible over an already-aggregated (histogram-sized) input,
      // never over raw corpus rows
      val overAggregate =
        w.child.collectFirst { case a: BaseAggregateExec => a }.isDefined
      assert(spec.size >= 2 || overAggregate,
        s"corpus-sized window partitioned on $spec")
    }
  }

  test("no registered query plans an UNPARTITIONED WindowExec (the " +
      "single-task total-order scale hazard)") {
    import org.apache.spark.sql.execution.window.WindowExec
    // Excluded: every x* query of the streaming module runs a real
    // micro-batch engine inside run() (their foreachBatch plans are
    // gated separately in StreamingPlanAuditSpec) — derived from the
    // module itself, not a name prefix, so new streaming queries (x60+)
    // can't silently re-enter the sweep; the module's q* entries are
    // batch decode paths and stay swept. The ml_* MLlib fits are minutes
    // of tree induction with no relational windows of ours.
    val excluded = Set("ml_rf_pipeline", "ml_cv_rf", "ml_gbt_ovr")
    val streamingEngines = graft.engine.streaming.StreamQueries.queries
      .map(_.name).filter(_.startsWith("x")).toSet
    val offenders = graft.engine.Registry.all
      .filterNot(q => excluded.contains(q.name) ||
        streamingEngines.contains(q.name))
      .flatMap { q =>
        val plan = q.run(spark, sfDir).queryExecution.sparkPlan
        plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => q.name
        }
      }.distinct
    assert(offenders.isEmpty,
      s"unpartitioned WindowExec in: ${offenders.mkString(", ")} — " +
        "bound the input explicitly (coalesce(1)+sortWithinPartitions, " +
        "TakeOrdered) or shard the window")
  }

  test("q59: partitioned read prunes to the filtered partition") {
    val plan = explainFormatted(RelationalQueries.q59)
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("l_returnflag"), s"expected partition filter, plan:\n${plan.take(3000)}")
  }
}
