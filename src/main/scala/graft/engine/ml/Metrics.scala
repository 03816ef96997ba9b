package graft.engine.ml

import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multiclass evaluation (SURVEY.md §2.3 A1) as ONE confusion-matrix
  * aggregation instead of the reference's four uncached full-table
  * evaluator passes (reference package.scala:70-78 ×
  * pipeline/Predict.scala:67-70 — a known inefficiency SURVEY.md §4 says
  * to fix).
  *
  * The confusion matrix is k² rows, so everything after the first
  * `groupBy(label, prediction)` is negligible at any scale — the input
  * table is touched exactly once.
  */
object Metrics {

  /** Confusion matrix: (label, prediction, n). One hash-agg pass. */
  def confusionMatrix(scored: DataFrame, labelCol: String, predCol: String): DataFrame =
    scored.groupBy(col(labelCol).cast(LongType).as("label"),
        col(predCol).cast(LongType).as("prediction"))
      .agg(count(lit(1)).as("n"))

  /** accuracy / weightedPrecision / weightedRecall / weightedF1 in a single
    * row, derived from the confusion matrix (still one pass over the data).
    * Per-class convention matches MLlib `MulticlassMetrics`: a class with
    * zero predicted positives has precision 0.
    */
  def multiclassMetrics(scored: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cm = confusionMatrix(scored, labelCol, predCol)
    // per-class stats: support (actual), predicted-positive, true-positive
    val byLabel = cm.groupBy(col("label")).agg(sum(col("n")).as("support"),
      sum(when(col("prediction") === col("label"), col("n")).otherwise(lit(0L))).as("tp"))
    val byPred = cm.groupBy(col("prediction").as("label"))
      .agg(sum(col("n")).as("pp"))
    val perClass = byLabel.join(byPred, Seq("label"), "left")
      .select(col("label"), col("support"), col("tp"),
        coalesce(col("pp"), lit(0L)).as("pp"))
      .withColumn("precision",
        when(col("pp") === 0L, lit(0.0)).otherwise(col("tp").cast("double") / col("pp")))
      .withColumn("recall", col("tp").cast("double") / col("support"))
      .withColumn("f1", when(col("precision") + col("recall") === 0.0, lit(0.0))
        .otherwise(lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall"))))
    perClass.agg(
      round(sum(col("tp")).cast("double") / sum(col("support")), 6).as("accuracy"),
      round(sum(col("precision") * col("support")) / sum(col("support")), 6).as("weighted_precision"),
      round(sum(col("recall") * col("support")) / sum(col("support")), 6).as("weighted_recall"),
      round(sum(col("f1") * col("support")) / sum(col("support")), 6).as("weighted_f1"))
  }

  /** Per-class precision/recall/f1 table (ordered, oracle-friendly). */
  def perClassMetrics(scored: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cm = confusionMatrix(scored, labelCol, predCol)
    val byLabel = cm.groupBy(col("label")).agg(sum(col("n")).cast(LongType).as("support"),
      sum(when(col("prediction") === col("label"), col("n")).otherwise(lit(0L)))
        .cast(LongType).as("tp"))
    val byPred = cm.groupBy(col("prediction").as("label"))
      .agg(sum(col("n")).cast(LongType).as("pp"))
    byLabel.join(byPred, Seq("label"), "left")
      .select(col("label"), col("support"), col("tp"),
        coalesce(col("pp"), lit(0L)).as("pp"))
      .withColumn("precision", round(when(col("pp") === 0L, lit(0.0))
        .otherwise(col("tp").cast("double") / col("pp")), 6))
      .withColumn("recall", round(col("tp").cast("double") / col("support"), 6))
      .withColumn("f1", round(when(col("precision") + col("recall") === 0.0, lit(0.0))
        .otherwise(lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall"))), 6))
      .orderBy(col("label"))
  }

  /** Reference-parity evaluator API (MulticlassClassificationEvaluator),
    * computed over a cached input — used by tests to cross-check the
    * relational implementation, and by the predict jobs for reporting.
    * (reference package.scala:46-51, 70-78)
    */
  def evaluatorMetrics(scored: DataFrame, labelCol: String, predCol: String): Map[String, Double] = {
    val cached = scored.select(col(labelCol).cast("double").as("label"),
      col(predCol).cast("double").as("prediction")).cache()
    try {
      val ev = new MulticlassClassificationEvaluator()
        .setLabelCol("label").setPredictionCol("prediction")
      Seq("accuracy", "f1", "weightedPrecision", "weightedRecall")
        .map(m => m -> ev.setMetricName(m).evaluate(cached)).toMap
    } finally { cached.unpersist() }
  }

  /** EXACT binary ROC-AUC as a relational computation — the Mann-Whitney
    * rank statistic with the standard tie correction
    * (AUC = P(s₊ > s₋) + ½·P(s₊ = s₋)), computed WITHOUT a corpus sort:
    * one aggregation keyed on the score VALUE (quantized to 6 dp — the
    * same rounding every cross-engine float in this repo rides), then
    * one running-sum window over the aggregated distinct-score table
    * (PlanAudit's bounded-window rule: aggregate below the window).
    * All numerators/denominators accumulate as exact longs; only the
    * final division is floating point, rounded to 6 dp.
    *
    * AUC = [ Σ_s n₊(s)·cumN₋(<s) + ½ Σ_s n₊(s)·n₋(s) ] / (N₊·N₋).
    *
    * BOUNDEDNESS CONTRACT: the distinct-score table (and hence the one
    * single-task window) is bounded by range·10⁶ — 2·10⁶ + 1 rows for
    * probabilities/normalized scores, the intended input. A raw feature
    * with an unbounded range must be normalized or coarser-quantized by
    * the caller first, or the window degenerates into the global-sort
    * shape this operator exists to avoid. NULL scores and NULL labels
    * are EXCLUDED before anything counts (a NULL score ranks
    * nondeterministically across engines — first in Spark, last in
    * DuckDB — so admitting them would break the cross-engine replay);
    * n_pos/n_neg reflect the scored rows only.
    *
    * `labelCol` must be 0/1. Returns one row (auc, n_pos, n_neg) when
    * any scored row survives the NULL exclusion; an EMPTY input (or one
    * whose scores/labels are all NULL) returns an EMPTY frame — there is
    * no population to evaluate, and a fabricated all-zero row would read
    * as a measured 0. A single-class input yields auc = NULL (undefined,
    * the caller decides), never NaN. */
  def binaryAuc(scored: DataFrame, labelCol: String,
      scoreCol: String): DataFrame =
    binaryAucBy(scored.withColumn("_measure", lit("all")), "_measure",
      labelCol, scoreCol).drop("measure")

  /** [[binaryAuc]] for several measures in ONE pass — the evaluation
    * dashboard shape (N models / N screening features over one scored
    * table): the score aggregation and the running-sum window both
    * partition by `measureCol`, so all measures cost one scan and one
    * (per-measure-bounded) window, the exact plan the ml_auc oracle SQL
    * writes. Same contracts as [[binaryAuc]], one row per measure. */
  def binaryAucBy(scored: DataFrame, measureCol: String, labelCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(measureCol).as("measure"),
        round(col(scoreCol).cast("double"), 6).as("s"))
      .agg(sum(col(labelCol).cast(LongType)).as("np"),
        sum(lit(1L) - col(labelCol).cast(LongType)).as("nn"))
    val below = Window.partitionBy(col("measure")).orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("cumnn", coalesce(sum(col("nn")).over(below), lit(0L)))
      .groupBy(col("measure"))
      .agg(sum(col("np")).as("npos"), sum(col("nn")).as("nneg"),
        sum(col("np") * col("cumnn")).as("u1"),
        sum(col("np") * col("nn")).as("u2"))
      .select(col("measure"),
        when(col("npos") > 0 && col("nneg") > 0,
          round((col("u1").cast("double") + col("u2").cast("double") / 2.0)
            / (col("npos").cast("double") * col("nneg").cast("double")), 6))
          .as("auc"),
        col("npos").cast(LongType).as("n_pos"),
        col("nneg").cast(LongType).as("n_neg"))
  }
}
