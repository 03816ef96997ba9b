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
}
