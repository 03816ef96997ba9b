package graft.engine.ml

import org.apache.spark.ml.util.{MLReadable, MLWritable}
import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.engine.schema.Schemas.IrisColumns._

/** The reference's SCORING lifecycle (SURVEY.md §3.3), with its two
  * inefficiencies fixed:
  *  - the scored frame is cached once, and all four metrics come from ONE
  *    confusion-matrix pass (vs 4 uncached full-table evaluator re-runs,
  *    reference package.scala:70-78);
  *  - output is written with `coalesce(1)` (narrow) instead of
  *    `repartition(1)` (full shuffle, reference pipeline/Predict.scala:60) —
  *    and only when the caller explicitly asks for a single file; at scale
  *    the default keeps the natural partitioning.
  */
object Predict {

  final case class PredictResult(scored: DataFrame, metrics: DataFrame)

  def score(transform: DataFrame => DataFrame, test: DataFrame): PredictResult = {
    val scored = transform(test)
    PredictResult(scored, Metrics.multiclassMetrics(scored, label, prediction))
  }

  /** Write scored output with the reference's save-mode policy
    * (reference package.scala:31-36). `singleFile` reproduces the
    * reference's 1-partition output without the shuffle. */
  def write(scored: DataFrame, path: String, overwrite: Boolean,
      singleFile: Boolean = false): Unit = {
    val mode = if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists
    val out = if (singleFile) scored.coalesce(1) else scored
    out.write.mode(mode).parquet(path)
  }

  // ---- Operator-state persistence (S4/S5) ----

  /** Save a fitted stage (reference persistPipelineStage,
    * no_pipeline/ModelFit.scala:143-152). Always saves the FITTED state —
    * the reference's CV non-overwrite branch saved the unfitted estimator
    * (bug noted in SURVEY.md §2.1; not replicated). */
  def saveStage(stage: MLWritable, path: String, overwrite: Boolean = true): Unit =
    if (overwrite) stage.write.overwrite().save(path) else stage.save(path)

  def loadStage[T](reader: MLReadable[T], path: String): T = reader.load(path)
}
