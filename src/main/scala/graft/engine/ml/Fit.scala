package graft.engine.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.{GBTClassifier, OneVsRest, RandomForestClassifier, RandomForestClassificationModel}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{IndexToString, StringIndexerModel, VectorAssembler}
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import graft.engine.schema.Schemas.IrisColumns._

/** The reference's three FIT shapes (SURVEY.md §3 entry-point mapping) plus
  * the boosted-classifier variant:
  *
  *  - manual stage wiring        (reference no_pipeline/ModelFit.scala:71-141)
  *  - Pipeline composition       (reference pipeline/ModelFit.scala:80-83)
  *  - CrossValidator grid search (reference cross_validation/ModelFit.scala:96-103)
  *  - boosted classifier slot    (reference xgboost_pipeline/ModelFit.scala:39-49;
  *    xgboost4j is not resolvable offline, so the capability — "a second,
  *    gradient-boosted classifier in the same pipeline slot" — is filled by
  *    Spark-native GBTClassifier wrapped in OneVsRest for multiclass).
  *
  * Classifier defaults mirror the reference (maxBins=64, maxDepth=4,
  * minInfoGain=0.01, numTrees=64 — reference no_pipeline/ModelFit.scala:104-110)
  * with a fixed seed added for deterministic tests.
  */
object Fit {

  final case class RfParams(
      maxBins: Int = 64,
      maxDepth: Int = 4,
      minInfoGain: Double = 0.01,
      numTrees: Int = 64,
      seed: Long = 42L)

  def randomForest(p: RfParams = RfParams()): RandomForestClassifier =
    new RandomForestClassifier()
      .setLabelCol(label)
      .setFeaturesCol(features)
      .setMaxBins(p.maxBins)
      .setMaxDepth(p.maxDepth)
      .setMinInfoGain(p.minInfoGain)
      .setNumTrees(p.numTrees)
      .setSeed(p.seed)

  /** Manual stage-by-stage fit: each stage fitted/applied explicitly.
    * Returns every fitted stage so callers can persist them individually
    * (the reference's persistPipelineStage pattern,
    * no_pipeline/ModelFit.scala:143-152).
    */
  final case class ManualModel(
      indexer: StringIndexerModel,
      assembler: VectorAssembler,
      model: RandomForestClassificationModel,
      decoder: IndexToString) {
    def transform(df: DataFrame): DataFrame =
      decoder.transform(model.transform(assembler.transform(indexer.transform(df))))
  }

  def manual(train: DataFrame, p: RfParams = RfParams()): ManualModel = {
    val indexer = Stages.stringIndexer(target, label).fit(train)
    val assembler = Stages.vectorAssembler(predictors, features)
    val rf = randomForest(p)
    val assembled = assembler.transform(indexer.transform(train))
    val model = rf.fit(assembled)
    val decoder = Stages.indexToString(prediction, predictedTarget, indexer)
    ManualModel(indexer, assembler, model, decoder)
  }

  /** Pipeline-composed fit: [StringIndexerModel, VectorAssembler, classifier,
    * IndexToString] with the indexer pre-fitted (reference T8 ordering). */
  def pipelined(train: DataFrame, p: RfParams = RfParams()): PipelineModel = {
    val indexer = Stages.stringIndexer(target, label).fit(train)
    val stages: Array[PipelineStage] = Array(
      indexer,
      Stages.vectorAssembler(predictors, features),
      randomForest(p),
      Stages.indexToString(prediction, predictedTarget, indexer))
    new Pipeline().setStages(stages).fit(train)
  }

  /** CrossValidator grid search over the pipelined estimator
    * (reference M1/M2: grid × k folds, parallel driver threads, keep best).
    * Grid kept small by default — the reference's 108-fit grid is a time
    * sink, not a capability (SURVEY.md §7 risk register).
    */
  def crossValidated(train: DataFrame,
      maxDepths: Seq[Int] = Seq(3, 5),
      numTreesChoices: Seq[Int] = Seq(8, 16),
      numFolds: Int = 3,
      parallelism: Int = 8,
      seed: Long = 42L): CrossValidatorModel = {
    val indexer = Stages.stringIndexer(target, label).fit(train)
    val rf = randomForest(RfParams(seed = seed))
    val pipeline = new Pipeline().setStages(Array(
      indexer,
      Stages.vectorAssembler(predictors, features),
      rf,
      Stages.indexToString(prediction, predictedTarget, indexer)))
    val grid = new ParamGridBuilder()
      .addGrid(rf.maxDepth, maxDepths)
      .addGrid(rf.numTrees, numTreesChoices)
      .build()
    new CrossValidator()
      .setEstimator(pipeline)
      .setEstimatorParamMaps(grid)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol(label).setPredictionCol(prediction).setMetricName("f1"))
      .setNumFolds(numFolds)
      .setParallelism(parallelism)
      .setSeed(seed)
      .fit(train)
  }

  /** Boosted-classifier pipeline (T6 capability slot). Spark GBT is binary,
    * so OneVsRest lifts it to multiclass; [[SoftmaxProbability]] turns the
    * per-class raw margins into a `probability` vector so the output schema
    * matches the RF path (and the reference scorer's, which always emits
    * probability — no_pipeline/Predict.scala:92). */
  def gbtOneVsRest(train: DataFrame, maxIter: Int = 10, maxDepth: Int = 3,
      seed: Long = 42L): PipelineModel = {
    val indexer = Stages.stringIndexer(target, label).fit(train)
    val gbt = new GBTClassifier()
      .setLabelCol(label).setFeaturesCol(features)
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
    val ovr = new OneVsRest()
      .setClassifier(gbt)
      .setParallelism(3) // one slot per class: all 3 binary fits in flight
      .setLabelCol(label).setFeaturesCol(features)
      .setPredictionCol(prediction)
    new Pipeline().setStages(Array(
      indexer,
      Stages.vectorAssembler(predictors, features),
      ovr,
      new SoftmaxProbability(),
      Stages.indexToString(prediction, predictedTarget, indexer)))
      .fit(train)
  }
}
