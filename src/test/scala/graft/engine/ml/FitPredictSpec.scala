package graft.engine.ml

import java.nio.file.Files
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark
import graft.engine.schema.Schemas.IrisColumns._

/** Golden ML checks (SURVEY.md §5.4): no oracle exists for tree induction,
  * so assert behavioral invariants — deterministic split, accuracy over a
  * threshold on the separable fixture, schema of the scored output, and
  * save/load round-trips (S4/S5). */
class FitPredictSpec extends AnyFunSuite {

  private lazy val data = IrisData.generate(spark)
  private lazy val Array(trainDf, testDf) = data.randomSplit(Array(0.7, 0.3), 42L)

  private def accuracy(scored: org.apache.spark.sql.DataFrame): Double =
    Metrics.multiclassMetrics(scored, label, prediction)
      .collect()(0).getAs[Double]("accuracy")

  test("manual fit reaches accuracy >= 0.9 and emits the scored schema") {
    val model = Fit.manual(trainDf)
    val scored = model.transform(testDf)
    val cols = scored.columns.toSet
    assert(Set(label, features, "rawPrediction", "probability", prediction,
      predictedTarget).subsetOf(cols))
    assert(accuracy(scored) >= 0.9)
  }

  test("pipelined fit matches manual fit predictions") {
    val manualPred = Fit.manual(trainDf).transform(testDf)
      .select(col("sepal_length"), col(predictedTarget)).collect().toSeq
    val pipePred = Fit.pipelined(trainDf).transform(testDf)
      .select(col("sepal_length"), col(predictedTarget)).collect().toSeq
    assert(manualPred == pipePred)
  }

  test("cross-validated fit selects a model with accuracy >= 0.9") {
    val cv = Fit.crossValidated(trainDf)
    assert(accuracy(cv.transform(testDf)) >= 0.9)
    assert(cv.avgMetrics.nonEmpty && cv.avgMetrics.forall(m => m >= 0.0 && m <= 1.0))
  }

  test("GBT OneVsRest pipeline reaches accuracy >= 0.9 and emits probability") {
    val model = Fit.gbtOneVsRest(trainDf)
    val scored = model.transform(testDf)
    assert(accuracy(scored) >= 0.9)
    assert(scored.columns.contains(predictedTarget))
    // T5 output-schema parity: both classifier paths emit a probability
    // vector; softmax rows sum to 1 and the argmax agrees with prediction
    assert(scored.columns.contains("probability"))
    scored.select(col("probability"), col(prediction)).collect().foreach { r =>
      val p = r.getAs[org.apache.spark.ml.linalg.Vector](0).toArray
      assert(math.abs(p.sum - 1.0) < 1e-9)
      assert(p.indexOf(p.max).toDouble == r.getDouble(1))
    }
  }

  test("pipeline model save/load round-trip scores identically (S4/S5)") {
    val dir = Files.createTempDirectory("graft-model").toString
    val model = Fit.pipelined(trainDf)
    Predict.saveStage(model, s"$dir/pipeline")
    val reloaded = Predict.loadStage(PipelineModel, s"$dir/pipeline")
    val a = model.transform(testDf).select(col(predictedTarget)).collect().toSeq
    val b = reloaded.transform(testDf).select(col(predictedTarget)).collect().toSeq
    assert(a == b)
  }

  test("predict writes parquet with save-mode policy (S3)") {
    val dir = Files.createTempDirectory("graft-out").toString
    val scored = Fit.pipelined(trainDf).transform(testDf)
    Predict.write(scored.select(col("sepal_length"), col(predictedTarget)),
      s"$dir/pred", overwrite = false, singleFile = true)
    intercept[Exception] {
      Predict.write(scored.select(col(predictedTarget)), s"$dir/pred", overwrite = false)
    }
    Predict.write(scored.select(col(predictedTarget)), s"$dir/pred", overwrite = true)
    assert(spark.read.parquet(s"$dir/pred").count() == testDf.count())
  }
}
