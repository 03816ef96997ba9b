package graft.engine.ml

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.engine.schema.Schemas

/** T10 — the data-prep job the reference *documents but never finishes*
  * (reference TrainTestSplit.scala:44-50 promises a 70/30 split + two
  * parquet writes; the code stops after the CSV read, :54-68). This
  * implements the documented intent.
  */
object TrainTestSplit {
  val DefaultTrainPercent = 0.7

  def split(df: DataFrame, trainPercent: Double = DefaultTrainPercent,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    require(trainPercent > 0.0 && trainPercent < 1.0,
      s"trainPercent must be in (0,1), got $trainPercent")
    val Array(train, test) = df.randomSplit(Array(trainPercent, 1.0 - trainPercent), seed)
    (train, test)
  }

  /** CSV (headerless, explicit iris schema — never inferred) → two parquet
    * dirs. Mirrors the reference CLI surface: distinct paths required
    * (reference TrainTestSplit.scala:58), overwrite policy via SaveMode
    * (reference package.scala:31-36).
    */
  def run(spark: SparkSession, input: String, trainPath: String, testPath: String,
      trainPercent: Double = DefaultTrainPercent, seed: Long = 42L,
      overwrite: Boolean = false): Unit = {
    require(trainPath != testPath, "train and test paths must differ")
    val mode = if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists
    val df = spark.read.schema(Schemas.iris).csv(input)
    val (train, test) = split(df, trainPercent, seed)
    train.write.mode(mode).parquet(trainPath)
    test.write.mode(mode).parquet(testPath)
  }
}
