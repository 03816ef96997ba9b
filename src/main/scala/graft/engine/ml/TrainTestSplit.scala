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

  /** Deterministic hash split: each row's fold is a pure function of its
    * key — `xxhash64(key, seed) mod buckets` against cumulative fraction
    * cut points. Unlike `randomSplit` (which samples per-partition, so the
    * assignment changes whenever the table is repartitioned, compacted, or
    * the cluster size changes), the same key lands in the same split on
    * every run at any scale — the property a 100 TB training-data pipeline
    * needs for train/val/test hygiene across re-ingests. Narrow (one filter
    * per split, no shuffle); splits are disjoint and exhaustive by
    * construction. */
  def hashSplit(df: DataFrame, keyCol: String, fractions: Seq[Double],
      seed: Long = 42L): Seq[DataFrame] = {
    import org.apache.spark.sql.functions._
    require(fractions.nonEmpty && fractions.forall(_ > 0.0) &&
      math.abs(fractions.sum - 1.0) < 1e-9,
      s"fractions must be positive and sum to 1, got $fractions")
    val buckets = 1000000L
    val h = pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets))
    val cuts = fractions.scanLeft(0.0)(_ + _).map(f => math.round(f * buckets))
    cuts.init.zip(cuts.tail).map { case (lo, hi) =>
      df.filter(h >= lo && h < hi)
    }
  }

  /** Engine-portable deterministic split: fold = first cumulative-fraction
    * cut point the row's 4-hex-digit md5 prefix falls under (same
    * md5-bucket membership as `Curation.hashSample`, so any engine that has
    * md5 — DuckDB, Trino, Spark — replays the assignment bit-for-bit;
    * [[hashSplit]]'s xxhash64 is Spark-only). Same scale posture: narrow,
    * no shuffle, stable under repartition/re-ingest. Returns (row, fold)
    * rather than one DataFrame per fold so a single pass can write a
    * fold-partitioned table. */
  def portableHashSplit(df: DataFrame, keyCol: String,
      fractions: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.engine.llm.Curation.hexThreshold
    require(fractions.nonEmpty && fractions.forall(_ > 0.0) &&
      math.abs(fractions.sum - 1.0) < 1e-9,
      s"fractions must be positive and sum to 1, got $fractions")
    val h = substring(md5(col(keyCol).cast("string").cast("binary")), 1, 4)
    val cuts = fractions.scanLeft(0.0)(_ + _).tail.init.map(hexThreshold)
    val fold = cuts.zipWithIndex.foldRight(
      lit(fractions.size - 1).cast("bigint")) { case ((cut, i), rest) =>
        when(h < lit(cut), i.toLong).otherwise(rest)
      }
    df.withColumn("fold", fold)
  }

  /** DuckDB/ANSI twin of [[portableHashSplit]]'s fold expression. */
  def sqlPortableFold(keyExpr: String, fractions: Seq[Double]): String = {
    import graft.engine.llm.Curation.hexThreshold
    val h = s"substr(md5(CAST($keyExpr AS VARCHAR)), 1, 4)"
    val cuts = fractions.scanLeft(0.0)(_ + _).tail.init.map(hexThreshold)
    val whens = cuts.zipWithIndex
      .map { case (cut, i) => s"WHEN $h < '$cut' THEN CAST($i AS BIGINT)" }
      .mkString(" ")
    s"CASE $whens ELSE CAST(${fractions.size - 1} AS BIGINT) END"
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
