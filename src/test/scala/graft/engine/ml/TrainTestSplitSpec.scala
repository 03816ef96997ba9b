package graft.engine.ml

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

class TrainTestSplitSpec extends AnyFunSuite {

  test("split is disjoint, exhaustive, ~70/30, and deterministic under seed") {
    val data = IrisData.generate(spark).withColumn("id",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    val (tr1, te1) = TrainTestSplit.split(data, 0.7, 42L)
    val (tr2, te2) = TrainTestSplit.split(data, 0.7, 42L)
    assert(tr1.count() + te1.count() == data.count())
    assert(tr1.join(te1, "id").count() == 0)
    val ratio = tr1.count().toDouble / data.count()
    assert(ratio > 0.5 && ratio < 0.9, s"ratio $ratio too far from 0.7")
    assert(tr1.count() == tr2.count() && te1.count() == te2.count())
  }

  test("hashSplit: disjoint, exhaustive, ~fractions, and repartition-stable membership") {
    import spark.implicits._
    val data = (0L until 5000L).toDF("id")
    val splits = TrainTestSplit.hashSplit(data, "id", Seq(0.8, 0.1, 0.1))
    assert(splits.map(_.count()).sum == 5000L)
    assert(splits(0).join(splits(1), "id").count() == 0)
    assert(splits(1).join(splits(2), "id").count() == 0)
    val f = splits(0).count().toDouble / 5000
    assert(f > 0.75 && f < 0.85, s"train fraction $f too far from 0.8")
    // membership (not just counts) must survive a repartition
    val ids1 = splits(1).as[Long].collect().toSet
    val ids2 = TrainTestSplit.hashSplit(data.repartition(13), "id",
      Seq(0.8, 0.1, 0.1))(1).as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("portableHashSplit: folds are exhaustive, ~fractions, repartition-stable, " +
      "and match the SQL twin's cut points") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val data = (0L until 5000L).toDF("id")
    val folds = TrainTestSplit.portableHashSplit(data, "id", Seq(0.8, 0.1, 0.1))
    val counts = folds.groupBy(col("fold")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0L, 1L, 2L), "every fold index assigned")
    assert(counts.values.sum == 5000L)
    val f = counts(0L).toDouble / 5000
    assert(f > 0.75 && f < 0.85, s"fold-0 fraction $f too far from 0.8")
    // assignment (not just counts) survives repartition
    val a1 = folds.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = TrainTestSplit.portableHashSplit(
        data.repartition(13), "id", Seq(0.8, 0.1, 0.1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 == a2)
    // the generated SQL twin names the same cut points
    val sql = TrainTestSplit.sqlPortableFold("id", Seq(0.8, 0.1, 0.1))
    assert(sql.contains("'cccd'") && sql.contains("'e666'"), sql)
    intercept[IllegalArgumentException] {
      TrainTestSplit.portableHashSplit(data, "id", Seq(0.5, 0.4))
    }
  }

  test("hashSplit rejects fractions that don't sum to 1") {
    val data = IrisData.generate(spark)
    intercept[IllegalArgumentException] {
      TrainTestSplit.hashSplit(data, "species", Seq(0.5, 0.4))
    }
  }

  test("run() completes the reference's documented CSV→parquet job (T10)") {
    val dir = Files.createTempDirectory("graft-split").toString
    IrisData.generate(spark).write.option("header", "false").csv(s"$dir/iris_csv")
    TrainTestSplit.run(spark, s"$dir/iris_csv", s"$dir/train", s"$dir/test",
      overwrite = true)
    val train = spark.read.parquet(s"$dir/train")
    val test = spark.read.parquet(s"$dir/test")
    assert(train.count() + test.count() == 150)
    assert(train.columns.toSeq == Seq("sepal_length", "sepal_width",
      "petal_length", "petal_width", "species"))
  }

  test("same train/test path is rejected (T11 input validation)") {
    intercept[IllegalArgumentException] {
      TrainTestSplit.run(spark, "in", "same", "same")
    }
  }

  test("trainPercent outside (0,1) is rejected") {
    intercept[IllegalArgumentException] {
      TrainTestSplit.split(IrisData.generate(spark), 1.5)
    }
  }
}
