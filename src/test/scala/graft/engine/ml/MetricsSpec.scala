package graft.engine.ml

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

class MetricsSpec extends AnyFunSuite {
  import spark.implicits._

  // Hand-computed 3×3 fixture (SURVEY.md §5.1):
  // labels:      0×5, 1×3, 2×2 (10 rows)
  // predictions: class0: 4 right + 1 as class1
  //              class1: 2 right + 1 as class2
  //              class2: 2 right
  private val pairs = Seq(
    (0, 0), (0, 0), (0, 0), (0, 0), (0, 1),
    (1, 1), (1, 1), (1, 2),
    (2, 2), (2, 2))

  private lazy val scored = pairs.toDF("label", "prediction")

  test("confusion matrix counts match hand computation") {
    val cm = Metrics.confusionMatrix(scored, "label", "prediction")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cm == Map((0L, 0L) -> 4L, (0L, 1L) -> 1L, (1L, 1L) -> 2L,
      (1L, 2L) -> 1L, (2L, 2L) -> 2L))
  }

  test("multiclass metrics match hand computation") {
    val m = Metrics.multiclassMetrics(scored, "label", "prediction").collect()(0)
    // accuracy = 8/10
    assert(m.getAs[Double]("accuracy") == 0.8)
    // precision: c0=4/4, c1=2/3, c2=2/3 → weighted = (1*5 + 2/3*3 + 2/3*2)/10 = 0.833333
    assert(math.abs(m.getAs[Double]("weighted_precision") - 0.833333) < 1e-6)
    // recall: c0=4/5, c1=2/3, c2=2/2 → weighted = (0.8*5 + 2/3*3 + 1*2)/10 = 0.8
    assert(math.abs(m.getAs[Double]("weighted_recall") - 0.8) < 1e-6)
  }

  test("relational metrics agree with MulticlassClassificationEvaluator") {
    val m = Metrics.multiclassMetrics(scored, "label", "prediction").collect()(0)
    val ev = Metrics.evaluatorMetrics(scored, "label", "prediction")
    assert(math.abs(m.getAs[Double]("accuracy") - ev("accuracy")) < 1e-6)
    assert(math.abs(m.getAs[Double]("weighted_precision") - ev("weightedPrecision")) < 1e-6)
    assert(math.abs(m.getAs[Double]("weighted_recall") - ev("weightedRecall")) < 1e-6)
    assert(math.abs(m.getAs[Double]("weighted_f1") - ev("f1")) < 1e-6)
  }

  test("metrics are bounded in [0,1] on skewed predictions") {
    val skewed = Seq.tabulate(50)(i => (i % 3, 0)).toDF("label", "prediction")
    val m = Metrics.multiclassMetrics(skewed, "label", "prediction").collect()(0)
    Seq("accuracy", "weighted_precision", "weighted_recall", "weighted_f1").foreach { c =>
      val v = m.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c=$v out of range")
    }
  }

  test("binaryAuc: hand-computed fixture with ties, perfect and reversed " +
      "separations, and single-class NULL") {
    def auc(rows: Seq[(Long, Double)]): Option[Double] = {
      val r = Metrics.binaryAuc(rows.toDF("y", "score"), "y", "score")
        .collect()(0)
      val out = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      assert(r.getLong(1) == rows.count(_._1 == 1L) &&
        r.getLong(2) == rows.count(_._1 == 0L))
      out
    }
    // pos scores {0.4, 0.8}, neg {0.1, 0.4}: wins 3, tie 1 of 4 pairs
    // -> AUC = (3 + 0.5)/4 = 0.875
    assert(auc(Seq((0L, 0.1), (0L, 0.4), (1L, 0.4), (1L, 0.8)))
      .contains(0.875))
    // perfect separation / full reversal / all-tied
    assert(auc(Seq((0L, 0.1), (0L, 0.2), (1L, 0.7), (1L, 0.9)))
      .contains(1.0))
    assert(auc(Seq((1L, 0.1), (1L, 0.2), (0L, 0.7), (0L, 0.9)))
      .contains(0.0))
    assert(auc(Seq((0L, 0.5), (1L, 0.5), (0L, 0.5), (1L, 0.5)))
      .contains(0.5))
    // single-class inputs are undefined, surfaced as NULL not NaN
    assert(auc(Seq((1L, 0.3), (1L, 0.9))).isEmpty)
    assert(auc(Seq((0L, 0.3), (0L, 0.9))).isEmpty)
    // quantization contract: sub-6dp differences collapse to a tie
    assert(auc(Seq((0L, 0.50000004), (1L, 0.50000001))).contains(0.5))
  }

  test("binaryAuc: NULL scores are excluded (not ranked), empty input " +
      "yields an empty frame, and binaryAucBy == per-measure calls") {
    val withNulls = Seq((Some(0L), Some(0.1)), (Some(1L), None),
        (Some(1L), Some(0.9)), (None, Some(0.4)))
      .toDF("y", "score")
    val r = Metrics.binaryAuc(withNulls, "y", "score").collect()(0)
    // only (0, 0.1) and (1, 0.9) count -> AUC 1.0 over 1 pos / 1 neg
    assert(r.getDouble(0) == 1.0 && r.getLong(1) == 1L && r.getLong(2) == 1L)
    val empty = Seq.empty[(Long, Double)].toDF("y", "score")
    assert(Metrics.binaryAuc(empty, "y", "score").count() == 0L,
      "no scored rows -> no measure row")
    // grouped == per-measure filtering
    val two = Seq(("a", 0L, 0.1), ("a", 1L, 0.9),
        ("b", 1L, 0.2), ("b", 0L, 0.7)).toDF("m", "y", "score")
    val grouped = Metrics.binaryAucBy(two, "m", "y", "score")
      .collect().map(r2 => r2.getString(0) -> r2.getDouble(1)).toMap
    assert(grouped == Map("a" -> 1.0, "b" -> 0.0))
  }
}
