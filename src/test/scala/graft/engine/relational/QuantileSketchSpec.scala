package graft.engine.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** QuantileSketch contracts: exactness below capacity, exact weight
  * conservation through collapses and merges, and the self-computed
  * rank-error bound holding on adversarial orderings (sorted, reversed,
  * constant — the inputs deterministic compaction is weakest on). */
class QuantileSketchSpec extends AnyFunSuite {
  import spark.implicits._

  private def sketchOf(df: DataFrame, k: Int): DataFrame =
    df.groupBy(col("g")).agg(QuantileSketch.sketchAgg(col("x"), k).as("sk"))

  /** (estimate, total_weight, bound) rows keyed by q. */
  private def estimates(sk: DataFrame, qs: Seq[Double], k: Int)
      : Map[Double, (Double, Long, Long)] =
    QuantileSketch.estimate(sk, "g", "sk", qs, k).collect()
      .map(r => r.getAs[Double]("q") -> ((r.getAs[Double]("estimate"),
        r.getAs[Long]("total_weight"), r.getAs[Long]("bound")))).toMap

  private def checkContract(values: Seq[Double], qs: Seq[Double],
      est: Map[Double, (Double, Long, Long)]): Unit = {
    val n = values.length
    qs.foreach { q =>
      val (e, w, bound) = est(q)
      assert(w == n.toLong, s"weight $w != n $n")
      val target = math.ceil(q * n).toLong
      val lo = values.count(_ < e).toLong
      val hi = values.count(_ <= e).toLong
      assert(lo + 1 <= target + bound && hi >= target - bound,
        s"q=$q est=$e true-rank [$lo+1, $hi] vs target $target ± $bound")
    }
  }

  test("below capacity the sketch is exact order statistics") {
    val values = new scala.util.Random(7)
      .shuffle((1 to 100).toList).map(_.toDouble)
    val sk = sketchOf(values.map(("a", _)).toDF("g", "x"), k = 512)
    val est = estimates(sk, Seq(0.1, 0.5, 0.9, 1.0), k = 512)
    est.foreach { case (q, (e, w, _)) =>
      assert(w == 100L)
      assert(e == math.ceil(q * 100).toDouble,
        s"n<k must be exact: q=$q got $e")
    }
  }

  test("weight is conserved exactly through collapses (n >> k)") {
    // group derived from data, not lit("a"): a foldable partition key is
    // constant-folded OUT of the window's partitionSpec, which would make
    // this spec log the unpartitioned-window warning for a window that is
    // partitioned in every real use
    val df = spark.range(10000).select(
      when(col("id") >= 0, "a").otherwise("b").as("g"),
      (col("id") * 37 % 10000).cast("double").as("x"))
    val est = estimates(sketchOf(df, k = 64), Seq(0.5), k = 64)
    assert(est(0.5)._2 == 10000L)
  }

  test("rank error stays inside the self-computed bound on adversarial " +
      "orderings") {
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val n = 8192
    val asc = (1 to n).map(_.toDouble)
    val cases = Seq(
      "ascending" -> asc,
      "descending" -> asc.reverse,
      "constant" -> Seq.fill(n)(42.0),
      "zipf-ties" -> (1 to n).map(i => math.min(i, 10).toDouble))
    cases.foreach { case (name, values) =>
      // repartition(7): nondeterministic partition merge order exercised
      val df = values.map(("a", _)).toDF("g", "x").repartition(7)
      val est = estimates(sketchOf(df, k = 64), qs, k = 64)
      withClue(name)(checkContract(values, qs, est))
    }
  }

  test("per-batch sketches merged == in-contract over the union, weight " +
      "exact") {
    val n = 9000
    val values = (0 until n).map(i => ((i * 2654435761L) % 100000).toDouble)
    val batches = (0 to 2).map { b =>
      val slice = values.zipWithIndex.collect {
        case (v, i) if i % 3 == b => v }
      sketchOf(slice.map(("a", _)).toDF("g", "x"), k = 64)
    }
    val merged = batches.reduce(_ unionByName _)
      .groupBy(col("g")).agg(QuantileSketch.mergeAgg(col("sk"), 64).as("sk"))
    val est = estimates(merged, Seq(0.5, 0.9), k = 64)
    checkContract(values, Seq(0.5, 0.9), est)
  }
}
