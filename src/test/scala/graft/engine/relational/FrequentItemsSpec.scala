package graft.engine.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** FrequentItems contracts: the Misra–Gries guarantees (no overcount,
  * n/(c+1)-bounded undercount, heavy items always tracked, capacity
  * bound) over seeded random streams under MANY different merge trees —
  * the aggregator's reduce/merge driven directly — plus the exact regime
  * (capacity ≥ NDV == GROUP BY) and partitioning invariance through the
  * real Spark aggregation path. */
class FrequentItemsSpec extends AnyFunSuite {
  import spark.implicits._

  private def checkGuarantees(items: Seq[String], c: Int,
      summary: Map[String, Long]): Unit = {
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = items.size.toLong
    assert(summary.size <= c, s"capacity $c exceeded: ${summary.size}")
    summary.foreach { case (k, est) =>
      assert(est <= exact(k), s"overcount on $k: est $est > true ${exact(k)}")
    }
    exact.foreach { case (k, t) =>
      val under = t - summary.getOrElse(k, 0L)
      assert(under * (c + 1) <= n,
        s"undercount bound broken on $k: true $t est ${summary.getOrElse(k, 0L)} n $n c $c")
    }
  }

  test("MG guarantees hold over seeded skewed streams and random merge trees") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      val nDistinct = 5 + rnd.nextInt(200)
      val c = 1 + rnd.nextInt(16)
      // zipf-ish skew: item i drawn with weight 1/(i+1)
      val weights = (0 until nDistinct).map(i => 1.0 / (i + 1))
      val total = weights.sum
      val items = Seq.fill(500 + rnd.nextInt(2000)) {
        var u = rnd.nextDouble() * total; var i = 0
        while (u > weights(i)) { u -= weights(i); i += 1 }
        s"item$i"
      }
      val agg = new FrequentItems.MisraGriesAggregator(c)
      // random partitioning into 1..8 chunks, each reduced then all merged
      // in shuffled order — models Spark's arbitrary partial/merge tree
      val chunks = items.grouped(1 + items.size / (1 + rnd.nextInt(8))).toSeq
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      checkGuarantees(items, c, merged)
      // a heavy item (> n/(c+1)) must be tracked
      val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = items.size.toLong
      exact.filter { case (_, t) => t * (c + 1) > n }.keys.foreach { k =>
        assert(merged.contains(k), s"trial $trial: heavy $k evicted (c=$c)")
      }
    }
  }

  test("exact regime: capacity >= NDV equals GROUP BY under any partitioning") {
    val rnd = new scala.util.Random(7)
    val items = Seq.fill(3000)(s"k${rnd.nextInt(12)}")
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 3, 8)) {
      val got = items.toDF("item").repartition(parts)
        .agg(FrequentItems.frequentItems(16, col("item")).as("mg"))
        .select(explode(col("mg")).as(Seq("k", "v"))).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exact, s"parts=$parts")
    }
  }

  test("sketch regime through Spark: guarantees survive the real exchange") {
    val rnd = new scala.util.Random(11)
    val items = Seq.fill(4000)(
      if (rnd.nextDouble() < 0.4) "hot" else s"u${rnd.nextInt(300)}")
    val summary = items.toDF("item").repartition(8)
      .agg(FrequentItems.frequentItems(6, col("item")).as("mg"))
      .select(explode(col("mg")).as(Seq("k", "v"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    checkGuarantees(items, 6, summary)
    assert(summary.contains("hot"), "40%-of-stream item must survive c=6")
  }

  test("degenerate capacities: c=1 tracks a majority item; empty input is empty") {
    val items = Seq.fill(60)("maj") ++ Seq.fill(10)("a") ++ Seq.fill(10)("b")
    val agg = new FrequentItems.MisraGriesAggregator(1)
    val s = items.foldLeft(agg.zero)(agg.reduce)
    checkGuarantees(items, 1, s)
    assert(s.keySet == Set("maj"), s"majority item must be the survivor: $s")
    assert(agg.merge(agg.zero, agg.zero).isEmpty)
    intercept[IllegalArgumentException] {
      new FrequentItems.MisraGriesAggregator(0)
    }
  }
}
