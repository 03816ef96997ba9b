package graft.engine.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}

/** Raw-estimate invariants of the x28 sketch family, computed directly
  * from the sketch aggregates (x28's driver row now carries oracle-pinned
  * contract BOOLEANS; the raw estimates live here): HLL++ stays inside its
  * advertised relative error, the count-min estimate NEVER underestimates
  * and stays within eps·N above the true count with high probability, and
  * the quantile sketch brackets the true median. Plus the contract row
  * itself: every boolean x28 publishes must be true. */
class StatsSketchSpec extends AnyFunSuite {

  private lazy val li = graft.engine.Tables.lineitem(spark, sfDir)

  // countDistinct stays in its OWN pass — mixing it into the sketch agg
  // compiles to an Expand plan that duplicates every row through the
  // TypedImperativeAggregate sketches (the pathology x28's comment records)
  private lazy val row = li.agg(
      approx_count_distinct(col("l_partkey")).cast(LongType).as("approx_parts"),
      expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
        .as("price_quantiles"),
      expr("count_min_sketch(l_orderkey % 7, 0.001d, 0.99d, 42)").as("cms"),
      sum(when(col("l_orderkey") % 7 === 3, 1L).otherwise(0L))
        .cast(LongType).as("exact_bucket3"))
    .head()

  private lazy val exactParts: Long =
    li.agg(countDistinct(col("l_partkey")).cast(LongType)).head().getLong(0)

  test("HLL++ distinct estimate within 5% of exact") {
    val approx = row.getAs[Long]("approx_parts").toDouble
    val exact = exactParts.toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("count-min estimate >= exact count, within eps*N slack") {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("cms")))
    val est = cms.estimateCount(java.lang.Long.valueOf(3L))
    val exact = row.getAs[Long]("exact_bucket3")
    assert(est >= exact, "CMS must never underestimate")
    val n = li.count()
    assert(est - exact <= (0.001 * n).toLong + 1,
      s"est=$est exact=$exact n=$n")
  }

  test("approx percentiles are ordered and within the value range") {
    val p50 = row.getSeq[Double](row.fieldIndex("price_quantiles"))(0)
    val p95 = row.getSeq[Double](row.fieldIndex("price_quantiles"))(1)
    assert(p50 <= p95)
    val mm = li.agg(min(col("l_extendedprice")), max(col("l_extendedprice")))
      .head()
    assert(p50 >= mm.getDouble(0) && p95 <= mm.getDouble(1))
  }

  test("x28 contract row: every published sketch contract holds") {
    val r = StatsQueries.x28.run(spark, sfDir).head()
    for (c <- Seq("hll_in_contract", "p50_rank_in_contract",
        "p95_rank_in_contract", "cms_in_contract")) {
      assert(r.getAs[Boolean](c), s"$c is false")
    }
  }
}
