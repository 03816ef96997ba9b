package graft.engine.relational

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}

/** Invariants of the x28 sketch family (no DuckDB oracle — sketches are
  * engine-specific): HLL++ stays inside its advertised relative error, the
  * count-min estimate NEVER underestimates and stays within eps·N above
  * the true count with high probability, and the quantile sketch brackets
  * the true median. */
class StatsSketchSpec extends AnyFunSuite {

  private lazy val row = StatsQueries.x28.run(spark, sfDir).head()

  test("HLL++ distinct estimate within 5% of exact") {
    val approx = row.getAs[Long]("approx_parts").toDouble
    val exact = row.getAs[Long]("exact_parts").toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("count-min estimate >= exact count, within eps*N slack") {
    val est = row.getAs[Long]("cms_bucket3")
    val exact = row.getAs[Long]("exact_bucket3")
    assert(est >= exact, "CMS must never underestimate")
    val n = graft.engine.Tables.lineitem(spark, sfDir).count()
    assert(est - exact <= (0.001 * n).toLong + 1,
      s"est=$est exact=$exact n=$n")
  }

  test("approx percentiles are ordered and within the value range") {
    import org.apache.spark.sql.functions.{col, max, min}
    val p50 = row.getAs[Double]("p50")
    val p95 = row.getAs[Double]("p95")
    assert(p50 <= p95)
    val mm = graft.engine.Tables.lineitem(spark, sfDir)
      .agg(min(col("l_extendedprice")), max(col("l_extendedprice"))).head()
    assert(p50 >= mm.getDouble(0) && p95 <= mm.getDouble(1))
  }
}
