package graft.engine.relational

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}
import graft.engine.Registry

class RelationalQueriesSpec extends AnyFunSuite {

  test("asofJoinMerge rejects BinaryType keys (reference-equality hazard)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("event_id", "t")
      .withColumn("k", unhex(lit("0a")))
    val r = Seq((1L, 5L, 7L)).toDF("order_id", "t2", "tie")
      .withColumn("k2", unhex(lit("0a")))
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoinMerge(l, r, "k", "k2", "t", "t2", "tie")
    }
    assert(e.getMessage.contains("BinaryType"))
  }

  test("every registered query runs at sf0.001 and is non-empty") {
    Registry.all.foreach { q =>
      val df = q.run(spark, sfDir)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("every oracle query has matching column aliasing discipline") {
    // The driver sorts columns by name before hashing — oracle SQL and the
    // Spark result must agree on names. We can't parse SQL here, but we can
    // at least require lower_snake_case names with no spaces/parens (which
    // would indicate an unaliased aggregate).
    Registry.all.foreach { q =>
      val cols = q.run(spark, sfDir).columns
      cols.foreach { c =>
        assert(c.matches("[a-z][a-z0-9_]*"), s"${q.name}: suspicious column name '$c'")
      }
    }
  }

  test("q01 groups by the 6 (returnflag, linestatus) pairs present") {
    val rows = RelationalQueries.q01.run(spark, sfDir).collect()
    assert(rows.length >= 4 && rows.length <= 9)
    val counts = rows.map(_.getAs[Long]("count_order"))
    assert(counts.forall(_ > 0))
  }

  test("q14 rank never exceeds 5 and starts at 1 per nation") {
    val rows = RelationalQueries.q14.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("rnk")).forall(r => r >= 1 && r <= 5))
    val byNation = rows.groupBy(_.getAs[Long]("nationkey"))
    byNation.values.foreach(rs => assert(rs.map(_.getAs[Long]("rnk")).min == 1))
  }

  test("q18 set algebra: result ⊆ nation<12 customers, disjoint from cheap-F customers") {
    val result = RelationalQueries.q18.run(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val c = graft.engine.Tables.customer(spark, sfDir)
    val k = c.filter(org.apache.spark.sql.functions.col("c_nationkey") < 12)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(result.subsetOf(k))
  }

  test("q26 sliding windows double-count events vs q25 tumbling") {
    val tumbling = RelationalQueries.q25.run(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    val sliding = RelationalQueries.q26.run(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(sliding == 2 * tumbling, s"each event must land in exactly 2 sliding windows ($sliding vs $tumbling)")
  }

  test("q27 session counts sum to total events") {
    val sessions = RelationalQueries.q27.run(spark, sfDir)
    val total = sessions.agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect()(0).getLong(0)
    val events = graft.engine.Tables.events(spark, sfDir).count()
    assert(total == events)
  }
}
