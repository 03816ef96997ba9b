package graft.engine.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}
import graft.engine.Tables

class SaltingSpec extends AnyFunSuite {

  test("saltedCount equals plain groupBy count") {
    val li = Tables.lineitem(spark, sfDir)
    val plain = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(li, "l_returnflag", col("l_orderkey"), 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join (row multiplicity preserved)") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_linenumber"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Salting.saltedJoin(li, o, "l_orderkey", col("l_linenumber"), 8)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, q)) =>
      assert(n == plain(k)._1, s"count mismatch for $k")
      assert(math.abs(q - plain(k)._2) < 1e-6, s"sum mismatch for $k")
    }
  }

  test("salted aggregation spreads a hot key over multiple partial groups") {
    import spark.implicits._
    val skewed = Seq.tabulate(1000)(i => ("hot", i.toLong)) ++
      Seq.tabulate(10)(i => (s"cold$i", i.toLong))
    val df = skewed.toDF("k", "v")
    val partials = df.withColumn("_salt", pmod(xxhash64(col("v")), lit(8L)))
      .groupBy(col("k"), col("_salt")).count()
      .filter(col("k") === "hot").count()
    assert(partials > 1, "hot key must split across salt buckets")
    val result = Salting.saltedCount(df, "k", col("v"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(result("hot") == 1000L)
  }
}
