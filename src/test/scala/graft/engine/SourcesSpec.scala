package graft.engine

import java.nio.file.Files
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}

/** Source/sink coverage beyond the driver harness (SURVEY.md §2.1 S1–S3
  * generalized): CSV/JSON/ORC round-trips with explicit schemas, partitioned
  * writes with partition pruning, and bucketed tables joining without a
  * shuffle — the 100 TB co-located-join strategy, provable in the plan. */
class SourcesSpec extends AnyFunSuite {

  private def tmp(): String = Files.createTempDirectory("graft-src").toString

  private lazy val li = Tables.lineitem(spark, sfDir)
    .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_returnflag"))

  test("CSV round-trip with explicit schema (never inferred)") {
    val dir = tmp()
    li.write.option("header", "false").csv(s"$dir/csv")
    val back = spark.read.schema(
      "l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE, l_returnflag STRING")
      .csv(s"$dir/csv")
    assert(back.count() == li.count())
    assert(back.agg(sum(col("l_quantity"))).collect()(0).getDouble(0) ==
      li.agg(sum(col("l_quantity"))).collect()(0).getDouble(0))
  }

  test("JSON round-trip with explicit schema") {
    val dir = tmp()
    li.limit(100).write.json(s"$dir/json")
    val back = spark.read.schema(li.schema).json(s"$dir/json")
    assert(back.count() == 100)
    assert(back.schema == li.schema)
  }

  test("ORC round-trip preserves values") {
    val dir = tmp()
    li.limit(100).write.orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
    assert(back.count() == 100)
    assert(back.schema.fieldNames.toSeq == li.schema.fieldNames.toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp()
    li.write.partitionBy("l_returnflag").parquet(s"$dir/part")
    val pruned = spark.read.parquet(s"$dir/part")
      .filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("l_returnflag"), s"expected partition pruning in:\n$plan")
    assert(pruned.count() ==
      li.filter(col("l_returnflag") === "R").count())
  }

  test("bucketed tables join WITHOUT a shuffle (co-located join)") {
    val suffix = System.nanoTime()
    val liT = s"li_bucketed_$suffix"
    val oT = s"o_bucketed_$suffix"
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(liT)
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(oT)
    try {
      val joined = spark.table(liT).join(spark.table(oT),
        col("l_orderkey") === col("o_orderkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle; plan:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == Tables.lineitem(spark, sfDir).count())
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $liT")
      spark.sql(s"DROP TABLE IF EXISTS $oT")
    }
  }
}
