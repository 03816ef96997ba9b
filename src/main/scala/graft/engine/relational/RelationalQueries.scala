package graft.engine.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{GraftQuery, Tables}
import Exact._

/** Relational core (SURVEY.md §2.5 X6): scans, filters, projections,
  * aggregations, joins, windows, set ops, scalar functions — each as a named
  * query with a DuckDB oracle.
  *
  * Scale notes apply to every query here: filters/projections are expressed
  * before aggregation so Catalyst pushes them into the parquet scan
  * (PushedFilters + pruned ReadSchema); aggregations are hash-aggregates
  * with map-side partials; the ORDER BY at the tail is on an
  * already-reduced (small) result, so its global sort is cheap at any scale.
  */
object RelationalQueries {

  /** q01 — TPC-H Q1-shaped pricing summary: filter → hash-agg → sort.
    * The flagship query. At 100 TB this is a single scan + partial agg
    * (8 groups), so the shuffle carries only #partitions × #groups rows.
    */
  val q01PricingSummary = GraftQuery(
    "q01_pricing_summary",
    (spark, sfDir) => {
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          lcount().as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${sqlDsum("l_quantity")} AS sum_qty,
      ${sqlDsum("l_extendedprice")} AS sum_base_price,
      ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
      ${sqlDavg("l_quantity")} AS avg_qty,
      ${sqlDavg("l_extendedprice")} AS avg_price,
      ${sqlDavg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    doc = "TPC-H Q1 shape: filtered scan + 8-group hash aggregate")

  def queries: Seq[GraftQuery] = Seq(q01PricingSummary)
}
