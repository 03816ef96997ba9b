package graft.engine.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time join): for each left row, the single right row
  * with the same key and the greatest right-time ≤ left-time.
  *
  * Composed from built-ins per the preference order (a) — equi-join on the
  * key, range predicate, then a row_number window per left row — which
  * keeps Catalyst free to pick broadcast vs sort-merge for the key join and
  * AQE free to handle skew. A dedicated SparkPlan (merge-scan over
  * time-sorted buckets) only pays off when right-rows-per-key is large;
  * for bounded fan-in (here: ~10 orders/customer) the composed plan is a
  * single shuffle + window.
  */
object AsOf {
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftRowId: Column, tieBreak: Column): DataFrame = {
    val joined = left.join(right, leftKey === rightKey && rightTime <= leftTime)
    val w = Window.partitionBy(leftRowId)
      .orderBy(rightTime.desc, tieBreak.desc)
    joined.withColumn("_asof_rn", row_number().over(w))
      .filter(col("_asof_rn") === 1)
      .drop("_asof_rn")
  }
}
