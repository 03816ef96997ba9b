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

  /** The large-fan-in refinement the [[asofJoin]] scaladoc promises: a
    * merge-scan over key-partitioned, time-sorted streams via
    * `mapPartitions` (preference order (d), used because the composed plan
    * genuinely cannot express it). Precisely what it buys on Spark 4:
    * the composed plan's SHUFFLE is already safe (WindowGroupLimit prunes
    * the rank filter map-side — measured in HotKeyStressSpec), but the
    * equi-join still COMPUTES every left×matching-right intermediate
    * before the limit discards them — O(L·fan-in) CPU, 10⁴× the useful
    * work at 10⁴ right rows per key. The merge walk never forms those
    * rows: O(L + R) per partition, each input row crosses the one
    * exchange exactly once.
    *
    * Shape: both sides union into (key, time, side, tie, payload) rows,
    * hash-repartition on key, sort within partitions by
    * (key, time, side=right-first, tie) — so walking a partition in order,
    * the last-seen right row IS the as-of match for every left row
    * (right rows at time == left-time sort first: the ≤ is inclusive;
    * ties resolve to the max tieBreak exactly like the window's
    * `tieBreak.desc`). Same INNER semantics as [[asofJoin]]: null keys and
    * null times never match and are filtered like the join predicate
    * drops them; a left row before any right row is dropped.
    *
    * Column-NAME parameters (values must be extracted from raw rows);
    * the right time column is cast to the left's type up front — the same
    * coercion the composed join's `rightTime <= leftTime` applies.
    *
    * Key columns must have VALUE equality on their JVM representation —
    * the partition walk detects key changes with `!=` on `Row.get`
    * values. Atomic types, structs, arrays and maps all satisfy this
    * (Catalyst surfaces them as case-class-equal Scala values), but
    * BinaryType surfaces as `Array[Byte]` whose `!=` is REFERENCE
    * equality: every row would look like a new key and silently reset
    * the merge state, dropping matches. Rejected up front. */
  def asofJoinMerge(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      tieBreakCol: String): DataFrame = {
    val lSchema = left.schema
    val rSchema = right.schema
    def hasBinary(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.BinaryType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasBinary(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasBinary(a.elementType)
      case m: org.apache.spark.sql.types.MapType => hasBinary(m.keyType) || hasBinary(m.valueType)
      case _ => false
    }
    require(!hasBinary(lSchema(leftKeyCol).dataType) &&
        !hasBinary(rSchema(rightKeyCol).dataType),
      s"asofJoinMerge key columns ($leftKeyCol, $rightKeyCol) must not contain " +
        "BinaryType: Array[Byte] has reference equality in the merge walk's key " +
        "comparison; pre-encode binary keys (e.g. hex(col)) or use asofJoin")
    val outSchema = org.apache.spark.sql.types.StructType(
      lSchema.fields ++ rSchema.fields)
    val tType = lSchema(leftTimeCol).dataType
    val tieType = rSchema(tieBreakCol).dataType
    val lStruct = struct(lSchema.fieldNames.map(col): _*)
    val rStruct = struct(rSchema.fieldNames.map(col): _*)
    val lTagged = left
      .filter(col(leftKeyCol).isNotNull && col(leftTimeCol).isNotNull)
      .select(col(leftKeyCol).as("_k"), col(leftTimeCol).as("_t"),
        lit(1).as("_side"), lit(null).cast(tieType).as("_tie"),
        lStruct.as("_l"),
        lit(null).cast(org.apache.spark.sql.types.StructType(rSchema.fields)).as("_r"))
    val rTagged = right
      .filter(col(rightKeyCol).isNotNull && col(rightTimeCol).isNotNull)
      .select(col(rightKeyCol).as("_k"), col(rightTimeCol).cast(tType).as("_t"),
        lit(0).as("_side"), col(tieBreakCol).as("_tie"),
        lit(null).cast(org.apache.spark.sql.types.StructType(lSchema.fields)).as("_l"),
        rStruct.as("_r"))
    val sorted = lTagged.unionByName(rTagged)
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_t"), col("_side"), col("_tie"))
    sorted.mapPartitions { it =>
      var curKey: Any = null
      var haveKey = false
      var lastRight: org.apache.spark.sql.Row = null
      it.flatMap { row =>
        val k = row.get(0)
        if (!haveKey || k != curKey) {
          curKey = k; haveKey = true; lastRight = null
        }
        if (row.getInt(2) == 0) {
          lastRight = row.getStruct(5)
          Iterator.empty
        } else if (lastRight != null) {
          Iterator(org.apache.spark.sql.Row.fromSeq(
            row.getStruct(4).toSeq ++ lastRight.toSeq))
        } else Iterator.empty
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }
}
