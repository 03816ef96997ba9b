package graft.engine.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column (rows, non-nulls, NDV,
  * min, max) in ONE pass over the table — the statistics every
  * cost-based planner and data-quality dashboard wants, shaped for
  * 100 TB.
  *
  * All columns' aggregates are computed in a single wide aggregation
  * (map-side partials, one tiny result row), then pivoted to long format
  * (one row per column) driver-free with `inline` — the scan happens
  * once no matter how many columns are profiled, instead of the
  * one-query-per-column loop an ANALYZE naively runs.
  *
  * NDV is `approx_count_distinct` by DEFAULT: exact multi-column
  * distincts make Catalyst EXPAND the input (one duplicated stream per
  * distinct aggregate — column-count × table-size shuffle at scale),
  * while the HLL++ sketch stays one pass and merges like any other
  * partial. Pass `exactNdv = true` where exactness matters more than the
  * expand cost (small dims; q100's DuckDB oracle needs bit-exact NDV).
  *
  * Min/max are emitted as strings so heterogeneous column types fit one
  * result schema; profiled columns must be string or integral (floats
  * would re-open cross-engine formatting drift for no profiling value —
  * their ranges belong in histogram sketches, x28's territory).
  */
object TableStats {
  def profile(df: DataFrame, cols: Seq[String],
      exactNdv: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"no such columns: ${bad.mkString(", ")}")
    for (c <- cols) {
      import org.apache.spark.sql.types._
      val dt = df.schema(c).dataType
      require(Seq[DataType](StringType, ByteType, ShortType, IntegerType,
          LongType).contains(dt),
        s"profile supports string/integral columns; '$c' is $dt")
    }
    def ndv(c: String): Column =
      if (exactNdv) countDistinct(col(c)) else approx_count_distinct(col(c))
    val rows = cols.map { c =>
      struct(lit(c).as("column_name"),
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        ndv(c).cast("long").as("ndv"),
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"))
    }
    df.agg(array(rows: _*).as("_stats"))
      .select(inline(col("_stats")))
  }
}
