package graft.engine.relational

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Deterministic aggregation helpers for DuckDB-oracle parity.
  *
  * Problem: `SUM(double)` is reduction-order dependent; Spark's partial/final
  * aggregation over N partitions and DuckDB's single-node scan sum the same
  * values in different orders, so the low bits (and occasionally a rounded
  * 4th decimal) differ. Rounding after the fact only shrinks — never
  * eliminates — the mismatch window.
  *
  * Fix: per-row arithmetic stays in DOUBLE (IEEE-754 ops are bit-identical
  * across engines for identical inputs), but the *commutative reduction* is
  * done in DECIMAL(27,6), which is exact and therefore order-independent.
  * The final value is cast back to DOUBLE (a single deterministic
  * conversion) for a stable, comparable output column.
  *
  * The DuckDB twin of `dsum(x)` is
  * `CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)`.
  *
  * This also scales: decimal sum is a fixed-width (128-bit) accumulator with
  * map-side partial aggregation — no extra shuffle, no precision loss at
  * 100 TB row counts (DECIMAL(27,6) holds ±1e21, and Spark widens the
  * accumulator to precision 37).
  */
object Exact {
  private val Dec = DecimalType(27, 6)

  /** Order-independent sum of a double expression, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** [[dsum]]'s MERGEABLE partial: the exact decimal sum WITHOUT the
    * final double cast, for incremental stores that persist per-batch
    * window partials and merge them later (x68/x69). Storing the
    * decimal keeps the merge exact and order-independent; the consumer
    * applies the single double cast after the final merge, so
    * `cast(sum(partials))` == `dsum(all rows)` bit-for-bit. Uses the
    * same DECIMAL(27,6) input envelope as the SQL twin — a wider ad-hoc
    * cast would diverge from the oracle's overflow behavior. */
  def dsumPartial(c: Column): Column = sum(c.cast(Dec))

  /** Order-independent average (exact sum / exact count), rounded to 4dp. */
  def davg(c: Column): Column =
    round(sum(c.cast(Dec)).cast(DoubleType) / count(lit(1)), 4)

  /** Count as BIGINT (matches DuckDB's COUNT type). */
  def lcount(): Column = count(lit(1)).cast(LongType)

  // ---- SQL-side twins (string builders used when assembling oracle SQL) ----
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(27,6))) AS DOUBLE)"
  def sqlDavg(expr: String): String =
    s"ROUND(CAST(SUM(CAST(($expr) AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 4)"
}
