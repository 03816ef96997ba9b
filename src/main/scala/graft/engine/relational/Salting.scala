package graft.engine.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (the manual fallback when AQE's runtime
  * skew-join splitting isn't applicable — e.g. skewed aggregations, or
  * joins whose skew AQE can't see because it's introduced upstream).
  *
  * Salts are DETERMINISTIC (hash of a caller-chosen disambiguator column,
  * never rand()) so retried tasks and re-runs produce identical results.
  */
object Salting {

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. The first shuffle spreads a
    * hot key over `buckets` reducers; the second handles only
    * |keys|×buckets pre-aggregated rows.
    */
  def saltedCount(df: DataFrame, keyCol: String, saltSource: Column,
      buckets: Int): DataFrame = {
    df.withColumn("_salt", pmod(xxhash64(saltSource), lit(buckets.toLong)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).cast("long").as("n"))
  }

  /** Skewed equi-join: the large (skewed) side gets a deterministic salt in
    * [0, buckets); the small side is replicated `buckets`× with an exploded
    * salt column; the join key becomes (key, salt). Row multiplicity is
    * preserved exactly — each large-side row matches its key's small-side
    * rows exactly once (at its own salt value).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltSource: Column, buckets: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(buckets.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
