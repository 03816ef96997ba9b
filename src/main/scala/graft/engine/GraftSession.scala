package graft.engine

import org.apache.spark.sql.SparkSession

/** The one SparkSession recipe every entrypoint (Verify, Bench,
  * TimeQueries) shares, so row counts and timings are comparable across
  * them. The load-bearing setting is the UTC session timezone: event-time
  * window queries over the events table bucket rows per the SESSION
  * timezone, so a tool session that omits it returns different row counts
  * than the driver run for the same query at the same SF — poisoning any
  * bisection that compares the two (the r4 post-mortem measured x52 at
  * 725 vs 3385 rows from exactly this).
  */
object GraftSession {
  def build(cpus: String): SparkSession = {
    // reclaim dead sessions' published artifacts (warehouse tables, tmp
    // stores) before this one starts adding its own
    Artifacts.gcDeadSessions()
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
