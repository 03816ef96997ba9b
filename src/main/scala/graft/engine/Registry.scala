package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-verifiable query: the Spark implementation plus (when
  * the semantics are relationally expressible) the equivalent ANSI SQL the
  * driver replays in DuckDB over the same parquet tables.
  *
  * Determinism contract (SURVEY.md §7): results end with a total ORDER BY,
  * double reductions go through [[graft.engine.relational.Exact]], derived
  * integers are BIGINT on both sides, timestamps are emitted as BIGINT epoch
  * seconds. Column names must match the SQL aliases exactly — the driver
  * sorts columns by name before hashing.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  /** All registered queries, in presentation order. Populated by the module
    * objects; SparkEntry flattens this into the driver's two maps.
    */
  def all: Seq[GraftQuery] =
    relational.RelationalQueries.queries ++
      relational.StatsQueries.queries ++
      ml.MlQueries.queries ++
      llm.LlmQueries.queries ++
      streaming.StreamQueries.queries
}
