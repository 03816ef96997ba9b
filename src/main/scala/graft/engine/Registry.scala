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
    doc: String = "",
    costClass: String = GraftQuery.Data)

object GraftQuery {
  /** Cost scales with the data scanned — the <5 s/query sf0.1 bench
    * contract applies (the overwhelming default). */
  val Data = "data"

  /** Cost is a FIXED multi-store lifecycle (N ticks × publish/append/
    * merge/vacuum job launches), sf-invariant within ~20% — a job-count
    * price, not a scan price, so per-query wall-clock says nothing
    * about data-path scaling. [[graft.Bench]] totals the two classes
    * separately (VERDICT r17 item 2) so the data-class rate stays a
    * meaningful contract. Annotate a query only when its sf0.01↔sf0.1
    * invariance is measured, not assumed. */
  val FixedLifecycle = "fixed_lifecycle"
}

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
