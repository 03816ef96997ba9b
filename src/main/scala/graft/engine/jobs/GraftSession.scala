package graft.engine.jobs

import org.apache.spark.sql.SparkSession

/** Session factory for the CLI jobs. Mirrors the driver's Verify config:
  * UTC, AQE on, shuffle partitions sized to local cores (not the 200
  * default — SURVEY.md §4). On a real cluster these come from spark-submit
  * conf instead; `getOrCreate` respects whatever the launcher set.
  */
object GraftSession {
  def create(appName: String): SparkSession = {
    graft.engine.Artifacts.gcDeadSessions()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
