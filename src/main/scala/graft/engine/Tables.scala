package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * One parquet directory per table under `sfDir`. Parquet carries its own
  * schema (validated against [[graft.engine.schema.Schemas]] in tests); a scan
  * here is a plain `FileScan parquet` that Catalyst prunes/pushes into — do
  * not cache or materialize at this layer, so every query keeps full
  * pushdown freedom.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Testdata generations write their timestamp columns (`ts`,
    * `o_orderdate`, `l_shipdate`) either UTC-adjusted (Spark:
    * `TimestampType`) or naive (Spark: `TIMESTAMP_NTZ`). Normalize naive
    * columns to session-local `TimestampType` at the loader so the engine
    * and [[graft.engine.schema.Schemas]] see ONE type regardless of
    * generation. Under the UTC session timezone every entry point pins,
    * the cast preserves the wall clock — which is how the DuckDB oracle
    * reads the same naive column, so comparisons are unaffected. The cast
    * happens before any filter, and partition/predicate pushdown on the
    * remaining columns is untouched (projection-only rewrite). */
  private def normalizeNtz(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == TimestampNTZType).map(_.name)
      .foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))

  def region(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "lineitem")
  /** One extra `ts` shape beyond [[normalizeNtz]]: the TIMESTAMP(NANOS)
    * generation, which Spark's vectorized reader rejects — read as LONG via
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set at session
    * construction by every entry point), then `div 1000` to micros with
    * exact integer arithmetic (a double division would lose precision
    * above 2^53 ns). */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long generation
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df // already normal, or NTZ handled by load()
      case other: DataType =>
        throw new IllegalStateException(s"unsupported events.ts type: $other")
    }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(load(spark, sfDir, "events"))
  /** Unbounded twin of [[events]]: a Structured Streaming file source over
    * the same parquet directory — executors read the files directly (no
    * driver-side buffering), new files appearing in the directory become new
    * micro-batches, exactly the production file-drop ingest shape. The
    * schema comes from a footer-only batch read (file sources require an
    * explicit schema); the ts normalization matches the batch loader so
    * batch and stream plans agree. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    // The testdata tables are single parquet files; FileStreamSource needs a
    // directory basePath, so address the file through a glob (parent dir
    // becomes the base, only events.* matches).
    normalizeTs(normalizeNtz(spark.readStream
      .schema(spark.read.parquet(path).schema)
      .parquet(s"$sfDir/events.*")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
