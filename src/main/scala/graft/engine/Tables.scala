package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

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
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "lineitem")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. Read nanos as LONG and convert to a
    * microsecond timestamp with integer arithmetic (`div 1000` — exact; a
    * double division would lose precision above 2^53 ns).
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set at session
    * construction by every entry point ([[graft.engine.jobs.GraftSession]],
    * Verify, Bench, SparkTestSession) — not mutated here, so a table load
    * never changes session-wide read behavior as a side effect.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  /** Unbounded twin of [[events]]: a Structured Streaming file source over
    * the same parquet directory — executors read the files directly (no
    * driver-side buffering), new files appearing in the directory become new
    * micro-batches, exactly the production file-drop ingest shape. The
    * schema comes from a footer-only batch read (file sources require an
    * explicit schema); the nanos→micros ts conversion matches the batch
    * loader so batch and stream plans agree. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    // The testdata tables are single parquet files; FileStreamSource needs a
    // directory basePath, so address the file through a glob (parent dir
    // becomes the base, only events.* matches).
    spark.readStream
      .schema(spark.read.parquet(path).schema)
      .parquet(s"$sfDir/events.*")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
