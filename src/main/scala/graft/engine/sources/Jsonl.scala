package graft.engine.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) source/sink — the lingua franca of LLM
  * training-data exchange (one document object per line; web-scale corpora
  * ship as sharded *.jsonl[.gz]).
  *
  * Read contract, tuned for dirty crawl data:
  *  - the schema is DECLARED, never inferred (inference is a full extra
  *    pass over 100 TB and locks in whatever the first files contained);
  *  - a malformed or type-mismatched line is QUARANTINED, not a job abort
  *    (FAILFAST) or silent loss (DROPMALFORMED): it comes back with the
  *    raw line in [[corruptCol]] and null data columns, and the caller
  *    routes it ([[readJsonlClean]] does the split).
  *
  * Implementation note: this parses `text` lines through `from_json`
  * rather than `spark.read.json` because Spark disallows querying a raw
  * JSON scan by its corrupt-record column alone
  * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the quarantine
  * side of the split is exactly that query. A text scan has no such
  * restriction, stays partition-parallel, and `from_json` applies the same
  * PERMISSIVE/corrupt-record semantics per line.
  *
  * Spark's `DataFrameWriter.json` already emits one object per line
  * (JSONL, not a JSON array).
  */
object Jsonl {

  val corruptCol = "_corrupt_record"

  /** All rows under the declared schema, malformed lines quarantined into
    * [[corruptCol]] (null data columns, raw line preserved).
    *
    * Blank lines and bare `null` literals parse to a NULL struct (not a
    * struct with the corrupt column set), so they are explicitly folded
    * into the quarantine here — otherwise they'd surface as "clean"
    * all-null rows, the silent loss this contract forbids. A valid empty
    * object `{}` parses to a non-null struct and stays clean. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    parseLines(spark.read.text(path), schema)

  /** Streaming twin of [[readJsonl]] — the SAME parse pipeline over a
    * file-source `readStream`, so an always-on ingest applies the identical
    * declared-schema/quarantine contract micro-batch by micro-batch (x58
    * pins stream ≡ batch on the same directory). Split clean/quarantine
    * with a filter on [[corruptCol]], exactly as the batch reader does. */
  def readJsonlStream(spark: SparkSession, path: String,
      schema: StructType, options: Map[String, String] = Map.empty): DataFrame =
    parseLines(spark.readStream.options(options).text(path), schema)

  /** The one line-parse pipeline both readers share: schema-declared
    * `from_json` in PERMISSIVE mode, blank/null-literal lines folded into
    * the quarantine column. */
  private def parseLines(lines: DataFrame, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"declared schema must not already contain $corruptCol")
    val full = schema.add(corruptCol, StringType)
    val parsed = lines
      .select(col("value"), from_json(col("value"), full, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> corruptCol)).as("j"))
    parsed.select(
      schema.fieldNames.map(f => col(s"j.$f").as(f)) :+
        coalesce(col(s"j.$corruptCol"),
          when(col("j").isNull, col("value"))).as(corruptCol): _*)
  }

  /** (clean rows in the declared schema, quarantined raw lines).
    *
    * COST NOTE: the two returned frames are FILTER BRANCHES of one lazy
    * parse — an action on each scans and `from_json`-parses the input
    * once PER BRANCH. Harmless when one branch is consumed or the input
    * is small; at the 100 TB dirty-crawl scale this contract exists for,
    * materialize ONE pass instead: either cache/checkpoint the combined
    * [[readJsonl]] frame and split it yourself, or (the pipeline shape
    * q88 uses) checkpoint the clean branch's downstream before the
    * quarantine branch is consumed, so only the (tiny) quarantine side
    * pays the re-parse. */
  def readJsonlClean(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val all = readJsonl(spark, path, schema)
    (all.filter(all(corruptCol).isNull).drop(corruptCol),
      all.filter(all(corruptCol).isNotNull).select(all(corruptCol).as("raw")))
  }

  /** One JSON object per line; overwrite is the snapshot-publish default
    * (compose with [[SnapshotStore.publish]] for atomic versioned output). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
