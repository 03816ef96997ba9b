package graft.engine.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.engine.{GraftQuery, Tables}

/** Rows-only driver queries that run the streaming plans end-to-end inside
  * a query call: batch events are replayed through a MemoryStream, the
  * streaming aggregation executes via the micro-batch engine, and the
  * in-memory sink table is returned. Batch/stream equivalence is asserted
  * in StreamingSpec against q25/q27.
  */
object StreamQueries {

  /** X5 — tumbling-window streaming aggregation through the real
    * micro-batch engine (complete mode; the 20k-event cap bounds the
    * driver-side replay buffer, not the operator). */
  val x52 = GraftQuery(
    "x52_stream_tumbling",
    (spark, sfDir) => {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val events = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("event_id")).limit(20000)
        .as[Streaming.Event].collect()
      val stream = MemoryStream[Streaming.Event]
      stream.addData(events.toSeq)
      val name = s"x52_out_${System.nanoTime()}"
      val q = Streaming.tumblingCounts(stream.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try { q.processAllAvailable() } finally q.stop()
      spark.table(name)
        .select(unix_timestamp(col("win_start")).as("win_start"),
          col("event_type"), col("n_events"),
          round(col("sum_value"), 4).as("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    },
    None,
    doc = "streaming tumbling agg via MemoryStream micro-batches")

  /** X5 — custom stateful sessionization (flatMapGroupsWithState), fed in
    * two micro-batches so cross-batch state transitions really happen. */
  val x53 = GraftQuery(
    "x53_stream_sessionize",
    (spark, sfDir) => {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val events = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("ts"), col("event_id")).limit(10000)
        .as[Streaming.Event].collect()
      val (batch1, batch2) = events.splitAt(events.length / 2)
      val stream = MemoryStream[Streaming.Event]
      val name = s"x53_out_${System.nanoTime()}"
      val q = Streaming.sessionizeWithState(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        stream.addData(batch1.toSeq); q.processAllAvailable()
        stream.addData(batch2.toSeq); q.processAllAvailable()
      } finally q.stop()
      spark.table(name)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_closed_sessions"),
          sum(col("n_events")).as("n_events"))
        .orderBy(col("user_id")).limit(1000)
    },
    None,
    doc = "flatMapGroupsWithState sessionizer over 2 micro-batches")

  /** X5 — stream–static broadcast enrichment join + windowed rollup. */
  val x54 = GraftQuery(
    "x54_stream_enrich",
    (spark, sfDir) => {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val events = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("event_id")).limit(20000)
        .as[Streaming.Event].collect()
      val customers = Tables.customer(spark, sfDir)
      val stream = MemoryStream[Streaming.Event]
      stream.addData(events.toSeq)
      val name = s"x54_out_${System.nanoTime()}"
      val q = Streaming.enrichedTumblingByNation(stream.toDF(), customers)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try { q.processAllAvailable() } finally q.stop()
      spark.table(name)
        .select(unix_timestamp(col("win_start")).as("win_start"),
          col("c_nationkey"), col("n_events"),
          round(col("sum_value"), 4).as("sum_value"))
        .orderBy(col("win_start"), col("c_nationkey"))
    },
    None,
    doc = "stream-static broadcast enrichment join + tumbling rollup per nation")

  /** X5 — the same tumbling aggregation fed by a REAL distributed source:
    * `readStream` directly over the events parquet directory. No driver-side
    * collect/replay anywhere — executors scan the files, the micro-batch
    * engine drives the same logical plan as x52, and the result must match
    * the batch twin q25 row-for-row (asserted in StreamingSpec). This is the
    * ingest shape a 100 TB/day file-drop pipeline runs. */
  val x55 = GraftQuery(
    "x55_stream_file_tumbling",
    (spark, sfDir) => {
      val name = s"x55_out_${System.nanoTime()}"
      val q = Streaming.tumblingCounts(Tables.eventsStream(spark, sfDir))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try { q.processAllAvailable() } finally q.stop()
      spark.table(name)
        .select(unix_timestamp(col("win_start")).as("win_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    },
    // The streaming answer must equal the batch q25 answer exactly (decimal
    // sum → order-independent), so it shares q25's DuckDB oracle verbatim.
    graft.engine.relational.RelationalQueries.q25.oracle,
    doc = "file-source readStream over events parquet → tumbling agg (no driver replay)")

  /** Multimodal pipeline summary (binary columns + mapPartitions decode). */
  val x60 = GraftQuery(
    "x60_multimodal",
    (spark, sfDir) =>
      graft.engine.llm.Multimodal.summary(spark, Tables.documents(spark, sfDir)),
    None,
    doc = "binary media columns → stubbed decode → feature aggregation")

  def queries: Seq[GraftQuery] = Seq(x52, x53, x54, x55, x60)
}
