package graft.engine.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (prompt extension surface): image/audio/video
  * as opaque BINARY columns with typed metadata, processed by
  * `mapPartitions` over a typed Dataset (the Scala analogue of the
  * mapInPandas batch shape: iterator in, iterator out, one partition per
  * task, no driver materialization).
  *
  * The actual media DECODE IS STUBBED — this container has no image/audio
  * codecs. The seam is the injectable [[Multimodal.MediaDecoder]] trait:
  * the default [[Multimodal.ByteHistogramDecoder]] is a deterministic fake
  * (byte histogram); a JNI/javacv decoder swaps in as an argument to
  * [[Multimodal.extractFeatures]] with zero other changes. Everything
  * around the seam — schema, partitioning, batch iteration, feature
  * schema — is real and tested.
  *
  * Scale posture: content bytes never shuffle except for the initial
  * repartition-by-id (even distribution of large blobs); features (small,
  * fixed-width) are what flows into downstream joins/aggs.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sample_rate: Int, n_frames: Int)
  final case class MediaRow(media_id: Long, modality: String,
      content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, modality: String,
      n_bytes: Long, features: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  val Modalities: Seq[String] = Seq("image", "audio", "video")

  /** Deterministic fake media corpus derived from the documents table:
    * content = UTF-8 bytes of the text, modality/meta assigned
    * arithmetically from doc_id. Stands in for a real binary-blob source
    * (S3 object columns, parquet BINARY) with identical Spark-side shape. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Modalities), (col("doc_id") % 3 + 1).cast("int"))
          .as("modality"),
        encode(col("text"), "UTF-8").as("content"),
        struct(
          (col("doc_id") % 640 + 64).cast("int").as("width"),
          (col("doc_id") % 480 + 48).cast("int").as("height"),
          lit(16000).cast("int").as("sample_rate"),
          (col("doc_id") % 30 + 1).cast("int").as("n_frames")).as("meta"))
      .as[MediaRow]
  }

  /** The real-codec seam: implementations turn raw media bytes into a
    * fixed-width feature vector. Must be Serializable — instances ship to
    * executors inside the mapPartitions closure. A production deployment
    * passes a JNI/javacv-backed implementation to [[extractFeatures]];
    * nothing else in the pipeline changes. */
  trait MediaDecoder extends Serializable {
    def decode(modality: String, content: Array[Byte], meta: MediaMeta): Array[Float]
  }

  /** ??? — REAL DECODER GOES HERE (default stand-in). 16-bin byte
    * histogram, L1 normalized: deterministic, codec-free,
    * shape-compatible with an embedding model's pooled output. */
  object ByteHistogramDecoder extends MediaDecoder {
    def decode(modality: String, content: Array[Byte],
        meta: MediaMeta): Array[Float] = {
      val hist = new Array[Float](16)
      var i = 0
      while (i < content.length) {
        hist((content(i) & 0xff) >> 4) += 1f
        i += 1
      }
      val n = math.max(content.length, 1).toFloat
      var b = 0
      while (b < 16) { hist(b) /= n; b += 1 }
      hist
    }
  }

  /** Batch feature extraction: one pass per partition, iterator→iterator —
    * constant memory per task regardless of partition size. The decoder is
    * a constructor-style argument, so swapping the stub for a real codec
    * is a call-site change, not a file edit. */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: MediaDecoder = ByteHistogramDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.modality, m.content.length.toLong,
          decoder.decode(m.modality, m.content, m.meta))
      }
    }
  }

  /** Frame sampling for video rows: split content into meta.n_frames chunks
    * and keep every k-th (a real decoder would seek keyframes; the chunk
    * arithmetic and fan-out shape are what Spark sees either way). */
  def frameSample(media: Dataset[MediaRow], everyK: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { m =>
      val n = math.max(m.meta.n_frames, 1)
      val chunk = math.max(m.content.length / n, 1)
      (0 until n by everyK).map { f =>
        val from = f * chunk
        val until = math.min(from + chunk, m.content.length)
        Frame(m.media_id, f,
          m.content.slice(from, math.max(until, from)))
      }
    }
  }

  /** Rows-only summary query over the full pipeline. */
  def summary(spark: SparkSession, docs: DataFrame): DataFrame = {
    val features = extractFeatures(fromDocuments(docs).repartition(col("media_id")))
    features.toDF()
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(element_at(col("features"), 8)), 6).as("avg_bin7"))
      .orderBy(col("modality"))
  }

  /** SQL-checkable twin of the decode path. The stub decoder is pure byte
    * arithmetic, so its bin-7 mass can be recovered integer-exactly from
    * the normalized float histogram: for count c of high-nibble-7 bytes in
    * an n-byte blob, `float(c/n) * n` is within c·2⁻²⁴ < 0.5 of c whenever
    * n < 2²³, so rounding recovers c exactly for any document under 8 MB.
    * Every emitted aggregate is then BIGINT — no float reduction order to
    * flake the oracle hash — and the driver's DuckDB compare genuinely
    * exercises the mapPartitions decode plumbing, not just rows > 0.
    * (Bytes 0x70–0x7F only arise from ASCII U+0070–U+007F under UTF-8, so
    * the oracle can count them with a character-class regexp.) */
  def oracleSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val features = extractFeatures(fromDocuments(docs).repartition(col("media_id")))
    features.toDF()
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).cast(LongType).as("total_bytes"),
        sum(round(element_at(col("features"), 8).cast("double") * col("n_bytes")))
          .cast(LongType).as("n_bin7_bytes"))
      .orderBy(col("modality"))
  }
}
