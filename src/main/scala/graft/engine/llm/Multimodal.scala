package graft.engine.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (prompt extension surface): image/audio/video
  * as opaque BINARY columns with typed metadata, processed by
  * `mapPartitions` over a typed Dataset (the Scala analogue of the
  * mapInPandas batch shape: iterator in, iterator out, one partition per
  * task, no driver materialization).
  *
  * The decode seam is the injectable [[Multimodal.MediaDecoder]] trait;
  * instances ship to executors inside the mapPartitions closure, so a
  * production codec swaps in as an argument to
  * [[Multimodal.extractFeatures]] with zero other changes. Two
  * implementations:
  *  - [[Multimodal.ImageIoDecoder]] — a REAL image decoder (PNG/JPEG/GIF/
  *    BMP via JDK `javax.imageio`, no external codecs needed): per-channel
  *    means + a 16-bin integer-luminance histogram, integer-exact and
  *    pinned against a DuckDB arithmetic twin (q94).
  *  - [[Multimodal.ByteHistogramDecoder]] — the codec-free stand-in for
  *    modalities the JDK cannot decode (audio/video), and the default.
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

  /** Codec-free stand-in for modalities the JDK cannot decode (the
    * container ships no audio/video codecs): 16-bin byte histogram,
    * L1 normalized — deterministic and shape-compatible with an
    * embedding model's pooled output. Images have a REAL decoder:
    * [[ImageIoDecoder]]. */
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

  /** REAL image decoder over the same seam — `javax.imageio` ships inside
    * the JDK (PNG/JPEG/GIF/BMP readers), so image decode needs no external
    * codecs. Feature layout (21 floats):
    * {{{
    *   [0] width   [1] height
    *   [2..4]  per-channel means, sum(channel)/(255·n_pixels)
    *   [5..20] 16-bin luminance histogram, L1-normalized; the bin of a
    *           pixel is ((299·r + 587·g + 114·b) / 1000) / 16 in INTEGER
    *           arithmetic (ITU-R BT.601 luma weights) — integer bins make
    *           the histogram bit-deterministic across JVMs, and every
    *           count is float-exactly recoverable as round(hist[b]·n) for
    *           images under 2^23 pixels (the q58 recovery argument).
    * }}}
    * `getRGB` converts any reader-produced raster to packed sRGB — for the
    * lossless formats (PNG/GIF/BMP) the round trip is bit-exact, which is
    * what lets q94 pin decoded stats against a DuckDB arithmetic twin.
    * Audio/video delegate to [[ByteHistogramDecoder]] (no JDK codec).
    * Undecodable image bytes throw `IllegalArgumentException` — silently
    * emitting garbage features would poison downstream dedup/similarity. */
  object ImageIoDecoder extends MediaDecoder {
    def decode(modality: String, content: Array[Byte],
        meta: MediaMeta): Array[Float] = modality match {
      case "image" =>
        javax.imageio.ImageIO.setUseCache(false) // no executor temp files
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(content))
        require(img != null,
          s"undecodable image bytes (${content.length} B): JDK ImageIO " +
            "supports PNG/JPEG/GIF/BMP; quarantine other formats upstream")
        val w = img.getWidth
        val h = img.getHeight
        var sumR = 0L; var sumG = 0L; var sumB = 0L
        val hist = new Array[Long](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff
            val g = (p >> 8) & 0xff
            val b = p & 0xff
            sumR += r; sumG += g; sumB += b
            hist(((299 * r + 587 * g + 114 * b) / 1000) >> 4) += 1L
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        val out = new Array[Float](21)
        out(0) = w.toFloat
        out(1) = h.toFloat
        out(2) = (sumR / (255.0 * n)).toFloat
        out(3) = (sumG / (255.0 * n)).toFloat
        out(4) = (sumB / (255.0 * n)).toFloat
        var b = 0
        while (b < 16) { out(5 + b) = (hist(b) / n).toFloat; b += 1 }
        out
      case _ => ByteHistogramDecoder.decode(modality, content, meta)
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

  final case class ImagePin(media_id: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, bin: Long, cnt: Long)

  /** Deterministic planted-PNG corpus: for each doc_id a (doc_id%16+1) ×
    * (doc_id%8+1) checkerboard of two doc_id-derived colors, ENCODED to
    * real PNG bytes with `ImageIO.write` on the executors. Every pixel
    * statistic is pure integer arithmetic over doc_id, so an engine with
    * no image codec (DuckDB) can recompute the decoded ground truth —
    * the fixture that turns the real decoder into an oracle-checkable
    * operator. Encode runs inside mapPartitions: blobs are born
    * distributed and never visit the driver. */
  def syntheticImages(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = (id % 16 + 1).toInt
        val h = (id % 8 + 1).toInt
        val colA = (((id % 256) << 16) | ((id * 7 % 256) << 8) | (id * 13 % 256)).toInt
        val colB = (((id * 3 % 256) << 16) | ((id * 11 % 256) << 8) | (id * 17 % 256)).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, if (((x + y) & 1) == 0) colA else colB)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        MediaRow(id, "image", baos.toByteArray, MediaMeta(w, h, 0, 1))
      }
    }
  }

  /** q94's Spark side: planted PNGs → REAL ImageIO decode → integer pins.
    * Each image emits 16 rows (one per luminance bin) carrying the decoded
    * width/height, per-channel byte sums and the bin's pixel count — all
    * BIGINT, recovered from the float features by the q58 rounding
    * argument (n ≤ 128 pixels ≪ 2^23). The DuckDB twin recomputes every
    * value from doc_id arithmetic alone: a hash match proves the PNG
    * encode → ImageIO decode round trip reproduced the planted pixels
    * bit-exactly. */
  def imageDecodeAudit(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    extractFeatures(syntheticImages(docs).repartition(col("media_id")),
        ImageIoDecoder)
      .flatMap { f =>
        val w = f.features(0).toLong
        val h = f.features(1).toLong
        val n = w * h
        def unscale(x: Float) = math.round(x.toDouble * 255.0 * n)
        val sr = unscale(f.features(2))
        val sg = unscale(f.features(3))
        val sb = unscale(f.features(4))
        (0 until 16).map { b =>
          ImagePin(f.media_id, w, h, sr, sg, sb, b.toLong,
            math.round(f.features(5 + b).toDouble * n))
        }
      }
      .toDF()
      // small fixed-width pins; checkpoint so the total sort's range
      // sampling pass doesn't run the encode+decode pipeline twice
      .localCheckpoint()
      .orderBy(col("media_id"), col("bin"))
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
