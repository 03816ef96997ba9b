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
  *  - [[Multimodal.WavDecoder]] — a REAL audio decoder (WAV/AIFF/AU PCM
  *    via JDK `javax.sound.sampled.AudioSystem`): sample rate, frame
  *    count, amplitude stats + 16-bin amplitude histogram, integer-exact
  *    and pinned against a DuckDB arithmetic twin (q107).
  *  - [[Multimodal.ByteHistogramDecoder]] — the codec-free stand-in for
  *    the one modality the JDK cannot decode (video), and the default.
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

  /** Codec-free stand-in for modalities the JDK cannot decode — in
    * practice only VIDEO (images have [[ImageIoDecoder]], WAV/AIFF/AU
    * audio has [[WavDecoder]]): 16-bin byte histogram, L1 normalized —
    * deterministic and shape-compatible with an embedding model's pooled
    * output. */
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
    * Audio/video delegate to [[ByteHistogramDecoder]] (audio has its own
    * real decoder, [[WavDecoder]]; video has no JDK codec).
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

  /** REAL audio decoder over the same seam — `javax.sound.sampled`
    * (AudioSystem) ships inside every JDK and decodes the WAV/AIFF/AU
    * container family for linear PCM, so audio decode needs no external
    * codecs either. Feature layout (19 floats):
    * {{{
    *   [0] sample_rate (Hz, from the container header)
    *   [1] n_frames    (decoded PCM frame count)
    *   [2] sum_abs     (sum of |sample| over all 16-bit samples)
    *   [3..18] 16-bin amplitude histogram: the bin of a signed 16-bit
    *           sample s is (s + 32768) >> 12 — raw INTEGER counts, so
    *           every statistic is bit-deterministic and exactly
    *           representable as Float for any clip under 2^24 frames
    *           (sum_abs stays exact under 2^24 too, i.e. clips shorter
    *           than ~512 frames at full scale; the audit fixture is ≤ 32).
    * }}}
    * PCM in a WAV container round-trips bit-exactly — what lets q107 pin
    * decoded stats against a DuckDB arithmetic twin, exactly as
    * [[ImageIoDecoder]]/q94 did for PNG. Only 16-bit signed mono PCM is
    * accepted; anything else throws (`IllegalArgumentException` — garbage
    * features would poison downstream dedup/similarity, the q94 stance).
    * Images delegate to [[ImageIoDecoder]]; video (genuinely no JDK
    * codec) falls through to [[ByteHistogramDecoder]]. */
  object WavDecoder extends MediaDecoder {
    def decode(modality: String, content: Array[Byte],
        meta: MediaMeta): Array[Float] = modality match {
      case "audio" =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val fmt = in.getFormat
          require(fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"unsupported audio format $fmt: decoder handles 16-bit " +
              "signed mono PCM; transcode or quarantine upstream")
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          var sumAbs = 0L
          val hist = new Array[Long](16)
          var i = 0
          while (i < n) {
            // sign-carrying high byte << 8 | unsigned low byte
            val s =
              if (fmt.isBigEndian)
                (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff)
              else
                (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
            sumAbs += math.abs(s)
            hist((s + 32768) >> 12) += 1L
            i += 1
          }
          val out = new Array[Float](19)
          out(0) = fmt.getSampleRate
          out(1) = n.toFloat
          out(2) = sumAbs.toFloat
          var b = 0
          while (b < 16) { out(3 + b) = hist(b).toFloat; b += 1 }
          out
        } finally in.close()
      case "image" => ImageIoDecoder.decode(modality, content, meta)
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
    // fanOut BEFORE generation: the exchange carries 8-byte ids, the
    // PNG encode (and every decode after it) is the per-row CPU cost —
    // unfanned, a one-row-group docs scan pins the whole codec pipeline
    // to a single task (guide §2.5).
    graft.engine.Par.fanOut(docs.select(col("doc_id")), col("doc_id"))
      .as[Long].mapPartitions { it =>
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
    // generator output is already fanned on doc_id; no blob re-exchange
    extractFeatures(syntheticImages(docs), ImageIoDecoder)
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

  final case class ImageSig(media_id: Long, phash: Long, pixkey: String)

  /** Per-image perceptual signature from the REAL decode: a 64-bit
    * average-hash (aHash) over an 8×8 nearest-neighbor-sampled integer
    * luminance grid (bit g set iff lum(g)·64 > Σlum — all-integer, so the
    * hash is bit-deterministic across JVMs), plus an exact content key
    * over the DECODED pixel grid (md5 of "w×h,rgb,rgb,…" — equality means
    * pixel-identical images regardless of how the bytes were encoded,
    * which raw-byte hashing cannot promise across encoders). Modeled on
    * the public aHash/dHash family (the standard image near-dup blocking
    * key); decode runs distributed in mapPartitions — the codec boundary,
    * same posture as [[extractFeatures]]. */
  def imageSignatures(media: Dataset[MediaRow]): Dataset[ImageSig] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        require(m.modality == "image", s"imageSignatures on ${m.modality}")
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.content))
        require(img != null, s"undecodable image bytes for ${m.media_id}")
        val w = img.getWidth
        val h = img.getHeight
        val lums = new Array[Long](64)
        var g = 0
        var sum = 0L
        while (g < 64) {
          // long arithmetic: g * w overflows Int for ~34M-pixel rows
          val px = img.getRGB(((g % 8).toLong * w / 8).toInt,
            ((g / 8).toLong * h / 8).toInt)
          val lum = 299L * ((px >> 16) & 0xff) + 587L * ((px >> 8) & 0xff) +
            114L * (px & 0xff)
          lums(g) = lum
          sum += lum
          g += 1
        }
        var hash = 0L
        var i = 0
        while (i < 64) {
          if (lums(i) * 64L > sum) hash |= (1L << i)
          i += 1
        }
        // stream the decoded pixel grid into the digest row by row —
        // O(row) extra memory at any image size (a materialized decimal
        // string would be ~9 chars/pixel: hundreds of MB on a real photo)
        md.reset()
        md.update(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
        val row = new Array[Int](w)
        val rowBytes = new Array[Byte](w * 3)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            rowBytes(3 * x) = ((row(x) >> 16) & 0xff).toByte
            rowBytes(3 * x + 1) = ((row(x) >> 8) & 0xff).toByte
            rowBytes(3 * x + 2) = (row(x) & 0xff).toByte
            x += 1
          }
          md.update(rowBytes)
          y += 1
        }
        val key = md.digest().map(b => f"${b & 0xff}%02x").mkString
        ImageSig(m.media_id, hash, key)
      }
    }
  }

  /** EXACT image dedup pairs over the decoded-pixel content key — the
    * scale-safe regime (one shuffle join on the key, output-sensitive;
    * never a pHash-bucket pair expansion, which degenerates when many
    * distinct images share a perceptual hash). Each emitted pair also
    * carries the pair's pHash Hamming distance — provably 0 for
    * pixel-identical images (same pixels → same integer grid → same
    * hash), which is what the q122 oracle pins value-level. */
  def imageExactDups(media: Dataset[MediaRow]): DataFrame = {
    // localCheckpoint: the content-key join consumes the signature table
    // TWICE (both self-join sides) — unmaterialized, each side re-runs
    // the full decode+hash pipeline over the corpus. The checkpoint is
    // (media_id, hash, key) — fixed-width rows, never blob-sized.
    val sigs = imageSignatures(media).toDF().localCheckpoint()
    val a = sigs.select(col("media_id").as("id_a"), col("phash").as("ph_a"),
      col("pixkey"))
    val b = sigs.select(col("media_id").as("id_b"), col("phash").as("ph_b"),
      col("pixkey"))
    a.join(b, Seq("pixkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b")))
          .cast(org.apache.spark.sql.types.LongType).as("phash_hamming"))
  }

  /** NEAR-dup image pairs: Hamming-banded LSH over the perceptual hash
    * ([[Dedup.fingerprintNearDups]] — the SimHash machinery with the
    * fingerprint supplied by the image decode), verified here only by the
    * Hamming radius. The pHash is a recall-oriented blocking key: callers
    * wanting pixel-exactness filter the pairs through the content key
    * (see [[imageExactDups]]); callers wanting perceptual closeness use
    * the radius. Bucket caps + telemetry semantics are SimHash's. */
  def imageNearDups(media: Dataset[MediaRow], maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    Dedup.fingerprintNearDups(imageSignatures(media).toDF(), "media_id",
      col("phash"), maxHamming, maxBucketSize)

  final case class AudioSig(media_id: Long, envhash: Long, pcmkey: String)

  /** Per-clip audio signature from the REAL decode (the audio sibling of
    * [[imageSignatures]]): a 64-bit amplitude-envelope hash (bit g set
    * iff |sample at position g·n/64|·64 > Σ|sample| over the 64 sampled
    * positions — all-integer, bit-deterministic) plus an exact content
    * key over the DECODED samples ("rate,n,s0,s1,…" md5 — equality means
    * sample-identical audio regardless of container: a WAV and an AIFF
    * of the same PCM pair up, byte hashing cannot promise that). */
  def audioSignatures(media: Dataset[MediaRow]): Dataset[AudioSig] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        require(m.modality == "audio", s"audioSignatures on ${m.modality}")
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(m.content))
        val (rate, samples) = try {
          val fmt = in.getFormat
          require(fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"unsupported audio format $fmt for ${m.media_id}")
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            out(i) =
              if (fmt.isBigEndian)
                (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff)
              else
                (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
            i += 1
          }
          (math.round(fmt.getSampleRate), out)
        } finally in.close()
        val n = samples.length
        val env = new Array[Long](64)
        var sum = 0L
        var g = 0
        while (g < 64) {
          // long arithmetic: g * n overflows Int past ~34M samples
          // (a ~13-minute 44.1 kHz clip)
          val a =
            if (n == 0) 0L
            else math.abs(samples((g.toLong * n / 64).toInt)).toLong
          env(g) = a
          sum += a
          g += 1
        }
        var hash = 0L
        var i = 0
        while (i < 64) {
          if (env(i) * 64L > sum) hash |= (1L << i)
          i += 1
        }
        // stream samples into the digest — O(1) extra memory at any
        // clip length (see imageSignatures)
        md.reset()
        md.update(java.nio.ByteBuffer.allocate(12)
          .putInt(rate).putLong(n.toLong).array())
        val buf = java.nio.ByteBuffer.allocate(2 * 4096)
        var j = 0
        while (j < n) {
          buf.clear()
          val end = math.min(j + 4096, n)
          while (j < end) { buf.putShort(samples(j).toShort); j += 1 }
          md.update(buf.array(), 0, buf.position())
        }
        val key = md.digest().map(b => f"${b & 0xff}%02x").mkString
        AudioSig(m.media_id, hash, key)
      }
    }
  }

  /** EXACT audio dedup pairs over the decoded-sample content key — same
    * scale posture as [[imageExactDups]] (one output-sensitive join; the
    * envelope hash rides along, provably Hamming-0 on sample-identical
    * clips — the q123 value pin). Near-dup over the envelope hash
    * composes with [[Dedup.fingerprintNearDups]] exactly as images do. */
  def audioExactDups(media: Dataset[MediaRow]): DataFrame = {
    // localCheckpoint: imageExactDups' argument — one decode+signature
    // pass, not one per self-join side
    val sigs = audioSignatures(media).toDF().localCheckpoint()
    val a = sigs.select(col("media_id").as("id_a"), col("envhash").as("eh_a"),
      col("pcmkey"))
    val b = sigs.select(col("media_id").as("id_b"), col("envhash").as("eh_b"),
      col("pcmkey"))
    a.join(b, Seq("pcmkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("eh_a").bitwiseXOR(col("eh_b")))
          .cast(org.apache.spark.sql.types.LongType).as("envhash_hamming"))
  }

  final case class AudioPin(media_id: Long, sample_rate: Long,
      n_frames: Long, sum_abs: Long, bin: Long, cnt: Long)

  /** Deterministic planted-WAV corpus (the audio sibling of
    * [[syntheticImages]]): for each doc_id, `doc_id % 32 + 1` 16-bit mono
    * PCM samples at `8000 + (doc_id % 8)·1000` Hz, sample i being
    * `((doc_id·2654435761 + i·40503) mod 65536) − 32768` — pure integer
    * arithmetic over doc_id (Knuth-hash multipliers spread the samples
    * over the full amplitude range so every histogram bin is exercised),
    * ENCODED to real WAV container bytes with `AudioSystem.write` on the
    * executors. An engine with no audio codec (DuckDB) can recompute every
    * decoded statistic, which turns [[WavDecoder]] into an
    * oracle-checkable operator. Encode runs inside mapPartitions: blobs
    * are born distributed and never visit the driver. */
  def syntheticWavs(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // deliberately NOT fanned (unlike syntheticImages): AudioSystem's
    // provider registry is synchronized JDK-wide, so 32 concurrent
    // encode tasks serialize on its lock — measured q107 1.1 -> 2.4 s
    // with the fan-out; single-digit task counts stay off the lock
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (id % 32 + 1).toInt
        val rate = (8000 + (id % 8) * 1000).toInt
        val pcm = new Array[Byte](2 * n)
        var i = 0
        while (i < n) {
          val s = (((id * 2654435761L + i * 40503L) % 65536L) - 32768L).toInt
          pcm(2 * i) = (s & 0xff).toByte // little-endian
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, 1, true, false)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        MediaRow(id, "audio", baos.toByteArray, MediaMeta(0, 0, rate, n))
      }
    }
  }

  /** q107's Spark side: planted WAVs → REAL AudioSystem decode → integer
    * pins. Each clip emits one row per NON-EMPTY amplitude bin carrying
    * the decoded sample rate, frame count, |sample| sum and the bin's
    * count — all BIGINT, recovered exactly from the float features (every
    * value < 2^24; see [[WavDecoder]]). The DuckDB twin recomputes all of
    * them from doc_id arithmetic alone: a hash match proves the WAV
    * encode → AudioSystem decode round trip reproduced the planted PCM
    * bit-exactly, header fields included. */
  def audioDecodeAudit(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    extractFeatures(syntheticWavs(docs).repartition(col("media_id")),
        WavDecoder)
      .flatMap { f =>
        val rate = math.round(f.features(0).toDouble)
        val n = math.round(f.features(1).toDouble)
        val sumAbs = math.round(f.features(2).toDouble)
        (0 until 16).flatMap { b =>
          val cnt = math.round(f.features(3 + b).toDouble)
          if (cnt == 0L) None
          else Some(AudioPin(f.media_id, rate, n, sumAbs, b.toLong, cnt))
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
    val features = extractFeatures(graft.engine.Par.fanOut(fromDocuments(docs), col("media_id")))
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
    val features = extractFeatures(graft.engine.Par.fanOut(fromDocuments(docs), col("media_id")))
    features.toDF()
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).cast(LongType).as("total_bytes"),
        sum(round(element_at(col("features"), 8).cast("double") * col("n_bytes")))
          .cast(LongType).as("n_bin7_bytes"))
      .orderBy(col("modality"))
  }
}
