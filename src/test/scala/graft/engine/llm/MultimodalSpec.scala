package graft.engine.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}
import graft.engine.Tables

class MultimodalSpec extends AnyFunSuite {

  private lazy val media = Multimodal.fromDocuments(Tables.documents(spark, sfDir))

  test("media corpus preserves row count and carries binary + meta") {
    val docs = Tables.documents(spark, sfDir)
    assert(media.count() == docs.count())
    val row = media.head()
    assert(Multimodal.Modalities.contains(row.modality))
    assert(row.content.nonEmpty && row.meta.width >= 64)
  }

  test("feature extraction: histogram is L1-normalized, n_bytes matches content") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    feats.take(50).foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3, "histogram must sum to 1")
      assert(f.n_bytes > 0)
    }
  }

  test("feature extraction is deterministic") {
    val a = Multimodal.extractFeatures(media).collect().map(_.features.toSeq).toSeq
    val b = Multimodal.extractFeatures(media).collect().map(_.features.toSeq).toSeq
    assert(a == b)
  }

  test("injected MediaDecoder flows end-to-end (real-codec swap is an argument)") {
    // A fake "real" decoder: constant-width vector keyed off meta — proves
    // the decoder argument (not the default stub) is what executes on the
    // executors, and that meta reaches it.
    object FakeCodec extends Multimodal.MediaDecoder {
      def decode(modality: String, content: Array[Byte],
          meta: Multimodal.MediaMeta): Array[Float] =
        Array(modality.length.toFloat, meta.width.toFloat,
          content.length.toFloat, 42f)
    }
    val feats = Multimodal.extractFeatures(media, FakeCodec).collect()
    assert(feats.nonEmpty)
    feats.take(50).foreach { f =>
      assert(f.features.length == 4, "injected decoder's shape, not the stub's 16")
      assert(f.features(3) == 42f)
      assert(f.features(2) == f.n_bytes.toFloat)
    }
    // and the default path still produces the stub's 16-bin histogram
    assert(Multimodal.extractFeatures(media).head().features.length == 16)
  }

  test("frame sampling keeps every k-th frame of video rows only") {
    val frames = Multimodal.frameSample(media, everyK = 2).collect()
    assert(frames.nonEmpty)
    val videos = media.filter(_.modality == "video").collect()
      .map(m => m.media_id -> m.meta.n_frames).toMap
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      assert(videos.contains(id), "frames only from video rows")
      val expected = (0 until math.max(videos(id), 1) by 2).size
      assert(fs.length == expected)
      assert(fs.map(_.frame_idx).forall(_ % 2 == 0))
    }
  }

  test("summary aggregates all three modalities") {
    val s = Multimodal.summary(spark, Tables.documents(spark, sfDir)).collect()
    assert(s.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(s.map(_.getAs[Long]("n_media")).sum == media.count())
  }

  test("oracleSummary recovers bin-7 byte counts integer-exactly (incl. non-ASCII)") {
    import spark.implicits._
    // Mixed content: ASCII in/out of the 0x70–0x7F bin, multi-byte UTF-8
    // (é → 0xC3 0xA9, 你 → 3 bytes ≥ 0x80 — none land in bin 7), and a
    // pipe/tilde row that is pure bin 7.
    val docs = Seq(
      (0L, "pqrstuvwxyz{|}~"),           // 15 chars, all bin 7
      (1L, "ABC def ghi"),               // bin 7: d,e,f? no — 0x64,0x65 are bin 6. none
      (2L, "café 你好 pp"), // bin 7: p,p = 2
      (3L, "")                           // empty
    ).toDF("doc_id", "text")
    val out = Multimodal.oracleSummary(spark, docs).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("total_bytes"),
        r.getAs[Long]("n_bin7_bytes"))).toMap
    // doc 0 → image, doc 1 → audio, doc 2 → video, doc 3 → image
    val utf8 = (s: String) => s.getBytes("UTF-8")
    val bin7 = (s: String) => utf8(s).count(b => (b & 0xff) >= 0x70 && (b & 0xff) <= 0x7f)
    assert(out("image") ==
      (utf8("pqrstuvwxyz{|}~").length.toLong + 0L, bin7("pqrstuvwxyz{|}~").toLong))
    assert(out("audio") == (utf8("ABC def ghi").length.toLong,
      bin7("ABC def ghi").toLong))
    assert(out("video") == (utf8("café 你好 pp").length.toLong,
      bin7("café 你好 pp").toLong))
  }

  // ---- real JDK-ImageIO decode ------------------------------------------

  private def pngBytes(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("ImageIoDecoder: planted 3x2 PNG decodes to exact dims, means, histogram") {
    // colors: (200,100,50) and (10,20,30); checkerboard on (x+y) parity
    val a = (200 << 16) | (100 << 8) | 50
    val b = (10 << 16) | (20 << 8) | 30
    val bytes = pngBytes(3, 2, (x, y) => if (((x + y) & 1) == 0) a else b)
    val f = Multimodal.ImageIoDecoder.decode("image", bytes,
      Multimodal.MediaMeta(3, 2, 0, 1))
    assert(f.length == 21)
    assert(f(0) == 3f && f(1) == 2f)
    // 3 of each color in a 3x2 checkerboard
    val n = 6.0
    assert(math.round(f(2) * 255 * n) == 3 * 200 + 3 * 10)
    assert(math.round(f(3) * 255 * n) == 3 * 100 + 3 * 20)
    assert(math.round(f(4) * 255 * n) == 3 * 50 + 3 * 30)
    val binA = ((299 * 200 + 587 * 100 + 114 * 50) / 1000) >> 4
    val binB = ((299 * 10 + 587 * 20 + 114 * 30) / 1000) >> 4
    (0 until 16).foreach { bin =>
      val expected = (if (bin == binA) 3 else 0) + (if (bin == binB) 3 else 0)
      assert(math.round(f(5 + bin) * n) == expected, s"bin $bin")
    }
  }

  test("ImageIoDecoder: JPEG decodes with correct dims and near-planted means") {
    // JPEG is lossy — pin dims exactly and channel means within codec error
    // on a uniform image (DC-only, so the error is small)
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val col = (120 << 16) | (180 << 8) | 60
    for (y <- 0 until 8; x <- 0 until 16) img.setRGB(x, y, col)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos),
      "JDK must ship a JPEG writer")
    val f = Multimodal.ImageIoDecoder.decode("image", baos.toByteArray,
      Multimodal.MediaMeta(16, 8, 0, 1))
    assert(f(0) == 16f && f(1) == 8f)
    assert(math.abs(f(2) * 255 - 120) < 8, s"mean R ${f(2) * 255}")
    assert(math.abs(f(3) * 255 - 180) < 8, s"mean G ${f(3) * 255}")
    assert(math.abs(f(4) * 255 - 60) < 8, s"mean B ${f(4) * 255}")
  }

  test("ImageIoDecoder: undecodable bytes throw; non-image delegates to stub") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode("image", Array[Byte](1, 2, 3),
        Multimodal.MediaMeta(1, 1, 0, 1))
    }
    assert(e.getMessage.contains("undecodable"))
    val audio = Multimodal.ImageIoDecoder.decode("audio",
      "hello".getBytes("UTF-8"), Multimodal.MediaMeta(0, 0, 16000, 1))
    assert(audio.toSeq == Multimodal.ByteHistogramDecoder.decode("audio",
      "hello".getBytes("UTF-8"), Multimodal.MediaMeta(0, 0, 16000, 1)).toSeq)
  }

  // ---- real JDK-AudioSystem decode --------------------------------------

  private def wavBytes(rate: Int, samples: Seq[Int],
      bigEndian: Boolean = false): Array[Byte] = {
    val pcm = new Array[Byte](2 * samples.length)
    samples.zipWithIndex.foreach { case (s, i) =>
      if (bigEndian) {
        pcm(2 * i) = ((s >> 8) & 0xff).toByte
        pcm(2 * i + 1) = (s & 0xff).toByte
      } else {
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true,
      bigEndian)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("WavDecoder: planted PCM decodes to exact rate, frames, sum, histogram") {
    val samples = Seq(-32768, -1, 0, 1, 32767, 4095, 4096, -4097)
    val f = Multimodal.WavDecoder.decode("audio", wavBytes(11025, samples),
      Multimodal.MediaMeta(0, 0, 11025, samples.length))
    assert(f.length == 19)
    assert(f(0) == 11025f && f(1) == samples.length.toFloat)
    assert(math.round(f(2).toDouble) == samples.map(s => math.abs(s.toLong)).sum)
    val hist = new Array[Long](16)
    samples.foreach(s => hist((s + 32768) >> 12) += 1)
    (0 until 16).foreach(b =>
      assert(math.round(f(3 + b).toDouble) == hist(b), s"bin $b"))
  }

  test("WavDecoder: AIFF (big-endian PCM) decodes via the same seam") {
    // AudioSystem writes AIFF as big-endian PCM — exercises the
    // endianness branch with a different JDK-native container.
    val samples = Seq(100, -200, 30000)
    val pcm = new Array[Byte](2 * samples.length)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = ((s >> 8) & 0xff).toByte
      pcm(2 * i + 1) = (s & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, baos)
    val f = Multimodal.WavDecoder.decode("audio", baos.toByteArray,
      Multimodal.MediaMeta(0, 0, 8000, samples.length))
    assert(f(0) == 8000f && f(1) == 3f)
    assert(math.round(f(2).toDouble) == samples.map(s => math.abs(s.toLong)).sum)
  }

  test("WavDecoder: undecodable/unsupported bytes throw; image delegates") {
    intercept[Exception] { // UnsupportedAudioFileException on garbage
      Multimodal.WavDecoder.decode("audio", Array[Byte](1, 2, 3),
        Multimodal.MediaMeta(0, 0, 8000, 1))
    }
    val img = pngBytes(2, 2, (_, _) => 0xffffff)
    assert(Multimodal.WavDecoder.decode("image", img,
        Multimodal.MediaMeta(2, 2, 0, 1)).toSeq ==
      Multimodal.ImageIoDecoder.decode("image", img,
        Multimodal.MediaMeta(2, 2, 0, 1)).toSeq)
  }

  test("real decode e2e: syntheticWavs -> extractFeatures(WavDecoder) " +
      "pins every planted sample statistic") {
    val docs = Tables.documents(spark, sfDir)
    val audit = Multimodal.audioDecodeAudit(docs).collect()
    assert(audit.nonEmpty)
    // independent in-test simulation of the planted PCM
    audit.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val n = (id % 32 + 1).toInt
      val samples = (0 until n).map(i =>
        ((id * 2654435761L + i * 40503L) % 65536L - 32768L).toInt)
      val hist = new Array[Long](16)
      samples.foreach(s => hist((s + 32768) >> 12) += 1)
      assert(rows.length == hist.count(_ > 0L))
      rows.foreach { r =>
        assert(r.getLong(1) == 8000L + (id % 8) * 1000L)
        assert(r.getLong(2) == n.toLong)
        assert(r.getLong(3) == samples.map(s => math.abs(s.toLong)).sum)
        assert(r.getLong(5) == hist(r.getLong(4).toInt))
      }
    }
  }

  test("real decode e2e: syntheticImages -> extractFeatures(ImageIoDecoder) " +
      "pins every planted pixel statistic") {
    val docs = Tables.documents(spark, sfDir)
    val audit = Multimodal.imageDecodeAudit(docs).collect()
    assert(audit.length == docs.count() * 16)
    // independent in-test simulation of the planted checkerboards
    audit.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val w = (id % 16 + 1).toInt
      val h = (id % 8 + 1).toInt
      val colA = Seq(id % 256, id * 7 % 256, id * 13 % 256).map(_.toInt)
      val colB = Seq(id * 3 % 256, id * 11 % 256, id * 17 % 256).map(_.toInt)
      val cells = for (y <- 0 until h; x <- 0 until w)
        yield if ((x + y) % 2 == 0) colA else colB
      val hist = new Array[Long](16)
      cells.foreach(c =>
        hist(((299 * c(0) + 587 * c(1) + 114 * c(2)) / 1000) >> 4) += 1)
      rows.foreach { r =>
        assert(r.getLong(1) == w && r.getLong(2) == h)
        assert(r.getLong(3) == cells.map(_(0)).sum)
        assert(r.getLong(4) == cells.map(_(1)).sum)
        assert(r.getLong(5) == cells.map(_(2)).sum)
        assert(r.getLong(7) == hist(r.getLong(6).toInt))
      }
    }
  }

  // ---- perceptual-hash image dedup (q122's machinery) --------------------

  private def imgBytes(fmt: String, w: Int, h: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  private def mediaOf(rows: (Long, Array[Byte])*) = {
    import graft.SparkTestSession.spark.implicits._
    spark.createDataset(rows.map { case (id, bytes) =>
      Multimodal.MediaRow(id, "image", bytes,
        Multimodal.MediaMeta(0, 0, 0, 1)) })
  }

  test("imageSignatures: pixel-identical images hash identically even " +
      "across encoders (PNG vs BMP); pixkey is over DECODED pixels") {
    val grad = (x: Int, y: Int) => ((x * 30) << 16) | ((y * 30) << 8) | 40
    val ds = mediaOf(
      1L -> imgBytes("png", 8, 8, grad),
      2L -> imgBytes("bmp", 8, 8, grad), // same pixels, different bytes
      3L -> imgBytes("png", 8, 8, (x, y) => grad(x, y) ^ 0x00FFFFFF))
    val sigs = Multimodal.imageSignatures(ds).collect()
      .map(s => s.media_id -> s).toMap
    assert(sigs(1L).pixkey == sigs(2L).pixkey,
      "content key must see through the container format")
    assert(sigs(1L).phash == sigs(2L).phash)
    assert(sigs(1L).pixkey != sigs(3L).pixkey)
    // exact dedup finds the cross-encoder pair, Hamming pinned 0
    val pairs = Multimodal.imageExactDups(ds).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toList == List((1L, 2L, 0L)))
  }

  test("imageNearDups: a one-cell luminance flip lands within the " +
      "banding radius; unrelated images do not pair") {
    // base: mid-gray; neighbor: ONE sampled cell pushed far above the
    // mean -> exactly one aHash bit differs; far: inverted-ramp image
    val base = (_: Int, _: Int) => 0x808080
    val oneCell = (x: Int, y: Int) =>
      if (x == 0 && y == 0) 0xFFFFFF else 0x808080
    val ramp = (x: Int, y: Int) =>
      (((x + 8 * y) * 4) << 16) | (((x + 8 * y) * 4) << 8) | ((x + 8 * y) * 4)
    val ds = mediaOf(
      10L -> imgBytes("png", 8, 8, base),
      11L -> imgBytes("png", 8, 8, oneCell),
      12L -> imgBytes("png", 8, 8, ramp))
    val sigs = Multimodal.imageSignatures(ds).collect()
      .map(s => s.media_id -> s.phash).toMap
    assert(java.lang.Long.bitCount(sigs(10L) ^ sigs(11L)) <= 3,
      "one flipped cell must stay within the Hamming-3 radius")
    val pairs = Multimodal.imageNearDups(ds, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L)),
      s"banding must surface the near-identical pair, got $pairs")
    assert(!pairs.contains((10L, 12L)) && !pairs.contains((11L, 12L)),
      "a structurally different image must not pair within the radius")
    // determinism: same inputs, same signatures on a second pass
    val again = Multimodal.imageSignatures(ds).collect()
      .map(s => s.media_id -> s.phash).toMap
    assert(again == sigs)
  }

  test("audioSignatures: sample-identical clips pair across containers " +
      "(WAV vs AIFF); different PCM does not") {
    def clip(fmt: javax.sound.sampled.AudioFileFormat.Type, big: Boolean,
        samples: Seq[Int]): Array[Byte] = {
      val af = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, big)
      val pcm = new Array[Byte](2 * samples.length)
      samples.zipWithIndex.foreach { case (v, i) =>
        if (big) { pcm(2 * i) = ((v >> 8) & 0xff).toByte
                   pcm(2 * i + 1) = (v & 0xff).toByte }
        else     { pcm(2 * i) = (v & 0xff).toByte
                   pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte }
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), af, samples.length.toLong),
        fmt, baos)
      baos.toByteArray
    }
    import graft.SparkTestSession.spark.implicits._
    val samples = Seq(100, -2000, 30000, -1, 0, 512)
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "audio",
        clip(javax.sound.sampled.AudioFileFormat.Type.WAVE, big = false,
          samples), Multimodal.MediaMeta(0, 0, 8000, samples.length)),
      Multimodal.MediaRow(2L, "audio",
        clip(javax.sound.sampled.AudioFileFormat.Type.AIFF, big = true,
          samples), Multimodal.MediaMeta(0, 0, 8000, samples.length)),
      Multimodal.MediaRow(3L, "audio",
        clip(javax.sound.sampled.AudioFileFormat.Type.WAVE, big = false,
          samples.map(_ / 2)), Multimodal.MediaMeta(0, 0, 8000,
          samples.length))))
    val sigs = Multimodal.audioSignatures(ds).collect()
      .map(a => a.media_id -> a).toMap
    assert(sigs(1L).pcmkey == sigs(2L).pcmkey,
      "content key must see through WAV vs AIFF containers")
    assert(sigs(1L).envhash == sigs(2L).envhash)
    assert(sigs(1L).pcmkey != sigs(3L).pcmkey)
    val pairs = Multimodal.audioExactDups(ds).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toList == List((1L, 2L, 0L)))
  }
}
