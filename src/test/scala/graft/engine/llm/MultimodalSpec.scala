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
}
