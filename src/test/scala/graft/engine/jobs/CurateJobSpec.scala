package graft.engine.jobs

import java.nio.file.Files
import org.apache.spark.sql.functions.{col, length}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}

/** Drives CurateJob.run (the main minus session lifecycle) over the
  * documents fixture — every mode must produce the same result as calling
  * the underlying operator directly. */
class CurateJobSpec extends AnyFunSuite {

  private val input = s"$sfDir/documents.parquet"

  test("filter mode applies the corpus gates and keeps the document text") {
    val out = CurateJob.run(spark, Map("input" -> input, "mode" -> "filter"))
    assert(out.columns.toSeq ==
      Seq("doc_id", "text", "lang_pred", "n_tokens", "quality"))
    assert(out.count() > 0)
    assert(out.filter(length(col("text")) === 0).count() == 0,
      "the curated output must be a consumable corpus, not evidence only")
  }

  test("sample mode honors --fraction") {
    val all = CurateJob.run(spark,
      Map("input" -> input, "mode" -> "sample", "fraction" -> "1.0")).count()
    val none = CurateJob.run(spark,
      Map("input" -> input, "mode" -> "sample", "fraction" -> "0.0")).count()
    assert(none == 0 && all == spark.read.parquet(input).count())
  }

  test("pack mode rolls up every document") {
    import org.apache.spark.sql.functions.sum
    val packs = CurateJob.run(spark,
      Map("input" -> input, "mode" -> "pack", "budget" -> "1024"))
    assert(packs.agg(sum("n_docs")).head.getLong(0) ==
      spark.read.parquet(input).count())
  }

  test("decontaminate mode needs --benchmark and emits per-doc ratios") {
    val bench = Files.createTempDirectory("graft-bench").toString + "/b"
    spark.read.parquet(input).limit(25).write.parquet(bench)
    val out = CurateJob.run(spark, Map("input" -> input,
      "mode" -> "decontaminate", "benchmark" -> bench))
    assert(out.columns.contains("contamination"))
    assert(out.count() == spark.read.parquet(input).count())
    intercept[IllegalArgumentException] {
      CurateJob.run(spark, Map("input" -> input, "mode" -> "decontaminate"))
    }
  }

  test("spans / trim-spans / shard modes drive the round-12 operators") {
    val n = spark.read.parquet(input).count()
    val spans = CurateJob.run(spark,
      Map("input" -> input, "mode" -> "spans", "min-len" -> "40"))
    assert(spans.columns.toSeq == Seq("doc_id", "n_spans", "dup_chars",
      "total_chars", "dup_ratio"))
    assert(spans.count() == n, "every doc accounted, zeros included")
    val trimmed = CurateJob.run(spark,
      Map("input" -> input, "mode" -> "trim-spans", "min-len" -> "40"))
    assert(trimmed.columns.contains("trimmed_text") && trimmed.count() == n)
    val sharded = CurateJob.run(spark,
      Map("input" -> input, "mode" -> "shard", "shards" -> "4"))
    assert(sharded.columns.contains("shard_id") &&
      sharded.columns.contains("shuffle_key"))
    assert(sharded.select("shard_id").distinct().count() == 4)
    assert(sharded.count() == n)
  }

  test("pack-fixed mode == packFixedSequences, and the main() write path " +
      "lands the trainer layout (q134's artifact shape)") {
    import graft.engine.llm.{Curation, Tokenizer}
    // an ids-bearing input, the shape a tokenize step hands the job
    val idsIn = Files.createTempDirectory("graft-packin").toString + "/ids"
    spark.read.parquet(input).limit(40)
      .select(col("doc_id"), Tokenizer.tokenIds(col("text"),
        Array("the", "and")).as("token_ids"))
      .write.parquet(idsIn)
    val o = Map("input" -> idsIn, "mode" -> "pack-fixed",
      "shards" -> "2", "seq-len" -> "64")
    val run = CurateJob.run(spark, o)
    assert(run.columns.toSeq == Seq("shard_id", "seq_idx", "token_ids",
      "doc_starts", "start_doc_ids", "n_tokens"))
    val expect = Curation.packFixedSequences(
      spark.read.parquet(idsIn), "doc_id", "token_ids", 2, 64)
    assert(run.exceptAll(expect).isEmpty && expect.exceptAll(run).isEmpty)
    // the write path main() routes this mode through: shard_id=K/ dirs,
    // seq_idx-sorted within — the layout a trainer streams in order
    val out = Files.createTempDirectory("graft-packout").toString + "/p"
    Curation.writePackedSequences(spark.read.parquet(idsIn),
      "doc_id", "token_ids", 2, 64, out)
    (0L until 2L).foreach { sh =>
      val seqs = spark.read.parquet(s"$out/shard_id=$sh")
        .select(col("seq_idx")).collect().map(_.getLong(0)).toSeq
      assert(seqs == seqs.sorted && seqs.nonEmpty)
    }
  }

  test("unknown mode is rejected") {
    intercept[IllegalArgumentException] {
      CurateJob.run(spark, Map("input" -> input, "mode" -> "nope"))
    }
  }
}
