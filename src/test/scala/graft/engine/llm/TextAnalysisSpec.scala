package graft.engine.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkTestSession.spark

class TextAnalysisSpec extends AnyFunSuite {
  import spark.implicits._

  test("embedText: identical word multisets embed identically; order and " +
      "case are irrelevant; wordless docs are the zero vector") {
    val df = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "Beta GAMMA beta, alpha!"), // same multiset, different order/case
      (3L, "alpha beta gamma"),        // different multiset
      (4L, "?!. ..."),                 // wordless
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.embedText(df, "doc_id", "text", dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(out.size == 5, "every input row embeds, none dropped")
    assert(out(1) == out(2), "multiset-equal docs must embed identically")
    assert(out(1) != out(3))
    assert(out(4) == List.fill(8)(0L) && out(5) == List.fill(8)(0L))
    assert(out.values.forall(_.length == 8))
    // total signed mass equals the signed word count: 4 words, each ±1
    assert(out(1).sum.abs <= 4 && out(1).map(_.abs).sum <= 4)
    // determinism across evaluations
    val again = TextAnalysis.embedText(df, "doc_id", "text", dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(again == out)
    intercept[IllegalArgumentException] {
      TextAnalysis.embedText(df, "doc_id", "text", dim = 0)
    }
  }

  private def chunksOf(text: String, size: Int, overlap: Int): Seq[(Long, Seq[String])] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    TextAnalysis.chunkTokens(df, "doc_id", "text", size, overlap)
      .orderBy(col("chunk_idx"))
      .select(col("chunk_idx"), col("chunk_tok"))
      .as[(Long, Seq[String])].collect().toSeq
  }

  test("chunking: starts advance by stride, last chunk may be short") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val chunks = chunksOf(text, size = 4, overlap = 1)  // stride 3
    assert(chunks.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(chunks.map(_._2.length) == Seq(4, 4, 4, 1))
    assert(chunks(1)._2.head == "t4") // starts at 1*stride = 3 (0-based)
    assert(chunks(3)._2 == Seq("t10"))
  }

  test("chunking with zero overlap partitions the token sequence exactly") {
    val tokens = (1 to 11).map(i => s"w$i")
    val chunks = chunksOf(tokens.mkString(" "), size = 4, overlap = 0)
    assert(chunks.flatMap(_._2) == tokens)
  }

  test("chunking with overlap: dropping the first `overlap` tokens of each later chunk reconstructs the doc") {
    val tokens = (1 to 23).map(i => s"w$i")
    val o = 3
    val chunks = chunksOf(tokens.mkString(" "), size = 8, overlap = o)
    val rebuilt = chunks.head._2 ++ chunks.tail.flatMap(_._2.drop(o))
    assert(rebuilt == tokens)
  }

  test("chunking: doc shorter than chunkSize yields one full-doc chunk; no empty chunks") {
    val chunks = chunksOf("only three tokens", size = 40, overlap = 8)
    assert(chunks == Seq((0L, Seq("only", "three", "tokens"))))
    assert(chunksOf("a b c d e", size = 2, overlap = 1).forall(_._2.nonEmpty))
  }

  test("chunking rejects overlap >= chunkSize") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(df, "doc_id", "text", chunkSize = 4, overlap = 4)
    }
  }

  test("normalizeText lowercases, strips symbols, collapses whitespace; idempotent") {
    val out = Seq("  Hello,  WORLD!! 42\t(ok) ", "", "a-b_c")
      .toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n"))
      .as[String].collect().toSeq
    assert(out == Seq("hello world 42 ok", "", "a b c"))
    val twice = Seq("Hello,  WORLD!!").toDF("t")
      .select(TextAnalysis.normalizeText(TextAnalysis.normalizeText(col("t"))).as("n"))
      .as[String].head()
    assert(twice == "hello world")
  }

  test("bm25: hand-computed score on a 2-doc fixture; tf monotonicity") {
    // doc 1: "join join x y"  doc 2: "join a b c d e f g h i"
    // N=2, avgdl=7, df(join)=2 -> idf = ln(1 + 0.5/2.5) = ln(1.2)
    val docs = Seq((1L, "join join x y"), (2L, "join a b c d e f g h i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def score(tf: Double, dl: Double) = {
      val idf = math.log(1.0 + 0.5 / 2.5)
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 7.0))
    }
    assert(math.abs(out(1L) - score(2, 4)) < 1e-5, s"doc1 got ${out(1L)}")
    assert(math.abs(out(2L) - score(1, 10)) < 1e-5, s"doc2 got ${out(2L)}")
    assert(out(1L) > out(2L),
      "higher tf in a shorter doc must outrank one hit in a longer doc")
  }

  test("redactPii scrubs planted emails/phones; clean text untouched") {
    val df = Seq(
      (1L, "mail me at bob.smith+x@corp.example.org today"),
      (2L, "call 555-0199 twice"),
      (3L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df, "text")
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((1L, 0L, "mail me at <EMAIL> today")))
    assert(out(2L) == ((0L, 1L, "call <PHONE> twice")))
    assert(out(3L) == ((0L, 0L, "no pii here at all")))
  }

  test("repetitionScore: fully repeated phrase scores near 1, varied text near 0") {
    val df = Seq(
      (1L, Seq.fill(20)("spam spam spam").mkString(" ")),
      (2L, (1 to 60).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) > 0.9, s"repeated doc got ${out(1L)}")
    assert(out(2L) == 0.0, s"all-distinct doc got ${out(2L)}")
  }

  test("unigramSurprisal: a doc of rare tokens scores above a doc of common tokens") {
    val common = Seq.fill(30)("the").mkString(" ")
    val df = Seq((1L, common), (2L, common), (3L, common),
      (4L, "zyx wvu tsr qpo nml kji")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(4L) > out(1L), s"rare ${out(4L)} vs common ${out(1L)}")
  }
}
