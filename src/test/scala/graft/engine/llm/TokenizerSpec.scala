package graft.engine.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}
import graft.engine.Tables

class TokenizerSpec extends AnyFunSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("greedy longest-match on a pinned fixture") {
    val vocab = Array("the", "theory", "or", "of")
    val df = Seq("the theory of xyz", "THEORY!", "  ", "a").toDF("t")
      .select(Tokenizer.tokens(col("t"), vocab).as("tok"),
        Tokenizer.tokenCount(col("t"), vocab).as("n"))
    val rows = df.collect().map(r =>
      (r.getSeq[String](0).toList, r.getLong(1)))
    // "theory" beats "the" at position 0 (longest match), "of" is one
    // token, unknown chars fall back to one token each
    assert(rows(0) == (List("the", "theory", "of", "x", "y", "z"), 6L))
    // lowercased before matching; "!" is a single-char fallback token
    assert(rows(1) == (List("theory", "!"), 2L))
    assert(rows(2) == (Nil, 0L))
    // single char not in vocab still counts (implicit base vocab)
    assert(rows(3) == (List("a"), 1L))
  }

  test("trie kernel == regex-alternation twin on the real corpus") {
    val vocab = Tokenizer.trainWordVocab(docs, "text", 16)
    val pat = Tokenizer.alternationPattern(vocab)
    val both = docs.select(
      Tokenizer.tokenCount(col("text"), vocab).as("trie"),
      size(regexp_extract_all(lower(col("text")), lit(pat), lit(0)))
        .cast("long").as("re"),
      size(Tokenizer.tokens(col("text"), vocab)).cast("long").as("ntok"))
    assert(both.filter(col("trie") =!= col("re")).count() == 0L,
      "greedy trie must equal leftmost-first alternation everywhere")
    assert(both.filter(col("trie") =!= col("ntok")).count() == 0L,
      "count kernel must equal size(tokens kernel)")
  }

  test("training is deterministic and ranked by (freq desc, word asc)") {
    val v1 = Tokenizer.trainWordVocab(docs, "text", 16)
    val v2 = Tokenizer.trainWordVocab(docs, "text", 16)
    assert(v1.toSeq == v2.toSeq, "identical vocab on re-run")
    assert(v1.length == 16)
    assert(v1.forall(w => w.length >= 2 && w.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))))
    // a larger vocab is a superset prefix-extension of the smaller one
    val v8 = Tokenizer.trainWordVocab(docs, "text", 8)
    assert(v1.take(8).toSeq == v8.toSeq)
  }

  test("token pieces reassemble the non-whitespace text exactly") {
    val vocab = Tokenizer.trainWordVocab(docs, "text", 16)
    val bad = docs.select(
        concat_ws("", Tokenizer.tokens(col("text"), vocab)).as("joined"),
        regexp_replace(lower(col("text")), "\\s", "").as("stripped"))
      .filter(col("joined") =!= col("stripped"))
    assert(bad.count() == 0L,
      "tokenization must partition the non-whitespace characters")
  }

  test("vocab coverage lowers the token count, never below word count") {
    val full = Tokenizer.trainWordVocab(docs, "text", 64)
    val none = docs.select(
      Tokenizer.tokenCount(col("text"), Array("zzzzzz")).as("chars"),
      Tokenizer.tokenCount(col("text"), full).as("vocab"),
      TextAnalysis.tokenCount(col("text")).as("regex"))
    // empty-coverage vocab degrades to per-character counting >= any
    // vocab'd count; a covering vocab merges whole words so it can't
    // exceed the regex word-proxy count on this alphanumeric corpus
    assert(none.filter(col("chars") < col("vocab")).count() == 0L)
    assert(none.filter(col("vocab") > col("regex")).count() == 0L)
  }

  test("subword vocab: within-word grams only, short words covered, " +
      "unseen words decompose into pieces") {
    val vocab = Tokenizer.trainNgramVocab(docs, "text", 24)
    assert(vocab.length == 24)
    assert(vocab.forall(g => g.length >= 2 && g.length <= 6))
    // grams never span whitespace by construction
    assert(vocab.forall(_.forall(c => c.isLetterOrDigit)))
    // determinism
    assert(vocab.toSeq == Tokenizer.trainNgramVocab(docs, "text", 24).toSeq)
    // an UNSEEN word still decomposes greedily: the learned piece is
    // consumed whole, the unseen tail falls back to characters
    val piece = vocab.maxBy(g => (g.length, g))
    val toks = Seq(piece + "zq").toDF("t")
      .select(Tokenizer.tokens(col("t"), vocab)).collect()
      .head.getSeq[String](0).toList
    assert(toks.head == piece, s"longest learned piece first, got $toks")
    assert(toks.mkString("") == piece + "zq")
    // trie == alternation twin holds for the subword vocab too
    val pat = Tokenizer.alternationPattern(vocab)
    val both = docs.select(
      Tokenizer.tokenCount(col("text"), vocab).as("trie"),
      size(regexp_extract_all(lower(col("text")), lit(pat), lit(0)))
        .cast("long").as("re"))
    assert(both.filter(col("trie") =!= col("re")).count() == 0L)
  }

  test("publish/load round-trips the vocabulary in training order; " +
      "versions pin") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_vocab").toString + "/v"
    val v16 = Tokenizer.trainWordVocab(docs, "text", 16)
    assert(Tokenizer.publishVocab(spark, root, v16) == 1L)
    assert(Tokenizer.loadVocab(spark, root).toSeq == v16.toSeq,
      "load must return the exact trained array, order included")
    // retrain wider -> v2; v1 stays loadable and unchanged
    val v24 = Tokenizer.trainWordVocab(docs, "text", 24)
    assert(Tokenizer.publishVocab(spark, root, v24) == 2L)
    assert(Tokenizer.loadVocab(spark, root).toSeq == v24.toSeq)
    assert(Tokenizer.loadVocab(spark, root, version = 1L).toSeq == v16.toSeq)
    // the loaded wider vocab still prefix-extends the narrower one
    assert(Tokenizer.loadVocab(spark, root).take(16).toSeq == v16.toSeq)
    intercept[IllegalArgumentException] {
      Tokenizer.publishVocab(spark, root, Array.empty[String])
    }
  }

  test("vertical tab: kernel and alternation twin agree, and the emitted " +
      "pattern avoids \\s (RE2's \\s excludes U+000B, Java's includes it)") {
    val vocab = Array("ab", "cd")
    val pat = Tokenizer.alternationPattern(vocab)
    assert(!pat.contains("\\s"),
      s"pattern must spell out the whitespace class explicitly, got $pat")
    assert(!Tokenizer.sqlVocabCtes(4).contains("[^\\s]"))
    // VT is whitespace for the kernel; the explicit class makes the regex
    // twin agree on BOTH engines (DuckDB's RE2 would have tokenized VT
    // under [^\s])
    val df = Seq("ab\u000Bcd", "x\u000B\u000B").toDF("t").select(
      Tokenizer.tokens(col("t"), vocab).as("tok"),
      Tokenizer.tokenCount(col("t"), vocab).as("n"),
      size(regexp_extract_all(lower(col("t")), lit(pat), lit(0)))
        .cast("long").as("re"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0).toList == List("ab", "cd"))
    assert(rows(0).getLong(1) == 2L && rows(0).getLong(2) == 2L)
    assert(rows(1).getSeq[String](0).toList == List("x"))
    assert(rows(1).getLong(1) == 1L && rows(1).getLong(2) == 1L)
  }

  test("guards: whitespace or regex-unsafe vocab entries are rejected") {
    intercept[IllegalArgumentException] {
      Seq("x").toDF("t")
        .select(Tokenizer.tokenCount(col("t"), Array("a b"))).collect()
    }
    intercept[IllegalArgumentException] {
      Tokenizer.alternationPattern(Array("a.b"))
    }
  }
}
