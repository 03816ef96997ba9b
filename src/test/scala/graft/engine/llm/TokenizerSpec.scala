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

  test("token IDS align 1:1 with pieces; decode(ids) == pieces wherever " +
      "the id is not UNK; UNK iff the piece is a fallback outside the " +
      "vocab") {
    val vocab = Tokenizer.trainWordVocab(docs, "text", 16)
    val rows = docs.limit(200).select(
        Tokenizer.tokens(col("text"), vocab).as("pieces"),
        Tokenizer.tokenIds(col("text"), vocab).as("ids"))
      .collect()
      .map(r => (r.getSeq[String](0), r.getSeq[Long](1)))
    val inVocab = vocab.toSet
    assert(rows.nonEmpty)
    rows.foreach { case (pieces, ids) =>
      assert(pieces.length == ids.length, "one id per piece")
      pieces.zip(ids).foreach { case (p, id) =>
        if (id == -1L)
          assert(!inVocab.contains(p),
            s"piece '$p' is in the vocab but got UNK")
        else assert(vocab(id.toInt) == p,
          s"decode(${id}) = '${vocab(id.toInt)}' != piece '$p'")
      }
    }
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

  test("BPE merge training equals the single-threaded reference, " +
      "including overlap runs and tie-breaks") {
    // "aaaaa": merging (a,a) leftmost gives [aa,aa,a] — the fold's
    // tail-replace rule must NOT re-merge the freshly produced piece;
    // "banana": (a,n) vs (n,a) exercises the (freq desc, pair asc)
    // tie-break; repeated docs weight the counts
    val texts = Seq("aaaaa aaaa abab", "banana bandana", "abab ababab aa",
      "aaaaa banana", "zz zz zz")
    val df = texts.toDF("t")
    val got = Tokenizer.trainBpeMerges(df, "t", 6).toList
    val want = BpeReference.train(texts, 6)
    assert(got == want, s"distributed fold must equal reference BPE:" +
      s"\n got $got\n want $want")
    // determinism on re-run
    assert(Tokenizer.trainBpeMerges(df, "t", 6).toList == got)
    // vocab: distinct merge outputs, regex-safe, length >= 2
    val vocab = Tokenizer.bpeVocab(got.toArray)
    assert(vocab.distinct.toSeq == vocab.toSeq)
    assert(vocab.forall(w => w.length >= 2 && w.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))))
  }

  test("BPE on the real corpus: deterministic, merge-prefix stable, " +
      "trie == alternation twin under the merged vocab") {
    val m8 = Tokenizer.trainBpeMerges(docs, "text", 8)
    assert(m8.length == 8)
    // fewer rounds = a prefix of more rounds (the merge loop is greedy
    // and earlier rounds never depend on later ones)
    val m4 = Tokenizer.trainBpeMerges(docs, "text", 4)
    assert(m8.take(4).toSeq == m4.toSeq)
    val vocab = Tokenizer.bpeVocab(m8)
    val pat = Tokenizer.alternationPattern(vocab)
    val both = docs.select(
      Tokenizer.tokenCount(col("text"), vocab).as("trie"),
      size(regexp_extract_all(lower(col("text")), lit(pat), lit(0)))
        .cast("long").as("re"))
    assert(both.filter(col("trie") =!= col("re")).count() == 0L)
    // exhaustion: asking for more merges than the corpus supports stops
    // cleanly instead of looping
    val tiny = Seq("ab ab").toDF("t")
    val m = Tokenizer.trainBpeMerges(tiny, "t", 10)
    assert(m.toSeq == Seq(("a", "b")))
  }

  test("BPE at 32 merge rounds: distributed trainer stays reference-equal " +
      "on the real corpus (the SCALE.md merge-budget claim)") {
    // 32 rounds = 64 small jobs over the shrinking distinct-word table;
    // the reference replays the same loop in memory. Equality at this
    // depth pins that per-round localCheckpoint + dead-word pruning
    // change nothing semantically as the merge budget grows.
    val texts = docs.select(col("text")).collect().map(_.getString(0)).toSeq
    val got = Tokenizer.trainBpeMerges(docs, "text", 32).toList
    val want = BpeReference.train(texts, 32)
    assert(got == want,
      s"divergence at depth ${got.zip(want).indexWhere(p => p._1 != p._2)}")
    assert(got.length == 32)
    // the merged vocab still tokenizes through the trie == twin
    val vocab = Tokenizer.bpeVocab(got.toArray)
    val pat = Tokenizer.alternationPattern(vocab)
    val both = docs.limit(100).select(
      Tokenizer.tokenCount(col("text"), vocab).as("trie"),
      size(regexp_extract_all(lower(col("text")), lit(pat), lit(0)))
        .cast("long").as("re"))
    assert(both.filter(col("trie") =!= col("re")).count() == 0L)
  }

  test("publish/load round-trips the merge sequence in merge order; " +
      "versions pin; empty list refused") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_merges").toString + "/m"
    val m8 = Tokenizer.trainBpeMerges(docs, "text", 8)
    assert(Tokenizer.publishMerges(spark, root, m8) == 1L)
    assert(Tokenizer.loadMerges(spark, root).toSeq == m8.toSeq,
      "load must return the exact merge sequence, order included")
    val m4 = Tokenizer.trainBpeMerges(docs, "text", 4)
    assert(Tokenizer.publishMerges(spark, root, m4) == 2L)
    assert(Tokenizer.loadMerges(spark, root).toSeq == m4.toSeq)
    assert(Tokenizer.loadMerges(spark, root, version = 1L).toSeq == m8.toSeq)
    intercept[IllegalArgumentException] {
      Tokenizer.publishMerges(spark, root, Array.empty)
    }
    // the loaded merges tokenize identically to the trained ones
    val both = docs.limit(50).select(
      Tokenizer.bpeTokenCount(col("text"), m8).as("a"),
      Tokenizer.bpeTokenCount(col("text"),
        Tokenizer.loadMerges(spark, root, version = 1L)).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0L)
  }

  test("TRUE BPE inference: merge-order semantics (not greedy), pieces " +
      "partition the text, count == size(pieces) on the real corpus") {
    // merge-order vs greedy divergence: merges [(b,c),(a,b)] on "abc" —
    // (b,c) fuses first so (a,b) never applies → pieces [a, bc]; greedy
    // over the merge OUTPUTS {bc, ab} picks "ab" at position 0 → [ab, c].
    // Same count, DIFFERENT pieces: the kernel must follow merge order.
    val m = Array(("b", "c"), ("a", "b"))
    val row = Seq("abc").toDF("t").select(
      Tokenizer.bpeTokens(col("t"), m).as("bpe"),
      Tokenizer.tokens(col("t"), Tokenizer.bpeVocab(m)).as("greedy"))
      .collect().head
    assert(row.getSeq[String](0).toList == List("a", "bc"))
    assert(row.getSeq[String](1).toList == List("ab", "c"))
    // leftmost non-overlap inside inference too: (a,a) on "aaaaa"
    val run = Seq("aaaaa").toDF("t")
      .select(Tokenizer.bpeTokens(col("t"), Array(("a", "a"))))
      .collect().head.getSeq[String](0).toList
    assert(run == List("aa", "aa", "a"))
    // run splitting + punctuation + whitespace: digits and letters are
    // separate words; '-' counts one; uppercase lowers first
    val mixed = Seq("AB12ab, cd\tab").toDF("t").select(
      Tokenizer.bpeTokens(col("t"), Array(("a", "b"), ("c", "d"))).as("p"),
      Tokenizer.bpeTokenCount(col("t"), Array(("a", "b"), ("c", "d"))).as("n"))
      .collect().head
    assert(mixed.getSeq[String](0).toList ==
      List("ab", "1", "2", "ab", ",", "cd", "ab"))
    assert(mixed.getLong(1) == 7L)
    // corpus-wide invariants under trained merges: count == size(pieces),
    // and pieces reassemble the non-whitespace text exactly
    val merges = Tokenizer.trainBpeMerges(docs, "text", 8)
    val inv = docs.select(
      Tokenizer.bpeTokenCount(col("text"), merges).as("n"),
      size(Tokenizer.bpeTokens(col("text"), merges)).cast("long").as("sz"),
      concat_ws("", Tokenizer.bpeTokens(col("text"), merges)).as("joined"),
      regexp_replace(lower(col("text")), "\\s", "").as("stripped"))
    assert(inv.filter(col("n") =!= col("sz")).count() == 0L)
    assert(inv.filter(col("joined") =!= col("stripped")).count() == 0L)
    // true-BPE counts can differ from greedy counts on the same merges —
    // but never on words the merges rebuild identically; just pin that
    // both are total and positive on non-empty docs
    val cmp = docs.filter(length(trim(col("text"))) > 0).select(
      Tokenizer.bpeTokenCount(col("text"), merges).as("a"))
    assert(cmp.filter(col("a") <= 0L).count() == 0L)
  }

  test("10^4-entry vocabulary: trie kernel stays correct and equal to " +
      "the alternation twin (the SCALE.md large-vocab gate)") {
    // synthetic vocab (real corpora here have < 10^4 distinct words):
    // tok0..tok9999 plus the corpus-trained top words, deduped
    val big = (Array.tabulate(10000)(i => s"tok$i") ++
      Tokenizer.trainWordVocab(docs, "text", 64)).distinct
    assert(big.length >= 10000)
    val sample = docs.limit(100)
    val pat = Tokenizer.alternationPattern(big)
    val both = sample.select(
      Tokenizer.tokenCount(col("text"), big).as("trie"),
      size(regexp_extract_all(lower(col("text")), lit(pat), lit(0)))
        .cast("long").as("re"),
      Tokenizer.tokenCount(col("text"),
        Tokenizer.trainWordVocab(docs, "text", 64)).as("small"))
    assert(both.filter(col("trie") =!= col("re")).count() == 0L,
      "trie must equal the 10^4-alternate regex twin")
    // the 10^4 padding words never occur, so counts equal the 64-word
    // vocab's — the big trie changes nothing but the lookup structure
    assert(both.filter(col("trie") =!= col("small")).count() == 0L)
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

  /** Deterministic synthetic corpus for deep-merge-budget gates: `n`
    * distinct words over a small alphabet (base-`radix` digit strings —
    * heavy pair sharing, like natural subword structure), each repeated
    * (i % 3 + 1) times, bundled into 20-word texts. */
  private def syntheticCorpus(n: Int, radix: Int, pad: Int): Seq[String] = {
    val words = (0 until n).map { i =>
      val s = java.lang.Integer.toString(i, radix)
        .map(c => if (c <= '9') ('a' + (c - '0')).toChar
                  else ('a' + (c - 'a') + 10).toChar)
      ("a" * math.max(0, pad - s.length)) + s
    }
    words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(i % 3 + 1)(w) }
      .grouped(20).map(_.mkString(" ")).toSeq
  }

  test("production-budget trainer: in-memory merge loop stays " +
      "reference-equal at a >=1000-merge budget (VERDICT r12 item 1)") {
    // a corpus rich enough to sustain >1000 merge rounds; the reference
    // recounts every round, the budget trainer maintains deltas + a
    // lazy-invalidation heap — equality pins the incremental accounting
    // (stale-entry discard, membership updates, tie-breaks) at depth
    val texts = syntheticCorpus(n = 900, radix = 6, pad = 9)
    val df = texts.toDF("t")
    val t0 = System.nanoTime()
    val got = Tokenizer.trainBpeMergesBudget(df, "t", 1200).toList
    val budgetSec = (System.nanoTime() - t0) / 1e9
    val want = BpeReference.train(texts, 1200)
    assert(got.length >= 1000,
      s"fixture must sustain >=1000 merges, got ${got.length}")
    assert(got == want,
      s"divergence at depth ${got.zip(want).indexWhere(p => p._1 != p._2)}" +
        s" of ${got.length}")
    info(f"budget trainer: ${got.length} merges in $budgetSec%.2f s " +
      "(one Spark aggregation + in-memory loop)")
    // determinism on re-run
    assert(Tokenizer.trainBpeMergesBudget(df, "t", 1200).toList == got)
  }

  test("ensureVocab: first call trains+publishes, later calls load the " +
      "stored version WITHOUT evaluating the training thunk") {
    val root = java.nio.file.Files.createTempDirectory("ensvocab")
      .toString + "/vocab"
    val df = Seq("alpha beta beta gamma", "beta gamma gamma delta").toDF("t")
    var trained = 0
    def thunk: Array[String] = {
      trained += 1
      Tokenizer.trainWordVocab(df, "t", 3)
    }
    val v1 = Tokenizer.ensureVocab(spark, root)(thunk)
    assert(trained == 1 && v1.nonEmpty)
    val v2 = Tokenizer.ensureVocab(spark, root)(thunk)
    assert(trained == 1, "present store must skip training entirely")
    assert(v2.toSeq == v1.toSeq, "reuse must load the identical artifact")
  }

  test("production-budget trainer: Heaps-violating corpus fails the " +
      "distinct-word cap FAST with the escape hatches named, never an " +
      "unbounded driver collect (VERDICT r12 item 3)") {
    // machine-generated unique tokens — the pathology that silently
    // breaks the Heaps'-law boundedness the in-memory trainer assumes
    val pathological = (0 until 5000)
      .map(i => s"tok${i}a tok${i}b tok${i}c").toDF("t")
    val e = intercept[IllegalArgumentException] {
      Tokenizer.trainBpeMergesBudget(pathological, "t", 10,
        maxDistinctWords = 1000L)
    }
    assert(e.getMessage.contains("distinct words") &&
      e.getMessage.contains("hashSample") &&
      e.getMessage.contains("trainBpeMerges"),
      s"cap failure must name the count and the escape hatches: " +
        s"${e.getMessage}")
    // the same corpus under a sufficient cap trains normally
    assert(Tokenizer.trainBpeMergesBudget(pathological, "t", 3,
      maxDistinctWords = 20000L).nonEmpty)
  }

  test("production-budget trainer == distributed fold at the 32-merge " +
      "budget on the real corpus") {
    val dist = Tokenizer.trainBpeMerges(docs, "text", 32).toList
    val mem = Tokenizer.trainBpeMergesBudget(docs, "text", 32).toList
    assert(mem == dist,
      s"divergence at depth ${mem.zip(dist).indexWhere(p => p._1 != p._2)}")
    // exhaustion parity: both stop at the same point on a tiny corpus
    val tiny = Seq("ab ab").toDF("t")
    assert(Tokenizer.trainBpeMergesBudget(tiny, "t", 10).toSeq ==
      Seq(("a", "b")))
  }

  test("BPE kernel at a 10^4-merge budget: inference stays correct and " +
      "fast under the production merge count (SCALE.md gate)") {
    // train a >=10^4-merge sequence on a deep synthetic corpus
    val texts = syntheticCorpus(n = 12000, radix = 8, pad = 14)
    val wf = scala.collection.mutable.Map.empty[String, Long]
    val wordRe = "[a-z]+|[0-9]+".r
    texts.foreach(t => wordRe.findAllIn(t.toLowerCase)
      .filter(_.length >= 2)
      .foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1L))
    val t0 = System.nanoTime()
    val merges = Tokenizer.bpeMergeLoop(wf.toArray, 10000)
    val trainSec = (System.nanoTime() - t0) / 1e9
    assert(merges.length >= 10000,
      s"fixture must sustain 10^4 merges, got ${merges.length}")
    // the kernel applies all 10^4 merges per distinct word (memoized);
    // correctness vs the reference merge application on the real
    // corpus's distinct words, timing over the full documents table
    val t1 = System.nanoTime()
    val kernelCounts = docs.select(col("doc_id"),
        Tokenizer.bpeTokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inferSec = (System.nanoTime() - t1) / 1e9
    info(f"10^4-merge gate: train $trainSec%.2f s, " +
      f"kernel inference over ${kernelCounts.size} docs $inferSec%.2f s")
    val sample = docs.filter(col("doc_id") < 60)
      .select(col("doc_id"), col("text")).collect()
    val mergeList = merges.toList
    val memo = scala.collection.mutable.Map.empty[String, Long]
    def refCount(text: String): Long = {
      var n = 0L
      var i = 0
      val s = text.toLowerCase
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
            c == '\f' || c == '\r') i += 1
        else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          val letters = c >= 'a' && c <= 'z'
          var j = i
          while (j < s.length && {
            val d = s.charAt(j)
            if (letters) d >= 'a' && d <= 'z' else d >= '0' && d <= '9'
          }) j += 1
          val w = s.substring(i, j)
          n += memo.getOrElseUpdate(w, {
            var p = w.map(_.toString).toList
            mergeList.foreach { case (a, b) =>
              p = BpeReference.applyMerge(p, a, b)
            }
            p.length.toLong
          })
          i = j
        } else { n += 1; i += 1 }
      }
      n
    }
    sample.foreach { r =>
      assert(kernelCounts(r.getLong(0)) == refCount(r.getString(1)),
        s"kernel count diverges from 10^4-merge reference on doc " +
          s"${r.getLong(0)}")
    }
    // the production inference cost must stay in the per-query budget
    assert(inferSec < 30.0,
      f"10^4-merge kernel inference took $inferSec%.1f s over 500 docs")
  }
}
