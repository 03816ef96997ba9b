package graft.engine.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the custom expression kernels, evaluated
  * directly (Expression.eval on literals — no Spark session, so hundreds of
  * samples are cheap). SURVEY.md §5.2. */
object ExpressionProperties extends Properties("graft.expressions") {

  private def floatArr(xs: Seq[Float]): Literal =
    Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(FloatType))
  private def strArr(xs: Seq[String]): Literal =
    Literal.create(ArrayData.toArrayData(
      xs.map(UTF8String.fromString).toArray), ArrayType(StringType))

  private val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-100f, 100f))
  private val tokGen = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))

  private def cosine(a: Seq[Float], b: Seq[Float]): Double =
    CosineSimilarity(floatArr(a), floatArr(b)).eval(null).asInstanceOf[Double]

  property("cosine in [-1, 1]") = Prop.forAll(vecGen, vecGen) { (a, b) =>
    val n = math.min(a.length, b.length)
    val c = cosine(a.take(n), b.take(n))
    c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9
  }

  property("cosine symmetric") = Prop.forAll(vecGen) { a =>
    val b = a.map(x => x * 0.5f + 1.0f)
    math.abs(cosine(a, b) - cosine(b, a)) < 1e-12
  }

  property("cosine of a vector with itself is 1 (unless zero)") =
    Prop.forAll(vecGen.suchThat(_.exists(_ != 0f))) { a =>
      math.abs(cosine(a, a) - 1.0) < 1e-9
    }

  property("simhash invariant under token permutation") =
    Prop.forAll(tokGen) { toks =>
      val h1 = SimHash64(strArr(toks)).eval(null)
      val h2 = SimHash64(strArr(scala.util.Random.shuffle(toks))).eval(null)
      h1 == h2
    }

  property("minhash signature invariant under shingle permutation, length = numHashes") =
    Prop.forAll(tokGen, Gen.choose(1, 32)) { (toks, n) =>
      def sig(ts: Seq[String]) = {
        val a = MinHashSignature(strArr(ts), n).eval(null).asInstanceOf[ArrayData]
        (0 until a.numElements()).map(a.getLong)
      }
      val s1 = sig(toks)
      val s2 = sig(scala.util.Random.shuffle(toks))
      s1 == s2 && s1.length == n
    }

  property("identical token sets share minhash signature; supersets only lower mins") =
    Prop.forAll(tokGen, tokGen) { (a, extra) =>
      def sig(ts: Seq[String]) = {
        val d = MinHashSignature(strArr(ts), 16).eval(null).asInstanceOf[ArrayData]
        (0 until 16).map(d.getLong)
      }
      val base = sig(a)
      val sup = sig(a ++ extra)
      base.zip(sup).forall { case (b, s) => s <= b }
    }

  property("shingles: count = max(n-k+1, 1), each has k tokens") =
    Prop.forAll(tokGen, Gen.choose(1, 5)) { (toks, k) =>
      val out = Shingles(strArr(toks), k).eval(null).asInstanceOf[ArrayData]
      val expected = if (toks.length < k) 1 else toks.length - k + 1
      val widths = (0 until out.numElements())
        .map(i => out.getUTF8String(i).toString.split(" ", -1).length)
      out.numElements() == expected &&
        (toks.length < k || widths.forall(_ == k))
    }

  property("sign-LSH buckets match a slow per-plane reference, every table, bits set only below width") =
    Prop.forAll(vecGen, Gen.choose(1, 8), Gen.choose(1, 4)) { (v, bits, tables) =>
      val planes = Array.tabulate(tables)(t =>
        graft.engine.llm.Similarity.hyperplanes(bits, v.length, seed = 7L + 9973L * t))
      val out = SignLshBuckets(floatArr(v), planes).eval(null).asInstanceOf[ArrayData]
      val slow = planes.map { table =>
        table.zipWithIndex.map { case (p, b) =>
          val dot = v.zip(p).map { case (x, w) => x.toDouble * w }.sum
          if (dot >= 0.0) 1L << b else 0L
        }.sum
      }
      out.numElements() == tables &&
        (0 until tables).forall { t =>
          out.getLong(t) == slow(t) && (out.getLong(t) >>> bits) == 0L
        }
    }

  property("bloom probe: no false negatives; disjoint keys mostly absent at low fpp") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { keys =>
      val distinct = keys.distinct
      val bf = org.apache.spark.util.sketch.BloomFilter.create(
        math.max(distinct.size.toLong, 1L), 0.01)
      distinct.foreach(bf.putString)
      val bytes = { val o = new java.io.ByteArrayOutputStream(); bf.writeTo(o); o.toByteArray }
      def probe(s: String): Boolean =
        BloomMightContain(Literal(UTF8String.fromString(s), StringType), bytes)
          .eval(null).asInstanceOf[Boolean]
      val inserted = distinct.forall(probe) // NO false negatives, ever
      val absent = (0 until 50).map(i => s"definitely-absent-key-$i")
        .filterNot(distinct.contains)
      // fpp 0.01: allow a generous margin, but 50 absent probes must not
      // all collide — that would mean the filter bytes didn't round-trip
      inserted && absent.count(probe) < absent.size
    }

  property("rolling hash: h(a ++ b) is a deterministic function of h(a), h(b), cp(b)") =
    Prop.forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      def h(s: String): Long =
        RollingHash(Literal(UTF8String.fromString(s), StringType))
          .eval(null).asInstanceOf[Long]
      val M = 1000000007L
      val pow = (1 to b.codePointCount(0, b.length))
        .foldLeft(1L)((acc, _) => acc * 131L % M)
      h(a + b) == (h(a) * pow + h(b)) % M
    }

  // PqEncode: fixed-geometry generators (m subspaces of width ds)
  private val pqGen = for {
    m <- Gen.choose(1, 4)
    ds <- Gen.choose(1, 4)
    k <- Gen.choose(1, 6)
    books <- Gen.listOfN(m, Gen.listOfN(k,
      Gen.listOfN(ds, Gen.chooseNum(-10.0, 10.0).map(x => x: Double))))
    vec <- Gen.listOfN(m * ds, Gen.chooseNum(-10f, 10f))
  } yield (books.map(_.map(_.toArray).toArray).toArray, vec)

  property("pq encode: codes match the argmax-cosine reference, in range") =
    Prop.forAll(pqGen) { case (books, vec) =>
      val out = PqEncode(floatArr(vec), books).eval(null)
        .asInstanceOf[ArrayData]
      val ds = books(0)(0).length
      def slowCell(s: Int): Int = {
        val sub = vec.slice(s * ds, (s + 1) * ds).map(_.toDouble)
        val nv = math.sqrt(sub.map(x => x * x).sum)
        var best = Double.NegativeInfinity; var bid = 0
        books(s).zipWithIndex.foreach { case (c, i) =>
          val nc = math.sqrt(c.map(x => x * x).sum)
          val cos = if (nv == 0.0 || nc == 0.0) 0.0
                    else sub.zip(c).map { case (x, y) => x * y }.sum / (nv * nc)
          if (cos >= best) { best = cos; bid = i } // ties to larger cid
        }
        bid
      }
      out.numElements() == books.length && books.indices.forall { s =>
        val code = out.getInt(s)
        code >= 0 && code < books(s).length && code == slowCell(s)
      }
    }

  // PqAdcScores / PqAdcScore: random codes, LUTs, norms; compare against a
  // slow driver-side reference of the same formula (ip / (rnorm * qnorm),
  // accumulated in subspace order, denom-0 => 0)
  private val adcGen = for {
    m <- Gen.choose(1, 4)
    k <- Gen.choose(1, 6)
    nq <- Gen.choose(0, 5)
    code <- Gen.listOfN(m, Gen.choose(0, k - 1))
    normLuts <- Gen.listOfN(m, Gen.listOfN(k, Gen.chooseNum(0.0, 10.0)))
    ipLuts <- Gen.listOfN(nq, Gen.listOfN(m, Gen.listOfN(k,
      Gen.chooseNum(-10.0, 10.0))))
    qnorms <- Gen.listOfN(nq, Gen.chooseNum(0.0, 10.0))
  } yield (code.toArray,
    normLuts.map(_.toArray).toArray,
    ipLuts.map(_.map(_.toArray).toArray).toArray,
    qnorms.toArray)

  private def adcRef(code: Array[Int], normLuts: Array[Array[Double]],
      ipLut: Array[Array[Double]], qnorm: Double): Double = {
    var n2 = 0.0; var ip = 0.0; var s = 0
    while (s < code.length) {
      n2 += normLuts(s)(code(s)); ip += ipLut(s)(code(s)); s += 1
    }
    val denom = math.sqrt(n2) * qnorm
    if (denom == 0.0) 0.0 else ip / denom
  }

  property("pq adc scores: every query's cosine matches the LUT reference") =
    Prop.forAll(adcGen) { case (code, normLuts, ipLuts, qnorms) =>
      val qids = ipLuts.indices.map(i => (i * 7 + 3).toLong).toArray
      val codeLit = Literal.create(ArrayData.toArrayData(code),
        ArrayType(IntegerType))
      val out = PqAdcScores(codeLit, qids, ipLuts, qnorms, normLuts)
        .eval(null).asInstanceOf[ArrayData]
      out.numElements() == qids.length && qids.indices.forall { q =>
        val row = out.getStruct(q, 2)
        row.getLong(0) == qids(q) &&
          row.getDouble(1) == adcRef(code, normLuts, ipLuts(q), qnorms(q))
      }
    }

  property("pq adc score: binary-search dispatch == per-query reference; " +
      "unknown qid is NaN") =
    Prop.forAll(adcGen) { case (code, normLuts, ipLuts, qnorms) =>
      val qids = ipLuts.indices.map(i => (i * 7 + 3).toLong).toArray
      val codeLit = Literal.create(ArrayData.toArrayData(code),
        ArrayType(IntegerType))
      def score(qid: Long): Double =
        PqAdcScore(codeLit, Literal(qid, LongType), qids, ipLuts, qnorms,
          normLuts).eval(null).asInstanceOf[Double]
      qids.indices.forall { q =>
        score(qids(q)) == adcRef(code, normLuts, ipLuts(q), qnorms(q))
      } && score(-999L).isNaN
    }

  property("pq encode: a centroid's own subvector encodes to itself " +
      "(no later duplicate)") =
    Prop.forAll(pqGen.suchThat { case (books, _) =>
      books.forall(b => b.map(_.toSeq).distinct.length == b.length &&
        b.forall(_.exists(_ != 0.0)))
    }) { case (books, _) =>
      val ds = books(0)(0).length
      // build the vector from each book's LAST centroid: with all-distinct,
      // non-parallel-ish centroids the argmax at cosine 1 keeps the max cid
      val vec = books.map(b => b.last).flatten.map(_.toFloat).toSeq
      val out = PqEncode(
        Literal.create(ArrayData.toArrayData(vec.toArray),
          ArrayType(FloatType)), books).eval(null).asInstanceOf[ArrayData]
      books.indices.forall { s =>
        // its own centroid scores cosine ~1; anything scoring >= must be
        // parallel, and ties resolve to the LARGER cid == the chosen one
        val code = out.getInt(s)
        val sub = vec.slice(s * ds, (s + 1) * ds).map(_.toDouble)
        val c = books(s)(code)
        val nv = math.sqrt(sub.map(x => x * x).sum)
        val nc = math.sqrt(c.map(x => x * x).sum)
        val cos = sub.zip(c).map { case (x, y) => x * y }.sum / (nv * nc)
        cos >= 1.0 - 1e-6
      }
    }

  // --- vocab tokenizer kernels ----------------------------------------
  private val vocabGen: Gen[List[String]] = Gen.listOf(
    Gen.choose(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)))
    .map(_.distinct)
  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaLowerChar.map(_.toString),
    1 -> Gen.const(" "),
    1 -> Gen.oneOf("0", "9", ".", "!", "\t", "\n"),
    // supplementary-plane code points: the fallback must consume whole
    // surrogate pairs, exactly like the regex twins' [^\s]
    1 -> Gen.oneOf("😀", "𝄞"))).map(_.mkString)

  /** Reference semantics: leftmost-first java.util.regex alternation with
    * the vocab sorted (length desc, word asc) and a [^\s] catch-all —
    * the same pattern DuckDB replays in the q109/q112/q113 oracles. */
  private def alternationTokens(text: String, vocab: Seq[String]): List[String] = {
    val pat = (vocab.sortBy(w => (-w.length, w)) :+ "[^\\s]")
      .mkString("(", "|", ")")
    val m = java.util.regex.Pattern.compile(pat).matcher(text)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toList
  }

  private def trieTokens(text: String, vocab: Seq[String]): List[String] = {
    val arr = VocabTokens(Literal.create(UTF8String.fromString(text),
      StringType), vocab.toArray).eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString).toList
  }

  property("vocab trie == regex alternation (tokens AND count)") =
    Prop.forAll(textGen, vocabGen) { (text, vocab) =>
      val trie = trieTokens(text, vocab)
      val re = alternationTokens(text, vocab)
      val n = VocabTokenCount(Literal.create(UTF8String.fromString(text),
        StringType), vocab.toArray).eval(null).asInstanceOf[Long]
      trie == re && n == trie.length.toLong
    }

  property("vocab fallback never splits a surrogate pair") =
    Prop.forAll(textGen, vocabGen) { (text, vocab) =>
      trieTokens(text, vocab).forall { t =>
        !Character.isLowSurrogate(t.charAt(0)) &&
          !Character.isHighSurrogate(t.charAt(t.length - 1))
      }
    }

  property("vocab tokens partition the non-whitespace text") =
    Prop.forAll(textGen, vocabGen) { (text, vocab) =>
      trieTokens(text, vocab).mkString("") ==
        text.filterNot(c => c == ' ' || c == '\t' || c == '\n' ||
          c == '\u000B' || c == '\f' || c == '\r')
    }

  // NOTE deliberately absent: "adding a vocab word never increases the
  // count" is FALSE for greedy matching (vocab {bcd} tokenizes "abcd" as
  // [a,bcd]=2; adding "ab" gives [ab,c,d]=3) -- greedy is not optimal,
  // only deterministic. The per-character fallback bound below is the
  // true invariant.
  property("token count bounded by non-whitespace char count") =
    Prop.forAll(textGen, vocabGen) { (text, vocab) =>
      val nonWs = text.count(c => c != ' ' && c != '\t' && c != '\n' &&
        c != '\u000B' && c != '\f' && c != '\r').toLong
      val n = VocabTokenCount(Literal.create(UTF8String.fromString(text),
        StringType), vocab.toArray).eval(null).asInstanceOf[Long]
      // every token consumes 1..6 chars (vocabGen caps word length at 6)
      n <= nonWs && 6L * n >= nonWs
    }
}
