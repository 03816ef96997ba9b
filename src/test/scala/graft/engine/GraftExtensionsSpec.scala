package graft.engine

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class can't be exercised through the shared test session
  * (extensions bind at session construction), so the builders are tested
  * directly: each registered name must build an evaluable expression. */
class GraftExtensionsSpec extends AnyFunSuite {

  private def strArray(xs: String*): Literal =
    Literal.create(ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType))

  test("all registered functions have working builders") {
    val fns = GraftExtensions.functions.toMap
    assert(fns.keySet == Set("graft_cosine", "graft_simhash64",
      "graft_rolling_hash", "graft_shingles", "graft_minhash",
      "graft_vocab_token_count", "graft_vocab_tokens",
      "graft_bpe_token_count", "graft_bpe_tokens"))

    val vc = fns("graft_vocab_token_count")(Seq(
      Literal(UTF8String.fromString("the theory x"), StringType),
      strArray("the", "theory")))
    assert(vc.eval(null) == 3L) // greedy: [the][theory][x]
    val vt = fns("graft_vocab_tokens")(Seq(
      Literal(UTF8String.fromString("the theory x"), StringType),
      strArray("the", "theory")))
    val toks = vt.eval(null).asInstanceOf[ArrayData]
    assert((0 until toks.numElements()).map(toks.getUTF8String(_).toString)
      == Seq("the", "theory", "x"))
    // a NON-constant vocab argument is refused (trie per row)
    intercept[IllegalArgumentException] {
      fns("graft_vocab_token_count")(Seq(
        Literal(UTF8String.fromString("t"), StringType),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "v", ArrayType(StringType))()))
    }

    val cos = fns("graft_cosine")(Seq(
      Literal.create(Array(1.0, 2.0), ArrayType(org.apache.spark.sql.types.DoubleType)),
      Literal.create(Array(2.0, 4.0), ArrayType(org.apache.spark.sql.types.DoubleType))))
    assert(math.abs(cos.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)

    val sh = fns("graft_shingles")(Seq(strArray("a", "b", "c"), Literal(2)))
    val shingles = sh.eval(null).asInstanceOf[ArrayData]
    assert(shingles.numElements() == 2)
    assert(shingles.getUTF8String(0).toString == "a b")

    val mh = fns("graft_minhash")(Seq(strArray("a", "b"), Literal(8)))
    assert(mh.eval(null).asInstanceOf[ArrayData].numElements() == 8)

    val sim = fns("graft_simhash64")(Seq(strArray("x", "y")))
    assert(sim.eval(null).isInstanceOf[Long])

    val rh = fns("graft_rolling_hash")(Seq(Literal(UTF8String.fromString("ab"), StringType)))
    assert(rh.eval(null) == ('a' * 131L + 'b'))
  }

  test("BPE SQL surface: 'a b'-encoded merges apply in order; malformed " +
      "merge strings are rejected") {
    val fns = GraftExtensions.functions.toMap
    // merges [(b,c), (a,b)]: merge-order gives [a, bc] on "abc" (the
    // second merge finds no (a,b) adjacency once bc fused) — 2 tokens
    val cnt = fns("graft_bpe_token_count")(Seq(
      Literal(UTF8String.fromString("abc abc"), StringType),
      strArray("b c", "a b")))
    assert(cnt.eval(null) == 4L)
    val toks = fns("graft_bpe_tokens")(Seq(
      Literal(UTF8String.fromString("abc"), StringType),
      strArray("b c", "a b")))
    val arr = toks.eval(null).asInstanceOf[ArrayData]
    assert((0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      == Seq("a", "bc"))
    val ex = intercept[IllegalArgumentException] {
      fns("graft_bpe_token_count")(Seq(
        Literal(UTF8String.fromString("t"), StringType),
        strArray("a b c")))
    }
    assert(ex.getMessage.contains("space-separated"))
  }

  test("NULL element in a constant vocabulary is rejected cleanly") {
    val withNull = Literal.create(
      ArrayData.toArrayData(Array(UTF8String.fromString("a"), null)),
      ArrayType(StringType))
    val ex = intercept[IllegalArgumentException] {
      GraftExtensions.functions.toMap.apply("graft_vocab_token_count")(Seq(
        Literal(UTF8String.fromString("t"), StringType), withNull))
    }
    assert(ex.getMessage.contains("NULL"))
  }

  test("non-literal shingle size is rejected with a clear error") {
    val ex = intercept[IllegalArgumentException] {
      GraftExtensions.functions.toMap.apply("graft_shingles")(
        Seq(strArray("a"), Literal(2.5)))
    }
    assert(ex.getMessage.contains("integer literal"))
  }
}
