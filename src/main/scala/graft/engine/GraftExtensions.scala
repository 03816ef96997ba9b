package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.engine.functions._

/** Cluster deployment entry point for the custom expressions: set
  * `spark.sql.extensions=graft.engine.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and the functions are available
  * in every session's SQL without per-session registration (the per-session
  * path is [[graft.engine.functions.F.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.engine.functions", name),
        (es: Seq[Expression]) => builder(es)))
    }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** A FOLDABLE array-of-strings argument (e.g. `array('the', 'ing')`),
    * constant-evaluated at registration: the vocab trie is built once per
    * plan, exactly as the Column-API path ships it — a non-constant vocab
    * would mean a trie per row, which is refused. */
  private def strArrayLit(e: Expression, what: String): Array[String] = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a constant array of strings, got $e")
    e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        Array.tabulate(a.numElements()) { i =>
          if (a.isNullAt(i)) throw new IllegalArgumentException(
            s"$what must not contain NULL elements")
          a.getUTF8String(i).toString
        }
      case other => throw new IllegalArgumentException(
        s"$what must be a constant array of strings, got $other")
    }
  }

  /** name → expression builder, shared by the extensions hook and tests. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (es => CosineSimilarity(es(0), es(1))),
    "graft_simhash64" -> (es => SimHash64(es.head)),
    "graft_rolling_hash" -> (es => RollingHash(es.head)),
    "graft_shingles" -> (es => Shingles(es(0), intLit(es(1), "shingle size"))),
    "graft_minhash" -> (es => MinHashSignature(es(0), intLit(es(1), "numHashes"))),
    "graft_vocab_token_count" -> (es =>
      VocabTokenCount(es(0), strArrayLit(es(1), "vocabulary"))),
    "graft_vocab_tokens" -> (es =>
      VocabTokens(es(0), strArrayLit(es(1), "vocabulary"))),
    "graft_bpe_token_count" -> (es =>
      BpeTokenCount(es(0), mergesLit(es(1)))),
    "graft_bpe_tokens" -> (es =>
      BpeTokens(es(0), mergesLit(es(1)))))

  /** SQL encoding of a BPE merge list: a constant array of "a b" strings
    * (pieces are [a-z0-9]+ so the space is unambiguous), e.g.
    * `graft_bpe_token_count(t, array('e r', 'i n', 'm er'))` applies the
    * three merges in array order. */
  private def mergesLit(e: Expression): Array[(String, String)] =
    strArrayLit(e, "merge list").map { s =>
      s.split(" ", -1) match {
        case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
        case _ => throw new IllegalArgumentException(
          s"each merge must be 'a b' (two space-separated pieces), got '$s'")
      }
    }
}
