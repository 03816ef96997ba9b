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

  /** name → expression builder, shared by the extensions hook and tests. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (es => CosineSimilarity(es(0), es(1))),
    "graft_simhash64" -> (es => SimHash64(es.head)),
    "graft_rolling_hash" -> (es => RollingHash(es.head)),
    "graft_shingles" -> (es => Shingles(es(0), intLit(es(1), "shingle size"))),
    "graft_minhash" -> (es => MinHashSignature(es(0), intLit(es(1), "numHashes"))))
}
