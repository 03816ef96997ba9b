package graft.engine.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{aggregate, array_max, col, exp, lit, transform => arrayTransform}
import org.apache.spark.sql.types.StructType

/** Turns a per-class raw-score vector into a `probability` vector via a
  * max-subtracted softmax — the missing piece of the OneVsRest path, whose
  * binary members emit margins but no calibrated multiclass probability
  * (T5 output-schema parity: the reference's scorer always emits a
  * probability vector, reference no_pipeline/Predict.scala:92).
  *
  * Pure column expressions (vector_to_array → transform/aggregate →
  * array_to_vector), so it stays inside codegen and needs no UDF; a
  * DefaultParamsWritable Transformer, so pipelines containing it survive the
  * S4/S5 model-state save/load round-trip.
  */
class SoftmaxProbability(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("softmaxProb"))

  final val rawCol: Param[String] =
    new Param[String](this, "rawCol", "input per-class raw score vector column")
  final val probCol: Param[String] =
    new Param[String](this, "probCol", "output probability vector column")
  setDefault(rawCol -> "rawPrediction", probCol -> "probability")

  def setRawCol(v: String): this.type = set(rawCol, v)
  def setProbCol(v: String): this.type = set(probCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val raw = vector_to_array(col($(rawCol)))
    // subtract the max before exp: no overflow, denominator >= 1
    val m = array_max(raw)
    val exps = arrayTransform(raw, x => exp(x - m))
    val denom = aggregate(exps, lit(0.0), (a, v) => a + v)
    ds.withColumn($(probCol), array_to_vector(arrayTransform(exps, e => e / denom)))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(rawCol)),
      s"SoftmaxProbability needs input column ${$(rawCol)}")
    schema.add($(probCol), SQLDataTypes.VectorType, nullable = false)
  }

  override def copy(extra: ParamMap): SoftmaxProbability = defaultCopy(extra)
}

object SoftmaxProbability extends DefaultParamsReadable[SoftmaxProbability]
