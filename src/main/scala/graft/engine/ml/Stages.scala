package graft.engine.ml

import org.apache.spark.ml.feature.{IndexToString, StringIndexer, StringIndexerModel, VectorAssembler}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference's pipeline stages (SURVEY.md §2.2 T1–T3, T7), two ways:
  *
  *  1. the MLlib operators themselves (what a reference user calls), and
  *  2. their *relational twins* — the same semantics expressed as
  *     DataFrame/SQL plans, which is what makes them oracle-verifiable and
  *     what you would actually run at 100 TB (a broadcast-joined dictionary
  *     scales; a driver-collected label array does not).
  *
  * Reference semantics being reproduced:
  *  - StringIndexer fit = count-by-value, order by freq desc then label asc,
  *    codes 0..k-1 (reference no_pipeline/ModelFit.scala:87-90).
  *  - StringIndexerModel transform = dictionary encode
  *    (reference no_pipeline/ModelFit.scala:122).
  *  - VectorAssembler = narrow projection packing predictor columns
  *    (reference no_pipeline/ModelFit.scala:96-98).
  *  - IndexToString = dictionary decode
  *    (reference no_pipeline/ModelFit.scala:113-116).
  */
object Stages {

  // ---- MLlib operators (reference-parity API) ----

  def stringIndexer(inputCol: String, outputCol: String): StringIndexer =
    new StringIndexer()
      .setInputCol(inputCol)
      .setOutputCol(outputCol)
      .setStringOrderType("frequencyDesc")
      .setHandleInvalid("error")

  def vectorAssembler(inputCols: Seq[String], outputCol: String): VectorAssembler =
    new VectorAssembler()
      .setInputCols(inputCols.toArray)
      .setOutputCol(outputCol)

  def indexToString(inputCol: String, outputCol: String,
      model: StringIndexerModel): IndexToString =
    new IndexToString()
      .setInputCol(inputCol)
      .setOutputCol(outputCol)
      .setLabels(model.labelsArray.head)

  // ---- Relational twins ----

  /** Dictionary build: (value, code) with Spark StringIndexer tie semantics
    * (frequency desc, value asc). A hash-agg over the fact (map-side partial
    * aggregation stays fully parallel), then the tiny distinct-value set is
    * coalesced to ONE partition and rank-numbered by its sort position —
    * the boundedness is explicit in the plan (a single |distinct|-row task)
    * instead of implied by an unpartitioned WindowExec, which Spark rightly
    * warns about and PlanShapeSpec now forbids across every registered
    * query. `monotonically_increasing_id` on partition 0 of a sorted
    * single-partition frame is exactly 0..k-1 in row order.
    */
  def labelDictionary(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column).as("value"))
      .agg(count(lit(1)).as("cnt"))
      .coalesce(1)
      .sortWithinPartitions(col("cnt").desc, col("value").asc)
      .withColumn("code", monotonically_increasing_id().cast(LongType))
      .select(col("value"), col("code"), col("cnt"))

  /** Dictionary encode: broadcast-join the dictionary onto the data.
    * At scale the dictionary is ~|distinct| rows → always broadcast; the
    * fact side never shuffles.
    */
  def encodeWithDictionary(df: DataFrame, dict: DataFrame, column: String,
      outputCol: String): DataFrame = {
    val d = broadcast(dict.select(col("value").as(column), col("code").as(outputCol)))
    df.join(d, Seq(column), "left")
  }

  /** Dictionary decode (IndexToString twin): reverse broadcast join. */
  def decodeWithDictionary(df: DataFrame, dict: DataFrame, codeCol: String,
      outputCol: String): DataFrame = {
    val d = broadcast(dict.select(col("code").as(codeCol), col("value").as(outputCol)))
    df.join(d, Seq(codeCol), "left")
  }

  /** VectorAssembler twin: pack columns into ARRAY<DOUBLE> — a pure narrow
    * projection, no shuffle. */
  def assembleArray(df: DataFrame, inputCols: Seq[String], outputCol: String): DataFrame =
    df.withColumn(outputCol, array(inputCols.map(c => col(c).cast("double")): _*))
}
