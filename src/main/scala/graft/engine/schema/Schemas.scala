package graft.engine.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for every input the engine touches.
  *
  * Policy (SURVEY.md §1, §4): schemas are always declared, never inferred —
  * mirrors the reference's explicit-schema stance
  * (reference: src/main/scala/com/github/robertwsmith/ml_pipelines/package.scala:22-29,
  * TrainTestSplit.scala:67). Parquet reads rely on the embedded file schema;
  * these literals are the contract we validate against in tests.
  */
object Schemas {

  /** Canonical iris schema — the reference's one declared schema
    * (reference package.scala:22-29). CSV is headerless; read with this, never infer.
    */
  val iris: StructType = StructType(Seq(
    StructField("sepal_length", DoubleType),
    StructField("sepal_width", DoubleType),
    StructField("petal_length", DoubleType),
    StructField("petal_width", DoubleType),
    StructField("species", StringType)
  ))

  /** Column-role constants (reference package.scala:15-21). */
  object IrisColumns {
    val predictors: Seq[String] =
      Seq("sepal_length", "sepal_width", "petal_length", "petal_width")
    val target = "species"
    val label = "label"
    val features = "features"
    val prediction = "prediction"
    val predictedTarget = "prediction_species"
  }

  // ---- /root/testdata star schema (FIXTURES.md §2) ----

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)
  ))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)
  ))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)
  ))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)
  ))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)
  ))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)
  ))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)
  ))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)
  ))

  /** Embedding dimensionality of the testdata `embeddings` table. */
  val EmbeddingDim = 64
}
