package graft.engine.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}
import graft.engine.Tables

class StagesSpec extends AnyFunSuite {

  test("labelDictionary matches StringIndexer's fitted label order exactly") {
    val docs = Tables.documents(spark, sfDir)
    val dict = Stages.labelDictionary(docs, "lang").orderBy("code")
      .collect().map(_.getAs[String]("value"))
    val indexer = Stages.stringIndexer("lang", "lang_idx").fit(docs)
    assert(dict.toSeq == indexer.labelsArray.head.toSeq,
      "relational twin must replicate frequencyDesc + label-asc tie order")
  }

  test("encode matches StringIndexerModel transform codes") {
    val docs = Tables.documents(spark, sfDir)
    val dict = Stages.labelDictionary(docs, "lang")
    val viaJoin = Stages.encodeWithDictionary(docs, dict, "lang", "code_join")
      .select(col("doc_id"), col("code_join")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaMl = Stages.stringIndexer("lang", "code_ml").fit(docs).transform(docs)
      .select(col("doc_id"), col("code_ml")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1).toLong).toMap
    assert(viaJoin == viaMl)
  }

  test("decode ∘ encode = identity on seen labels") {
    val docs = Tables.documents(spark, sfDir)
    val dict = Stages.labelDictionary(docs, "lang")
    val encoded = Stages.encodeWithDictionary(docs, dict, "lang", "c")
    val roundtrip = Stages.decodeWithDictionary(encoded, dict, "c", "lang2")
    assert(roundtrip.filter(col("lang") =!= col("lang2")).count() == 0)
  }

  test("assembleArray packs values in declared column order") {
    val df = Tables.customer(spark, sfDir).limit(10)
    val out = Stages.assembleArray(df, Seq("c_acctbal", "c_nationkey"), "f")
      .select(col("c_acctbal"), col("c_nationkey"), col("f")).collect()
    out.foreach { r =>
      val arr = r.getSeq[Double](2)
      assert(arr == Seq(r.getDouble(0), r.getInt(1).toDouble))
    }
  }
}
