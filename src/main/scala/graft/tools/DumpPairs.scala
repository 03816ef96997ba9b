package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Tables
import graft.engine.llm.Dedup

/** Scratch driver: dump the MinHash J>=0.3 pair set per SF so the exact
  * all-pairs DuckDB twin can be diffed against it (x42 oracle design). */
object DumpPairs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- args) {
      val docs = Tables.documents(spark, s"/root/testdata/$sf")
      Dedup.minHashNearDups(docs, "text", "doc_id", jaccardThreshold = 0.3)
        .write.mode("overwrite").parquet(s"/tmp/pairs_$sf")
      println(s"[dump] $sf done")
    }
    spark.stop()
  }
}
