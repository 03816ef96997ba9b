package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.engine.llm.Dedup

/** Scratch driver for profiling the MinHash pipeline stage by stage. */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    println(s"[debug] docs: ${docs.count()}")
    val base = docs.select(col("doc_id").cast("long").as("id"),
        Dedup.shingles(Dedup.tokens(col("text")), 3).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 32))
    time("signature materialize") { base.select("id", "sig").write.mode("overwrite").parquet("/tmp/dbg_sig") }
    val banded = base.withColumn("band",
        explode(transform(sequence(lit(0), lit(7)),
          b => struct(b.as("band_id"),
            xxhash64(concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4))).cast("string")).as("band_hash")))))
      .select(col("id"), col("band.band_id").as("band_id"), col("band.band_hash").as("band_hash"))
    val bandedCached = time("banded materialize") { val c = banded.cache(); c.count(); c }
    val a = bandedCached.select(col("band_id"), col("band_hash"), col("id").as("id_a"))
    val b = bandedCached.select(col("band_id"), col("band_hash"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band_id", "band_hash")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    println(s"[debug] candidates: ${time("candidate join")(cand.count())}")
    val full = time("full pipeline") {
      Dedup.minHashNearDups(docs, "text", "doc_id", jaccardThreshold = 0.3).count()
    }
    println(s"[debug] confirmed pairs: $full")
    spark.stop()
  }
}
