package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.engine.llm.Similarity

/** Offline recall/cost sweep for the ANN operating point (dev utility).
  * Prints one TSV row per (bits, probeRadius, tables) and per IVF nprobe:
  * recall vs exact top-k, candidate fraction of the corpus scanned per
  * query, wall seconds. The chosen operating point is recorded in
  * BASELINE.md and run by x44/x47.
  *
  * Usage: runMain graft.tools.AnnSweep <corpus> [k] [nQueries]
  * where <corpus> is an sfDir (isotropic synthetic embeddings — the
  * adversarial case) or `clustered:n[:k[:sigma]]` for the
  * [[ClusteredVectors]] planted-cluster corpus (the realistic case) —
  * run BOTH and record both curves side by side.
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 5
    val nq = if (args.length > 2) args(2).toLong else 20L
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = ClusteredVectors.parseSpec(spark, sfDir)
      .getOrElse(Tables.embeddings(spark, sfDir)).persist()
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < nq)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k))
    println(s"corpus=$n k=$k queries=$nq exact_pairs=${exact.size}")
    println("kind\tbits\tradius\ttables\trecall\tcand_frac\tsec")
    for (bits <- Seq(4, 6, 8); radius <- Seq(0, 1, 2); tables <- Seq(1, 2, 4, 8)) {
      val t0 = System.nanoTime()
      val approx = pairs(Similarity.lshTopK(emb, queries, k,
        bits = bits, probeRadius = radius, tables = tables))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = exact.intersect(approx).size.toDouble / math.max(exact.size, 1)
      // expected candidate fraction: probes/2^bits per table, <= 1 overall
      val frac = math.min(1.0,
        tables * Similarity.probeMasks(bits, radius).size.toDouble / (1L << bits))
      println(f"lsh\t$bits\t$radius\t$tables\t$recall%.3f\t$frac%.3f\t$sec%.1f")
    }
    for (nlist <- Seq(16, 32); nprobe <- Seq(1, 2, 4, 8, 16)) {
      if (nprobe <= nlist) {
        val t0 = System.nanoTime()
        val approx = pairs(Similarity.ivfTopK(emb, queries, k,
          nlist = nlist, nprobe = nprobe))
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = exact.intersect(approx).size.toDouble / math.max(exact.size, 1)
        println(f"ivf\t$nlist\t$nprobe\t-\t$recall%.3f\t${nprobe.toDouble / nlist}%.3f\t$sec%.1f")
      }
    }
    spark.stop()
  }
}
