package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.engine.llm.Similarity

/** PQ operating-point sweep (the AnnSweep sibling for the product-quantizer
  * dials): recall@5 of the ADC scan vs brute force for a grid of
  * (m subspaces, k centroids) — i.e., compression vs fidelity. Usage:
  * runMain graft.tools.PqSweep [sfDir | clustered:n[:k[:sigma]]] — the
  * latter sweeps the [[ClusteredVectors]] planted-cluster corpus (see
  * AnnSweep's scaladoc). Results recorded in BASELINE.md. */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.engine.GraftSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = ClusteredVectors.parseSpec(spark, sfDir)
      .getOrElse(Tables.embeddings(spark, sfDir)).persist()
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopKAgg(emb, queries, 5)
      .select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (m <- Seq(8, 16, 32); k <- Seq(16, 32, 64)) {
      val t0 = System.nanoTime()
      val books = Similarity.pqTrain(emb, m, k, iters = 2)
      // encode ONCE per grid point; all three operating points share it
      val codes = Similarity.pqEncode(emb, books).persist()
      def recallAt(rerank: Int): Double = {
        val pq = Similarity.pqTopK(emb, queries, 5, books, rerank,
            codes = Some(codes))
          .select(col("qid"), col("nid")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        exact.intersect(pq).size.toDouble / math.max(exact.size, 1)
      }
      val (r0, r25, r100) = try (recallAt(0), recallAt(25), recallAt(100))
        finally codes.unpersist()
      val sec = (System.nanoTime() - t0) / 1e9
      val bytes = m * (if (k <= 256) 1 else 2)
      println(f"PQ m=$m%2d k=$k%2d code=$bytes%3dB (vs 256B float) " +
        f"recall@5 adc=$r0%.2f rerank25=$r25%.2f rerank100=$r100%.2f  $sec%5.1f s")
    }
    emb.unpersist()
    spark.stop()
  }
}
