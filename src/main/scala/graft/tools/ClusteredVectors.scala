package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic planted-cluster embedding corpus for ANN validation.
  *
  * The synthetic `embeddings` table is ISOTROPIC — uniform directions, the
  * hardest case for space-partitioning ANN (every hyperplane/centroid cut
  * is equally bad). Real embedding corpora are clustered: points
  * concentrate around semantic modes, so bucketing captures true
  * neighbors at far lower probe cost. BASELINE.md's claim that the
  * published dials land "far above the diagonal" on clustered data needs
  * a measurement, not an extrapolation — this generator plants the
  * clusters so AnnSweep/PqSweep can produce the clustered curve next to
  * the isotropic one, and SimilaritySpec can pin a recall floor.
  *
  * Construction: `k` unit-norm Gaussian-direction centers (seeded per
  * cluster), each point = L2-normalize(center + sigma·gaussian noise),
  * cluster id = vec_id % k (equal-size clusters), every draw seeded by
  * (seed, vec_id) alone. Same (n, dim, k, sigma, seed) → bit-identical
  * corpus on any partitioning, any cluster size — generation is a
  * distributed `spark.range(...).map` with no driver-side materialization
  * (scales to any n) and no shared RNG stream (no cross-partition order
  * dependence).
  *
  * sigma picks the regime: 0.2 → tight clusters (intra-cluster cosine
  * ≈ 0.9+, inter ≈ chance), 0.5 → overlapping, 1.0+ → approaches
  * isotropic. Schema matches `Tables.embeddings` (vec_id, embedding
  * float[dim] L2-normalized, label = cluster id) so every Similarity
  * entry point takes the output unchanged.
  */
object ClusteredVectors {

  /** k unit-norm centers, each from its own (seed, cluster)-keyed RNG. */
  def centers(k: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    Array.tabulate(k) { c =>
      val rnd = new java.util.Random(seed * 1000003L + c)
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
  }

  def generate(spark: SparkSession, n: Long, dim: Int = 64, k: Int = 20,
      sigma: Double = 0.2, seed: Long = 42L): DataFrame = {
    require(k > 0 && n >= k, s"need n >= k > 0, got n=$n k=$k")
    val bc = spark.sparkContext.broadcast(centers(k, dim, seed))
    import spark.implicits._
    spark.range(0L, n, 1L, spark.sparkContext.defaultParallelism)
      .map { id =>
        val cid = (id % k).toInt
        // Knuth multiplicative spread so adjacent ids don't get adjacent
        // RNG streams; java.util.Random scrambles the seed internally
        val rnd = new java.util.Random(seed ^ (id * 2654435761L))
        val ctr = bc.value(cid)
        val v = Array.tabulate(dim)(d => ctr(d) + sigma * rnd.nextGaussian())
        val nrm = math.sqrt(v.map(x => x * x).sum)
        (id, v.map(x => (x / nrm).toFloat), cid)
      }
      .toDF("vec_id", "embedding", "label")
  }

  /** Parse a `clustered:n[:k[:sigma]]` corpus spec (the sweep tools' CLI
    * alternative to an sfDir); returns None when `arg` is a plain path. */
  def parseSpec(spark: SparkSession, arg: String): Option[DataFrame] =
    if (!arg.startsWith("clustered")) None
    else {
      val p = arg.split(":")
      val n = if (p.length > 1) p(1).toLong else 5000L
      val k = if (p.length > 2) p(2).toInt else 20
      val sigma = if (p.length > 3) p(3).toDouble else 0.2
      Some(generate(spark, n, k = k, sigma = sigma))
    }
}
