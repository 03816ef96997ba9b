package graft.engine.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.functions.F

/** Deduplication operators for LLM training-data pipelines (X1/X2).
  *
  * Scale design: every variant is a *bucketing* strategy — no operator here
  * ever compares all pairs. Exact dedup shuffles once on a 128-bit content
  * key; MinHash and SimHash shuffle candidate generation on band keys and
  * verify only within buckets. At 100 TB the bucket-join key-space is what
  * controls skew: band hashes are uniformly distributed by construction, so
  * AQE's skew handling is a safety net, not a requirement.
  */
object Dedup {

  /** Whitespace tokens of lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** 128-bit content key for exact (normalized) dedup. */
  def contentKey(text: Column): Column = md5(lower(trim(text)))

  /** X1 — exact dedup: keep the lowest-id row per normalized content key.
    * One shuffle on the content hash; survivors keep their full row. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(contentKey(col(textCol))).orderBy(col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** k-token shingles (k-grams of the token stream) as strings; documents
    * shorter than k tokens collapse to a single whole-text shingle.
    * Native expression — single pass over the token array (the HOF
    * formulation re-evaluated the tokenizing split per element access). */
  def shingles(tokensCol: Column, k: Int): Column = F.shingles(tokensCol, k)

  /** MinHash signature via the custom Catalyst expression: one string hash
    * per shingle + `numHashes` integer re-mixes, single pass, no shuffle.
    * (The pure-HOF formulation re-hashes the shingle text per family
    * through interpreted lambdas — measured 25 s → 0.1 s at sf0.1.) */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    F.minhashSignature(shinglesCol, numHashes)

  /** X2a — MinHash + LSH banding near-dup candidates, verified by exact
    * shingle Jaccard. Returns (id_a, id_b, jaccard) pairs with
    * jaccard >= threshold and id_a < id_b.
    *
    * Pipeline: shingle → signature (narrow) → explode `bands` band-hashes →
    * shuffle on (band, bandHash) → self-join inside buckets → distinct
    * candidate pairs → verify exact Jaccard on the shingle arrays.
    * Wrong-bucket collisions are filtered by the verify stage, so hash
    * collisions cost time, never correctness.
    */
  def minHashNearDups(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8,
      jaccardThreshold: Double = 0.5, shingleSize: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val base = df.select(col(idCol).cast(LongType).as("id"),
        shingles(tokens(col(textCol)), shingleSize).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = base.withColumn("band",
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band_id"),
            xxhash64(concat_ws(",",
              slice(col("sig"), b * rows + 1, lit(rows))).cast("string")).as("band_hash")))))
      .select(col("id"),
        col("band.band_id").as("band_id"), col("band.band_hash").as("band_hash"))
    // Candidate pairs come from grouping ids per (band, bandHash) bucket and
    // expanding in-bucket combinations — ONE aggregation instead of a
    // self-join, so the signature plan executes once. `maxBucketSize` caps
    // the quadratic expansion of a degenerate bucket (a 10^5-duplicate
    // cluster at 100 TB would otherwise emit 10^10 pairs; capped, its dups
    // are still found transitively through the survivors).
    val buckets = banded.groupBy(col("band_id"), col("band_hash"))
      .agg(slice(sort_array(collect_list(col("id"))), 1, maxBucketSize).as("ids"))
      .filter(size(col("ids")) > 1)
    val candidates = buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .dropDuplicates("id_a", "id_b")
    // Verify with exact shingle Jaccard; only the (small) candidate set
    // carries arrays through a shuffle.
    val shs = df.select(col(idCol).cast(LongType).as("id"),
      shingles(tokens(col(textCol)), shingleSize).as("sh"))
    candidates
      .join(shs.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shs.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** X2b — SimHash near-dups: 64-bit fingerprint (custom Catalyst
    * expression), candidates from matching any of four 16-bit bands
    * (pigeonhole: hamming <= 3 guarantees a shared band), verified by exact
    * Hamming distance via bit_count(xor).
    */
  def simHashNearDups(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("id"),
      F.simHash64(tokens(col(textCol))).as("sim"))
    val banded = base.withColumn("band_id",
        explode(sequence(lit(0), lit(3))))
      .withColumn("band_val",
        expr("(sim >> (band_id * 16)) & 65535"))
    val a = banded.select(col("band_id"), col("band_val"),
      col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band_id"), col("band_val"),
      col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast(LongType).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over near-dup pairs by iterative min-label
    * propagation: each vertex repeatedly adopts the smallest component id
    * among itself and its neighbors; converges in O(component diameter)
    * rounds (near-dup clusters are dense, so diameter is tiny in practice).
    *
    * Each round is one join + one aggregation — fully distributed; the
    * driver only checks the convergence counter. `localCheckpoint` truncates
    * the growing lineage each round (on a cluster prefer
    * `checkpoint()` with a reliable dir; same semantics).
    *
    * Returns (id, component) where component = min id in the cluster.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
    var comp = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges.join(comp, edges("src") === comp("id"))
        .groupBy(col("dst").as("nid"))
        .agg(min(col("comp")).as("nbr_comp"))
      val updated = comp.join(nbrMin, comp("id") === nbrMin("nid"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp2"))
        .localCheckpoint()
      changed = updated.filter(col("comp2") < col("comp")).count()
      comp = updated.select(col("id"), col("comp2").as("comp"))
      iter += 1
    }
    comp
  }

  /** End-to-end near-duplicate removal: MinHash candidate pairs →
    * transitive clusters → keep the lowest-id document of each cluster
    * (plus every unpaired document). This is the operator an LLM data
    * pipeline actually runs; the pair/cluster stages are its observables.
    */
  def dedupNearDuplicates(df: DataFrame, textCol: String, idCol: String,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val pairs = minHashNearDups(df, textCol, idCol,
      jaccardThreshold = jaccardThreshold)
    val clusters = connectedComponents(pairs)
    val losers = clusters.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** X2c — exact token-set Jaccard between blocked pairs (the verifiable
    * small-block twin of the MinHash path; blocking keys bound the
    * pair count, |Δ n_chars| prunes hopeless pairs before the set ops). */
  def blockedJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[String], lengthCol: String, maxLengthDelta: Int): DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("id"),
      array_distinct(tokens(col(textCol))).as("tok"),
      col(lengthCol).as("len"),
      struct(blockCols.map(col): _*).as("blk"))
    val a = base.select(col("blk"), col("id").as("id_a"),
      col("tok").as("tok_a"), col("len").as("len_a"))
    val b = base.select(col("blk"), col("id").as("id_b"),
      col("tok").as("tok_b"), col("len").as("len_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxLengthDelta)
      .withColumn("jaccard",
        size(array_intersect(col("tok_a"), col("tok_b"))).cast("double") /
          size(array_union(col("tok_a"), col("tok_b"))))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
