package graft.engine.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.functions.F

/** Similarity search over embedding columns (X3).
  *
  * Two paths, as a 100 TB ANN system needs both:
  *  - `bruteForceTopK`: exact — broadcast the (small) query set against the
  *    full corpus; one scan, no shuffle of the corpus, per-partition local
  *    ranking would be the next refinement. This is the correctness oracle.
  *  - `lshBuckets`/`lshTopK`: sign-random-projection bucketing — corpus is
  *    hashed once to `bits`-bit buckets (deterministic seeded hyperplanes),
  *    queries probe only their own bucket (+ optional multi-probe of
  *    Hamming-1 neighbors). Recall trades against the 2^bits fan-in; at
  *    scale, bucket id becomes the partitioning/clustering key so a probe
  *    touches one partition instead of the whole corpus.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes (xorshift from a fixed seed —
    * no RNG state, reproducible across JVMs/sessions). */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s.toDouble / Long.MaxValue)
    }
    Array.fill(bits, dim)(next())
  }

  /** Embedding width, read from the data (one CollectLimit-1 job — a single
    * row of a single file). Hardcoding a default dim would silently compute
    * wrong cosines if the embedding table changed width. */
  def embeddingDim(corpus: DataFrame, embCol: String = "embedding"): Int = {
    val h = corpus.select(size(col(embCol))).head(1)
    if (h.isEmpty) 1 else h(0).getInt(0) // empty corpus: no rows to hash
  }

  /** Sign-LSH bucket id (LongType, `bits` bits) for an embedding column.
    * One native-expression node ([[graft.engine.functions.SignLshBuckets]])
    * — the Column-DSL element_at/when formulation built a bits × dim
    * expression tree that overflowed codegen at realistic widths. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    element_at(F.signLshBuckets(vec, Array(planes)), 1)

  /** Exact cosine top-k: each query (broadcast) against every corpus row,
    * ranked with a window partitioned by query id. Self-matches excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", F.cosineSimilarity(col("qe"), col("ne")))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cosine"))
  }

  /** Exact cosine top-k via the typed [[TopK.TopKAggregator]]: same answer
    * as [[bruteForceTopK]], but ranked by a partially-aggregated top-k
    * aggregate instead of a window — each map partition reduces to ≤ k rows
    * per query before the shuffle, so the exchange is O(partitions·q·k)
    * instead of O(|corpus|·q). This is the 100 TB formulation. */
  def bruteForceTopKAgg(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        F.cosineSimilarity(col("qe"), col("ne")).as("cos"))
      .groupBy(col("qid"))
      .agg(TopK.topK(k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("rnk0", "s")))
      .select(col("qid"), (col("rnk0") + 1).cast(LongType).as("rnk"),
        col("s.nid").as("nid"), round(col("s.cos"), 6).as("cosine"))
  }

  /** XOR masks for every bucket within Hamming distance <= radius of the
    * origin (radius <= 2 supported — fan-out 1 + b + b(b−1)/2). */
  def probeMasks(bits: Int, radius: Int): Seq[Long] = {
    require(radius >= 0 && radius <= 2, "probeRadius in {0, 1, 2}")
    val r0 = Seq(0L)
    val r1 = if (radius >= 1) (0 until bits).map(b => 1L << b) else Nil
    val r2 = if (radius >= 2)
      for (a <- 0 until bits; b <- a + 1 until bits)
        yield (1L << a) | (1L << b)
    else Nil
    r0 ++ r1 ++ r2
  }

  /** Approximate top-k with the two standard recall dials:
    *
    *  - `probeRadius`: each query also probes every bucket within that
    *    Hamming distance of its own (0 = exact bucket; 1 adds `bits`
    *    sign-flip neighbors; 2 adds the C(bits,2) two-flip buckets). Only
    *    the tiny broadcast query side expands; the corpus is hashed and
    *    partitioned once per table.
    *  - `tables`: independent hash tables (distinct seeded hyperplane
    *    sets). The corpus is stored `tables`× (the classic LSH
    *    space-for-recall trade: at scale, table id + bucket becomes the
    *    partition key); a neighbor is found if ANY table co-buckets it.
    *
    * Candidates are distinct (qid, nid) pairs before ranking, so the
    * returned top-k is unaffected by how many probes found a neighbor.
    * Returns the bruteForceTopK schema (fewer than k rows when the probed
    * buckets are sparse — the residual recall trade). The recall/cost
    * curve for the testdata corpus is recorded in BASELINE.md; x44 runs
    * the chosen operating point. `multiProbe` is the legacy radius-1
    * switch. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 8, dim: Int = 0, multiProbe: Boolean = false,
      probeRadius: Int = -1, tables: Int = 1): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    val radius = if (probeRadius >= 0) probeRadius else if (multiProbe) 1 else 0
    val d = if (dim > 0) dim else embeddingDim(corpus)
    val planesByTable: Array[Array[Array[Double]]] = (0 until tables)
      .map(t => hyperplanes(bits, d, seed = 7L + 9973L * t)).toArray
    // all tables' buckets from ONE expression node; posexplode index = table
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("ne"),
        posexplode(F.signLshBuckets(col("embedding"), planesByTable))
          .as(Seq("tbl", "bucket")))
    val masks = probeMasks(bits, radius)
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        posexplode(F.signLshBuckets(col("embedding"), planesByTable))
          .as(Seq("tbl", "bucket")))
      .select(col("qid"), col("qe"), col("tbl"),
        explode(array(masks.map(m =>
          col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("nid"))
      // score BEFORE the candidate dedup: with tables > 1 the same pair
      // co-buckets in several tables, and the duplicated candidate volume
      // is exactly what the dedup exchange carries — scoring first means it
      // shuffles bare (qid, nid, cos) rows instead of both embedding
      // vectors (cos is identical across duplicates, so this is
      // value-neutral; the extra per-duplicate cosine is map-side, cheap,
      // and buys a vector-free exchange)
      .select(col("qid"), col("nid"),
        F.cosineSimilarity(col("qe"), col("ne")).as("cos"))
      .dropDuplicates("qid", "nid")
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cosine"))
  }

  /** IVF coarse centroids: seeded from the `nlist` corpus vectors with the
    * smallest `xxhash64(vec_id)` — a deterministic uniform sample
    * (TakeOrdered, so partial top-k per partition, no full sort) — then
    * refined with `iters` Lloyd iterations, each a pure DataFrame job:
    * assign every vector to its nearest centroid ([[ivfCell]], codegen'd
    * expression literals, no shuffle of the corpus) → per-(cell, position)
    * mean via posexplode + groupBy (shuffle carries nlist·dim grouped rows,
    * map-side partial aggregation does the heavy lifting). An empty cell
    * keeps its seed centroid. Centroids are driver-side (nlist ≪ corpus; at
    * 100 TB nlist ~ 10⁴ × dim doubles is still a few MB, broadcast to every
    * task as expression literals), and at that scale you'd train on a
    * deterministic hash-sample of the corpus rather than every row — the
    * codebook quality saturates long before the full pass. */
  def ivfCentroids(corpus: DataFrame, nlist: Int,
      iters: Int = 2): Array[(Int, Array[Double])] =
    ivfRefine(corpus, ivfSeeds(corpus, nlist), iters)

  /** Seed centroids alone (one TakeOrdered job). Because the sample is the
    * `nlist` smallest by (xxhash64(vec_id), vec_id), the first m seeds of
    * an nlist-seed sample ARE the m-seed sample — a harness training
    * several codebook sizes (x47) runs this once at the largest nlist and
    * `take(m)`s the rest, saving a corpus job per extra codebook. */
  def ivfSeeds(corpus: DataFrame, nlist: Int): Array[(Int, Array[Double])] =
    corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nlist)
      .collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](1).toArray }

  /** Lloyd refinement of given seeds (one corpus job per iteration). */
  def ivfRefine(corpus: DataFrame, seeds: Array[(Int, Array[Double])],
      iters: Int): Array[(Int, Array[Double])] = {
    val base = corpus.select(col("embedding").cast("array<double>").as("e"))
    var cents = seeds
    var it = 0
    while (it < iters) {
      val means = base
        .select(ivfCell(col("e"), cents).as("cell"),
          posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
      cents = cents.map { case (cid, seed) =>
        means.get(cid) match {
          case Some(rows) =>
            val arr = seed.clone()
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            cid -> arr
          case None => cid -> seed
        }
      }
      it += 1
    }
    cents
  }

  /** Refine SEVERAL codebooks in lock-step with ONE corpus job per Lloyd
    * iteration (vs one per codebook per iteration): every row's cell in
    * every codebook is computed in the same pass, (sum, count) partials are
    * aggregated per JOINT cell key — output bounded by Π nlist_i · dim, still
    * driver-small for harness-scale codebook counts — and each codebook's
    * per-cell means are recovered by marginalizing driver-side. Up to FP
    * addition order, each codebook converges exactly as if refined alone;
    * empty cells keep their seed (no joint row carries their cid). */
  def ivfRefineAll(corpus: DataFrame, seedSets: Seq[Array[(Int, Array[Double])]],
      iters: Int): Seq[Array[(Int, Array[Double])]] = {
    val base = corpus.select(col("embedding").cast("array<double>").as("e"))
    var books = seedSets.toArray
    val nb = books.length
    var it = 0
    while (it < iters) {
      val cellCols = books.zipWithIndex.map { case (b, i) =>
        ivfCell(col("e"), b).as(s"_c$i") }
      val rows = base
        .select(cellCols :+ posexplode(col("e")).as(Seq("pos", "x")): _*)
        .groupBy(books.indices.map(i => col(s"_c$i")) :+ col("pos"): _*)
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      books = books.zipWithIndex.map { case (book, bi) =>
        val acc = scala.collection.mutable.Map.empty[(Int, Int), (Double, Long)]
        rows.foreach { r =>
          val key = (r.getInt(bi), r.getInt(nb))
          val (s0, n0) = acc.getOrElse(key, (0.0, 0L))
          acc(key) = (s0 + r.getDouble(nb + 1), n0 + r.getLong(nb + 2))
        }
        book.map { case (cid, seed) =>
          val arr = seed.clone()
          arr.indices.foreach { pos =>
            acc.get((cid, pos)).foreach { case (s, n) => arr(pos) = s / n }
          }
          cid -> arr
        }
      }
      it += 1
    }
    books.toSeq
  }

  /** Per-centroid (cosine, cid) score structs for a vector column. */
  private def ivfScores(vec: Column, centroids: Array[(Int, Array[Double])]): Column =
    array(centroids.map { case (cid, cv) =>
      struct(F.cosineSimilarity(vec, lit(cv)).as("cos"), lit(cid).as("cid"))
    }: _*)

  /** IVF cell id = argmax-cosine centroid (struct array_max: max cos, ties
    * to max cid — deterministic). */
  def ivfCell(vec: Column, centroids: Array[(Int, Array[Double])]): Column =
    array_max(ivfScores(vec, centroids)).getField("cid")

  /** Approximate top-k, IVF-style: corpus rows are assigned to their
    * nearest coarse centroid's cell once (at scale: partition/cluster the
    * stored table by `cell`); each query probes only its `nprobe` nearest
    * cells, so a probe scans nprobe/nlist of the corpus instead of all of
    * it. nprobe = nlist degrades gracefully to the exact answer. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      centroids: Option[Array[(Int, Array[Double])]] = None): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "need 1 <= nprobe <= nlist")
    val cents = centroids.getOrElse(ivfCentroids(corpus, nlist))
    require(cents.length == nlist,
      s"centroids.length ${cents.length} != nlist $nlist")
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("ne"),
      ivfCell(col("embedding"), cents).as("cell"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("cell", explode(transform(
        slice(reverse(array_sort(ivfScores(col("qe"), cents))), 1, nprobe),
        s => s.getField("cid"))))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid").asc)
    c.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", F.cosineSimilarity(col("qe"), col("ne")))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cosine"))
  }

  /** Hash width for [[embeddingNearDups]] sized to the corpus: enough
    * bits that the MEAN bucket holds ~`targetBucket` vectors (hot buckets
    * get the hard `maxBucketSize` cap on top). Fixed bits would be the
    * 100 TB failure: 256 buckets over 10^12 vectors is 4·10^9 per bucket
    * and a quadratic within-bucket join. */
  def autoBits(corpusSize: Long, targetBucket: Int = 256): Int =
    math.max(4, math.min(24,
      math.ceil(math.log(math.max(corpusSize, 1).toDouble / targetBucket)
        / math.log(2.0)).toInt))

  /** Bucket aggregation behind [[embeddingNearDups]]: per sign-LSH bucket
    * the size-capped sorted member-id list PLUS the uncapped count
    * (`n_full`) — persist this one result to derive both the pairs and the
    * truncation telemetry without a second corpus scan (see x45).
    * `bits <= 0` sizes the hash to the corpus via [[autoBits]]. */
  def embeddingBuckets(corpus: DataFrame, bits: Int = 0, dim: Int = 0,
      maxBucketSize: Int = 1000): DataFrame = {
    val b = if (bits > 0) bits else autoBits(corpus.count())
    val planes = hyperplanes(b, if (dim > 0) dim else embeddingDim(corpus))
    corpus.select(col("vec_id").as("id"),
        lshBucket(col("embedding"), planes).as("bucket"))
      .groupBy(col("bucket"))
      // partial-aggregating capped collector: a collect_list-then-slice
      // would materialize the FULL hot bucket in one aggregation buffer
      // before capping — the degenerate bucket the cap exists for could
      // OOM the aggregating task. CappedIdsAggregator keeps every partial
      // and merge buffer at <= maxBucketSize ids; n_full still counts the
      // uncapped membership for the truncation telemetry.
      .agg(TopK.cappedIds(maxBucketSize, col("id")).as("ids"),
        count(lit(1)).cast(LongType).as("n_full"))
  }

  /** Expand capped buckets into candidate pairs and verify exact cosine
    * against the corpus embeddings (only the candidate set — bounded by
    * buckets·maxBucketSize² — ever carries vectors through a shuffle). */
  def embeddingPairsFromBuckets(buckets: DataFrame, corpus: DataFrame,
      threshold: Double): DataFrame = {
    val candidates = buckets
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .dropDuplicates("id_a", "id_b")
    val emb = corpus.select(col("vec_id").as("id"), col("embedding").as("e"))
    candidates
      .join(emb.select(col("id").as("id_a"), col("e").as("e_a")), Seq("id_a"))
      .join(emb.select(col("id").as("id_b"), col("e").as("e_b")), Seq("id_b"))
      .withColumn("cosine", F.cosineSimilarity(col("e_a"), col("e_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** X2e — embedding-cosine near-dup pairs via LSH blocking: only pairs
    * sharing a bucket are scored; cosine >= threshold survives.
    *
    * Same bounded-bucket posture as the MinHash/SimHash paths
    * (Dedup.minHashNearDups): candidate pairs come from grouping ids per
    * bucket and expanding in-bucket combinations with `maxBucketSize`
    * capping the quadratic blow-up of a hot bucket (capped members still
    * pair transitively through the survivors). Recall is only guaranteed
    * while every bucket fits the cap — [[embeddingCapOverflow]] (or the
    * persisted [[embeddingBuckets]] `n_full` column) reports truncation. */
  def embeddingNearDups(corpus: DataFrame, threshold: Double = 0.9,
      bits: Int = 0, dim: Int = 0, maxBucketSize: Int = 1000): DataFrame =
    embeddingPairsFromBuckets(
      embeddingBuckets(corpus, bits, dim, maxBucketSize), corpus, threshold)

  /** SemDeDup-style semantic dedup (X2e end-to-end): embedding-cosine
    * near-dup pairs ([[embeddingNearDups]] — LSH-blocked, capped buckets)
    * → connected components (pointer-doubling min-label) → drop every
    * cluster member except its min-id representative. Returns the
    * SURVIVING corpus rows, so the output is directly the semantically
    * deduplicated corpus a downstream tokenizer consumes. The embedding
    * twin of [[Dedup.dedupNearDuplicates]]; same recall caveat as the
    * pair path (bucket-cap overflow telemetry via
    * [[embeddingCapOverflow]]). */
  def semanticDedup(corpus: DataFrame, threshold: Double = 0.9,
      bits: Int = 0, dim: Int = 0, maxBucketSize: Int = 1000): DataFrame = {
    val pairs = embeddingNearDups(corpus, threshold, bits, dim, maxBucketSize)
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("vec_id"))
    // NO broadcast hint: a dup-heavy corpus (the case this operator exists
    // for) can lose 30-50% of its rows, so the loser set is NOT reliably
    // broadcast-sized — let the planner pick, same as
    // Dedup.dedupNearDuplicates' anti-join
    corpus.join(losers, Seq("vec_id"), "left_anti")
  }

  /** Truncation telemetry for [[embeddingNearDups]], mirroring
    * [[Dedup.simHashCapOverflow]]: one row (n_overflow_buckets,
    * max_bucket_size); pair recall is only guaranteed when the first is 0.
    * Coalesced so an empty corpus reads (0, 0), not NULLs. */
  def embeddingCapOverflow(corpus: DataFrame, bits: Int = 0, dim: Int = 0,
      maxBucketSize: Int = 1000): DataFrame =
    embeddingBuckets(corpus, bits, dim, maxBucketSize)
      .agg(coalesce(sum(when(col("n_full") > maxBucketSize, 1L).otherwise(0L)),
             lit(0L)).cast(LongType).as("n_overflow_buckets"),
           coalesce(max(col("n_full")), lit(0L)).cast(LongType)
             .as("max_bucket_size"))

  // ---- Product quantization (X3 — the compressed-corpus ANN path) ----
  //
  // PQ is the 100 TB complement to LSH/IVF: split each D-dim vector into m
  // contiguous subvectors, learn a k-entry codebook per subspace, and store
  // each vector as m small codes (m bytes at k <= 256) instead of D floats
  // — a 64x-compressed corpus whose approximate cosines are computed from
  // per-query lookup tables (ADC), never from the original vectors. The
  // scan stays narrow (codes only), the LUTs are m·k doubles per query
  // (driver-computed, shipped as expression literals), and ranking reuses
  // the partially-aggregating TopKAggregator — the same
  // O(partitions·q·k)-exchange posture as bruteForceTopKAgg. In production
  // PQ composes with IVF (probe cells, then ADC-scan the cell's codes).

  /** Train m per-subspace codebooks (k centroids each) with `iters` Lloyd
    * passes — ONE corpus job per iteration for ALL subspaces: each row
    * explodes into its m (subspace, cell, subvector) assignments and the
    * (sub, cell, pos) means aggregate map-side; the shuffle carries
    * <= m·k·(D/m) grouped rows, never vectors. Seeds are the same
    * deterministic hash-sample as [[ivfSeeds]] (smallest k by
    * (xxhash64(vec_id), vec_id)), so training is reproducible across runs.
    * Assignment is argmax-cosine ([[ivfCell]] on the subvector slice) —
    * spherical k-means, matching the cosine geometry the ANN ranks by. */
  def pqTrain(corpus: DataFrame, m: Int, k: Int,
      iters: Int = 2): Seq[Array[(Int, Array[Double])]] = {
    val dim = embeddingDim(corpus)
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val ds = dim / m
    val sample = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(k).collect()
    var books: Array[Array[(Int, Array[Double])]] = Array.tabulate(m) { s =>
      sample.zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Double](1).slice(s * ds, (s + 1) * ds).toArray }
    }
    val base = corpus.select(col("embedding").cast("array<double>").as("e"))
    var it = 0
    while (it < iters) {
      // assignment through the ONE-node native kernel (the per-centroid
      // Column-DSL tree overflows janino at realistic m·k — see PqEncode)
      val code = F.pqEncode(col("e"), bareBooks(books.toSeq))
      val subs = array((0 until m).map { s =>
        struct(lit(s).as("sub"), element_at(code, s + 1).as("cell"),
          slice(col("e"), s * ds + 1, ds).as("sv"))
      }: _*)
      val rows = base.select(explode(subs).as("t"))
        .select(col("t.sub"), col("t.cell"), posexplode(col("t.sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cell"), col("pos"))
        .agg(sum(col("x")).as("sm"), count(lit(1)).as("n"))
        .collect()
      val bySub = rows.groupBy(_.getInt(0))
      books = books.zipWithIndex.map { case (book, s) =>
        val byCell = bySub.getOrElse(s, Array.empty).groupBy(_.getInt(1))
        book.map { case (cid, seed) =>
          byCell.get(cid) match {
            case Some(rs) =>
              val arr = seed.clone()
              rs.foreach(r => arr(r.getInt(2)) = r.getDouble(3) / r.getLong(4))
              cid -> arr
            case None => cid -> seed // empty cell keeps its seed
          }
        }
      }
      it += 1
    }
    books.toSeq
  }

  /** LOSSLESS codebooks for the exact-regime oracle (q84): every distinct
    * subvector of the corpus becomes a centroid, so encoding is an identity
    * and ADC reproduces the exact cosine ranking. Collects the corpus
    * driver-side — strictly an oracle-harness constructor for a small
    * pinned corpus subset, never a production path (production trains with
    * [[pqTrain]]).
    *
    * EXACTNESS PREMISE (enforced below): "identity encoding" rests on
    * [[graft.engine.functions.PqEncode]]'s argmax-COSINE assignment, which
    * cannot distinguish parallel subvectors (cosine ties break to the
    * larger cid → a subvector parallel to a later centroid encodes to the
    * wrong one) and scores every centroid 0 for a zero subvector (encodes
    * to the last cid). Real float embeddings never trip either case, but a
    * synthetic corpus could — so rather than silently weakening the q84/q87
    * oracles and the SimilaritySpec equalities built on them, refuse loudly
    * when a subspace contains a zero or pairwise-parallel subvector. */
  def pqCodebooksExact(corpus: DataFrame, m: Int): Seq[Array[(Int, Array[Double])]] = {
    val dim = embeddingDim(corpus)
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val ds = dim / m
    // ORACLE-ONLY: collects the corpus driver-side by design (exact-regime
    // insurance for the q84/q87 oracles). The scale contract is in code,
    // not just this comment — refuse anything beyond harness size; the
    // production path is pqTrain's bounded-sample k-means codebooks.
    val nRows = corpus.count()
    require(nRows <= 100000L,
      s"pqCodebooksExact is an oracle-only exact-regime helper (collects " +
        s"the corpus driver-side); got $nRows rows — use pqTrain's " +
        "sampled k-means codebooks for production-scale corpora")
    val vecs = corpus.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0))
    (0 until m).map { s =>
      val cents = vecs.map(_.slice(s * ds, (s + 1) * ds).toVector).distinct
        .sortBy(_.mkString(",")) // deterministic cid assignment
      // O(k²·ds) driver-side over the small oracle corpus: cheap insurance
      // for the exactness argument (see premise above)
      cents.foreach { c =>
        require(c.exists(_ != 0.0),
          s"subspace $s contains a zero subvector: identity encoding " +
            "does not hold (argmax-cosine scores every centroid 0)")
      }
      for (i <- cents.indices; j <- (i + 1) until cents.length) {
        val (a, b) = (cents(i), cents(j))
        val dot = a.lazyZip(b).map(_ * _).sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        // anti-parallel (cos -1) is fine — it loses every argmax; only
        // POSITIVE-parallel distinct subvectors are indistinguishable
        require(dot / (na * nb) < 1.0 - 1e-12,
          s"subspace $s has parallel distinct subvectors (cids $i, $j): " +
            "argmax-cosine cannot separate them, identity encoding breaks")
      }
      cents.zipWithIndex.map { case (v, i) => i -> v.toArray }.toArray
    }
  }

  /** Codebooks as the bare centroid arrays the native kernel takes
    * (position = cid; constructors emit contiguous 0..k-1 cids, enforced
    * here so a code indexes its LUT correctly). */
  private def bareBooks(books: Seq[Array[(Int, Array[Double])]]): Array[Array[Array[Double]]] =
    books.map { b =>
      val sorted = b.sortBy(_._1)
      require(sorted.iterator.map(_._1).zipWithIndex.forall(p => p._1 == p._2),
        "codebook cids must be contiguous from 0")
      sorted.map(_._2)
    }.toArray

  /** Encode the corpus against trained codebooks: (nid, code) where code is
    * the m-array of per-subspace centroid ids — the narrow compressed
    * representation an ADC scan reads (at scale this is the stored table;
    * the float vectors are cold storage). ONE native expression node
    * ([[graft.engine.functions.PqEncode]]) — the per-(subspace, centroid)
    * Column-DSL tree overflowed janino at the x48 operating point. */
  def pqEncode(corpus: DataFrame, books: Seq[Array[(Int, Array[Double])]]): DataFrame =
    corpus.select(col("vec_id").as("nid"),
      F.pqEncode(col("embedding"), bareBooks(books)).as("code"))

  /** Approximate cosine top-k by asymmetric distance computation: the
    * corpus is scanned as codes only; each (query, subspace) contributes
    * via two driver-computed k-entry lookup tables (query·centroid dot
    * products and centroid squared norms) shipped as literals, and
    * cos_adc = sum(ip LUT) / (|q| · sqrt(sum(norm LUT))). Ranking reuses
    * [[TopK.TopKAggregator]] partial top-k. Queries are collected
    * driver-side (they are the broadcast-small side by the same contract
    * as bruteForceTopK).
    *
    * `rerank > 0` is the standard PQ fidelity recovery: the ADC scan
    * nominates `rerank` candidates per query (codes only — the corpus scan
    * stays narrow), then ONLY those q·rerank rows join back to their float
    * vectors for an exact-cosine re-ranking to the final k. On isotropic
    * data raw ADC recall plateaus near 0.6 (no inter-dimension structure
    * for the quantizer to exploit — the PqSweep curve in BASELINE.md);
    * re-ranking buys recall back while the full-vector reads stay
    * O(queries·rerank), not O(corpus). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      books: Seq[Array[(Int, Array[Double])]], rerank: Int = 0,
      codes: Option[DataFrame] = None): DataFrame = {
    val m = books.length
    val ds = books.head.head._2.length
    // a harness evaluating several operating points passes the encoded
    // corpus in (persisted) so the encode pass — the expensive part of an
    // ADC scan — runs once, not per point
    val codesDf = codes.getOrElse(pqEncode(corpus, books))
    val qRows = queries
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    if (qRows.isEmpty) {
      // explode(array()) of zero score structs fails ANALYSIS (VOID element
      // type) — an empty query set must mean an empty result, not a crash
      val session = corpus.sparkSession
      import session.implicits._
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("qid", "rnk", "nid", "cosine")
    }
    // ONE native kernel node scores every query per code row (the former
    // explode(array(per-query structs)) of element_at chains was O(q·m)
    // expression nodes — the janino-64KB pattern at a 256+ query batch;
    // PqAdcScores keeps the node count O(1) and the work in tight loops).
    val normLutsArr: Array[Array[Double]] = books.map(_.sortBy(_._1)
      .map { case (_, c) => c.map(x => x * x).sum }).toArray
    val sortedBooks = books.map(_.sortBy(_._1).map(_._2))
    val qids = qRows.map(_._1)
    val ipLuts: Array[Array[Array[Double]]] = qRows.map { case (_, qv) =>
      (0 until m).map { s =>
        sortedBooks(s).map(c => (0 until ds).map(i => qv(s * ds + i) * c(i)).sum)
      }.toArray
    }
    val qnorms = qRows.map { case (_, qv) => math.sqrt(qv.map(x => x * x).sum) }
    val adcScored = codesDf
      .select(col("nid"), explode(F.pqAdcScores(col("code"), qids, ipLuts,
        qnorms, normLutsArr)).as("t"))
      .select(col("t.qid").as("qid"), col("nid"), col("t.cos").as("cos"))
      .filter(col("qid") =!= col("nid"))
    if (rerank <= 0) top(adcScored, k)
    else pqExactRerank(corpus, queries,
      top(adcScored, math.max(rerank, k)), k)
  }

  /** The IVF-PQ STORED representation of a corpus: (nid, cell, code) —
    * one narrow pass over the vectors assigning each to its coarse cell
    * and quantizing it to the m-subspace PQ code. This is the table a
    * production deployment persists (cell-partitioned; the float vectors
    * go cold) and appends to incrementally as batches arrive — publish it
    * through [[AnnIndex]] and probe with `ivfPqTopK(codes = Some(...))`
    * without ever re-encoding history. */
  def ivfPqEncode(corpus: DataFrame,
      cents: Array[(Int, Array[Double])],
      books: Seq[Array[(Int, Array[Double])]]): DataFrame =
    corpus.select(col("vec_id").as("nid"),
      ivfCell(col("embedding"), cents).as("cell"),
      F.pqEncode(col("embedding"), bareBooks(books)).as("code"))

  /** IVF-PQ top-k — the production composition (the Faiss IVFPQ shape):
    * the corpus is stored ONCE as (coarse cell, m-byte PQ code); a query
    * probes its `nprobe` nearest cells and ADC-scores only those cells'
    * codes, so a probe reads nprobe/nlist of a 16×-compressed corpus —
    * the two approximations multiply and so do their savings. At scale
    * `cell` is the storage partition key and the code column is the only
    * thing a probe scans; float vectors surface solely for `rerank`'s
    * O(queries·rerank) candidate re-scoring.
    *
    * Degrades to exact by composition: nprobe = nlist (IVF exact) +
    * lossless codebooks (PQ exact) reproduces the brute-force ranking,
    * and rerank >= corpus recovers exactness under ANY codebooks —
    * both asserted in SimilaritySpec.
    *
    * EXACT-SELECTION SENTINEL: `rerank = Int.MaxValue` declares "keep
    * EVERY probed candidate" (an oracle/adjudication regime, not a
    * production operating point). Selecting top-MaxValue of the ADC
    * ordering is the identity, so that path skips the ADC pass entirely
    * — no code scan, no candidate-list materialization or broadcast —
    * and exact-scores the probed cells in ONE pass over the vector
    * table: cell from the codegen'd [[ivfCell]] (deterministic, the same
    * expression that produced the stored cells), probe list + query
    * vectors broadcast, partial top-k aggregate. The `codes` frame is
    * unused there (its ordering would be discarded row-for-row). A
    * finite `rerank` that merely happens to exceed the corpus still
    * takes the literal ADC path.
    *
    * PRECONDITION on `codes`: the published codes MUST have been encoded
    * under the SAME `cents` (and `books`) passed here — the lifecycle
    * contract [[AnnIndex]] versions exist to enforce (pin both to one
    * index version). The sentinel path re-derives cells via
    * `ivfCell(embedding, cents)` rather than reading `codes`, so codes
    * encoded under older/different centroids would make the sentinel's
    * candidate set silently diverge from the ADC path's instead of
    * failing — a mismatched pairing is caller error in BOTH regimes
    * (ADC scores under mismatched books are equally corrupt, just less
    * visibly). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cents: Array[(Int, Array[Double])],
      books: Seq[Array[(Int, Array[Double])]],
      nprobe: Int, rerank: Int = 0,
      codes: Option[DataFrame] = None): DataFrame = {
    require(nprobe >= 1 && nprobe <= cents.length,
      "need 1 <= nprobe <= nlist")
    val m = books.length
    val ds = books.head.head._2.length
    // the stored table: (nid, cell, code) — precomputed/published codes
    // when the caller has them (the incremental path), one encode pass
    // over the vectors otherwise
    val stored = codes.getOrElse(ivfPqEncode(corpus, cents, books))
    val qRows = queries
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // caller-facing guard: the ADC kernel resolves each qid to exactly one
    // LUT by binary search over a sorted-distinct qid array, so a repeated
    // vec_id (which the old when-chain dispatch silently tolerated) would
    // otherwise surface as an opaque kernel-construction failure
    require(qRows.iterator.map(_._1).toSet.size == qRows.length,
      "ivfPqTopK queries must have distinct vec_id values " +
        "(each qid maps to one ADC lookup table); deduplicate the query frame")
    val normLuts: Seq[Array[Double]] = books.map(_.sortBy(_._1)
      .map { case (_, c) => c.map(x => x * x).sum })
    // probe side: each query explodes to its nprobe nearest cells
    // (broadcast-small), carrying only its qid — LUTs live in the scorer
    val session = corpus.sparkSession
    import session.implicits._
    val probes = qRows.flatMap { case (qid, qv) =>
      val ranked = cents.map { case (cid, cv) =>
        val dot = (0 until math.min(qv.length, cv.length))
          .map(i => qv(i) * cv(i)).sum
        val den = math.sqrt(qv.map(x => x * x).sum) *
          math.sqrt(cv.map(x => x * x).sum)
        (if (den == 0.0) 0.0 else dot / den, cid)
      }.sortBy { case (cos, cid) => (-cos, -cid) }.take(nprobe)
      ranked.map { case (_, cid) => (qid, cid) }
    }.toSeq.toDF("qid", "cell")
    if (rerank == Int.MaxValue) {
      // exact-selection regime (see scaladoc): top-MaxValue of the ADC
      // ordering keeps every probed candidate, so the ADC scores are dead
      // work — exact-score the probed cells in one distributed pass over
      // the vector table instead. Only the tiny probe list (q·nprobe
      // rows) and the query vectors broadcast; the per-query partial
      // top-k heap holds k entries, never a candidate list.
      val qe = qRows.map { case (qid, qv) => (qid, qv.toSeq) }
        .toSeq.toDF("qid", "qe")
      val exact = corpus
        .select(col("vec_id").as("nid"),
          col("embedding").cast("array<double>").as("ne"))
        .withColumn("cell", ivfCell(col("ne"), cents))
        .join(broadcast(probes), Seq("cell"))
        .filter(col("qid") =!= col("nid"))
        .join(broadcast(qe), Seq("qid"))
        .select(col("qid"), col("nid"),
          F.cosineSimilarity(col("qe"), col("ne")).as("cos"))
      return top(exact, k)
    }
    // ADC score for a (qid, code) row through ONE native kernel node: the
    // qid resolves its LUT by binary search inside PqAdcScore (O(m + log q)
    // per row), replacing the per-query `when`-chain dispatch that put
    // O(q·m) expression nodes on the hot probed-cell scan — the
    // janino-64KB pattern at a production query batch.
    val sortedQ = qRows.sortBy(_._1)
    val qidsArr = sortedQ.map(_._1)
    val sortedBooks = books.map(_.sortBy(_._1).map(_._2))
    val ipLutsArr: Array[Array[Array[Double]]] = sortedQ.map { case (_, qv) =>
      (0 until m).map { s =>
        sortedBooks(s).map(c => (0 until ds).map(i => qv(s * ds + i) * c(i)).sum)
      }.toArray
    }
    val qnormsArr = sortedQ.map { case (_, qv) => math.sqrt(qv.map(x => x * x).sum) }
    val scored = stored
      .join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        F.pqAdcScore(col("code"), col("qid"), qidsArr, ipLutsArr,
          qnormsArr, normLuts.toArray).as("cos"))
    if (rerank <= 0) top(scored, k)
    else pqExactRerank(corpus, queries, top(scored, math.max(rerank, k)), k)
  }

  /** Shared ranked-top-k tail of the PQ paths: partial top-k aggregate →
    * (qid, rnk, nid, cosine). */
  private def top(scored: DataFrame, kk: Int): DataFrame = scored
    .groupBy(col("qid"))
    .agg(TopK.topK(kk).as("top"))
    .select(col("qid"), posexplode(col("top")).as(Seq("rnk0", "s")))
    .select(col("qid"), (col("rnk0") + 1).cast(LongType).as("rnk"),
      col("s.nid").as("nid"), round(col("s.cos"), 6).as("cosine"))

  /** Exact-cosine re-rank of an ADC candidate list — pqTopK(rerank>0)'s
    * second stage, public so a harness evaluating several operating points
    * (x48) reuses ONE ADC ranking for all of them instead of re-scanning
    * the codes per point. `candidates` needs (qid, nid) columns. */
  def pqExactRerank(corpus: DataFrame, queries: DataFrame,
      candidates: DataFrame, k: Int): DataFrame = {
    val session = corpus.sparkSession
    import session.implicits._
    val qe = queries
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq.toDF("qid", "qe")
    // candidate set (q·rerank ids) broadcasts; the corpus-vector read
    // stays a shuffle-free probe of the big side
    val exactScored = corpus
      .select(col("vec_id").as("nid"),
        col("embedding").cast("array<double>").as("ne"))
      .join(broadcast(candidates.select(col("qid"), col("nid"))), Seq("nid"))
      .join(broadcast(qe), Seq("qid"))
      .select(col("qid"), col("nid"),
        F.cosineSimilarity(col("qe"), col("ne")).as("cos"))
    top(exactScored, k)
  }

  /** Per-group embedding centroids via posexplode → (group, position)
    * hash-agg — the distributed position-wise mean (cluster summaries,
    * per-source drift monitoring, IVF codebook seeding). The shuffle
    * carries (group, pos, partial-sum) — groups × dim rows after map-side
    * partials, never the vectors; means use the decimal sum so every
    * element is engine-replayable. `maxPos` bounds the output width for
    * summary queries (0 = all positions). */
  def groupCentroids(corpus: DataFrame, groupCol: String,
      embCol: String = "embedding", maxPos: Int = 0): DataFrame = {
    val exploded = corpus.select(col(groupCol),
        posexplode(col(embCol)).as(Seq("pos", "v")))
      .withColumn("pos", (col("pos") + 1).cast(LongType)) // 1-based like SQL
    val bounded = if (maxPos > 0) exploded.filter(col("pos") <= maxPos)
                  else exploded
    bounded
      .groupBy(col(groupCol), col("pos"))
      .agg(graft.engine.relational.Exact.lcount().as("n_vectors"),
        graft.engine.relational.Exact.davg(col("v").cast("double")).as("centroid_v"))
      .orderBy(col(groupCol), col("pos"))
  }

  /** 1-based ranks for a SMALL candidate list (a retriever's top-N —
    * bounded by construction, never corpus-sized): rank(x) = 1 + |rows
    * strictly better than x| under (score desc, id asc) — a broadcast
    * inequality join over N×N candidate rows, so no window (and no
    * single-partition sort) ever touches the plan. Ties are impossible
    * in the count because (score, id) is a total order.
    *
    * PRECONDITIONS, enforced in-plan because [[rrfFuse]] treats the
    * ranks as trustworthy: scores must be non-null (a NULL compares
    * false against everything, which would silently rank the row 1) and
    * ids must be unique (a duplicate would merge in the groupBy and
    * double the strictly-better counts). Both guards run inside one
    * hash-agg over the candidate-sized frame — no extra job, no extra
    * shuffle beyond the N-row aggregation — and raise instead of
    * corrupting downstream fusion. */
  def rankCandidates(cands: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    // min == max over a single row is the row itself; n > 1 or a null
    // score (min of a lone null is null) trips the raise_error branch
    val checked = cands.groupBy(col(idCol))
      .agg(count(lit(1)).as("_n"), min(col(scoreCol)).as("_s"))
      .select(col(idCol),
        when(col("_n") === 1 && col("_s").isNotNull, col("_s"))
          .otherwise(raise_error(concat(
            lit("rankCandidates: duplicate id or null score for "),
            col(idCol).cast("string")))).as("_score"))
    val better = broadcast(checked.select(col(idCol).as("_yid"),
      col("_score").as("_ys")))
    checked.join(better,
        col("_ys") > col("_score") ||
          (col("_ys") === col("_score") && col("_yid") < col(idCol)),
        "left")
      .groupBy(col(idCol))
      .agg((count(col("_yid")) + 1L).as("rank"))
  }

  /** Reciprocal-rank fusion of two ranked candidate lists (Cormack,
    * Clarke & Buettcher 2009 — the standard hybrid-retrieval combiner:
    * no score calibration needed, only ranks): fused(d) =
    * Σ 1/(kRrf + rank_i(d)) over the lists that retrieved d, top-k by
    * (fused desc, id asc). Inputs are (id, rank) frames — each a
    * retriever's bounded top-N — so the full-outer join and the final
    * TakeOrdered touch candidate-sized data only; at 100 TB the corpus
    * cost lives inside the retrievers (BM25's hits-only shuffle, the
    * ANN probe), never in the fusion. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
      kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(kRrf >= 1 && topK >= 1, "need kRrf >= 1 and topK >= 1")
    val fa = a.select(col(idCol), col("rank").as("rank_a"))
    val fb = b.select(col(idCol), col("rank").as("rank_b"))
    fa.join(fb, Seq(idCol), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(kRrf) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("rank_b")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
