package graft.engine.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}
import graft.engine.Tables
import graft.engine.functions.F

class SimilaritySpec extends AnyFunSuite {
  import spark.implicits._

  test("CosineSimilarity expression: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f), 1.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f), 0.0) // zero-norm guard
    ).toDF("a", "b", "expected")
    df.withColumn("cos", F.cosineSimilarity(col("a"), col("b")))
      .collect().foreach { r =>
        assert(math.abs(r.getAs[Double]("cos") - r.getAs[Double]("expected")) < 1e-12)
      }
  }

  test("CosineSimilarity matches the zip_with/aggregate built-in formulation") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = emb.filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding").as("e1"))
    val b = emb.filter(col("vec_id").between(50, 54))
      .select(col("vec_id").as("vid2"), col("embedding").as("e2"))
    val pairs = a.crossJoin(b).orderBy(col("vec_id"), col("vid2"))
    val viaExpr = pairs.withColumn("c", F.cosineSimilarity(col("e1"), col("e2")))
    val viaBuiltin = pairs.withColumn("dot",
        aggregate(zip_with(col("e1"), col("e2"), (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v))
      .withColumn("na", aggregate(transform(col("e1"), x => x.cast("double") * x.cast("double")), lit(0.0), (acc, v) => acc + v))
      .withColumn("nb", aggregate(transform(col("e2"), x => x.cast("double") * x.cast("double")), lit(0.0), (acc, v) => acc + v))
      .withColumn("c2", col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
    val exprVals = viaExpr.select("c").collect().map(_.getDouble(0))
    val builtinVals = viaBuiltin.select("c2").collect().map(_.getDouble(0))
    exprVals.zip(builtinVals).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-12, s"$x vs $y")
    }
  }

  test("custom expressions are callable from SQL after registration") {
    F.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c, " +
        "graft_simhash64(array('a','b')) AS s, " +
        "graft_rolling_hash('abc') AS h").collect()(0)
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
    assert(r.getAs[Long]("h") == (('a' * 131L + 'b') * 131L + 'c'))
  }

  test("bruteForceTopK: planted duplicate vector is its twin's top neighbor") {
    val emb = Tables.embeddings(spark, sfDir)
    val planted = emb.filter(col("vec_id") === 3)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(planted)
    val top = Similarity.bruteForceTopK(corpus,
        corpus.filter(col("vec_id") === 10003), k = 1).collect()(0)
    assert(top.getAs[Long]("nid") == 3L)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("aggregator-based top-k equals window-based top-k exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rnk")) ->
        (r.getAs[Long]("nid"), r.getAs[Double]("cosine"))).toMap
    val viaWindow = key(Similarity.bruteForceTopK(emb, queries, 5))
    val viaAgg = key(Similarity.bruteForceTopKAgg(emb, queries, 5))
    assert(viaAgg == viaWindow)
  }

  test("lshTopK returns a subset of bucket-mates with valid ranks") {
    val emb = Tables.embeddings(spark, sfDir)
    val res = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 3, bits = 4)
    val rows = res.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("qid")).values.foreach { rs =>
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted
      assert(ranks.head == 1L && ranks.length <= 3)
    }
  }

  test("multi-probe lshTopK recall >= single-bucket recall (superset pool)") {
    // the Hamming-1 probe set strictly contains the exact-bucket probe, so
    // the candidate pool grows; top-k over a superset pool can only gain
    // true-top-k members (a displacing candidate ranks above the displaced
    // one, hence is itself a true-top-k member when the displaced was)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, queries, 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = Similarity.lshTopK(emb, queries, 4, bits = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.lshTopK(emb, queries, 4, bits = 4, multiProbe = true)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.intersect(multi).size >= exact.intersect(single).size)
    assert(multi.size >= single.size, "multi-probe must not shrink the result")
  }

  test("multi-table lshTopK: more tables never lose candidates, pairs stay distinct") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, queries, 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // table t=0 uses the same seed as tables=1, so the 8-table candidate
    // pool strictly contains the 1-table pool → recall is monotone
    val one = Similarity.lshTopK(emb, queries, 4, bits = 6, probeRadius = 1)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val eight = Similarity.lshTopK(emb, queries, 4, bits = 6, probeRadius = 1,
        tables = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(eight.distinct.length == eight.length,
      "co-bucketing in several tables must not duplicate a (qid, nid) pair")
    assert(exact.intersect(eight.toSet).size >= exact.intersect(one.toSet).size)
    // the published operating point holds its documented recall on testdata
    val recall = exact.intersect(eight.toSet).size.toDouble /
      math.max(exact.size, 1)
    assert(recall >= 0.75, f"operating-point recall $recall%.2f collapsed")
  }

  test("ivfTopK with nprobe = nlist equals brute force exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 8)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val exact = key(Similarity.bruteForceTopK(emb, queries, 5))
    val ivf = key(Similarity.ivfTopK(emb, queries, 5, nlist = 8, nprobe = 8))
    assert(ivf == exact)
  }

  test("ivfTopK: planted duplicate shares its twin's cell, found at nprobe=1") {
    val emb = Tables.embeddings(spark, sfDir)
    val planted = emb.filter(col("vec_id") === 3)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(planted)
    val top = Similarity.ivfTopK(corpus,
        corpus.filter(col("vec_id") === 10003), k = 1,
        nlist = 16, nprobe = 1).collect()(0)
    assert(top.getAs[Long]("nid") == 3L)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-9)
    val ranks = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 3,
      nlist = 16, nprobe = 2).collect()
    ranks.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to rs.length))
    }
  }

  test("dim is derived from the data: 8-dim corpus works with default args") {
    // Non-64-dim fixture: if a hardcoded dim=64 were still in play, the
    // hyperplane dot products would read past the array and cosine would be
    // computed against garbage — the planted twin would not rank first.
    val rnd = new scala.util.Random(11)
    val base = Seq.tabulate(40)(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val corpus = (base :+ (999L, base(3)._2)).toDF("vec_id", "embedding")
    assert(Similarity.embeddingDim(corpus) == 8)
    val top = Similarity.lshTopK(corpus,
      corpus.filter(col("vec_id") === 999), k = 1, bits = 4).collect()(0)
    assert(top.getAs[Long]("nid") == 3L)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-6)
    val dups = Similarity.embeddingNearDups(corpus, threshold = 0.999, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups.contains((3L, 999L)))
  }

  test("ivfCentroids: Lloyd iterations keep nlist centroids of data dim, " +
      "every vector gets a valid cell") {
    val emb = Tables.embeddings(spark, sfDir)
    val dim = Similarity.embeddingDim(emb)
    val seeds = Similarity.ivfCentroids(emb, nlist = 8, iters = 0)
    val trained = Similarity.ivfCentroids(emb, nlist = 8, iters = 2)
    assert(seeds.length == 8 && trained.length == 8)
    assert(trained.forall(_._2.length == dim))
    // training moved at least one centroid off its seed vector
    assert(seeds.zip(trained).exists { case ((_, a), (_, b)) => !a.sameElements(b) })
    val cells = emb.select(Similarity.ivfCell(
        col("embedding").cast("array<double>"), trained).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf((0 until 8).toSet) && cells.nonEmpty)
  }

  test("embeddingNearDups: degenerate corpus (1k identical vectors) stays " +
      "bounded by the bucket cap and reports overflow") {
    // all-identical vectors collapse to ONE bucket: uncapped this is
    // C(1000,2) ≈ 5·10^5 pairs (and quadratic at scale); capped at 100 the
    // expansion is C(100,2) and the telemetry says truncation happened
    val vec = Array.fill(8)(0.5f)
    val corpus = (0L until 1000L).map(i => (i, vec)).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(corpus, threshold = 0.9,
      bits = 4, maxBucketSize = 100)
    assert(pairs.count() == 100L * 99L / 2)
    val tel = Similarity.embeddingCapOverflow(corpus, bits = 4,
      maxBucketSize = 100).collect()(0)
    assert(tel.getAs[Long]("n_overflow_buckets") >= 1L)
    assert(tel.getAs[Long]("max_bucket_size") == 1000L)
    // empty corpus: telemetry must read (0, 0), never NULL
    val empty = Similarity.embeddingCapOverflow(
      corpus.filter(col("vec_id") < 0), bits = 4).collect()(0)
    assert(empty.getAs[Long]("n_overflow_buckets") == 0L)
    assert(empty.getAs[Long]("max_bucket_size") == 0L)
  }

  test("autoBits sizes the hash to the corpus") {
    assert(Similarity.autoBits(0) == 4)
    assert(Similarity.autoBits(256) == 4)          // floor
    assert(Similarity.autoBits(1L << 20) == 12)    // 2^20 / 256 = 2^12
    assert(Similarity.autoBits(Long.MaxValue) == 24) // ceiling
    // auto path end-to-end: bits <= 0 derives from the corpus
    val rnd = new scala.util.Random(5)
    val base = Seq.tabulate(30)(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val corpus = (base :+ (999L, base(3)._2)).toDF("vec_id", "embedding")
    val dups = Similarity.embeddingNearDups(corpus, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups.contains((3L, 999L)))
  }

  test("embeddingNearDups finds planted duplicate pair") {
    val emb = Tables.embeddings(spark, sfDir)
    val planted = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val pairs = Similarity.embeddingNearDups(emb.unionByName(planted), threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((7L, 10007L)))
  }

  test("semanticDedup: min id survives each planted clique, singletons kept") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    def shifted(mod: Int, off: Int) = emb.filter(col("vec_id") % mod === 0)
      .select((col("vec_id") + off).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(shifted(10, 100000))
      .unionByName(shifted(20, 200000))
    val survivors = Similarity.semanticDedup(corpus, threshold = 0.999999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // every original id survives (it is its clique's min), no copy does
    assert(emb.select("vec_id").collect().map(_.getLong(0)).forall(survivors))
    assert(survivors.forall(_ < 100000L), s"a planted copy survived")
    assert(survivors.size.toLong == n)
    // idempotent: a deduped corpus has nothing left to drop
    val again = Similarity.semanticDedup(
      corpus.join(broadcast(survivors.toSeq.toDF("vec_id")), Seq("vec_id"),
        "left_semi"), threshold = 0.999999)
    assert(again.count() == n)
  }

  test("pqTopK with lossless codebooks equals brute force (ranks and ids)") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 60)
    val queries = emb.filter(col("vec_id") < 5)
    val books = Similarity.pqCodebooksExact(emb, m = 4)
    val exact = Similarity.bruteForceTopKAgg(emb, queries, 5)
      .select("qid", "rnk", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pq = Similarity.pqTopK(emb, queries, 5, books)
      .select("qid", "rnk", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pq == exact, "lossless PQ must reproduce the exact ranking")
  }

  test("pqTrain: m books of k centroids of dim/m width; training is " +
      "deterministic and encode emits in-range codes") {
    val emb = Tables.embeddings(spark, sfDir)
    val b1 = Similarity.pqTrain(emb, m = 8, k = 16, iters = 1)
    val b2 = Similarity.pqTrain(emb, m = 8, k = 16, iters = 1)
    assert(b1.length == 8)
    assert(b1.forall(b => b.length == 16 && b.forall(_._2.length == 8)))
    assert(b1.zip(b2).forall { case (x, y) =>
      x.zip(y).forall { case ((ci, cv), (di, dv)) =>
        ci == di && cv.sameElements(dv) } }, "training must be deterministic")
    val codes = Similarity.pqEncode(emb, b1)
      .select(col("code")).collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("pqTopK rerank >= corpus size equals brute force even with a crude codebook") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 40)
    val queries = emb.filter(col("vec_id") < 5)
    // deliberately lossy: 2 centroids per subspace — raw ADC is near-blind,
    // but a full re-rank must still recover the exact answer (the re-rank
    // stage scores candidates with exact cosine, and everyone is a candidate)
    val books = Similarity.pqTrain(emb, m = 4, k = 2, iters = 1)
    val exact = Similarity.bruteForceTopKAgg(emb, queries, 5)
      .select("qid", "rnk", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pq = Similarity.pqTopK(emb, queries, 5, books, rerank = 100)
      .select("qid", "rnk", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pq == exact, "full re-rank must reproduce the exact ranking")
  }

  test("ivfPqTopK: nprobe=nlist + lossless codebooks equals brute force; " +
      "partial probe returns a subset") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 60)
    val queries = emb.filter(col("vec_id") < 5)
    val cents = Similarity.ivfCentroids(emb, nlist = 4, iters = 1)
    val books = Similarity.pqCodebooksExact(emb, m = 4)
    val exact = Similarity.bruteForceTopKAgg(emb, queries, 5)
      .select("qid", "rnk", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Similarity.ivfPqTopK(emb, queries, 5, cents, books, nprobe = 4)
      .select("qid", "rnk", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == exact, "both approximations at their exact settings " +
      "must compose to the exact ranking")
    // partial probe: a top-k over a cell-restricted candidate subset —
    // valid dense ranks per query, never more than k rows, non-empty
    // (every query's own cell is always probed)
    val partial = Similarity.ivfPqTopK(emb, queries, 5, cents, books, nprobe = 1)
      .select("qid", "rnk", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(partial.nonEmpty)
    partial.groupBy(_._1).foreach { case (_, rows) =>
      val rnks = rows.map(_._2).sorted.toSeq
      assert(rnks == (1L to rnks.length).toSeq, s"ranks must be dense: $rnks")
      assert(rows.length <= 5)
    }
    // repeated vec_id in the query frame fails with a caller-facing message
    // (the ADC kernel maps each qid to exactly one LUT)
    val dupQ = queries.union(queries.limit(1))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(emb, dupQ, 5, cents, books, nprobe = 4)
    }
    assert(e.getMessage.contains("distinct vec_id"))
  }

  test("ivfPqTopK: full rerank recovers exactness under crude codebooks") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 40)
    val queries = emb.filter(col("vec_id") < 5)
    val cents = Similarity.ivfCentroids(emb, nlist = 2, iters = 1)
    val books = Similarity.pqTrain(emb, m = 4, k = 2, iters = 1)
    val exact = Similarity.bruteForceTopKAgg(emb, queries, 5)
      .select("qid", "rnk", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Similarity.ivfPqTopK(emb, queries, 5, cents, books,
        nprobe = 2, rerank = 100)
      .select("qid", "rnk", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exact)
  }

  test("ivfPqTopK exact-selection sentinel (rerank = Int.MaxValue): " +
      "row-for-row equal to the finite-rerank ADC path at full AND " +
      "partial probe, with and without published codes") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 60)
    val queries = emb.filter(col("vec_id") < 5)
    val cents = Similarity.ivfCentroids(emb, nlist = 3, iters = 1)
    // deliberately CRUDE codebooks: the sentinel's claim is that the ADC
    // ordering is irrelevant when every candidate is kept, so equality
    // must hold even when ADC would rank candidates badly
    val books = Similarity.pqTrain(emb, m = 4, k = 2, iters = 1)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "rnk", "nid", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    for (np <- Seq(1, 3)) {
      // finite rerank >= sub-corpus: the literal ADC path (score every
      // probed code, keep top-rerank, exact re-rank) — the slow twin
      val literal = rows(Similarity.ivfPqTopK(emb, queries, 5, cents,
        books, nprobe = np, rerank = 60))
      val sentinel = rows(Similarity.ivfPqTopK(emb, queries, 5, cents,
        books, nprobe = np, rerank = Int.MaxValue))
      assert(sentinel == literal,
        s"sentinel must equal the literal exact regime at nprobe=$np")
      // codes-provided lifecycle (q127's shape): the sentinel ignores
      // the codes frame but must still match, because the recomputed
      // ivfCell assignment IS the stored assignment
      val withCodes = rows(Similarity.ivfPqTopK(emb, queries, 5, cents,
        books, nprobe = np, rerank = Int.MaxValue,
        codes = Some(Similarity.ivfPqEncode(emb, cents, books))))
      assert(withCodes == literal,
        s"sentinel over published codes must match at nprobe=$np")
    }
    // full probe + sentinel == brute force (q127's oracle contract);
    // ranking-only compare — brute force scores float32 arrays while
    // ivfPqTopK casts to double, so 6-decimal cosines can differ in ulps
    val exact = Similarity.bruteForceTopKAgg(emb, queries, 5)
      .select("qid", "rnk", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Similarity.ivfPqTopK(emb, queries, 5, cents, books,
        nprobe = 3, rerank = Int.MaxValue)
      .select("qid", "rnk", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == exact,
      "full-probe sentinel must reproduce the brute-force ranking")
  }

  test("pqTopK trained regime: planted duplicate vector is recovered at rank 1") {
    val emb = Tables.embeddings(spark, sfDir)
    val planted = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(planted)
    val books = Similarity.pqTrain(corpus, m = 8, k = 16, iters = 2)
    val top = Similarity.pqTopK(corpus, emb.filter(col("vec_id") === 7), 1, books)
      .collect()
    assert(top.length == 1)
    // identical vectors get identical codes, hence identical ADC cosine —
    // the duplicate must top the list (nid tie-break can't demote it: its
    // ADC cosine is the maximum attainable)
    assert(top(0).getAs[Long]("nid") == 10007L,
      s"expected planted twin at rank 1, got ${top(0)}")
  }

  test("ADC kernels: a 256-query batch is ONE expression node (codegen-safe)") {
    // The former per-query Column-DSL fan-out put O(q·m) expression nodes
    // on the hot corpus scan — at 256 queries that overflows janino's 64 KB
    // method limit and silently drops to interpreted eval. The native
    // kernels must keep the node count O(1) in query count (so the scan
    // stays inside WholeStageCodegen) and still return exact top-k shapes.
    val emb = Tables.embeddings(spark, sfDir).persist()
    try {
      val queries = emb.filter(col("vec_id") < 256) // 500-vector corpus: all 256 exist
      val books = Similarity.pqTrain(emb, m = 4, k = 8, iters = 1)
      val adc = Similarity.pqTopK(emb, queries, 3, books)
      val plan = adc.queryExecution.executedPlan.toString
      assert("graft_pq_adc_scores".r.findAllIn(plan).length == 1,
        "pqTopK must score all 256 queries through ONE PqAdcScores node")
      assert(plan.contains("*("), // star-notation WholeStageCodegen spans
        "the codes scan must stay inside whole-stage codegen")
      assert(adc.count() == 256L * 3, "each query gets exactly k ranked rows")

      val cents = Similarity.ivfSeeds(emb, 4)
      val ivfpq = Similarity.ivfPqTopK(emb, queries, 3, cents, books,
        nprobe = cents.length)
      val plan2 = ivfpq.queryExecution.executedPlan.toString
      assert("graft_pq_adc_score\\b".r.findAllIn(plan2).length == 1,
        "ivfPqTopK must dispatch all 256 query LUTs through ONE PqAdcScore node")
      assert(plan2.contains("*("), // star-notation WholeStageCodegen spans
        "the probed-cell scan must stay inside whole-stage codegen")
      assert(ivfpq.count() == 256L * 3, "each query gets exactly k ranked rows")

      // nprobe = nlist makes IVF-PQ's candidate set exhaustive, so with the
      // SAME books both paths rank by the same ADC cosine: equal answers
      val a = adc.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val b = ivfpq.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(a == b, "exhaustive IVF-PQ must equal the flat ADC ranking")
    } finally emb.unpersist()
  }

  test("clustered corpus: published dials hold their recall floors far " +
      "above the isotropic diagonal (the realistic-deployment check)") {
    // The synthetic embeddings are isotropic — recall ≈ candidate fraction,
    // the information-theoretic worst case. Real corpora are clustered;
    // BASELINE.md's deployment guidance rests on the claim that the same
    // dials then land far ABOVE the diagonal. Plant the clusters and pin
    // it: fixed-seed corpus → these are regressions gates, not flakes
    // (AnnSweep/PqSweep `clustered:` mode carries the full curves).
    import graft.tools.ClusteredVectors
    val emb = ClusteredVectors.generate(spark, n = 1000L, k = 10,
      sigma = 0.2, seed = 42L).persist()
    try {
      val queries = emb.filter(col("vec_id") < 10)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("qid"), col("nid")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
      def recallOf(approx: Set[(Long, Long)]): Double =
        exact.intersect(approx).size.toDouble / math.max(exact.size, 1)
      // published LSH point (bits=6, radius=1, tables=8): 0.94 isotropic,
      // measured 0.96 on this fixture — floor leaves headroom
      val lsh = recallOf(pairs(Similarity.lshTopK(emb, queries, 5,
        bits = 6, probeRadius = 1, tables = 8)))
      info(f"clustered recall: lsh=$lsh%.2f (floor 0.9)")
      assert(lsh >= 0.9, f"clustered LSH operating-point recall $lsh%.2f")
      // the above-the-diagonal pin: IVF at a ~12.5% expected scan
      // (nprobe/nlist = 4/32) must beat 4× its candidate fraction —
      // isotropic lands AT the fraction (~0.125); measured 1.00 here
      val ivf = recallOf(pairs(Similarity.ivfTopK(emb, queries, 5,
        nlist = 32, nprobe = 4)))
      info(f"clustered recall: ivf@0.125-scan=$ivf%.2f (floor 0.5)")
      assert(ivf >= 0.5, f"IVF@12.5%%-scan recall $ivf%.2f not above diagonal")
      // published PQ point (m=16, k=32, re-rank@100): 0.98 isotropic,
      // measured 1.00 clustered — quantizer gains structure, never loses
      val books = Similarity.pqTrain(emb, 16, 32, iters = 2)
      val pq = recallOf(pairs(
        Similarity.pqTopK(emb, queries, 5, books, rerank = 100)))
      info(f"clustered recall: pq-rerank100=$pq%.2f (floor 0.9)")
      assert(pq >= 0.9, f"clustered PQ re-rank@100 recall $pq%.2f")
    } finally emb.unpersist()
  }

  test("rankCandidates + rrfFuse: pinned fixture, one-sided candidates, " +
      "tie-breaks") {
    import graft.SparkTestSession.spark.implicits._
    // scores with a tie: ranks under (score desc, id asc) are
    // 10->1, 11->2 (tie with 12, lower id wins), 12->3, 13->4
    val lex = Seq((10L, 0.9), (11L, 0.5), (12L, 0.5), (13L, 0.1))
      .toDF("doc_id", "score")
    val ranked = Similarity.rankCandidates(lex, "doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranked == Map(10L -> 1L, 11L -> 2L, 12L -> 3L, 13L -> 4L))
    // dense list shares 11 and brings a new candidate 99
    val dense = Seq((11L, 1L), (99L, 2L)).toDF("doc_id", "rank")
    val fused = Similarity.rrfFuse(
      ranked.toSeq.toDF("doc_id", "rank"), dense, "doc_id",
      kRrf = 60, topK = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    def rr(r: Long) = 1.0 / (60 + r)
    def rnd(x: Double) = math.round(x * 1e6) / 1e6
    assert(fused(11L) == rnd(rr(2) + rr(1)), "both lists contribute")
    assert(fused(10L) == rnd(rr(1)), "lex-only candidate keeps one term")
    assert(fused(99L) == rnd(rr(2)), "dense-only candidate keeps one term")
    // the doubly-retrieved candidate outranks every single-list one here
    assert(fused(11L) > fused(10L))
    // topK truncation honors (rrf desc, id asc)
    val top2 = Similarity.rrfFuse(
      ranked.toSeq.toDF("doc_id", "rank"), dense, "doc_id",
      kRrf = 60, topK = 2).collect().map(_.getLong(0)).toList
    assert(top2 == List(11L, 10L))
  }
}
