package graft.engine.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}
import graft.engine.Tables
import graft.engine.sources.SnapshotStore

class AnnIndexSpec extends AnyFunSuite {

  private lazy val emb = Tables.embeddings(spark, sfDir)
    .filter(col("vec_id") < 100)

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft_annidx_$tag").toString + "/store"

  private def trained() = (
    Similarity.ivfCentroids(emb, nlist = 4, iters = 1),
    Similarity.pqCodebooksExact(emb, m = 4))

  test("publish/load round-trips codebooks bit-exactly, versions pin") {
    val root = freshRoot("rt")
    val (cents, books) = trained()
    val v1 = AnnIndex.publishIndex(spark, root, cents, books)
    assert(v1 == 1L)
    val (c2, b2) = AnnIndex.loadIndex(spark, root)
    assert(c2.map(_._1).toSeq == cents.map(_._1).toSeq)
    assert(c2.zip(cents).forall { case ((_, a), (_, b)) => a.sameElements(b) },
      "coarse centroids must round-trip bit-exactly")
    assert(b2.size == books.size)
    assert(b2.zip(books).forall { case (ba, bb) =>
      ba.map(_._1).toSeq == bb.map(_._1).toSeq &&
        ba.zip(bb).forall { case ((_, x), (_, y)) => x.sameElements(y) }
    }, "PQ codebooks must round-trip bit-exactly per subspace")

    // retrain (different nlist) -> v2; the pinned v1 read still loads the
    // ORIGINAL index — a retrain is a new version, never a mutation
    val cents8 = Similarity.ivfCentroids(emb, nlist = 8, iters = 1)
    val v2 = AnnIndex.publishIndex(spark, root, cents8, books)
    assert(v2 == 2L)
    assert(AnnIndex.loadIndex(spark, root)._1.length == 8)
    val (c1again, _) = AnnIndex.loadIndex(spark, root, version = 1L)
    assert(c1again.length == 4 &&
      c1again.zip(cents).forall { case ((_, a), (_, b)) => a.sameElements(b) })
  }

  test("loadIndex refuses a partial/corrupt store instead of silently " +
      "renumbering subspaces") {
    val (cents, books) = trained()
    // a store whose sub=1 codebook rows are missing entirely: decoding
    // would silently shift subspaces 2..m-1 down without the guard
    val gapRoot = freshRoot("gap")
    SnapshotStore.publish(
      AnnIndex.toDf(spark, cents, books).filter(col("sub") =!= 1), gapRoot)
    val exGap = intercept[IllegalArgumentException] {
      AnnIndex.loadIndex(spark, gapRoot)
    }
    assert(exGap.getMessage.contains("contiguous"), exGap.getMessage)
    // a store with centroids but NO codebooks at all fails with a clear
    // message, not books.head downstream
    val emptyRoot = freshRoot("nobooks")
    SnapshotStore.publish(
      AnnIndex.toDf(spark, cents, books).filter(col("kind") === "cent"),
      emptyRoot)
    val exEmpty = intercept[IllegalArgumentException] {
      AnnIndex.loadIndex(spark, emptyRoot)
    }
    assert(exEmpty.getMessage.contains("codebooks"), exEmpty.getMessage)
    // ragged ksub: one codebook entry removed from sub=0
    val raggedRoot = freshRoot("ragged")
    SnapshotStore.publish(
      AnnIndex.toDf(spark, cents, books)
        .filter(!(col("sub") === 0 && col("cid") === 0)), raggedRoot)
    val exRag = intercept[IllegalArgumentException] {
      AnnIndex.loadIndex(spark, raggedRoot)
    }
    assert(exRag.getMessage.contains("ksub"), exRag.getMessage)
  }

  test("bootstrap + append == one-shot encode; append moves no history") {
    val root = freshRoot("ap")
    val (cents, books) = trained()
    val v1 = AnnIndex.publishCodes(emb.filter(col("vec_id") < 50), root,
      cents, books, nBuckets = 4)
    val v1Files = SnapshotStore.read(spark, root, v1).inputFiles.toSet
    val v2 = AnnIndex.appendCodes(emb.filter(col("vec_id") >= 50), root,
      cents, books)
    assert(v2 == v1 + 1)
    // content: the two-batch store equals a single-pass encode, row-exact
    val expect = Similarity.ivfPqEncode(emb, cents, books)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList)).toSet
    val got = AnnIndex.readCodes(spark, root)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList)).toSet
    assert(got == expect, "bootstrap+append must equal one-shot encode")
    // history carryover is by hardlink: every v1 file name is still
    // referenced by v2 (append rewrites nothing)
    val v2Files = SnapshotStore.read(spark, root, v2).inputFiles.toSet
    val v1Names = v1Files.map(_.split('/').last)
    val v2Names = v2Files.map(_.split('/').last)
    assert(v1Names.subsetOf(v2Names),
      "append must carry every base file over untouched")
    // and the pinned v1 read still sees only the first batch
    assert(SnapshotStore.read(spark, root, v1).count() == 50L)
  }

  test("deletion lifecycle: tombstones kill nids in live/probe reads, " +
      "delete is idempotent, tombstone is terminal until compaction, " +
      "compaction removes tombstones+victims, re-insert works after") {
    val root = freshRoot("del")
    val (cents, books) = trained()
    AnnIndex.publishCodes(emb.filter(col("vec_id") < 50), root, cents,
      books, nBuckets = 4)
    AnnIndex.appendCodes(emb.filter(col("vec_id") >= 50), root, cents, books)
    import spark.implicits._
    val victims = Seq(3L, 7L, 42L)
    val vDel = AnnIndex.deleteCodes(victims.toDF("nid"), root)
    assert(vDel == 3, "bootstrap, append, tombstone append = 3 versions")
    // raw read: victims still present plus 3 NULL-code tombstones;
    // live read: victims and tombstones both gone
    val raw = AnnIndex.readCodes(spark, root)
    assert(raw.filter(col("code").isNull).count() == 3L)
    val live = AnnIndex.readCodesLive(spark, root)
    assert(live.filter(col("nid").isin(victims.map(Long.box): _*)).isEmpty)
    assert(live.count() == emb.count() - 3)
    // a victim is invisible to the cell-pruned probe of its OWN cell
    // (the tombstone landed in that same bucket)
    val vcell = raw.filter(col("nid") === 42L && col("code").isNotNull)
      .head().getInt(1)
    assert(!AnnIndex.probeCodes(spark, root, Seq(vcell))
      .collect().map(_.getLong(0)).contains(42L))
    // idempotence: deleting an already-dead or never-inserted nid finds
    // no live row -> empty tombstone batch -> NO new version minted
    assert(AnnIndex.deleteCodes(Seq(42L, 999999L).toDF("nid"), root) == vDel)
    // tombstone is TERMINAL pre-compaction: re-appending the nid stays dead
    AnnIndex.appendCodes(emb.filter(col("vec_id") === 42L), root, cents,
      books)
    assert(AnnIndex.readCodesLive(spark, root)
      .filter(col("nid") === 42L).isEmpty)
    // compaction: raw == live afterwards — no tombstones, no victims
    val vc = AnnIndex.compactCodes(spark, root)
    assert(vc == vDel + 2, "re-append + compaction = 2 more versions")
    val raw2 = AnnIndex.readCodes(spark, root)
    assert(raw2.filter(col("code").isNull).isEmpty)
    assert(raw2.count() == emb.count() - 3)
    // after compaction the tombstone is gone: re-insert is visible again
    AnnIndex.appendCodes(emb.filter(col("vec_id") === 42L), root, cents,
      books)
    assert(AnnIndex.readCodesLive(spark, root)
      .filter(col("nid") === 42L).count() == 1L)
  }

  test("probeCodes reads only the probed cells' bucket directories") {
    val root = freshRoot("pr")
    val (cents, books) = trained()
    AnnIndex.publishCodes(emb, root, cents, books, nBuckets = 4)
    val all = AnnIndex.readCodes(spark, root)
    val cellOf = all.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    assert(cellOf.length > 1, "fixture must spread over multiple cells")
    val probed = AnnIndex.probeCodes(spark, root, Seq(cellOf.head))
    // value correctness: pruned read == full read filtered
    val expect = all.filter(col("cell") === cellOf.head)
      .collect().map(_.getLong(0)).toSet
    assert(probed.collect().map(_.getLong(0)).toSet == expect)
    // IO correctness, plan-pinned (house style): the scan must carry a
    // directory-level partition filter on _bucket (listing only the
    // probed bucket's directory) AND push the exact cell predicate into
    // the parquet reader — both visible on the FileScan node
    val plan = probed.queryExecution.executedPlan.toString
    val pf = plan.split('\n').find(_.contains("PartitionFilters"))
    assert(pf.exists(l => l.substring(l.indexOf("PartitionFilters"))
      .takeWhile(_ != ']').contains("_bucket")),
      s"probe scan must partition-prune on _bucket:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(cell)") ||
      plan.contains("EqualTo(cell") || plan.contains("In(cell"),
      s"probe scan must push the cell predicate down:\n$plan")
  }

  test("probeCodes: multi-cell probes and version pinning") {
    val root = freshRoot("mc")
    val (cents, books) = trained()
    val v1 = AnnIndex.publishCodes(emb.filter(col("vec_id") < 50), root,
      cents, books, nBuckets = 4)
    AnnIndex.appendCodes(emb.filter(col("vec_id") >= 50), root, cents, books)
    val all = AnnIndex.readCodes(spark, root)
    val cells = all.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    // probing every cell == the full read (dup cells in the request are
    // tolerated)
    val everything = AnnIndex.probeCodes(spark, root, cells ++ cells.take(1))
    assert(everything.count() == all.count())
    // probing two cells == the filtered full read, row-exact
    val two = cells.take(2)
    val got = AnnIndex.probeCodes(spark, root, two)
      .collect().map(_.getLong(0)).toSet
    val want = all.filter(col("cell").isin(two.map(Int.box): _*))
      .collect().map(_.getLong(0)).toSet
    assert(got == want && want.nonEmpty)
    // a probe pinned to v1 sees only the bootstrap batch's rows
    val v1Rows = AnnIndex.probeCodes(spark, root, cells, version = v1)
      .collect().map(_.getLong(0))
    assert(v1Rows.nonEmpty && v1Rows.forall(_ < 50),
      "pinned probe must not see appended history")
  }

  test("empty append is a no-op version; appended store compacts") {
    val root = freshRoot("cp")
    val (cents, books) = trained()
    val v1 = AnnIndex.publishCodes(emb.filter(col("vec_id") < 50), root,
      cents, books, nBuckets = 2)
    assert(AnnIndex.appendCodes(emb.filter(col("vec_id") < 0), root,
      cents, books) == v1, "empty batch must not mint a version")
    AnnIndex.appendCodes(emb.filter(col("vec_id") >= 50 &&
      col("vec_id") < 75), root, cents, books)
    AnnIndex.appendCodes(emb.filter(col("vec_id") >= 75), root, cents, books)
    val before = AnnIndex.readCodes(spark, root)
    val beforeRows = before.collect().map(_.getLong(0)).toSet
    val beforeFiles = before.inputFiles.length
    val vC = SnapshotStore.compact(spark, root, maxFilesPerBucket = 1)
    val after = AnnIndex.readCodes(spark, root)
    assert(after.collect().map(_.getLong(0)).toSet == beforeRows,
      "compaction is layout-only")
    assert(after.inputFiles.length < beforeFiles,
      s"compaction must shrink the file count (was $beforeFiles)")
    assert(vC > v1)
  }

  test("streaming ingest restart: checkpoint resume + per-batch tags keep " +
      "the codes store exactly-once across process boundaries") {
    val base = Files.createTempDirectory("graft_annidx_rs").toString
    val (cents, books) = trained()
    val codesRoot = s"$base/codes"
    AnnIndex.publishCodes(emb.filter(col("vec_id") < 34), codesRoot,
      cents, books, nBuckets = 4)
    emb.filter(col("vec_id") >= 34 && col("vec_id") < 67)
      .write.parquet(s"$base/in")
    def start() = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        AnnIndex.appendCodes(batch, codesRoot, cents, books,
          tag = Some(s"batch-$id"))
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val afterFirst = AnnIndex.readCodes(spark, codesRoot).count()
    assert(afterFirst == 67L)
    // second ingest file lands while the process is DOWN; a fresh query
    // over the same checkpoint must pick up only the new file — no
    // re-encode, no double-append of the first tick
    emb.filter(col("vec_id") >= 67).write.mode("append")
      .parquet(s"$base/in")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = AnnIndex.readCodes(spark, codesRoot)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList))
    assert(got.length == 100, s"exactly-once across restart, got ${got.length}")
    assert(got.toSet == Similarity.ivfPqEncode(emb, cents, books)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList)).toSet)
  }

  test("torn append: a stream killed after staging but before the flip " +
      "restarts to exactly-once — no duplicate, no lost batch, orphan " +
      "staging reaped") {
    val base = Files.createTempDirectory("graft_annidx_torn").toString
    val (cents, books) = trained()
    val codesRoot = s"$base/codes"
    AnnIndex.publishCodes(emb.filter(col("vec_id") < 50), codesRoot,
      cents, books, nBuckets = 4)
    val v1 = SnapshotStore.currentVersion(codesRoot)
    emb.filter(col("vec_id") >= 50).write.parquet(s"$base/in")
    // the crash is planted INSIDE the real micro-batch: first attempt
    // stages the encoded batch exactly as append would (bucket layout +
    // tag file) and dies BEFORE the flip — the post-staging, pre-flip
    // window a process kill can land in
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start(failFirst: Boolean) = spark.readStream.schema(emb.schema)
      .parquet(s"$base/in")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (failFirst && crashed.compareAndSet(false, true)) {
          val (keyCol, nBuckets) = SnapshotStore.readBucketSpec(codesRoot).get
          val staging = java.nio.file.Paths.get(codesRoot,
            s".staging-torn-${System.nanoTime()}")
          Similarity.ivfPqEncode(batch, cents, books)
            .withColumn("_bucket",
              SnapshotStore.bucketExpr(keyCol, nBuckets))
            .write.partitionBy("_bucket").parquet(staging.toString)
          java.nio.file.Files.write(staging.resolve("_GRAFT_TAG"),
            s"batch-$id".getBytes)
          throw new RuntimeException(
            "simulated crash: staged, not flipped")
        }
        AnnIndex.appendCodes(batch, codesRoot, cents, books,
          tag = Some(s"batch-$id"))
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    val q1 = start(failFirst = true)
    intercept[Throwable] { q1.processAllAvailable() }
    q1.stop()
    assert(crashed.get(), "the planted crash must have fired")
    // nothing flipped: the store is still at the bootstrap version and
    // the torn staging dir is on disk
    assert(SnapshotStore.currentVersion(codesRoot) == v1)
    val orphans = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(codesRoot))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith(".staging-torn-")).toList
      } finally s.close()
    }
    assert(orphans.size == 1, s"expected the torn staging dir, got $orphans")
    // restart over the same checkpoint: the SAME logical batch replays
    // with the SAME tag and must apply exactly once
    val q2 = start(failFirst = false)
    try q2.processAllAvailable() finally q2.stop()
    val v2 = SnapshotStore.currentVersion(codesRoot)
    assert(v2 == v1 + 1, "exactly one version minted across the crash")
    assert(SnapshotStore.versionTags(codesRoot).get(v2).contains("batch-0"))
    val got = AnnIndex.readCodes(spark, codesRoot)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList))
    assert(got.length == 100, s"exactly-once rows, got ${got.length}")
    assert(got.toSet == Similarity.ivfPqEncode(emb, cents, books)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList)).toSet)
    // the orphan never becomes a version; the staleness-gated reaper
    // (vacuum) reclaims it and the store is unchanged afterwards
    Thread.sleep(150)
    SnapshotStore.vacuum(codesRoot, keep = 10, stagingStaleMs = 100L)
    val after = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(codesRoot))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith(".staging-")).toList
      } finally s.close()
    }
    assert(after.isEmpty, s"vacuum must reap the torn staging, left $after")
    assert(AnnIndex.readCodes(spark, codesRoot).count() == 100L)
  }

  test("append replay protection: a tagged batch applies once") {
    val root = freshRoot("tg")
    val (cents, books) = trained()
    AnnIndex.publishCodes(emb.filter(col("vec_id") < 50), root,
      cents, books, nBuckets = 2)
    val batch = emb.filter(col("vec_id") >= 50)
    val va = AnnIndex.appendCodes(batch, root, cents, books,
      tag = Some("ingest-batch-7"))
    val vb = AnnIndex.appendCodes(batch, root, cents, books,
      tag = Some("ingest-batch-7"))
    assert(va == vb, "replayed tag must return the applied version")
    assert(AnnIndex.readCodes(spark, root).count() == 100L,
      "rows must not double on replay")
  }
}
