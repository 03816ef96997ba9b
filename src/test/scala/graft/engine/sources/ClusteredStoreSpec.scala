package graft.engine.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** [[ClusteredStore]] contracts: box reads are exact AND pruned, time
  * travel answers from the pinned version's own files/envelopes, tags
  * replay as no-ops, refusals fire where a silent full scan (or a
  * wedged bucketed store) would otherwise hide, and a damaged sidecar
  * degrades to unpruned reads — never to wrong rows. */
class ClusteredStoreSpec extends AnyFunSuite {
  import spark.implicits._

  private def root(): String = {
    val r = s"${System.getProperty("java.io.tmpdir")}/" +
      s"clustered_spec_${ProcessHandle.current().pid()}_" +
      s"${System.nanoTime()}/tbl"
    SnapshotStore.deleteRecursively(Paths.get(r).getParent)
    r
  }

  // 2-D grid with range locality on both axes: ids 0..1999, x = id
  // (time-like), y = reversed (value-like) — a narrow box touches few
  // z-contiguous files
  private lazy val grid = (0L until 2000L)
    .map(i => (i, i, (i * 7919L) % 2000L, s"g${i % 4}"))
    .toDF("id", "x", "y", "grp")

  test("box read == direct filter, strictly pruned, exact rows") {
    val r = root()
    ClusteredStore.publishClustered(grid, r, Seq("x", "y"), nFiles = 16)
    val (df, read, total) = ClusteredStore.readBox(spark, r,
      Seq(("x", 100L, 300L), ("y", 0L, 500L)))
    assert(total == 16 && read < total,
      s"expected pruning over 16 files, read $read of $total")
    val expected = grid.filter(col("x").between(100L, 300L) &&
      col("y").between(0L, 500L))
    assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty)
  }

  test("time travel: a box pinned to v1 answers from v1's content and " +
      "envelopes after a later publish") {
    val r = root()
    val v1data = grid.filter(col("id") < 1000L)
    ClusteredStore.publishClustered(v1data, r, Seq("x", "y"), nFiles = 8)
    ClusteredStore.publishClustered(grid, r, Seq("x", "y"), nFiles = 16)
    val (cur, _, totCur) = ClusteredStore.readBox(spark, r,
      Seq(("x", 0L, 1500L)))
    // the pinned box must be NARROW relative to v1's own x-range
    // (0..999) or every v1 file envelope intersects and nothing prunes
    val (old, readOld, totOld) = ClusteredStore.readBox(spark, r,
      Seq(("x", 0L, 300L)), version = 1L)
    assert(totCur == 16 && totOld == 8)
    assert(readOld < totOld, "the pinned read must prune v1's own files")
    assert(old.count() == 301L,
      "the pinned box answers from v1's content alone")
    assert(cur.count() == 1501L)
  }

  test("tag idempotence: a replayed tagged publish returns the landed " +
      "version without minting a new one") {
    val r = root()
    val v = ClusteredStore.publishClustered(grid, r, Seq("x"), nFiles = 4,
      tag = Some("epoch-1"))
    val v2 = ClusteredStore.publishClustered(grid, r, Seq("x"), nFiles = 4,
      tag = Some("epoch-1"))
    assert(v == v2 && SnapshotStore.currentVersion(r) == v)
  }

  test("refusals: unclustered version, non-cluster box column, " +
      "bucketed root") {
    val r = root()
    SnapshotStore.publish(grid, r) // v1: plain, no sidecar
    val e1 = intercept[IllegalStateException] {
      ClusteredStore.readBox(spark, r, Seq(("x", 0L, 10L)))
    }
    assert(e1.getMessage.contains("no cluster sidecar"))
    val r2 = root()
    ClusteredStore.publishClustered(grid, r2, Seq("x"), nFiles = 4)
    intercept[IllegalArgumentException] {
      ClusteredStore.readBox(spark, r2, Seq(("y", 0L, 10L)))
    }
    val r3 = root()
    SnapshotStore.publishBucketed(grid, r3, "id", 4)
    intercept[IllegalArgumentException] {
      ClusteredStore.publishClustered(grid, r3, Seq("x"), nFiles = 4)
    }
  }

  test("appendClustered: batch clustered within itself, base hardlinked " +
      "with envelopes carried, box exact over both, readSince delta == " +
      "the batch, tag replays as a no-op") {
    val r = root()
    val a = grid.filter(col("id") < 1000L)
    val b = grid.filter(col("id") >= 1000L)
    ClusteredStore.publishClustered(a, r, Seq("x", "y"), nFiles = 8)
    val v1Files = SnapshotStore.versionFileInodes(r, 1L)
    val v2 = ClusteredStore.appendClustered(b, r, nFiles = 8,
      tag = Some("batch-1"))
    assert(v2 == 2L)
    // replayed tagged append: no new version
    assert(ClusteredStore.appendClustered(b, r, nFiles = 8,
      tag = Some("batch-1")) == 2L)
    assert(SnapshotStore.currentVersion(r) == 2L)
    // base files carried by hardlink, names and inodes intact
    val v2Files = SnapshotStore.versionFileInodes(r, 2L)
    assert(v1Files.nonEmpty && v1Files.forall {
      case (rel, ino) => v2Files.get(rel).contains(ino) })
    // box over the appended version: exact and pruned
    val (df, read, total) = ClusteredStore.readBox(spark, r,
      Seq(("x", 100L, 300L)))
    assert(total == 16 && read < total)
    val expected = grid.filter(col("x").between(100L, 300L))
    assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty)
    // incremental consumer: the file diff is exactly the appended rows
    val delta = SnapshotStore.readSince(spark, r, 1L, 2L).get
    assert(delta.exceptAll(b).isEmpty && b.exceptAll(delta).isEmpty)
    // refusals: schema drift and an unclustered base
    intercept[IllegalArgumentException] {
      ClusteredStore.appendClustered(
        b.withColumnRenamed("grp", "zzz"), r, nFiles = 4)
    }
    val r2 = root()
    SnapshotStore.publish(grid, r2)
    intercept[IllegalStateException] {
      ClusteredStore.appendClustered(b, r2, nFiles = 4)
    }
  }

  test("compactClustered: one global z-run replaces the append pile — " +
      "content-neutral, sidecar rebuilt to one line per file, pruning " +
      "restored, time travel intact, readSince refuses across it, " +
      "replay and already-compact calls are no-ops") {
    val r = root()
    val thirds = (0 until 3).map(i => grid.filter(col("id") % 3 === i))
    ClusteredStore.publishClustered(thirds(0), r, Seq("x", "y"), nFiles = 8)
    ClusteredStore.appendClustered(thirds(1), r, nFiles = 8) // v2
    ClusteredStore.appendClustered(thirds(2), r, nFiles = 8) // v3
    val box = Seq(("x", 100L, 300L), ("y", 0L, 500L))
    val (pre, readPre, totalPre) = ClusteredStore.readBox(spark, r, box)
    val preRows = pre.collect().map(_.toString).sorted.toSeq
    assert(totalPre == 24)
    val v4 = ClusteredStore.compactClustered(spark, r, nFiles = 8,
      tag = Some("compact-1"))
    assert(v4 == 4L)
    // replayed tag AND already-compact both no-op at v4
    assert(ClusteredStore.compactClustered(spark, r, nFiles = 8,
      tag = Some("compact-1")) == 4L)
    assert(ClusteredStore.compactClustered(spark, r, nFiles = 8) == 4L)
    assert(SnapshotStore.currentVersion(r) == 4L)
    // content-neutral: the same box reads the same rows, now from ONE
    // 8-file z-run with a rebuilt one-line-per-file sidecar
    val (post, readPost, totalPost) = ClusteredStore.readBox(spark, r, box)
    assert(post.collect().map(_.toString).sorted.toSeq == preRows)
    assert(totalPost == 8 && readPost < totalPost,
      s"compacted box must prune: read $readPost of $totalPost")
    val sidecarLines = new String(Files.readAllBytes(
      Paths.get(r, "v4", "_GRAFT_CLUSTER")), StandardCharsets.UTF_8)
      .split("\n")
    assert(sidecarLines.length == 1 + 8,
      "sidecar must shrink to header + one line per compacted file")
    // full-content neutrality (not just the box)
    val full = SnapshotStore.read(spark, r, 4L)
    assert(full.exceptAll(grid).isEmpty && grid.exceptAll(full).isEmpty)
    // time travel: the pre-compact version still serves its own box
    val (old, _, totOld) = ClusteredStore.readBox(spark, r, box,
      version = 3L)
    assert(totOld == 24 &&
      old.collect().map(_.toString).sorted.toSeq == preRows)
    // lineage: the compact is a rewrite — a file diff across it is not
    // a row delta, so the incremental consumer refuses loudly
    val e = intercept[IllegalStateException] {
      SnapshotStore.readSince(spark, r, 2L, 4L)
    }
    assert(e.getMessage.contains("rewrite"))
    // and appends COMPOSE after the compact (fresh hardlink base)
    assert(ClusteredStore.appendClustered(thirds(0), r, nFiles = 4) == 5L)
    assert(SnapshotStore.read(spark, r, 5L).count() == grid.count() +
      thirds(0).count())
  }

  test("trimBelow: expired whole files drop metadata-only, files above " +
      "carry by hardlink, only straddlers are read and rewritten, " +
      "content == filter, empty expiry stays readable") {
    val r = root()
    ClusteredStore.publishClustered(grid.filter(col("id") < 1000L), r,
      Seq("x", "y"), nFiles = 8) // run A: x 0..999
    ClusteredStore.appendClustered(grid.filter(col("id") >= 1000L), r,
      nFiles = 8) // run B: x 1000..1999
    val v2Inodes = SnapshotStore.versionFileInodes(r, 2L)
    // cutoff exactly between the runs: A drops whole (max 999 < 1000),
    // B carries whole (min 1000), NOTHING is read or rewritten
    val v3 = ClusteredStore.trimBelow(spark, r, "x", 1000L, nFiles = 8,
      tag = Some("trim-1"))
    assert(v3 == 3L)
    assert(ClusteredStore.trimBelow(spark, r, "x", 1000L, nFiles = 8,
      tag = Some("trim-1")) == 3L, "tag replay no-ops")
    val v3Inodes = SnapshotStore.versionFileInodes(r, 3L)
    assert(v3Inodes.size == 8, s"run B's 8 files survive: ${v3Inodes.size}")
    assert(v3Inodes.forall { case (rel, ino) =>
      v2Inodes.get(rel).contains(ino) },
      "survivors must carry by hardlink — a trim above them is metadata-only")
    val expect3 = grid.filter(col("x") >= 1000L)
    val got3 = SnapshotStore.read(spark, r, 3L)
    assert(got3.exceptAll(expect3).isEmpty && expect3.exceptAll(got3).isEmpty)
    // time travel: the pre-trim version still serves everything
    assert(SnapshotStore.read(spark, r, 2L).count() == 2000L)
    // lineage: a trim deletes rows — readSince refuses across it
    intercept[IllegalStateException] {
      SnapshotStore.readSince(spark, r, 2L, 3L)
    }
    // straddling cutoff: only the straddlers are rewritten
    val v4 = ClusteredStore.trimBelow(spark, r, "x", 1500L, nFiles = 4)
    assert(v4 == 4L)
    val v4Inodes = SnapshotStore.versionFileInodes(r, 4L)
    val reused = v4Inodes.keySet.intersect(v3Inodes.keySet)
    val fresh = v4Inodes.keySet -- v3Inodes.keySet
    assert(reused.forall(rel => v4Inodes(rel) == v3Inodes(rel)))
    assert(fresh.size <= 4, s"only straddlers re-z-run: $fresh")
    val expect4 = grid.filter(col("x") >= 1500L)
    val got4 = SnapshotStore.read(spark, r, 4L)
    assert(got4.exceptAll(expect4).isEmpty && expect4.exceptAll(got4).isEmpty)
    // a box read over the trimmed layout still prunes and stays exact.
    // Box on y: run B's x span (1000..1999) scales to 10 bits vs y's 11,
    // so at 4 surviving files the z-cuts are y-dominant — x contributes
    // one splitting bit and can't prune at this granularity, y can.
    val (box, readN, totalN) = ClusteredStore.readBox(spark, r,
      Seq(("y", 0L, 400L)))
    val expectBox = grid.filter(col("x") >= 1500L && col("y") <= 400L)
    assert(readN < totalN, s"y-box must prune: read $readN of $totalN")
    assert(box.exceptAll(expectBox).isEmpty &&
      expectBox.exceptAll(box).isEmpty)
    // nothing below the cutoff: no-op at the current version
    assert(ClusteredStore.trimBelow(spark, r, "x", 0L, nFiles = 4) == 4L)
    // full expiry: a zero-row version is minted and stays readable
    val v5 = ClusteredStore.trimBelow(spark, r, "x", 999999L, nFiles = 4)
    assert(v5 == 5L && SnapshotStore.read(spark, r, 5L).count() == 0L)
    // refusal: a non-cluster column has no envelopes to classify by
    intercept[IllegalArgumentException] {
      ClusteredStore.trimBelow(spark, r, "grp", 1L, nFiles = 4)
    }
  }

  test("maybeCompactClustered: no-op at or below the append-run budget, " +
      "compacts once past it, census restarts after the rewrite") {
    val r = root()
    val quarters = (0 until 4).map(i => grid.filter(col("id") % 4 === i))
    ClusteredStore.publishClustered(quarters(0), r, Seq("x"), nFiles = 4)
    ClusteredStore.appendClustered(quarters(1), r, nFiles = 4) // v2, 1 run
    assert(ClusteredStore.maybeCompactClustered(spark, r,
      maxAppendRuns = 2, nFiles = 8) == 2L, "1 run <= budget: no-op")
    ClusteredStore.appendClustered(quarters(2), r, nFiles = 4) // v3, 2 runs
    assert(ClusteredStore.maybeCompactClustered(spark, r,
      maxAppendRuns = 2, nFiles = 8) == 3L, "2 runs <= budget: no-op")
    ClusteredStore.appendClustered(quarters(3), r, nFiles = 4) // v4, 3 runs
    val v5 = ClusteredStore.maybeCompactClustered(spark, r,
      maxAppendRuns = 2, nFiles = 8)
    assert(v5 == 5L, "3 runs > budget: the policy must compact")
    assert(SnapshotStore.versionKind(r, 5L).contains("rewrite"))
    assert(SnapshotStore.read(spark, r).count() == grid.count())
    // the rewrite resets the census: the next call is a no-op again
    assert(ClusteredStore.maybeCompactClustered(spark, r,
      maxAppendRuns = 2, nFiles = 8) == 5L)
  }

  test("compactClustered: refuses unclustered roots, no-ops on a " +
      "freshly published (single-z-run) store") {
    val r = root()
    SnapshotStore.publish(grid, r)
    intercept[IllegalStateException] {
      ClusteredStore.compactClustered(spark, r, nFiles = 4)
    }
    val r2 = root()
    ClusteredStore.publishClustered(grid, r2, Seq("x"), nFiles = 4)
    assert(ClusteredStore.compactClustered(spark, r2, nFiles = 4) == 1L,
      "a bootstrap publish is already one global z-run")
  }

  test("appendClustered: a same-named column with a DRIFTED TYPE is " +
      "refused — name-only validation would coerce the hardlinked base " +
      "files under the batch's schema on every later read") {
    val r = root()
    ClusteredStore.publishClustered(grid, r, Seq("x", "y"), nFiles = 4)
    val drifted = grid.withColumn("grp", lit(7L)) // string -> bigint
    val e = intercept[IllegalArgumentException] {
      ClusteredStore.appendClustered(drifted, r, nFiles = 4)
    }
    assert(e.getMessage.contains("grp"), s"got: ${e.getMessage}")
    assert(SnapshotStore.currentVersion(r) == 1L, "nothing minted")
  }

  test("empty batches: append no-ops at the current version, publish " +
      "no-ops on an existing store and refuses an empty bootstrap") {
    val r = root()
    ClusteredStore.publishClustered(grid, r, Seq("x"), nFiles = 4) // v1
    assert(ClusteredStore.appendClustered(
      grid.filter(lit(false)), r, nFiles = 4) == 1L)
    assert(ClusteredStore.publishClustered(
      grid.filter(lit(false)), r, Seq("x"), nFiles = 4) == 1L)
    assert(SnapshotStore.currentVersion(r) == 1L, "empty mints no version")
    val r2 = root()
    intercept[IllegalArgumentException] {
      ClusteredStore.publishClustered(grid.filter(lit(false)), r2,
        Seq("x"), nFiles = 4)
    }
  }

  test("INT cluster columns satisfy the BIGINT-castable contract end to " +
      "end: publish derives the sidecar and the box read prunes") {
    val r = root()
    val ints = grid.select(col("id"),
      col("x").cast("int").as("x"), col("y").cast("int").as("y"), col("grp"))
    ClusteredStore.publishClustered(ints, r, Seq("x", "y"), nFiles = 8)
    val (df, read, total) = ClusteredStore.readBox(spark, r,
      Seq(("x", 100L, 300L)))
    assert(total == 8 && read < total)
    assert(df.count() == 201L)
  }

  test("fail-safe: a sidecar missing a file's envelope reads that file " +
      "unpruned — rows stay exact") {
    val r = root()
    ClusteredStore.publishClustered(grid, r, Seq("x"), nFiles = 8)
    val v = SnapshotStore.currentVersion(r)
    val cf = Paths.get(r, s"v$v", "_GRAFT_CLUSTER")
    val lines = new String(Files.readAllBytes(cf), StandardCharsets.UTF_8)
      .split("\n")
    // drop one file's envelope line (keep header + the rest)
    Files.write(cf, (lines.head +: lines.drop(2))
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    val (df, read, total) = ClusteredStore.readBox(spark, r,
      Seq(("x", 1900L, 1999L)))
    val expected = grid.filter(col("x").between(1900L, 1999L))
    assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty,
      "a damaged sidecar must never change the result")
    assert(read >= 1 && read <= total)
  }

  test("countBox: exact on every box shape, interior files counted from " +
      "the sidecar unopened, whole-domain count reads zero files") {
    val r = root()
    ClusteredStore.publishClustered(grid, r, Seq("x", "y"), nFiles = 16)
    // whole domain: every envelope is inside -> fully metadata-served
    val (nAll, readAll, totAll) = ClusteredStore.countBox(spark, r,
      Seq(("x", 0L, 1999L)))
    assert(nAll == 2000L && readAll == 0 && totAll == 16)
    // a narrow band: exact AND only edge files opened
    for (box <- Seq(Seq(("x", 100L, 900L)),
        Seq(("x", 100L, 900L), ("y", 0L, 500L)),
        Seq(("y", 1990L, 1999L)))) {
      val (n, read, total) = ClusteredStore.countBox(spark, r, box)
      val expected = box.map { case (c, lo, hi) => col(c).between(lo, hi) }
        .reduce(_ && _)
      assert(n == grid.filter(expected).count(), s"wrong count for $box")
      assert(read < total, s"no pruning for $box")
    }
    // disjoint box: zero rows, zero files opened
    val (n0, read0, _) = ClusteredStore.countBox(spark, r,
      Seq(("x", 5000L, 6000L)))
    assert(n0 == 0L && read0 == 0)
  }

  test("countBox: time travel, damaged-sidecar fail-safe, refusals") {
    val r = root()
    ClusteredStore.publishClustered(grid.filter(col("id") < 1000L), r,
      Seq("x"), nFiles = 8)
    ClusteredStore.appendClustered(grid.filter(col("id") >= 1000L), r,
      nFiles = 8)
    // mixed publish+append layout counts exactly; pinned v1 sees only v1
    val (nCur, _, totCur) = ClusteredStore.countBox(spark, r,
      Seq(("x", 0L, 1999L)))
    val (nOld, _, totOld) = ClusteredStore.countBox(spark, r,
      Seq(("x", 0L, 1999L)), version = 1L)
    assert(nCur == 2000L && totCur == 16)
    assert(nOld == 1000L && totOld == 8)
    // damage the sidecar: the unknown file is READ, the count stays exact
    val v = SnapshotStore.currentVersion(r)
    val cf = Paths.get(r, s"v$v", "_GRAFT_CLUSTER")
    val lines = new String(Files.readAllBytes(cf), StandardCharsets.UTF_8)
      .split("\n")
    Files.write(cf, (lines.head +: lines.drop(2))
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    val (nDam, readDam, _) = ClusteredStore.countBox(spark, r,
      Seq(("x", 0L, 1999L)))
    assert(nDam == 2000L, "a damaged sidecar must never change the count")
    assert(readDam >= 1, "the unknown-envelope file must be read")
    // refusals: non-cluster column; unclustered version
    intercept[IllegalArgumentException] {
      ClusteredStore.countBox(spark, r, Seq(("y", 0L, 10L)))
    }
    val plain = root()
    SnapshotStore.publish(grid, plain)
    intercept[IllegalStateException] {
      ClusteredStore.countBox(spark, plain, Seq(("x", 0L, 10L)))
    }
  }

  test("readTopK: exact under boundary ties, pruned for small k, " +
      "k past the table reads everything, ascending symmetric") {
    val r = root()
    // d = id/10 has TEN rows per value: the k-th boundary lands inside
    // a tie group, and every tied row must be in the candidate set
    val dups = grid.withColumn("d", expr("id div 10"))
    ClusteredStore.publishClustered(dups, r, Seq("d"), nFiles = 16)
    def expect(k: Int, asc: Boolean) = {
      val o = if (asc) Seq(col("d").asc, col("id").asc)
        else Seq(col("d").desc, col("id").desc)
      dups.select(col("id"), col("d")).orderBy(o: _*).limit(k)
        .collect().toSeq
    }
    for (k <- Seq(1, 25, 105)) { // 105: straddles a tie group mid-way
      val (cand, read, total) = ClusteredStore.readTopK(spark, r, "d", k)
      assert(cand.select(col("id"), col("d"))
        .orderBy(col("d").desc, col("id").desc).limit(k)
        .collect().toSeq == expect(k, asc = false), s"wrong top-$k")
      assert(read < total, s"no pruning for k=$k ($read/$total)")
      val (candA, readA, totalA) = ClusteredStore.readTopK(spark, r, "d",
        k, descending = false)
      assert(candA.select(col("id"), col("d"))
        .orderBy(col("d").asc, col("id").asc).limit(k)
        .collect().toSeq == expect(k, asc = true), s"wrong bottom-$k")
      assert(readA < totalA)
    }
    // k beyond the table: every row comes back, all files read
    val (all, readAll, totalAll) = ClusteredStore.readTopK(spark, r, "d",
      5000)
    assert(all.count() == 2000L && readAll == totalAll)
    // refusals
    intercept[IllegalArgumentException] {
      ClusteredStore.readTopK(spark, r, "x", 5)
    }
    intercept[IllegalArgumentException] {
      ClusteredStore.readTopK(spark, r, "d", 0)
    }
  }

  test("tableStats: exact count/min/max with zero reads; damaged " +
      "sidecar folds the unknown file back in; zero-file version empty") {
    val r = root()
    ClusteredStore.publishClustered(grid, r, Seq("x", "y"), nFiles = 8)
    val (n, envs, read, total) = ClusteredStore.tableStats(spark, r)
    assert(n == 2000L && read == 0 && total == 8)
    assert(envs("x") == ((0L, 1999L)) && envs("y") == ((0L, 1999L)))
    // damage: drop one envelope line -> that file is READ, stats exact
    val v = SnapshotStore.currentVersion(r)
    val cf = Paths.get(r, s"v$v", "_GRAFT_CLUSTER")
    val lines = new String(Files.readAllBytes(cf), StandardCharsets.UTF_8)
      .split("\n")
    Files.write(cf, (lines.head +: lines.drop(2))
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    val (nD, envsD, readD, _) = ClusteredStore.tableStats(spark, r)
    assert(nD == 2000L && readD == 1 && envsD("x") == ((0L, 1999L)))
    // a fully-expired store: zero files, zero rows, empty envelopes
    val r2 = root()
    ClusteredStore.publishClustered(grid, r2, Seq("x"), nFiles = 4)
    val vT = ClusteredStore.trimBelow(spark, r2, "x", 5000L, nFiles = 4)
    val (n2, envs2, _, total2) = ClusteredStore.tableStats(spark, r2,
      version = vT)
    assert(n2 == 0L && envs2.isEmpty && total2 == 0)
  }

  test("readTopK: a damaged sidecar reads the unknown file first — " +
      "result stays exact") {
    val r = root()
    ClusteredStore.publishClustered(grid, r, Seq("x"), nFiles = 8)
    val v = SnapshotStore.currentVersion(r)
    val cf = Paths.get(r, s"v$v", "_GRAFT_CLUSTER")
    val lines = new String(Files.readAllBytes(cf), StandardCharsets.UTF_8)
      .split("\n")
    Files.write(cf, (lines.head +: lines.drop(2))
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    val (cand, read, _) = ClusteredStore.readTopK(spark, r, "x", 10)
    assert(cand.orderBy(col("x").desc).limit(10)
      .collect().map(_.getLong(0)).toSeq ==
      (1999L to 1990L by -1L).toSeq,
      "a damaged sidecar must never change the top-k")
    assert(read >= 1)
  }
}
