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
}
