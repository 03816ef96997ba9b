package graft.engine.sources

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** Randomized-interleaving concurrency property spec (VERDICT r17 item
  * 3): r15–r17 each found one more store race by serial review
  * (IncrementalAgg lost update, compactCodes CAS hole, tagged-fold
  * replay window, recovery ordering, rebucket mis-prune). This spec
  * replaces review-luck with a seeded random schedule: several threads
  * storm ONE bucketed store with publish/merge/append/deleteKeys/
  * rebucket/vacuum/read, then the whole history is checked against the
  * store's own serial order — the version chain. It works: the codes
  * storm below caught compactCodes' read-to-CAS gap (a live
  * lost-update) on its first run — see [[graft.engine.llm.AnnIndex
  * .compactCodes]] and SCALE.md §"Store concurrency model".
  *
  * THE INVARIANT (SCALE.md §concurrency): every committed write claims
  * exactly one version, and replaying the committed effects in VERSION
  * ORDER from the base state reproduces (a) the content of every
  * version a mid-storm read observed and (b) the final content. That is
  * serializability with the version chain as the serial order — lost
  * updates, double-applies, and torn reads all surface as a replay
  * mismatch. Threads write PRIVATE key ranges so each op's effect is a
  * pure function of its arguments (the check needs no cross-thread
  * value arbitration); the CONTENTION is real — every op races the same
  * version pointer, flip lock, tag table, and bucket layout.
  *
  * Allowed op outcomes besides commit: StalePublishException (the one
  * retryable condition — retried with recompute, the appendContended
  * discipline) and rebucket's explicit no-op refusal when a rival
  * already flipped the layout. Anything else fails the seed.
  *
  * Seeds: `SPARK_GRAFT_RACE_SEEDS` (default 25) seeds per suite run;
  * the r18 evidence run was 100 seeds green (SCALE.md records it).
  * Each seed uses its own store root, 3 writer threads, 3 ops each. */
class SnapshotStoreRaceSpec extends AnyFunSuite {
  import spark.implicits._

  private val nSeeds =
    sys.env.getOrElse("SPARK_GRAFT_RACE_SEEDS", "25").toInt

  /** A committed write's content effect, replayable in version order. */
  sealed private trait Effect
  private case class Add(rows: Map[Long, Long]) extends Effect
  private case class Upsert(key: Long, value: Long) extends Effect
  private case class Del(key: Long) extends Effect
  private case object LayoutOnly extends Effect
  // clustered retention trim: drops every key below the cutoff. A no-op
  // trim (nothing below) returns the CURRENT version like LayoutOnly,
  // and its replay filter is the identity on that state — commutes with
  // the >=1000 private-key appends at any tie order.
  private case class TrimKeysBelow(cutoff: Long) extends Effect

  private def digest(m: Map[Long, Long]): String =
    m.toSeq.sorted.mkString(";")

  private def contentAt(root: String, v: Long): Map[Long, Long] =
    SnapshotStore.read(spark, root, v).drop("_bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def storm(seed: Int): Unit = {
    val root = s"${System.getProperty("java.io.tmpdir")}/" +
      s"race_spec_${ProcessHandle.current().pid()}_$seed/tbl"
    SnapshotStore.deleteRecursively(
      java.nio.file.Paths.get(root).getParent)
    val base = (0L until 8L).map(k => (k, k)).toMap
    SnapshotStore.publishBucketed(base.toSeq.toDF("k", "v"), root, "k",
      nBuckets = 4) // v1
    val committed = new ConcurrentLinkedQueue[(Long, Effect)]()
    val reads = new ConcurrentLinkedQueue[(Long, String)]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val nThreads = 3
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nThreads)

    def retrying(what: String)(op: => Long): Long = {
      var attempts = 0
      while (true) {
        try return op
        catch {
          case _: StalePublishException if attempts < 8 => attempts += 1
        }
      }
      -1L // unreachable
    }

    (0 until nThreads).foreach { tid =>
      pool.execute { () =>
        val rnd = new scala.util.Random(seed * 1000 + tid)
        val myKeys = scala.collection.mutable.ArrayBuffer.empty[Long]
        start.await()
        try {
          (0 until 3).foreach { i =>
            Thread.sleep(rnd.nextInt(15).toLong)
            rnd.nextInt(6) match {
              case 0 | 1 => // tagged append of a fresh private key
                val k = 1000L * (tid + 1) + i
                val rows = Map(k -> rnd.nextLong(1000L))
                val v = retrying("append")(SnapshotStore.appendContended(
                  () => rows.toSeq.toDF("k", "v"), root,
                  tag = Some(s"s$seed-t$tid-a$i")))
                myKeys += k
                committed.add(v -> Add(rows))
              case 2 => // upsert of this thread's base key
                val k = tid.toLong // base keys 0..7, one per thread
                val value = 10000L * (tid + 1) + i
                val v = retrying("merge")(SnapshotStore.merge(
                  Seq((k, value)).toDF("k", "v"), root,
                  keysAreDistinct = true))
                committed.add(v -> Upsert(k, value))
              case 3 if myKeys.nonEmpty => // delete an own appended key
                val k = myKeys.remove(0)
                val v = retrying("delete")(
                  SnapshotStore.deleteKeys(Seq(k).toDF("k"), root))
                committed.add(v -> Del(k))
              case 4 => // layout flip 4 <-> 8 (recomputed per retry)
                try {
                  val v = retrying("rebucket") {
                    val cur = SnapshotStore.readBucketSpec(root).get._2
                    SnapshotStore.rebucket(spark, root,
                      if (cur == 4) 8 else 4)
                  }
                  committed.add(v -> LayoutOnly)
                } catch {
                  // a rival flipped to our target first: explicit no-op
                  case e: IllegalArgumentException
                    if e.getMessage.contains("no-op") => ()
                }
              case _ => // read: pin a version, digest its content
                // keep > max possible writes (9): the storm's vacuum
                // exercises the reaper's locking and scan without ever
                // reaping a version a concurrent pinned read holds
                SnapshotStore.vacuum(root, keep = 12)
                val v = SnapshotStore.currentVersion(root)
                reads.add(v -> digest(contentAt(root, v)))
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS),
      s"seed $seed: storm deadlocked")
    import scala.jdk.CollectionConverters._
    assert(failures.isEmpty,
      s"seed $seed: unexpected failures: " +
        failures.asScala.map(_.toString).mkString(" | "))
    val effects = committed.asScala.toSeq
    // 1. every committed write claimed a DISTINCT version (two ops
    //    sharing one version number = a lost update by construction)
    val dupes = effects.groupBy(_._1).filter(_._2.size > 1)
    assert(dupes.isEmpty, s"seed $seed: version collisions: $dupes")
    // 2. replay the committed effects in VERSION ORDER from the base:
    //    the fold must explain the final content...
    def replayTo(v: Long): Map[Long, Long] =
      effects.filter(_._1 <= v).sortBy(_._1)
        .foldLeft(base) { case (st, (_, e)) => e match {
          case Add(rows) => st ++ rows
          case Upsert(k, value) => st + (k -> value)
          case Del(k) => st - k
          case LayoutOnly => st
        }}
    val cur = SnapshotStore.currentVersion(root)
    assert(contentAt(root, cur) == replayTo(cur),
      s"seed $seed: final content is not explained by the version-order " +
        "replay of committed effects")
    // 3. ...and the content every mid-storm read observed
    reads.asScala.foreach { case (v, d) =>
      assert(d == digest(replayTo(v)),
        s"seed $seed: the read at v$v observed content no serial order " +
          "explains")
    }
    // 4. surviving versions are internally consistent (manifest == disk)
    (1L to cur).foreach { v =>
      if (java.nio.file.Files.exists(
          java.nio.file.Paths.get(root, s"v$v"))) {
        val (missing, unknown) = SnapshotStore.auditVersion(root, v)
        assert(missing.isEmpty && unknown.isEmpty,
          s"seed $seed: v$v manifest drift: missing=$missing unknown=$unknown")
      }
    }
  }

  test(s"randomized interleavings: $nSeeds seeded storms, every " +
      "committed read explained by the version-order serial replay") {
    (1 to nSeeds).foreach(storm)
  }

  /** The cursor-fold protocol under live interleaving — the machinery
    * the r17 ADVICE items hardened (consumer-scoped fold tags + the
    * destination vacuum pin). TWO consumers fold from TWO sources into
    * ONE shared destination with the SAME prefix, while publishers keep
    * advancing both sources and a vacuum storms the destination; each
    * consumer "crashes" (skips its cursor advance) on a seeded subset of
    * ticks, so recovery must reconstruct the cursor from its OWN fold
    * tags only. Invariant: when everything drains, the destination holds
    * every source row EXACTLY once — a cross-advanced cursor shows as
    * loss, a replayed fold as duplication, a reaped fold tag as either. */
  private def foldStorm(seed: Int): Unit = {
    val dirBase = s"${System.getProperty("java.io.tmpdir")}/" +
      s"race_fold_${ProcessHandle.current().pid()}_$seed"
    SnapshotStore.deleteRecursively(java.nio.file.Paths.get(dirBase))
    val srcs = Seq(s"$dirBase/src0/tbl", s"$dirBase/src1/tbl")
    val dst = s"$dirBase/dst/tbl"
    srcs.zipWithIndex.foreach { case (s, i) =>
      SnapshotStore.publishBucketed(
        Seq((10000L * (i + 1), 0L)).toDF("k", "v"), s, "k", 2)
    }
    SnapshotStore.publishBucketed(
      Seq((99999L, 0L)).toDF("k", "v"), dst, "k", 2)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    // publishers: 4 appends per source, fresh keys
    srcs.zipWithIndex.foreach { case (s, i) =>
      pool.execute { () =>
        val rnd = new scala.util.Random(seed * 7919 + i)
        start.await()
        try (1 to 4).foreach { j =>
          Thread.sleep(rnd.nextInt(20).toLong)
          SnapshotStore.append(
            Seq((10000L * (i + 1) + j, j.toLong)).toDF("k", "v"), s,
            tag = Some(s"pub-$i-$j"))
        } catch { case t: Throwable => failures.add(t) }
      }
    }
    // consumers: sync ticks with seeded crash-before-cursor-advance
    srcs.zipWithIndex.foreach { case (s, i) =>
      pool.execute { () =>
        val rnd = new scala.util.Random(seed * 104729 + i)
        val consumer = s"c$i"
        start.await()
        def tick(alwaysAdvance: Boolean): Unit = {
          val cursor = SnapshotStore.recoverTaggedFolds(
            s, consumer, dst, "fold")
          val cv = SnapshotStore.currentVersion(s)
          if (cv > cursor) {
            SnapshotStore.readSince(spark, s, cursor, cv).foreach { delta =>
              var done = false
              while (!done) {
                try {
                  SnapshotStore.append(
                    delta.select(col("k"), col("v")), dst,
                    tag = Some(SnapshotStore.foldTag("fold", consumer, cv)))
                  done = true
                } catch { case _: StalePublishException => () }
              }
            }
            // seeded crash: the fold landed, the cursor never advances —
            // the NEXT tick's recovery must close the window
            if (alwaysAdvance || rnd.nextBoolean())
              SnapshotStore.setConsumedThrough(s, consumer, cv)
          }
          // destination vacuum storms the fold evidence: the pin
          // registered by recovery must floor it
          SnapshotStore.vacuum(dst, keep = 1)
        }
        try {
          (1 to 4).foreach { _ =>
            Thread.sleep(rnd.nextInt(25).toLong)
            tick(alwaysAdvance = false)
          }
        } catch { case t: Throwable => failures.add(t) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS),
      s"fold seed $seed: storm deadlocked")
    import scala.jdk.CollectionConverters._
    assert(failures.isEmpty,
      s"fold seed $seed: " + failures.asScala.map(_.toString).mkString(" | "))
    // drain: one final clean tick per consumer (recovery first)
    srcs.zipWithIndex.foreach { case (s, i) =>
      val consumer = s"c$i"
      val cursor = SnapshotStore.recoverTaggedFolds(s, consumer, dst, "fold")
      val cv = SnapshotStore.currentVersion(s)
      if (cv > cursor) {
        SnapshotStore.readSince(spark, s, cursor, cv).foreach { delta =>
          SnapshotStore.append(delta.select(col("k"), col("v")), dst,
            tag = Some(SnapshotStore.foldTag("fold", consumer, cv)))
        }
        SnapshotStore.setConsumedThrough(s, consumer, cv)
      }
    }
    // exactly-once: dst == union of both sources (plus its own seed row)
    val got = SnapshotStore.read(spark, dst).drop("_bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = ((99999L, 0L) +: srcs.indices.flatMap(i =>
      (0 to 4).map(j => (10000L * (i + 1) + j, j.toLong)))).sorted
    assert(got == want,
      s"fold seed $seed: destination is not exactly-once: got $got")
  }

  test(s"concurrent tagged-fold syncs: ${math.max(5, nSeeds / 5)} seeded " +
      "storms — two consumers, one destination, crash-replay injected, " +
      "destination exactly-once") {
    (1 to math.max(5, nSeeds / 5)).foreach(foldStorm)
  }

  /** The ANN codes-store lifecycle under interleaving — the
    * compactCodes CAS class (r17's review-found lost-update shape
    * applied to whole-store rewrites), randomized. Threads storm one
    * published code store with tagged appendCodes batches, deleteCodes
    * tombstones of their own earlier appends, compactCodes rewrites,
    * and pinned live reads; the replay invariant is over the LIVE nid
    * set (append adds, tombstone removes, compact is content-neutral).
    * A compact that swallowed a concurrent append (the CAS hole) reads
    * as loss; a tombstone dropped by a racing compact reads as
    * resurrection. */
  private def codesStorm(seed: Int): Unit = {
    import graft.engine.llm.{AnnIndex, Similarity}
    val dirBase = s"${System.getProperty("java.io.tmpdir")}/" +
      s"race_codes_${ProcessHandle.current().pid()}_$seed"
    SnapshotStore.deleteRecursively(java.nio.file.Paths.get(dirBase))
    val root = s"$dirBase/codes"
    def vecs(ids: Seq[Long]) = ids.map { id =>
      val rnd = new java.util.Random(id * 2654435761L)
      (id, Array.fill(8)((rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val baseIds = (0L until 16L)
    val corpus = vecs(baseIds)
    val cents = Similarity.ivfCentroids(corpus, nlist = 2, iters = 1)
    val books = Similarity.pqTrain(corpus, m = 2, k = 4)
    AnnIndex.publishCodes(corpus, root, cents, books, nBuckets = 2) // v1
    val committed = new ConcurrentLinkedQueue[(Long, Effect)]()
    val reads = new ConcurrentLinkedQueue[(Long, String)]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val pool = Executors.newFixedThreadPool(3)
    val start = new CountDownLatch(1)
    def retrying(op: => Long): Long = {
      var attempts = 0
      while (true) {
        try return op
        catch {
          case _: StalePublishException if attempts < 8 => attempts += 1
        }
      }
      -1L
    }
    (0 until 3).foreach { tid =>
      pool.execute { () =>
        val rnd = new scala.util.Random(seed * 31337 + tid)
        val mine = scala.collection.mutable.ArrayBuffer.empty[Long]
        start.await()
        try {
          (0 until 3).foreach { i =>
            Thread.sleep(rnd.nextInt(15).toLong)
            rnd.nextInt(5) match {
              case 0 | 1 => // tagged ingest batch of 2 fresh private nids
                val ids = Seq(1000L * (tid + 1) + 2 * i,
                  1000L * (tid + 1) + 2 * i + 1)
                val v = retrying(AnnIndex.appendCodes(vecs(ids), root,
                  cents, books, tag = Some(s"codes-s$seed-t$tid-a$i")))
                mine ++= ids
                committed.add(v -> Add(ids.map(_ -> 0L).toMap))
              case 2 if mine.nonEmpty => // tombstone an own earlier nid
                val victim = mine.remove(0)
                val v = retrying(AnnIndex.deleteCodes(
                  Seq(victim).toDF("nid"), root))
                committed.add(v -> Del(victim))
              case 3 => // CAS compaction rewrite
                val v = retrying(AnnIndex.compactCodes(spark, root))
                committed.add(v -> LayoutOnly)
              case _ => // pinned live read
                val v = SnapshotStore.currentVersion(root)
                val nids = AnnIndex.readCodesLive(spark, root, v)
                  .select("nid").collect().map(_.getLong(0)).sorted
                reads.add(v -> nids.mkString(";"))
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS),
      s"codes seed $seed: storm deadlocked")
    import scala.jdk.CollectionConverters._
    assert(failures.isEmpty,
      s"codes seed $seed: " + failures.asScala.map(_.toString)
        .mkString(" | "))
    val effects = committed.asScala.toSeq
    val dupes = effects.groupBy(_._1).filter(_._2.size > 1)
    assert(dupes.isEmpty, s"codes seed $seed: version collisions: $dupes")
    def liveAt(v: Long): Seq[Long] =
      effects.filter(_._1 <= v).sortBy(_._1)
        .foldLeft(baseIds.toSet) { case (st, (_, e)) => e match {
          case Add(rows) => st ++ rows.keys
          case Del(k) => st - k
          case _ => st
        }}.toSeq.sorted
    val cur = SnapshotStore.currentVersion(root)
    val finalLive = AnnIndex.readCodesLive(spark, root)
      .select("nid").collect().map(_.getLong(0)).sorted.toSeq
    assert(finalLive == liveAt(cur),
      s"codes seed $seed: final live set not explained by version-order " +
        s"replay: got $finalLive want ${liveAt(cur)}")
    reads.asScala.foreach { case (v, d) =>
      assert(d == liveAt(v).mkString(";"),
        s"codes seed $seed: live read at v$v observed a set no serial " +
          "order explains")
    }
  }

  test(s"concurrent ANN code-store lifecycle: ${math.max(5, nSeeds / 5)} " +
      "seeded storms — ingest/tombstone/CAS-compact/live-read, live set " +
      "version-order explained") {
    (1 to math.max(5, nSeeds / 5)).foreach(codesStorm)
  }

  /** The CLUSTERED writers under interleaving (r18 VERDICT item 4):
    * publishClustered/appendClustered/compactClustered bypass the
    * bucketed write paths the general storm covers — same commitStaged
    * CAS tail, but their OWN staging discipline (flat z-run staging,
    * hardlink carryover, sidecar assembly). Threads storm one clustered
    * store with tagged appends of private key ranges, CAS compactions,
    * pinned reads, and vacuums. Invariants: the version chain is the
    * serial order (every committed write a distinct version, replay
    * explains final content and every pinned read), and every surviving
    * version's SIDECAR describes exactly its manifest's files — a
    * compact that swallowed a racing append reads as loss; an append
    * whose sidecar merge raced a compact reads as sidecar/manifest
    * drift. */
  private def clusteredStorm(seed: Int): Unit = {
    val root = s"${System.getProperty("java.io.tmpdir")}/" +
      s"race_clustered_${ProcessHandle.current().pid()}_$seed/tbl"
    SnapshotStore.deleteRecursively(
      java.nio.file.Paths.get(root).getParent)
    val base = (0L until 8L).map(k => (k, k)).toMap
    ClusteredStore.publishClustered(base.toSeq.toDF("k", "v"), root,
      Seq("k", "v"), nFiles = 2) // v1
    val committed = new ConcurrentLinkedQueue[(Long, Effect)]()
    val reads = new ConcurrentLinkedQueue[(Long, String)]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val pool = Executors.newFixedThreadPool(3)
    val start = new CountDownLatch(1)
    def retrying(op: => Long): Long = {
      var attempts = 0
      while (true) {
        try return op
        catch {
          case _: StalePublishException if attempts < 8 => attempts += 1
        }
      }
      -1L
    }
    (0 until 3).foreach { tid =>
      pool.execute { () =>
        val rnd = new scala.util.Random(seed * 52711 + tid)
        start.await()
        try {
          (0 until 3).foreach { i =>
            Thread.sleep(rnd.nextInt(15).toLong)
            rnd.nextInt(6) match {
              case 0 | 1 => // tagged clustered append of private keys
                val rows = Map(
                  1000L * (tid + 1) + 2 * i -> rnd.nextLong(1000L),
                  1000L * (tid + 1) + 2 * i + 1 -> rnd.nextLong(1000L))
                val v = retrying(ClusteredStore.appendClustered(
                  rows.toSeq.toDF("k", "v"), root, nFiles = 2,
                  tag = Some(s"z-s$seed-t$tid-a$i")))
                committed.add(v -> Add(rows))
              case 2 => // CAS compaction into one global z-run
                val v = retrying(
                  ClusteredStore.compactClustered(spark, root, nFiles = 2))
                committed.add(v -> LayoutOnly)
              case 3 => // retention trim: kills the base keys (0..7)
                // once; every later trim is a no-op at CURRENT — both
                // paths race the appends and compactions
                val v = retrying(
                  ClusteredStore.trimBelow(spark, root, "k", 500L,
                    nFiles = 2))
                committed.add(v -> TrimKeysBelow(500L))
              case _ => // pinned read + reaper exercise (keep > max writes)
                SnapshotStore.vacuum(root, keep = 12)
                val v = SnapshotStore.currentVersion(root)
                reads.add(v -> digest(contentAt(root, v)))
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS),
      s"clustered seed $seed: storm deadlocked")
    import scala.jdk.CollectionConverters._
    assert(failures.isEmpty,
      s"clustered seed $seed: " +
        failures.asScala.map(_.toString).mkString(" | "))
    val effects = committed.asScala.toSeq
    // compactClustered NO-OPS (current version already one z-run) and
    // no-op trims (nothing below the cutoff) return the current version
    // without minting, so they may legitimately report a version some
    // other op claimed. A version collision is a lost update only when
    // two MINTING content effects (Add) share a version; LayoutOnly is
    // the identity and a tied no-op trim's filter is the identity on
    // its state (appends only write keys >= 1000, the cutoff is 500).
    val dupes = effects.groupBy(_._1).filter { case (_, es) =>
      es.count(_._2.isInstanceOf[Add]) > 1 }
    assert(dupes.isEmpty, s"clustered seed $seed: version collisions: $dupes")
    def replayTo(v: Long): Map[Long, Long] =
      effects.filter(_._1 <= v).sortBy(_._1)
        .foldLeft(base) { case (st, (_, e)) => e match {
          case Add(rows) => st ++ rows
          case TrimKeysBelow(c) => st.filter { case (k, _) => k >= c }
          case LayoutOnly => st
          case _ => st
        }}
    val cur = SnapshotStore.currentVersion(root)
    def clusteredContent(v: Long): Map[Long, Long] =
      SnapshotStore.read(spark, root, v)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusteredContent(cur) == replayTo(cur),
      s"clustered seed $seed: final content is not explained by the " +
        "version-order replay")
    reads.asScala.foreach { case (v, d) =>
      assert(d == digest(replayTo(v)),
        s"clustered seed $seed: the read at v$v observed content no " +
          "serial order explains")
    }
    // a full-range box over CURRENT must equal the content too (the
    // sidecar path agrees with the manifest path)
    val (boxDf, _, _) = ClusteredStore.readBox(spark, root,
      Seq(("k", 0L, 100000L)))
    assert(boxDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        == replayTo(cur),
      s"clustered seed $seed: box read disagrees with the version content")
    // the metadata count path must agree with the content too — after
    // any interleaving of appends/compactions/trims, whole-domain (all
    // sidecar counts, zero files read) and a narrow band (straddlers)
    val (nAll, _, _) = ClusteredStore.countBox(spark, root,
      Seq(("k", 0L, 100000L)))
    assert(nAll == replayTo(cur).size.toLong,
      s"clustered seed $seed: whole-domain countBox $nAll != content " +
        s"${replayTo(cur).size}")
    val (nBand, _, _) = ClusteredStore.countBox(spark, root,
      Seq(("k", 1000L, 2001L)))
    val expectBand = replayTo(cur).keys.count(k => k >= 1000L && k <= 2001L)
    assert(nBand == expectBand.toLong,
      s"clustered seed $seed: band countBox $nBand != content $expectBand")
    // ... and the metadata top-k: the 3 largest keys by (k) must match
    // the replay content's own sort after any interleaving
    val (topCand, _, _) = ClusteredStore.readTopK(spark, root, "k", 3)
    val got = topCand.orderBy(org.apache.spark.sql.functions.col("k").desc)
      .limit(3).collect().map(r => r.getLong(0)).toSeq
    val want = replayTo(cur).keys.toSeq.sorted(Ordering[Long].reverse)
      .take(3)
    assert(got == want,
      s"clustered seed $seed: readTopK $got != replay top $want")
    // every surviving version: manifest == disk AND sidecar describes
    // exactly the manifest's files
    (1L to cur).foreach { v =>
      val dir = java.nio.file.Paths.get(root, s"v$v")
      if (java.nio.file.Files.exists(dir)) {
        val (missing, unknown) = SnapshotStore.auditVersion(root, v)
        assert(missing.isEmpty && unknown.isEmpty,
          s"clustered seed $seed: v$v manifest drift: $missing $unknown")
        val manifest = SnapshotStore.manifestFiles(root, v).get.toSet
        val sidecarFiles = java.nio.file.Files.readAllLines(
          dir.resolve("_GRAFT_CLUSTER")).asScala.drop(1)
          .map(_.split("\t")(0)).toSet
        assert(sidecarFiles == manifest,
          s"clustered seed $seed: v$v sidecar describes $sidecarFiles " +
            s"but the manifest lists $manifest")
      }
    }
  }

  test(s"concurrent clustered-store lifecycle: ${math.max(5, nSeeds / 5)} " +
      "seeded storms — z-append/CAS-compact/box-read/vacuum, content " +
      "version-order explained, sidecar == manifest on every version") {
    (1 to math.max(5, nSeeds / 5)).foreach(clusteredStorm)
  }
}
