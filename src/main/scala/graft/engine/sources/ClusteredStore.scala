package graft.engine.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** [[ZOrder]] clustering THROUGH [[SnapshotStore]] versions (VERDICT r17
  * item 5): until now clustered layout and versioned storage were
  * separate roots, so a store column with range locality (timestamps,
  * doc ids) got no data skipping and a clustered layout got no atomic
  * versions, time travel, tags, or vacuum.
  *
  * [[publishClustered]] writes a version whose data files are contiguous
  * z-ranges over k BIGINT columns, plus a per-version CLUSTER SIDECAR
  * (`_GRAFT_CLUSTER`): the cluster spec and one line of min/max/count
  * per data file — the rebucket-style posture where layout facts ride
  * inside the version directory and become visible atomically with it.
  * [[readBox]] then serves a k-dimensional box predicate over a version
  * reading only the files whose envelopes touch the box.
  *
  * Scale shape (the ZOrder story, now versioned):
  *  - publish = one range-shuffle of the batch (the same one-off cost
  *    class as publishBucketed's hash layout);
  *  - the sidecar is one line per file — at 100 TB with 1 GB files,
  *    ~10⁵ lines, the same order as the store's own manifest and the
  *    driver's FileIndex; box pruning reads the sidecar, never data;
  *  - skipping is an optimization, never a correctness authority: files
  *    the manifest lists but the sidecar does not know are read
  *    UNPRUNED, and the box filter is always re-applied, so the result
  *    is exact even against a damaged sidecar;
  *  - each version's sidecar describes exactly that version's files, so
  *    TIME TRAVEL composes: a box read pinned to v1 prunes and returns
  *    v1's content after any number of later publishes (q148 pins it).
  *
  * A clustered version is otherwise a plain store version: tags, vacuum,
  * diff, rollback all apply. Versions written by other writers carry no
  * sidecar and [[readBox]] refuses them loudly — a silent unpruned scan
  * at 100 TB is the failure mode this integration exists to kill. */
object ClusteredStore {

  private val ClusterFile = "_GRAFT_CLUSTER"

  /** Publish `df` as a new z-clustered version of the store at `root`.
    * `clusterCols` must be BIGINT-castable and non-null (ZOrder's
    * contract); `nFiles` sets the skipping granularity (files are
    * equi-count in z space). Same `tag` replay protection as every
    * other store writer. */
  def publishClustered(df: DataFrame, root: String,
      clusterCols: Seq[String], nFiles: Int, bits: Int = 16,
      tag: Option[String] = None): Long = {
    require(nFiles >= 1, "nFiles must be positive")
    require(clusterCols.nonEmpty, "need at least one cluster column")
    clusterCols.foreach(c => require(df.columns.contains(c),
      s"missing cluster column $c"))
    require(SnapshotStore.readBucketSpec(root).isEmpty,
      s"$root is a bucketed store (hash layout); a clustered publish " +
        "would strip the _bucket layout and wedge incremental writers — " +
        "use a separate root for the clustered copy")
    val alreadyApplied = SnapshotStore.taggedVersion(root, tag)
    if (alreadyApplied.isDefined) return alreadyApplied.get
    val spark = df.sparkSession
    val staging = Paths.get(root,
      s".staging-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    val z = ZOrder.zExpr(df, clusterCols, bits)
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.ErrorIfExists).parquet(staging.toString)
    // per-file envelopes from the staged files THEMSELVES (they can
    // never disagree with the data); file names are write-unique, so
    // the relative name survives the atomic staging -> vN rename.
    // Driver-side rows = nFiles — bounded by the publish's own
    // granularity choice, metadata-scale by construction.
    val stats = spark.read.parquet(staging.toString)
      .groupBy(element_at(split(col("_metadata.file_path"), "/"), -1)
        .as("file"))
      .agg(ZOrder.statExprs(clusterCols).head,
        ZOrder.statExprs(clusterCols).tail: _*)
      .collect()
    val header = s"cols=${clusterCols.mkString(",")};bits=$bits"
    val lines = stats.map { r =>
      val file = r.getString(0)
      val envs = clusterCols.indices.flatMap(i =>
        Seq(r.getLong(1 + 2 * i), r.getLong(2 + 2 * i)))
      val n = r.getLong(1 + 2 * clusterCols.length)
      (file +: envs :+ n).mkString("\t")
    }
    Files.write(staging.resolve(ClusterFile),
      (header +: lines.sorted).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    tag.foreach(t => Files.write(staging.resolve(SnapshotStore.TagFile),
      t.getBytes(StandardCharsets.UTF_8)))
    SnapshotStore.writeVersionManifest(staging, kind = "base",
      schema = df.schema)
    SnapshotStore.commitStaged(root, staging, base = -1L, tag,
      op = "clustered publish")
  }

  /** APPEND a batch to a clustered store as a new version: the batch is
    * z-clustered WITHIN ITSELF (scaled by its own min/max — sound
    * because z-values are never stored or compared across batches; the
    * sidecar's RAW per-file envelopes are exact filesystem facts
    * regardless of scaling, ZOrder.appendCluster's argument), written as
    * `nFiles` fresh files, and every base file HARDLINKS over with its
    * sidecar envelope line carried verbatim (file names are
    * write-unique, so the lines stay valid). Lineage kind is `append` —
    * a file diff equals the row delta, so [[SnapshotStore.readSince]]
    * composes with clustered layout (q149 pins it). A time-ordered
    * append stream even helps skipping: each batch's files envelope
    * that batch's range, so time-window boxes prune whole appends.
    * Steady-state cost: O(batch) + O(base files) metadata. */
  def appendClustered(df: DataFrame, root: String, nFiles: Int,
      bits: Int = 16, tag: Option[String] = None): Long = {
    require(nFiles >= 1, "nFiles must be positive")
    val alreadyApplied = SnapshotStore.taggedVersion(root, tag)
    if (alreadyApplied.isDefined) return alreadyApplied.get
    val spark = df.sparkSession
    val base = SnapshotStore.currentVersion(root)
    require(base > 0, s"no published version under $root")
    val (cols, baseBits) = clusterSpecAt(root, base).getOrElse(
      throw new IllegalStateException(
        s"v$base under $root is not clustered — bootstrap with " +
          "publishClustered"))
    cols.foreach(c => require(df.columns.contains(c),
      s"missing cluster column $c"))
    SnapshotStore.versionSchema(root, base).foreach { st =>
      require(df.columns.toSet == st.fieldNames.toSet,
        s"append batch columns ${df.columns.sorted.mkString(",")} must " +
          s"match the store's ${st.fieldNames.sorted.mkString(",")} " +
          "(clustered appends do not evolve the schema)")
    }
    val baseDir = Paths.get(root, s"v$base")
    val baseManifest = SnapshotStore.manifestFiles(root, base).getOrElse(
      throw new IllegalStateException(
        s"clustered v$base under $root has no manifest"))
    val baseSidecar = new String(
      Files.readAllBytes(baseDir.resolve(ClusterFile)),
      StandardCharsets.UTF_8).linesIterator.toSeq
    val staging = Paths.get(root,
      s".staging-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    val z = ZOrder.zExpr(df, cols, baseBits)
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.ErrorIfExists).parquet(staging.toString)
    // fresh-file envelopes: everything staged so far IS the batch
    val freshStats = spark.read.parquet(staging.toString)
      .groupBy(element_at(split(col("_metadata.file_path"), "/"), -1)
        .as("file"))
      .agg(ZOrder.statExprs(cols).head, ZOrder.statExprs(cols).tail: _*)
      .collect()
    val freshLines = freshStats.map { r =>
      val envs = cols.indices.flatMap(i =>
        Seq(r.getLong(1 + 2 * i), r.getLong(2 + 2 * i)))
      (r.getString(0) +: envs :+ r.getLong(1 + 2 * cols.length))
        .mkString("\t")
    }
    // base carryover: hardlink data files (copy fallback), keep lines
    baseManifest.foreach { rel =>
      val src = baseDir.resolve(rel)
      val dst = staging.resolve(rel)
      Files.createDirectories(dst.getParent)
      try Files.createLink(dst, src)
      catch {
        case _: UnsupportedOperationException | _: java.io.IOException =>
          Files.copy(src, dst, java.nio.file.StandardCopyOption
            .REPLACE_EXISTING)
      }
    }
    Files.write(staging.resolve(ClusterFile),
      (baseSidecar.head +:
        (baseSidecar.tail ++ freshLines).sorted).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    tag.foreach(t => Files.write(staging.resolve(SnapshotStore.TagFile),
      t.getBytes(StandardCharsets.UTF_8)))
    SnapshotStore.writeVersionManifest(staging, kind = "append",
      schema = df.schema)
    SnapshotStore.commitStaged(root, staging, base, tag,
      op = "clustered append")
  }

  /** The cluster spec a version was published with: (cols, bits), or
    * None for versions without a sidecar (not clustered). */
  def clusterSpecAt(root: String, version: Long): Option[(Seq[String], Int)] = {
    val f = Paths.get(root, s"v$version", ClusterFile)
    if (!Files.exists(f)) None
    else {
      val header = new String(Files.readAllBytes(f),
        StandardCharsets.UTF_8).linesIterator.next()
      val parts = header.split(";")
      val cols = parts(0).stripPrefix("cols=").split(",").toSeq
      val bits = parts(1).stripPrefix("bits=").toInt
      Some((cols, bits))
    }
  }

  /** Box read over a clustered store VERSION (`version = 0` → current):
    * every `lo <= col <= hi` clause must name a cluster column; files
    * whose sidecar envelope misses the box are never opened. Returns
    * (data, filesRead, filesTotal) — the honest pruning observable
    * (q148's `pruned` contract boolean). Time travel: pin `version` and
    * the box is answered from that version's files and envelopes alone.
    * Fail-safe: manifest files the sidecar does not know are read
    * unpruned and the box filter is re-applied, so the result is exact
    * against any sidecar damage. */
  def readBox(spark: SparkSession, root: String,
      box: Seq[(String, Long, Long)],
      version: Long = 0L): (DataFrame, Int, Int) = {
    require(box.nonEmpty, "need at least one box clause")
    val v = if (version == 0L) SnapshotStore.currentVersion(root) else version
    val (cols, _) = clusterSpecAt(root, v).getOrElse(
      throw new IllegalStateException(
        s"v$v under $root carries no cluster sidecar — a box read over " +
          "an unclustered version would silently scan every file; " +
          "publishClustered the version (or read + filter explicitly " +
          "if a full scan is intended)"))
    box.foreach { case (c, _, _) => require(cols.contains(c),
      s"box column $c is not a cluster column of v$v (${cols.mkString(",")})") }
    val sidecar = new String(
      Files.readAllBytes(Paths.get(root, s"v$v", ClusterFile)),
      StandardCharsets.UTF_8).linesIterator.drop(1).map { line =>
      val f = line.split("\t")
      f(0) -> cols.indices.map(i =>
        (f(1 + 2 * i).toLong, f(2 + 2 * i).toLong))
    }.toMap
    val manifest = SnapshotStore.manifestFiles(root, v).getOrElse(
      throw new IllegalStateException(
        s"clustered v$v under $root has no manifest"))
    val selected = manifest.filter { file =>
      sidecar.get(file) match {
        case None => true // unknown envelope -> must read (fail-safe)
        case Some(envs) => box.forall { case (c, lo, hi) =>
          val (mn, mx) = envs(cols.indexOf(c))
          mx >= lo && mn <= hi
        }
      }
    }
    val boxFilter = box.map { case (c, lo, hi) => col(c).between(lo, hi) }
      .reduce(_ && _)
    val dir = s"$root/v$v"
    val rdr = SnapshotStore.versionSchema(root, v) match {
      case Some(st) => spark.read.schema(st)
      case None => spark.read
    }
    val data =
      if (selected.isEmpty)
        SnapshotStore.read(spark, root, v).filter(lit(false))
      else rdr.parquet(selected.map(f => s"$dir/$f"): _*).filter(boxFilter)
    (data, selected.size, manifest.size)
  }
}
