package graft.engine.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order clustered layout with file-level min/max data skipping.
  *
  * THE multi-dimensional pruning story for a 100 TB fact table: a table
  * sorted on one column prunes range predicates on THAT column only — a
  * box predicate over two columns (time window × value band, the
  * dashboard/debugging shape) still reads every file on a
  * single-column-sorted layout, because the second column's values are
  * uniformly spread across all files. Interleaving the bits of both
  * columns (the Morton / Z-curve) makes file z-ranges correspond to
  * rectangles in (A, B) space, so each file's [min, max] envelope on BOTH
  * columns is tight, and a box query intersects only the few files whose
  * envelopes touch the box.
  *
  * Scale posture (100 TB lens):
  *   - [[clusterWrite]] is one range-shuffle over the input — the same
  *     one-off cost as any sorted/bucketed publish ([[SnapshotStore]],
  *     `Bucketed.publishTable`); recurring box queries then read
  *     `O(files touching the box)` instead of `O(all files)`.
  *   - The manifest holds ONE row per data file (path + per-column
  *     min/max + row count). At 100 TB with 1 GB files that is ~10^5
  *     rows — the same order as the driver's own `FileIndex`, and the
  *     same thing Delta/Iceberg keep in their manifests. [[readBox]]
  *     collects only the SELECTED paths (bounded by the file count, and
  *     by the pruning itself), never data rows.
  *   - Skipping is an optimization, never a correctness dependency: the
  *     box filter is re-applied to the surviving files, so a manifest
  *     that selected too much still returns exact results (and one that
  *     selected too little cannot exist — selection keeps every file
  *     whose envelope intersects the box).
  *   - Scaling to [0, 2^bits) uses the GLOBAL min/max (4 longs to the
  *     driver, one aggregate) — equi-width in value space; the range
  *     shuffle then makes files equi-COUNT in z space, so skew in either
  *     column degrades file envelopes gracefully instead of producing
  *     empty/huge files.
  *
  * No counterpart in the reference (its only layout control is
  * `repartition(1)`, `train_model.py:57`); modeled on the public
  * Delta/Iceberg OPTIMIZE ZORDER BY semantics, built from Spark
  * primitives: bit interleaving is a fold of `shiftleft`/`bitwiseOR`
  * (codegen-friendly column expressions — no UDF), clustering is
  * `repartitionByRange` + `sortWithinPartitions`.
  */
object ZOrder {

  /** Bit-interleave two columns already scaled to [0, 2^bits): bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. Pure column
    * expression — `bits` shift/or terms per side, all inside whole-stage
    * codegen. bits ≤ 31 keeps the result in a positive long. */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(a.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Scale a long column to [0, 2^bits) given its global min/max.
    * Exact integer arithmetic (double division would lose precision on
    * epoch-microsecond magnitudes): rebase to `v - min`, then drop low
    * bits with a right shift sized so the top value fits in `bits` bits.
    * Constant columns (min == max) scale to 0. */
  def scaled(c: Column, min: Long, max: Long, bits: Int): Column = {
    val span = max - min
    if (span <= 0L) lit(0L)
    else {
      val spanBits = 64 - java.lang.Long.numberOfLeadingZeros(span)
      val shift = math.max(0, spanBits - bits)
      shiftright(c.cast(LongType) - lit(min), shift)
    }
  }

  /** Cluster `df` on the Z-curve of two BIGINT columns and publish to
    * `root`: data parquet under `root/data` (≈ `nFiles` files, each a
    * contiguous z-range) plus a one-row-per-file min/max manifest under
    * `root/manifest`. The manifest pass re-reads the written files once
    * (write-time cost, amortized over every later skipped read) and
    * derives per-file stats from the files themselves — it can never
    * disagree with the data. */
  def clusterWrite(df: DataFrame, root: String, colA: String, colB: String,
      nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles >= 1, "nFiles must be positive")
    val spark = df.sparkSession
    val Array(row) = df.agg(
      min(col(colA).cast(LongType)), max(col(colA).cast(LongType)),
      min(col(colB).cast(LongType)), max(col(colB).cast(LongType))).collect()
    require(!row.anyNull, s"$colA/$colB must be non-null for clustering")
    val (aMin, aMax, bMin, bMax) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val z = interleave(scaled(col(colA), aMin, aMax, bits),
      scaled(col(colB), bMin, bMax, bits), bits)
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(s"$root/data")
    spark.read.parquet(s"$root/data")
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/manifest")
  }

  /** APPEND a new batch to an existing clustered layout: the batch is
    * z-clustered WITHIN ITSELF (scaled by its own min/max — see below),
    * written as `nFiles` additional data files, and the manifest gains
    * one row per new file. This is the steady-state write path: a 100 TB
    * table takes daily appends, each clustered within itself; a full
    * [[clusterWrite]] re-cluster is the rare maintenance action (same
    * cost class as q104's compact) once accumulated appends overlap the
    * base layout enough to degrade skipping.
    *
    * Why per-batch scaling is sound: the z-value exists ONLY to cluster
    * rows within one write — it is never stored and never compared
    * across batches. Skipping reads use the manifest's RAW per-file
    * min/max envelopes, which are exact filesystem facts regardless of
    * how any batch was scaled. A time-ordered append stream even helps:
    * each day's files envelope that day's timestamp range, so time-range
    * boxes prune whole appends.
    *
    * The new-file set is found by diffing the data listing against the
    * manifest's known files (driver-side path lists, bounded by file
    * count — the same metadata a FileIndex holds); stats are computed by
    * reading ONLY the new files. */
  def appendCluster(df: DataFrame, root: String, colA: String, colB: String,
      nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles >= 1, "nFiles must be positive")
    val spark = df.sparkSession
    val known = spark.read.parquet(s"$root/manifest")
      .select(col("file")).collect().map(_.getString(0)).toSet
    val Array(row) = df.agg(
      min(col(colA).cast(LongType)), max(col(colA).cast(LongType)),
      min(col(colB).cast(LongType)), max(col(colB).cast(LongType))).collect()
    require(!row.anyNull, s"$colA/$colB must be non-null for clustering")
    val z = interleave(
      scaled(col(colA), row.getLong(0), row.getLong(1), bits),
      scaled(col(colB), row.getLong(2), row.getLong(3), bits), bits)
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Append).parquet(s"$root/data")
    // fresh files come from a DIRECTORY LISTING (metadata-only — scanning
    // the table to discover its own new files would defeat the append's
    // cost model); names are write-unique, so suffix-matching against the
    // manifest's URIs is exact
    val fresh = {
      val d = java.nio.file.Paths.get(root, "data")
      val s = java.nio.file.Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        val knownFileNames = known.map(u => u.substring(u.lastIndexOf('/') + 1))
        s.iterator().asScala
          .filter { p =>
            val n = p.getFileName.toString
            n.endsWith(".parquet") && !n.startsWith(".") &&
              !knownFileNames.contains(n)
          }
          .map(_.toAbsolutePath.toString).toArray
      } finally s.close()
    }
    require(fresh.nonEmpty, "append produced no new files (empty batch?)")
    spark.read.parquet(fresh.toIndexedSeq: _*)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(s"$root/manifest")
  }

  /** Box read `loA <= colA <= hiA AND loB <= colB <= hiB` with manifest
    * skipping. Returns the filtered DataFrame plus (filesRead,
    * filesTotal) — the honest pruning observable callers pin in contract
    * booleans. The driver holds only the selected path list. */
  def readBox(spark: SparkSession, root: String,
      colA: String, loA: Long, hiA: Long,
      colB: String, loB: Long, hiB: Long): (DataFrame, Int, Int) = {
    val manifest = spark.read.parquet(s"$root/manifest")
    val filesTotal = manifest.count().toInt
    val selected = manifest
      .filter(col("max_a") >= loA && col("min_a") <= hiA &&
        col("max_b") >= loB && col("min_b") <= hiB)
      .select(col("file")).collect().map(_.getString(0))
    val boxFilter = col(colA).between(loA, hiA) && col(colB).between(loB, hiB)
    val data =
      if (selected.isEmpty)
        spark.read.parquet(s"$root/data").filter(lit(false))
      else spark.read.parquet(selected.toIndexedSeq: _*).filter(boxFilter)
    (data, selected.length, filesTotal)
  }
}
