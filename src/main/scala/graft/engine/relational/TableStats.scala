package graft.engine.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column (rows, non-nulls, NDV,
  * min, max) in ONE pass over the table — the statistics every
  * cost-based planner and data-quality dashboard wants, shaped for
  * 100 TB.
  *
  * All columns' aggregates are computed in a single wide aggregation
  * (map-side partials, one tiny result row), then pivoted to long format
  * (one row per column) driver-free with `inline` — the scan happens
  * once no matter how many columns are profiled, instead of the
  * one-query-per-column loop an ANALYZE naively runs.
  *
  * NDV is `approx_count_distinct` by DEFAULT: exact multi-column
  * distincts make Catalyst EXPAND the input (one duplicated stream per
  * distinct aggregate — column-count × table-size shuffle at scale),
  * while the HLL++ sketch stays one pass and merges like any other
  * partial. Pass `exactNdv = true` where exactness matters more than the
  * expand cost (small dims; q100's DuckDB oracle needs bit-exact NDV).
  *
  * Min/max are emitted as strings so heterogeneous column types fit one
  * result schema; profiled columns must be string or integral (floats
  * would re-open cross-engine formatting drift for no profiling value —
  * their ranges belong in histogram sketches, x28's territory).
  */
object TableStats {
  def profile(df: DataFrame, cols: Seq[String],
      exactNdv: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"no such columns: ${bad.mkString(", ")}")
    for (c <- cols) {
      import org.apache.spark.sql.types._
      val dt = df.schema(c).dataType
      require(Seq[DataType](StringType, ByteType, ShortType, IntegerType,
          LongType).contains(dt),
        s"profile supports string/integral columns; '$c' is $dt")
    }
    def ndv(c: String): Column =
      if (exactNdv) countDistinct(col(c)) else approx_count_distinct(col(c))
    val rows = cols.map { c =>
      struct(lit(c).as("column_name"),
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        ndv(c).cast("long").as("ndv"),
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"))
    }
    df.agg(array(rows: _*).as("_stats"))
      .select(inline(col("_stats")))
  }

  // ---- incremental ANALYZE: profile maintenance at delta cost ----------

  /** Fold a batch into a maintained profile store at `root` — the
    * incremental ANALYZE: per-column statistics stay current under
    * appends WITHOUT ever re-scanning history. Every component is chosen
    * to be mergeable:
    *
    *  - counts are additive;
    *  - min/max are monotone under union (kept in their NATIVE type —
    *    `least`/`greatest` on a string-cast would order "10" < "9");
    *  - NDV is a Datasketches HLL sketch column (`hll_sketch_agg` /
    *    `hll_union`, q93's machinery) — fixed-width state that merges
    *    exactly like the counts do.
    *
    * The store is a column_name-keyed bucketed [[graft.engine.sources.SnapshotStore]]
    * (one row per profiled column — tiny at any corpus size; the DATA
    * scanned per refresh is the batch, once). Addition is not
    * idempotent, so at-least-once callers pass `tag` exactly as with
    * [[graft.engine.sources.IncrementalAgg.refresh]].
    *
    * `sourceVersion` (r18 VERDICT item 2): the version of the PROFILED
    * STORE this batch brings the profile up to. Recorded max-merged in
    * the profile (`src_version`), it lets [[Planner.keyProfile]] refuse
    * a profile the store has silently advanced past — without it, a
    * profile refreshed at v3 plans v9's join with v3's facts. 0 (the
    * default) means "not version-tracked" (profiles of raw batches);
    * staleness checks are then unavailable. */
  def refreshProfile(batch: DataFrame, root: String, cols: Seq[String],
      tag: Option[String] = None, nBuckets: Int = 4,
      sourceVersion: Long = 0L): Long = {
    import graft.engine.sources.SnapshotStore
    val applied = tag.flatMap(t =>
      SnapshotStore.versionTags(root).collectFirst { case (v, vt) if vt == t => v })
    if (applied.isDefined) return applied.get
    val delta = batchProfile(batch, cols, sourceVersion)
    if (SnapshotStore.currentVersion(root) == 0L)
      SnapshotStore.publishBucketed(delta, root, "column_name", nBuckets,
        tag = tag)
    else {
      val existing = SnapshotStore.read(batch.sparkSession, root)
        .drop("_bucket")
        .select(col("column_name") +: StatCols.map(c => col(c).as(s"_old_$c")): _*)
      val updated = delta.join(existing, Seq("column_name"), "left_outer")
        .select(col("column_name"),
          (col("n_rows") + coalesce(col("_old_n_rows"), lit(0L))).as("n_rows"),
          (col("n_nonnull") + coalesce(col("_old_n_nonnull"), lit(0L)))
            .as("n_nonnull"),
          least(col("min_long"), col("_old_min_long")).as("min_long"),
          greatest(col("max_long"), col("_old_max_long")).as("max_long"),
          least(col("min_str"), col("_old_min_str")).as("min_str"),
          greatest(col("max_str"), col("_old_max_str")).as("max_str"),
          when(col("_old_hll").isNull, col("hll"))
            .when(col("hll").isNull, col("_old_hll"))
            .otherwise(hll_union(col("hll"), col("_old_hll"))).as("hll"),
          // bytes are additive like the counts; the source watermark is
          // the NEWEST version any fold has seen (monotone under merge)
          (col("sum_bytes") + coalesce(col("_old_sum_bytes"), lit(0L)))
            .as("sum_bytes"),
          greatest(col("src_version"),
            coalesce(col("_old_src_version"), lit(0L))).as("src_version"))
      SnapshotStore.merge(updated, root, keysAreDistinct = true, tag = tag)
    }
  }

  /** The maintained profile: per column rows/non-nulls/NDV-estimate,
    * min/max rendered as strings (from the native-typed stored values),
    * plus the column's total payload bytes (`sum_bytes` — fixed-width
    * columns at their storage width, strings at octet length) and the
    * profiled source-store watermark (`src_version`, 0 = untracked). */
  def readProfile(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame =
    graft.engine.sources.SnapshotStore.read(spark, root)
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        when(col("hll").isNull, lit(0L))
          .otherwise(hll_sketch_estimate(col("hll")).cast("long")).as("ndv_est"),
        coalesce(col("min_long").cast("string"), col("min_str")).as("min_str"),
        coalesce(col("max_long").cast("string"), col("max_str")).as("max_str"),
        col("sum_bytes"), col("src_version"))

  private val StatCols = Seq("n_rows", "n_nonnull", "min_long", "max_long",
    "min_str", "max_str", "hll", "sum_bytes", "src_version")

  /** One-scan per-batch partial profile in MERGEABLE form: typed min/max
    * (the other type's pair is null) and an HLL sketch per column. An
    * all-null column yields a null sketch — normalized by the merge's
    * null-safe union and by [[readProfile]]'s estimate (0).
    * `sum_bytes` is the column's additive payload estimate: 8 bytes per
    * non-null integral (the stored width after the profile's long cast),
    * octet length for strings — the byte facts a broadcast budget needs
    * (Catalyst's own autoBroadcastJoinThreshold is in bytes; a row count
    * alone calls 10⁶ rows of wide text "small"). */
  private def batchProfile(df: DataFrame, cols: Seq[String],
      sourceVersion: Long): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"no such columns: ${bad.mkString(", ")}")
    import org.apache.spark.sql.types._
    val rows = cols.map { c =>
      val dt = df.schema(c).dataType
      val integral = Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(dt)
      require(integral || dt == StringType,
        s"profile supports string/integral columns; '$c' is $dt")
      val (minL, maxL, minS, maxS) =
        if (integral)
          (min(col(c)).cast(LongType), max(col(c)).cast(LongType),
            lit(null).cast(StringType), lit(null).cast(StringType))
        else
          (lit(null).cast(LongType), lit(null).cast(LongType),
            min(col(c)), max(col(c)))
      val bytes =
        if (integral) (count(col(c)) * lit(8L)).cast(LongType)
        else coalesce(sum(octet_length(col(c)).cast(LongType)), lit(0L))
      struct(lit(c).as("column_name"),
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        minL.as("min_long"), maxL.as("max_long"),
        minS.as("min_str"), maxS.as("max_str"),
        hll_sketch_agg(col(c)).as("hll"),
        bytes.as("sum_bytes"),
        lit(sourceVersion).as("src_version"))
    }
    df.agg(array(rows: _*).as("_stats")).select(inline(col("_stats")))
  }
}
