package graft.engine.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.{GraftQuery, Tables}
import Exact._

/** Statistical aggregates and pivot (rounding out X6).
  *
  * stddev/corr are computed FROM exact decimal component sums (Σx, Σx²,
  * Σxy) rather than the built-in aggregates: the built-ins reduce doubles
  * in engine-specific order, while component sums are order-independent and
  * the final closed-form arithmetic is a handful of deterministic double
  * ops. Same single-pass cost, exact cross-engine equality. */
object StatsQueries {

  /** q28 — moments, DIY stddev/corr, exact interpolated median. */
  val q28 = GraftQuery(
    "q28_stats_fns",
    (spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
      li.groupBy(col("l_linestatus"))
        .agg(
          lcount().as("n"),
          dsum(col("l_quantity")).as("sx"),
          dsum(col("l_quantity") * col("l_quantity")).as("sxx"),
          dsum(col("l_extendedprice")).as("sy"),
          dsum(col("l_extendedprice") * col("l_extendedprice")).as("syy"),
          dsum(col("l_quantity") * col("l_extendedprice")).as("sxy"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"))
        .select(col("l_linestatus"), col("n"),
          round(col("sx") / col("n"), 6).as("mean_qty"),
          round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 6)
            .as("stddev_qty"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qty_price"),
          col("median_price"))
        .orderBy(col("l_linestatus"))
    },
    Some(s"""WITH comp AS (
        SELECT l_linestatus, COUNT(*) AS n,
          ${sqlDsum("l_quantity")} AS sx,
          ${sqlDsum("l_quantity * l_quantity")} AS sxx,
          ${sqlDsum("l_extendedprice")} AS sy,
          ${sqlDsum("l_extendedprice * l_extendedprice")} AS syy,
          ${sqlDsum("l_quantity * l_extendedprice")} AS sxy,
          ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS median_price
        FROM lineitem GROUP BY l_linestatus)
      SELECT l_linestatus, n,
        ROUND(sx / n, 6) AS mean_qty,
        ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
        ROUND((n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
        median_price
      FROM comp ORDER BY l_linestatus"""),
    doc = "mean/stddev/corr from exact component sums + exact median")

  /** q29 — pivot: returnflag columns per linestatus. */
  val q29 = GraftQuery(
    "q29_pivot",
    (spark, sfDir) => {
      val p = Tables.lineitem(spark, sfDir)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(dsum(col("l_quantity")))
      p.select(col("l_linestatus"),
          coalesce(col("A"), lit(0.0)).as("qty_a"),
          coalesce(col("N"), lit(0.0)).as("qty_n"),
          coalesce(col("R"), lit(0.0)).as("qty_r"))
        .orderBy(col("l_linestatus"))
    },
    Some(s"""SELECT l_linestatus,
      COALESCE(${sqlDsum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")}, 0.0) AS qty_a,
      COALESCE(${sqlDsum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")}, 0.0) AS qty_n,
      COALESCE(${sqlDsum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")}, 0.0) AS qty_r
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""),
    doc = "pivot on returnflag (oracle: CASE-filtered sums)")

  /** x28 — sketch aggregates (HLL++, approximate percentile, count-min),
    * promoted from rows-only to an ORACLE-CHECKED CONTRACT ROW: the sketch
    * values themselves are engine-specific (DuckDB cannot replay Spark's
    * HLL/KLL/CMS internals), so the row carries the EXACT ground truths
    * (DuckDB recomputes those) plus one boolean per sketch asserting its
    * published error contract against that ground truth (DuckDB pins them
    * TRUE). A sketch drifting out of contract flips its boolean and reds
    * the row — unlike the old summary, which nothing verified. The raw
    * estimates remain asserted (with the same bounds) in StatsSketchSpec.
    * The CMS binary sketch is decoded driver-side — the sketch itself is a
    * fixed-width mergeable aggregate (map-side partials), which is the
    * point at 100 TB: heavy-hitter counts without a per-key shuffle.
    *
    * OPERATOR NOTE on a red boolean: these are PROBABILISTIC contracts
    * pinned hard-TRUE only because the datasets and sketch seeds are
    * deterministic — the CMS bound holds at 0.99 confidence and the HLL
    * bound is ~2σ of its 5% rsd, so REGENERATED testdata or a new SF can
    * legitimately flip a boolean with zero code change (a ~1%-level draw,
    * not a bug). Before bisecting a red x28 as a regression, check whether
    * the corpus changed; if it did, re-validate the sketch against
    * StatsSketchSpec's bounds on the new data and re-pin. */
  val x28 = GraftQuery(
    "x28_approx_sketches",
    (spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
      // countDistinct lives in its OWN aggregation: a multi-distinct agg
      // compiles to an Expand (row duplication) plan, and routing every
      // expanded row through the two TypedImperativeAggregate sketches
      // (approx_percentile, count_min_sketch) measured 0.3 s → ~20 s at
      // sf0.1. Two single-pass jobs are strictly cheaper.
      val row = li.agg(
          approx_count_distinct(col("l_partkey")).cast(LongType).as("approx_parts"),
          expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
            .as("price_quantiles"),
          expr("count_min_sketch(l_orderkey % 7, 0.001d, 0.99d, 42)").as("cms"),
          sum(when(col("l_orderkey") % 7 === 3, 1L).otherwise(0L))
            .cast(LongType).as("exact_bucket3"),
          count(lit(1)).cast(LongType).as("n_rows"))
        .head()
      val p50 = row.getSeq[Double](1)(0)
      val p95 = row.getSeq[Double](1)(1)
      // countDistinct stays ALONE in its pass (mixing it with the plain
      // sums compiles to an Expand plan that duplicates every row); the
      // estimates' exact ranks are a third, narrow single-column pass
      val exactParts = li.agg(countDistinct(col("l_partkey")).cast(LongType))
        .head().getLong(0)
      val ranks = li.agg(
          sum(when(col("l_extendedprice") <= p50, 1L).otherwise(0L))
            .cast(LongType).as("rank_p50"),
          sum(when(col("l_extendedprice") <= p95, 1L).otherwise(0L))
            .cast(LongType).as("rank_p95"))
        .head()
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("cms")))
      val n = row.getAs[Long]("n_rows")
      val cmsB3 = cms.estimateCount(java.lang.Long.valueOf(3L))
      val exactB3 = row.getAs[Long]("exact_bucket3")
      // contracts: HLL++ default rsd 5% (allow 2σ); KLL rank error n/accuracy
      // (+1 for the <=-vs-< rank convention); CMS never undercounts and
      // overcounts <= eps·N = 0.001·n at confidence 0.99
      val rankTol = n / 1000 + 1
      import spark.implicits._
      Seq((n, exactParts, exactB3,
        math.abs(row.getAs[Long]("approx_parts") - exactParts).toDouble
          <= 0.10 * exactParts,
        math.abs(ranks.getAs[Long]("rank_p50") - n / 2) <= rankTol,
        math.abs(ranks.getAs[Long]("rank_p95") - (n * 95) / 100) <= rankTol,
        cmsB3 >= exactB3 && cmsB3 <= exactB3 + (n / 1000 + 1)))
        .toDF("n_rows", "exact_parts", "exact_bucket3",
          "hll_in_contract", "p50_rank_in_contract", "p95_rank_in_contract",
          "cms_in_contract")
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        CAST(SUM(CASE WHEN l_orderkey % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT)
          AS exact_bucket3,
        TRUE AS hll_in_contract, TRUE AS p50_rank_in_contract,
        TRUE AS p95_rank_in_contract, TRUE AS cms_in_contract
      FROM lineitem"""),
    doc = "HLL++ distinct + approx_percentile + count-min heavy-hitter; " +
      "exact ground truths DuckDB-recomputed, sketch error contracts " +
      "oracle-pinned TRUE")

  /** q93 — MERGEABLE HLL sketches (Datasketches `hll_sketch_agg` family):
    * the incremental-statistics move. Each ingest batch aggregates its own
    * per-source sketch INDEPENDENTLY (what a snapshot store publishes per
    * batch — fixed-width binary columns); a later reader `hll_union`s the
    * stored sketches and estimates distinct counts over the combined
    * corpus WITHOUT re-scanning either batch. The oracle pins the exact
    * ground truth (DuckDB recomputes it) plus an honest merge-accuracy
    * contract boolean (x28's pattern — the union estimate must sit within
    * 5% of exact; at this cardinality the sketch is in sparse mode and
    * the estimate is exact, but the CONTRACT is what the row pins).
    * Dataset-conditional like x28: regenerated data at much larger
    * per-source cardinality could legitimately stress the bound. */
  val q93 = GraftQuery(
    "q93_hll_mergeable_sketches",
    (spark, sfDir) => {
      val docs = Tables.documents(spark, sfDir)
      val s1 = docs.filter(col("doc_id") < 250).groupBy(col("source"))
        .agg(hll_sketch_agg(col("doc_id")).as("sk1"))
      val s2 = docs.filter(col("doc_id") >= 250).groupBy(col("source"))
        .agg(hll_sketch_agg(col("doc_id")).as("sk2"))
      // full outer + null-safe union: a source seen by only ONE batch must
      // still estimate (its other-side sketch simply doesn't exist yet —
      // the normal state of an incremental store mid-history)
      val est = s1.join(s2, Seq("source"), "full_outer")
        .select(col("source"),
          when(col("sk1").isNull, hll_sketch_estimate(col("sk2")))
            .when(col("sk2").isNull, hll_sketch_estimate(col("sk1")))
            .otherwise(hll_sketch_estimate(hll_union(col("sk1"), col("sk2"))))
            .as("est"))
      // exact twin in its own aggregation (multi-distinct + sketch in one
      // agg is the Expand-plan pathology x28 documents)
      val exact = docs.groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).cast(LongType).as("exact_distinct"))
      est.join(exact, Seq("source"))
        .select(col("source"), col("exact_distinct"),
          (abs(col("est") - col("exact_distinct"))
            <= col("exact_distinct") * 0.05).as("merge_in_contract"))
        .orderBy(col("source"))
    },
    Some("""SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS exact_distinct,
        TRUE AS merge_in_contract
      FROM documents GROUP BY 1 ORDER BY 1"""),
    doc = "per-batch HLL sketches unioned WITHOUT re-scanning either batch; " +
      "exact ground truth + merge-accuracy contract oracle-pinned")

  /** q51 — as-of (point-in-time) join: each event picks its user's latest
    * order at-or-before the event timestamp. */
  val q51 = GraftQuery(
    "q51_asof_join",
    (spark, sfDir) => {
      val e = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      AsOf.asofJoin(e, o,
          leftKey = col("user_id"), rightKey = col("o_custkey"),
          leftTime = col("ts"), rightTime = col("o_orderdate"),
          leftRowId = col("event_id"), tieBreak = col("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("last_orderkey"),
          unix_timestamp(col("o_orderdate")).as("last_order_epoch"))
        .orderBy(col("event_id"))
        .limit(1000)
    },
    Some("""SELECT event_id, user_id, o_orderkey AS last_orderkey,
        CAST(epoch(o_orderdate) AS BIGINT) AS last_order_epoch
      FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
          ROW_NUMBER() OVER (PARTITION BY e.event_id
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t
      WHERE rn = 1 ORDER BY event_id LIMIT 1000"""),
    doc = "as-of join composed from equi-join + range filter + window")

  /** q92 — the SAME as-of semantics through the merge-scan refinement
    * ([[graft.engine.relational.AsOf.asofJoinMerge]]): key-partitioned,
    * time-sorted walk instead of join-then-window, so the exchange carries
    * each row once instead of left×fan-in intermediates. Shares q51's
    * oracle SQL verbatim — the refinement is value-verified equivalent,
    * not just spec-asserted. */
  val q92 = GraftQuery(
    "q92_asof_merge",
    (spark, sfDir) => {
      val e = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      AsOf.asofJoinMerge(e, o,
          leftKeyCol = "user_id", rightKeyCol = "o_custkey",
          leftTimeCol = "ts", rightTimeCol = "o_orderdate",
          tieBreakCol = "o_orderkey")
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("last_orderkey"),
          unix_timestamp(col("o_orderdate")).as("last_order_epoch"))
        .orderBy(col("event_id"))
        .limit(1000)
    },
    q51.oracle, // the merge-scan must reproduce the composed plan's answer
    doc = "as-of join via merge-scan over key-partitioned time-sorted streams")

  /** q52 — posexplode / lateral unnest: per-position embedding statistics. */
  val q52 = GraftQuery(
    "q52_posexplode",
    (spark, sfDir) => {
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .filter(col("pos") < 8)
        .groupBy(col("pos").cast(LongType).as("pos"))
        .agg(lcount().as("n"),
          dsum(col("v").cast("double")).as("sum_v"),
          round(max(col("v")).cast("double"), 6).as("max_v"))
        .orderBy(col("pos"))
    },
    Some(s"""WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
          unnest(embedding) AS v
        FROM embeddings)
      SELECT CAST(pos AS BIGINT) AS pos, COUNT(*) AS n,
        ${sqlDsum("CAST(v AS DOUBLE)")} AS sum_v,
        ROUND(CAST(MAX(v) AS DOUBLE), 6) AS max_v
      FROM ex WHERE pos < 8 GROUP BY pos ORDER BY pos"""),
    doc = "posexplode (lateral unnest with ordinality) + per-position agg")

  /** q53 — subquery forms through the SQL entry point: scalar subquery,
    * IN-subquery, correlated EXISTS in one statement. */
  val q53 = GraftQuery(
    "q53_subqueries",
    (spark, sfDir) => {
      Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
      Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
      spark.sql("""
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
          AND c_nationkey IN (SELECT c_nationkey FROM customer
                              GROUP BY c_nationkey
                              HAVING COUNT(*) * 25 >= (SELECT COUNT(*) FROM customer))
          AND EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        ORDER BY c_custkey LIMIT 500""")
    },
    Some("""SELECT c_custkey, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        AND c_nationkey IN (SELECT c_nationkey FROM customer
                            GROUP BY c_nationkey
                            HAVING COUNT(*) * 25 >= (SELECT COUNT(*) FROM customer))
        AND EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey LIMIT 500"""),
    doc = "scalar + IN + correlated EXISTS subqueries (same SQL both engines)")

  /** q54 — bag (multiset) set operations: UNION ALL / EXCEPT ALL /
    * INTERSECT ALL preserve duplicates, unlike q18's distinct set ops. */
  val q54 = GraftQuery(
    "q54_bag_setops",
    (spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = o.filter(col("o_totalprice") > 300000.0).select(col("o_custkey"))
      a.union(b)            // UNION ALL
        .exceptAll(a.intersectAll(b))
        .groupBy(col("o_custkey"))
        .agg(lcount().as("n"))
        .orderBy(col("o_custkey"))
        .limit(1000)
    },
    Some("""SELECT o_custkey, COUNT(*) AS n FROM (
        (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        EXCEPT ALL
        (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT ALL
         SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
      ) t GROUP BY o_custkey ORDER BY o_custkey LIMIT 1000"""),
    doc = "multiset UNION ALL / EXCEPT ALL / INTERSECT ALL")

  /** q96 — binned point-in-interval range join
    * ([[graft.engine.relational.RangeJoin.pointInInterval]]): each view
    * event opens an engagement window `[ts, ts + floor(value·10) s)`;
    * count every event (any type) landing inside and exact-sum its value.
    * The naive `BETWEEN` join is nested-loop at any scale; the binned plan
    * is an equi-join on an hour-wide micros bin. Empty windows (floor = 0)
    * survive via the compose-outer pattern the operator documents: inner
    * range join → aggregate per window id → left-join back to the window
    * set, so COUNT reads 0 and SUM stays NULL exactly like the oracle's
    * flat LEFT JOIN + GROUP BY. */
  val q96 = GraftQuery(
    "q96_range_join",
    (spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val points = ev.select(col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_us"), col("value").as("p_value"))
      val windows = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"),
          unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) +
            expr("CAST(FLOOR(value * 10) AS BIGINT)") * 1000000L).as("e_us"))
      val hits = RangeJoin
        .pointInInterval(points, windows, "p_us", "s_us", "e_us",
          binWidth = 3600L * 1000000L)
        .groupBy(col("view_id"))
        .agg(lcount().as("n_hits"), dsum(col("p_value")).as("sum_value"))
      windows.select(col("view_id"))
        .join(hits, Seq("view_id"), "left_outer")
        .select(col("view_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("sum_value"))
        .orderBy(col("view_id"))
    },
    Some(s"""WITH iv AS (
        SELECT event_id AS view_id, epoch_us(ts) AS s_us,
               epoch_us(ts) + CAST(FLOOR(value * 10) AS BIGINT) * 1000000 AS e_us
        FROM events WHERE event_type = 'view'),
      pt AS (SELECT event_id AS p_id, epoch_us(ts) AS p_us, value AS p_value
        FROM events)
      SELECT view_id, COUNT(p_id) AS n_hits,
        ${sqlDsum("p_value")} AS sum_value
      FROM iv LEFT JOIN pt ON p_us >= s_us AND p_us < e_us
      GROUP BY view_id ORDER BY view_id"""),
    doc = "point-in-interval range join, binned to a distributed equi-join")

  /** q97 — binned interval-overlap join
    * ([[graft.engine.relational.RangeJoin.intervalOverlap]]): 10-minute
    * view windows × 10-minute click windows, per view the count and
    * exact value sum of concurrently-open click windows. Both sides
    * explode to covered bins; the claim-bin filter keeps each overlapping
    * pair exactly once with no corpus-sized distinct. */
  val q97 = GraftQuery(
    "q97_interval_overlap",
    (spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      def win(tpe: String, idAs: String, sAs: String, eAs: String,
          extra: Seq[(String, String)]) =
        ev.filter(col("event_type") === tpe)
          .select(col("event_id").as(idAs) +:
            unix_micros(col("ts")).as(sAs) +:
            (unix_micros(col("ts")) + 600L * 1000000L).as(eAs) +:
            extra.map { case (c, a) => col(c).as(a) }: _*)
      val views = win("view", "view_id", "vs_us", "ve_us", Nil)
      val clicks = win("click", "click_id", "cs_us", "ce_us",
        Seq("value" -> "c_value"))
      val pairs = RangeJoin.intervalOverlap(views, clicks,
        "vs_us", "ve_us", "cs_us", "ce_us", binWidth = 600L * 1000000L)
      val agg = pairs.groupBy(col("view_id"))
        .agg(lcount().as("n_concurrent"),
          dsum(col("c_value")).as("sum_click_value"))
      views.select(col("view_id"))
        .join(agg, Seq("view_id"), "left_outer")
        .select(col("view_id"),
          coalesce(col("n_concurrent"), lit(0L)).as("n_concurrent"),
          col("sum_click_value"))
        .orderBy(col("view_id"))
    },
    Some(s"""WITH v AS (
        SELECT event_id AS view_id, epoch_us(ts) AS vs,
               epoch_us(ts) + 600000000 AS ve
        FROM events WHERE event_type = 'view'),
      c AS (
        SELECT event_id AS click_id, value AS c_value, epoch_us(ts) AS cs,
               epoch_us(ts) + 600000000 AS ce
        FROM events WHERE event_type = 'click')
      SELECT view_id, COUNT(click_id) AS n_concurrent,
        ${sqlDsum("c_value")} AS sum_click_value
      FROM v LEFT JOIN c ON vs < ce AND cs < ve
      GROUP BY view_id ORDER BY view_id"""),
    doc = "interval-overlap range join via per-bin explode + claim-bin dedup")

  /** q100 — ANALYZE-style one-pass table profile
    * ([[graft.engine.relational.TableStats]]): per-column rows/non-nulls/
    * NDV/min/max over documents in a single scan (exact NDV here so the
    * DuckDB twin is bit-comparable; the approx default is the scale
    * path — see the operator's scaladoc for the expand-cost rationale). */
  val q100 = GraftQuery(
    "q100_table_stats",
    (spark, sfDir) => {
      TableStats.profile(Tables.documents(spark, sfDir),
          Seq("doc_id", "lang", "source", "n_chars"), exactNdv = true)
        .orderBy(col("column_name"))
    },
    Some("""SELECT column_name, n_rows, n_nonnull, ndv, min_str, max_str
      FROM (
        SELECT 'doc_id' AS column_name, COUNT(*) AS n_rows,
          COUNT(doc_id) AS n_nonnull, COUNT(DISTINCT doc_id) AS ndv,
          CAST(MIN(doc_id) AS VARCHAR) AS min_str,
          CAST(MAX(doc_id) AS VARCHAR) AS max_str FROM documents
        UNION ALL
        SELECT 'lang', COUNT(*), COUNT(lang), COUNT(DISTINCT lang),
          MIN(lang), MAX(lang) FROM documents
        UNION ALL
        SELECT 'source', COUNT(*), COUNT(source), COUNT(DISTINCT source),
          MIN(source), MAX(source) FROM documents
        UNION ALL
        SELECT 'n_chars', COUNT(*), COUNT(n_chars), COUNT(DISTINCT n_chars),
          CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
          FROM documents
      ) t ORDER BY column_name"""),
    doc = "one-pass ANALYZE: per-column rows/non-nulls/NDV/min/max, long format")

  /** q101 — INCREMENTAL ANALYZE ([[TableStats.refreshProfile]]): the q100
    * profile maintained across three append batches without re-scanning
    * history — counts add, native-typed min/max merge monotonically, NDV
    * merges as HLL sketch columns (q93's machinery folded into the
    * maintenance loop). Exact fields must equal a full recompute (the
    * DuckDB twin); the sketch NDV is pinned by the same 5%-of-exact
    * contract boolean x28/q93 use, with the exact side computed in its
    * own aggregation. */
  val q101 = GraftQuery(
    "q101_incremental_stats",
    (spark, sfDir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q101_prof_${ProcessHandle.current().pid()}/tbl"
      graft.engine.sources.SnapshotStore.deleteRecursively(
        java.nio.file.Paths.get(root))
      val cols = Seq("doc_id", "lang", "source", "n_chars")
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id") +: cols.drop(1).map(col): _*)
      for (r <- 0 until 3)
        TableStats.refreshProfile(docs.filter(col("doc_id") % 3 === r),
          root, cols)
      val exact = TableStats.profile(docs, cols, exactNdv = true)
        .select(col("column_name"), col("ndv").as("_exact_ndv"))
      TableStats.readProfile(spark, root)
        .join(exact, Seq("column_name"))
        .select(col("column_name"), col("n_rows"), col("n_nonnull"),
          col("min_str"), col("max_str"),
          (abs(col("ndv_est") - col("_exact_ndv"))
            <= col("_exact_ndv") * 0.05).as("ndv_in_contract"))
        .orderBy(col("column_name"))
    },
    Some("""SELECT column_name, n_rows, n_nonnull, min_str, max_str,
        TRUE AS ndv_in_contract
      FROM (
        SELECT 'doc_id' AS column_name, COUNT(*) AS n_rows,
          COUNT(doc_id) AS n_nonnull,
          CAST(MIN(doc_id) AS VARCHAR) AS min_str,
          CAST(MAX(doc_id) AS VARCHAR) AS max_str FROM documents
        UNION ALL
        SELECT 'lang', COUNT(*), COUNT(lang), MIN(lang), MAX(lang)
          FROM documents
        UNION ALL
        SELECT 'source', COUNT(*), COUNT(source), MIN(source), MAX(source)
          FROM documents
        UNION ALL
        SELECT 'n_chars', COUNT(*), COUNT(n_chars),
          CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
          FROM documents
      ) t ORDER BY column_name"""),
    doc = "incremental ANALYZE: mergeable profile maintenance == full recompute")

  /** q102 — the DIM-INTERVAL regime of the range join: same semantics as
    * q96 (shared oracle, the q51/q92 value-equivalence pattern) but with
    * the exploded window table broadcast, so the point side contributes
    * ZERO shuffle to the join — at 100 TB the fact stream flows straight
    * from scan to broadcast-hash-join to partial aggregation.
    * `points_unshuffled` is computed honestly from the executed join
    * plan (no ShuffleExchange anywhere below the join: the broadcast
    * side distributes via BroadcastExchange, the point side is scan →
    * project) and pinned TRUE by the oracle. */
  val q102 = GraftQuery(
    "q102_range_join_broadcast",
    (spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val points = ev.select(col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_us"), col("value").as("p_value"))
      val windows = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"),
          unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) +
            expr("CAST(FLOOR(value * 10) AS BIGINT)") * 1000000L).as("e_us"))
      val joined = RangeJoin.pointInInterval(points, windows,
        "p_us", "s_us", "e_us", binWidth = 3600L * 1000000L,
        broadcastIntervals = true)
      val pointsUnshuffled = Bucketed.shuffleCount(joined) == 0
      windows.select(col("view_id"))
        .join(joined.groupBy(col("view_id"))
            .agg(lcount().as("n_hits"), dsum(col("p_value")).as("sum_value")),
          Seq("view_id"), "left_outer")
        .select(col("view_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("sum_value"),
          lit(pointsUnshuffled).as("points_unshuffled"))
        .orderBy(col("view_id"))
    },
    q96.oracle.map(_.replace(
      "SELECT view_id, COUNT(p_id) AS n_hits,",
      "SELECT view_id, COUNT(p_id) AS n_hits, TRUE AS points_unshuffled,")),
    doc = "broadcast-interval range join: fact side never shuffles, plan-pinned")

  /** q105 — Misra–Gries heavy hitters, EXACT regime
    * ([[FrequentItems]]): capacity 64 ≥ NDV(lang) = 5, so no counter is
    * ever evicted in any partial or merge and the summary equals the full
    * GROUP BY — the same exactness-pinning pattern as q84 (PQ) / q75
    * (MinHash): value-level proof of the kernel in the regime where the
    * approximation provably vanishes. The aggregation itself stays
    * capacity-bounded at every stage (map-side partials carry ≤ 64
    * counters per partition), which is the whole point at 100 TB — the
    * exchange never scales with row count. */
  val q105 = GraftQuery(
    "q105_heavy_hitters_exact",
    (spark, sfDir) => {
      val docs = Tables.documents(spark, sfDir).filter(col("lang").isNotNull)
      docs.agg(FrequentItems.frequentItems(64, col("lang")).as("mg"))
        .select(explode(col("mg")).as(Seq("lang", "est_count")))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS est_count
      FROM documents WHERE lang IS NOT NULL
      GROUP BY lang ORDER BY lang"""),
    doc = "Misra-Gries heavy hitters, exact regime (capacity >= NDV) == GROUP BY")

  /** q106 — Misra–Gries heavy hitters, SKETCH regime: capacity 8 over a
    * planted-skew item stream (even event ids collapse to one 'hot'
    * item — exactly half the stream — the rest keep their user id — NDV ≈ 150 at sf0.01, far above
    * capacity), with every published guarantee pinned as a contract
    * boolean against an exact census computed in the SAME query:
    * `no_overcount` (est ≤ true for every tracked item),
    * `bounded_undercount` (true − est ≤ n/(c+1) counting untracked as 0
    * — the Agarwal et al. mergeable bound, so it must hold under Spark's
    * arbitrary partial/merge tree), `hot_item_tracked` (an item holding
    * ~50% of the stream MUST survive — it exceeds the n/(c+1) eviction
    * bound by construction), and `tracked_ok` (the summary really holds
    * ≤ capacity entries). The census-side GROUP BY exists only to AUDIT
    * the sketch at harness scale; production use ships the map alone. */
  val q106 = GraftQuery(
    "q106_heavy_hitters_guarantee",
    (spark, sfDir) => {
      val c = 8
      val items = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull && col("event_id").isNotNull)
        .select(when(col("event_id") % 2 === 0, lit("hot"))
          .otherwise(col("user_id").cast("string")).as("item"))
      val mg = items
        .agg(FrequentItems.frequentItems(c, col("item")).as("mg"))
        .select(explode(col("mg")).as(Seq("item", "est")))
      val exact = items.groupBy(col("item")).agg(lcount().as("true_cnt"))
      val audit = exact.join(mg, Seq("item"), "left_outer")
        .agg(
          sum(col("true_cnt")).cast(LongType).as("n_events"),
          max(when(col("est") > col("true_cnt"), 1L).otherwise(0L))
            .as("_overcount"),
          max(col("true_cnt") - coalesce(col("est"), lit(0L)))
            .as("_max_under"),
          max(when(col("item") === "hot" && col("est").isNotNull, 1L)
            .otherwise(0L)).as("_hot_tracked"),
          sum(when(col("est").isNotNull, 1L).otherwise(0L)).as("_tracked"))
      audit.select(
        col("n_events"),
        (col("_overcount") === 0L).as("no_overcount"),
        (col("_max_under") * (c + 1) <= col("n_events")).as("bounded_undercount"),
        (col("_hot_tracked") === 1L).as("hot_item_tracked"),
        (col("_tracked") <= c).as("tracked_ok"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
        TRUE AS no_overcount, TRUE AS bounded_undercount,
        TRUE AS hot_item_tracked, TRUE AS tracked_ok
      FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL"""),
    doc = "Misra-Gries sketch regime: mergeable-bound contract booleans vs exact census")

  /** q110 — mergeable QUANTILE sketch columns ([[QuantileSketch]], the
    * percentile sibling of q93's HLL columns): events arrives as three
    * ingest batches, each batch is sketched independently per event_type
    * (per-batch sketch COLUMNS — storable rows, never re-scanned), the
    * batch sketches fold through [[QuantileSketch.mergeAgg]], and
    * p50/p90 estimates come off the merged sketch through a
    * sketch-items-only window. The ORACLE pins (a) the exact p50/p90
    * VALUES (the ceil(q·n)-th smallest, recomputed by DuckDB from the raw
    * rows — the exact census half of the q93 pattern) and (b) the
    * `in_contract` booleans: each estimate's true-rank interval
    * [#{x<est}+1, #{x<=est}] overlaps the target rank ± the sketch's own
    * self-computed L·n/k+k bound (interval form so heavy ties cannot
    * false-fail the contract). A broken collapse, a lost buffer in a
    * merge, or weight drift breaks the booleans — weight conservation is
    * additionally value-pinned through `n` (total sketch weight must
    * equal the DuckDB row count). */
  val q110 = GraftQuery(
    "q110_quantile_sketches",
    (spark, sfDir) => {
      val k = 512
      val qs = Seq(0.5, 0.9)
      val ev = Tables.events(spark, sfDir)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"), col("value"))
      val batches = (0 to 2).map(i =>
        ev.filter(pmod(col("event_id"), lit(3L)) === i.toLong)
          .groupBy(col("event_type"))
          .agg(QuantileSketch.sketchAgg(col("value"), k).as("sk")))
      val merged = batches.reduce(_ unionByName _)
        .groupBy(col("event_type"))
        .agg(QuantileSketch.mergeAgg(col("sk"), k).as("sk"))
      val est = QuantileSketch.estimate(merged, "event_type", "sk", qs, k)
        // tiny (|event_type| × |qs| rows) but feeds THREE consumers below
        .localCheckpoint()
      // exact census (oracle half): the ceil(q·n)-th smallest raw value —
      // a per-type sort, the harness's exact side, not the scale path
      val n = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ranked = ev.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("value"))))
      val exact = qs.map(q =>
        ranked.join(n, "event_type")
          .filter(col("rn") === ceil(lit(q) * col("n")).cast(LongType))
          .select(col("event_type"), lit(q).as("q"), col("n"),
            col("value").as("exact_q"))).reduce(_ unionByName _)
      // true-rank interval of each estimate, from the raw rows
      val ranks = ev
        .join(est.select(col("event_type"), col("q"), col("estimate")),
          "event_type")
        .groupBy(col("event_type"), col("q"))
        .agg(sum(when(col("value") < col("estimate"), 1L).otherwise(0L))
            .as("rank_lo"),
          sum(when(col("value") <= col("estimate"), 1L).otherwise(0L))
            .as("rank_hi"))
      exact
        .join(est, Seq("event_type", "q"))
        .join(ranks, Seq("event_type", "q"))
        .select(col("event_type"), col("q"), col("n").cast(LongType).as("n"),
          col("exact_q"),
          (col("total_weight") === col("n")).as("weight_exact"),
          (col("rank_lo") + 1 <= ceil(col("q") * col("n")).cast(LongType)
              + col("bound") &&
            col("rank_hi") >= ceil(col("q") * col("n")).cast(LongType)
              - col("bound")).as("in_contract"))
        .orderBy(col("event_type"), col("q"))
    },
    Some("""WITH e AS (SELECT event_type, value FROM events
        WHERE value IS NOT NULL),
      n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM e GROUP BY 1),
      r AS (SELECT event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn
        FROM e),
      qs AS (SELECT CAST(0.5 AS DOUBLE) AS q
        UNION ALL SELECT CAST(0.9 AS DOUBLE))
      SELECT n.event_type, qs.q, n.n,
        (SELECT value FROM r WHERE r.event_type = n.event_type
           AND rn = CAST(CEIL(qs.q * n.n) AS BIGINT)) AS exact_q,
        TRUE AS weight_exact, TRUE AS in_contract
      FROM n, qs ORDER BY event_type, q"""),
    doc = "per-batch Munro-Paterson quantile sketches merged without " +
      "re-scanning any batch; exact p50/p90 census + self-computed " +
      "rank-error contract oracle-pinned")

  /** q147 — STATS-DRIVEN JOIN PLANNING ([[Planner]]): the consumer the
    * q100/q101 profile stores were missing (VERDICT r17 item 4). The
    * query publishes real profiles for events (user_id, event_type) and
    * customer (c_custkey) via [[TableStats.refreshProfile]], then walks
    * [[Planner.chooseJoin]]'s full decision ladder from those profiles:
    *
    *  - default broadcast budget, (events, customer): the dim's row
    *    count AND byte payload fit → **broadcast**;
    *  - tight ROW budget (the 100 TB big×big regime where nothing
    *    fits), key user_id: NDV (150·sf·10⁴) fills the shuffle →
    *    **sort-merge**;
    *  - tight row budget, key event_type: NDV ~5 < partitions/skewFactor
    *    — q66's every-key-is-hot posture — → **salted**;
    *  - tight BYTE budget (r19: the budget Catalyst's own threshold uses
    *    — a row count alone calls wide text "small"): customer's rows
    *    fit the row budget but its profiled `sum_bytes` exceeds 1 KB →
    *    the ladder flips to **sort-merge** on bytes alone.
    *
    * All four choices then EXECUTE the same q67 join (events ⋈ customer
    * → per-nation rollup) and must agree bit-for-bit (`variants_agree`);
    * each choice's physical plan is pinned STRUCTURALLY via
    * [[graft.tools.PlanAudit]]'s AQE-aware tree walk (r18 VERDICT item
    * 5 — plan-string matching drifts across Spark upgrades):
    * BroadcastHashJoinExec / SortMergeJoinExec via the AQE-respected
    * merge hint / a join whose keys carry the salt column. The oracle is
    * q67's plain SQL: planning must be result-invariant, only the plan
    * flips with the profile. */
  val q147 = GraftQuery(
    "q147_stats_driven_join",
    (spark, sfDir) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q147_plan_${ProcessHandle.current().pid()}"
      graft.engine.sources.SnapshotStore.deleteRecursively(
        java.nio.file.Paths.get(base))
      val ev = Tables.events(spark, sfDir)
        .select(col("user_id").as("c_custkey"), col("value"),
          col("event_type"))
      val cust = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey"))
      TableStats.refreshProfile(
        ev.select(col("c_custkey"), col("event_type")),
        s"$base/ev", Seq("c_custkey", "event_type"))
      TableStats.refreshProfile(cust.select(col("c_custkey")),
        s"$base/cust", Seq("c_custkey"))
      val evKey = Planner.keyProfile(spark, s"$base/ev", "c_custkey")
      val evType = Planner.keyProfile(spark, s"$base/ev", "event_type")
      val custKey = Planner.keyProfile(spark, s"$base/cust", "c_custkey")
      val tight = Planner.Config(broadcastMaxRows = 100L)
      val tightBytes = Planner.Config(broadcastMaxBytes = 1024L)
      val cA = Planner.chooseJoin(evKey, custKey)
      val cB = Planner.chooseJoin(evKey, evKey, tight)
      val cC = Planner.chooseJoin(evType, evType, tight)
      // customer fits the ROW budget but its profiled byte payload
      // (8 B × rows, well over 1 KB at every SF) trips the byte gate
      val cD = Planner.chooseJoin(evKey, custKey, tightBytes)
      def run(choice: Planner.JoinChoice) =
        Planner.join(ev.select(col("c_custkey"), col("value")), cust,
            "c_custkey", choice, col("value"))
          .groupBy(col("c_nationkey"))
          .agg(lcount().as("n_events"), dsum(col("value")).as("sum_value"))
          .orderBy(col("c_nationkey"))
      val (a, b, c, d) = (run(cA), run(cB), run(cC), run(cD))
      val rowsA = a.collect().toSeq
      val variantsAgree =
        rowsA == b.collect().toSeq && rowsA == c.collect().toSeq &&
          rowsA == d.collect().toSeq
      import graft.tools.PlanAudit
      a.withColumn("choice_broadcast",
          lit(cA == Planner.BroadcastHash && custKey.bytes > 0L &&
            PlanAudit.hasBroadcastHashJoin(a)))
        .withColumn("choice_sort_merge",
          lit(cB == Planner.SortMerge && PlanAudit.hasSortMergeJoin(b)))
        .withColumn("choice_salted",
          lit(cC.isInstanceOf[Planner.Salted] && PlanAudit.hasSaltedJoin(c)))
        .withColumn("choice_bytes_flip",
          lit(cD == Planner.SortMerge && PlanAudit.hasSortMergeJoin(d)))
        .withColumn("variants_agree", lit(variantsAgree))
    },
    Some(s"""SELECT c.c_nationkey, COUNT(*) AS n_events,
      ${sqlDsum("e.value")} AS sum_value,
      TRUE AS choice_broadcast, TRUE AS choice_sort_merge,
      TRUE AS choice_salted, TRUE AS choice_bytes_flip,
      TRUE AS variants_agree
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1 ORDER BY 1"""),
    doc = "profile-store-driven join planning: broadcast/sort-merge/" +
      "salted chosen from published rows+NDV+bytes, the byte budget " +
      "flips the ladder on its own, plans pinned structurally " +
      "(AQE-aware tree walk), result oracle-invariant")

  /** q151 — STATS-DRIVEN STAR-JOIN ORDERING ([[Planner.starJoin]],
    * r19): the multi-join half of the q147 story. A fact stream joined
    * to k dims is the training-data-pipeline shape (lineitem × filtered
    * part × filtered orders × supplier here), and with inner joins each
    * dim FILTERS the fact — the survival fraction is
    * ndv(dim)/ndv(fact key) under containment — so the most selective
    * dim must join first: every later broadcast probe then carries the
    * shrunken stream. The query publishes real profiles for the fact's
    * three keys and the three (pre-filtered) dims, lets the planner
    * order and choose, and pins:
    *
    *  - `order_selective_first` — the planner put the 10%-survival dim
    *    (part, p_size ≤ 5) before the 34% dim (orders, status F) before
    *    the 100% dim (supplier): fractions measured 0.10/0.34/1.00 at
    *    BOTH SFs, far outside HLL error;
    *  - `all_broadcast` — every dim fits both budgets, and the executed
    *    plan carries broadcast-hash joins (tree-walk pin);
    *  - `fact_unshuffled` — the whole star executes map-side: scan → 3
    *    broadcast probes → partial agg, zero ShuffleExchange below the
    *    aggregation (q102's shuffle-count observable). At 100 TB this
    *    is THE plan: the fact never moves.
    *
    * The oracle is the plain 4-table SQL — ordering must be
    * result-invariant (Catalyst may itself reorder; the PLANNER's
    * decisions are pinned from its returned choices, the plan from the
    * executed tree). */
  val q151 = GraftQuery(
    "q151_stats_star_join",
    (spark, sfDir) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q151_star_${ProcessHandle.current().pid()}"
      graft.engine.sources.SnapshotStore.deleteRecursively(
        java.nio.file.Paths.get(base))
      val fact = Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"))
      val part = Tables.part(spark, sfDir).filter(col("p_size") <= 5)
        .select(col("p_partkey").as("l_partkey"))
      val ords = Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey"))
      val supp = Tables.supplier(spark, sfDir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      TableStats.refreshProfile(
        fact.select(col("l_partkey"), col("l_orderkey"), col("l_suppkey")),
        s"$base/fact", Seq("l_partkey", "l_orderkey", "l_suppkey"))
      TableStats.refreshProfile(part, s"$base/part", Seq("l_partkey"))
      TableStats.refreshProfile(ords, s"$base/ords", Seq("l_orderkey"))
      TableStats.refreshProfile(supp.select(col("l_suppkey")),
        s"$base/supp", Seq("l_suppkey"))
      def fp(k: String) = Planner.keyProfile(spark, s"$base/fact", k)
      val dims = Seq(
        Planner.Dim(supp, "l_suppkey", fp("l_suppkey"),
          Planner.keyProfile(spark, s"$base/supp", "l_suppkey")),
        Planner.Dim(ords, "l_orderkey", fp("l_orderkey"),
          Planner.keyProfile(spark, s"$base/ords", "l_orderkey")),
        Planner.Dim(part, "l_partkey", fp("l_partkey"),
          Planner.keyProfile(spark, s"$base/part", "l_partkey")))
      val (joined, choices) = Planner.starJoin(fact, dims,
        saltSource = col("l_extendedprice"))
      val orderOk = choices.map(_._1) ==
        Seq("l_partkey", "l_orderkey", "l_suppkey")
      val allBroadcastChosen =
        choices.forall(_._2 == Planner.BroadcastHash)
      val factUnshuffled = Bucketed.shuffleCount(joined) == 0
      val out = joined.groupBy(col("s_nationkey"))
        .agg(lcount().as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("s_nationkey"))
      out.collect() // force, so the tree-walk pins AQE's FINAL plan
      import graft.tools.PlanAudit
      out.withColumn("order_selective_first", lit(orderOk))
        .withColumn("all_broadcast",
          lit(allBroadcastChosen && PlanAudit.hasBroadcastHashJoin(out)))
        .withColumn("fact_unshuffled", lit(factUnshuffled))
    },
    Some(s"""SELECT s.s_nationkey, COUNT(*) AS n_rows,
        ${sqlDsum("l.l_extendedprice")} AS sum_price,
        TRUE AS order_selective_first, TRUE AS all_broadcast,
        TRUE AS fact_unshuffled
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size <= 5
      JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1 ORDER BY 1"""),
    doc = "stats-driven star join: dims ordered most-selective-first " +
      "from published profiles (survival = dim/fact key NDV), all " +
      "broadcast, fact side never shuffles — plan tree-walk pinned, " +
      "result oracle-invariant")

  /** q153 — HISTOGRAM-DRIVEN FILTER SELECTIVITY ([[Histogram]] +
    * [[Planner.filteredProfile]], r19): the range-selectivity fact the
    * q147/q151 planner was still missing. The dim a pipeline joins is
    * almost always FILTERED ("orders from this date band"), and the raw
    * table's rows×bytes over-refuse the broadcast the filtered side
    * earns. An equi-width histogram over orders' day column — maintained
    * in THREE incremental refreshes, delta-cost, through the one
    * IncrementalAgg machinery — estimates the band's survival fraction
    * ahead of time; [[Planner.filteredProfile]] scales the published
    * profile by it, and the ladder flips from the raw profile's
    * sort-merge to a broadcast of the filtered dim (plan pinned via the
    * tree walk).
    *
    * The estimate itself is pinned against ARITHMETIC, not folklore
    * (the [[Histogram]] error contract): the day band is built from
    * multiples of the bin width, so the aligned estimate must equal the
    * exact filtered count (zero straddle); a deliberately mis-aligned
    * band must err by at most its straddled edge bins' rows. Band
    * bounds derive from min/max day in exact integer arithmetic, so
    * DuckDB replays the same band and the result is plan-invariant. */
  val q153 = GraftQuery(
    "q153_histogram_selectivity",
    (spark, sfDir) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q153_hist_${ProcessHandle.current().pid()}"
      graft.engine.sources.SnapshotStore.deleteRecursively(
        java.nio.file.Paths.get(base))
      val dayUs = 86400000000L
      val ord = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          expr(s"unix_micros(o_orderdate) div ${dayUs}L").as("o_day"))
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
      // the band: multiples of the bin width w = span/16, starting two
      // bins above the min — exact long arithmetic both engines replay
      val Array(mm) = ord.agg(min(col("o_day")), max(col("o_day"))).collect()
      val (dmin, dmax) = (mm.getLong(0), mm.getLong(1))
      val w = math.max(1L, (dmax - dmin + 1L) / 16L)
      val lo = (dmin / w + 2L) * w
      val hiEx = lo + 3L * w
      // histogram maintained incrementally: three delta refreshes
      (0L to 2L).foreach { i =>
        Histogram.refresh(ord.filter(pmod(col("o_orderkey"), lit(3L)) === i),
          s"$base/hist", "o_day", binWidth = w, tag = Some(s"batch-$i"))
      }
      // published profiles: fact key + the dim's full broadcast payload
      TableStats.refreshProfile(li.select(col("o_orderkey")),
        s"$base/li", Seq("o_orderkey"))
      TableStats.refreshProfile(
        ord.select(col("o_orderkey"), col("o_orderpriority")),
        s"$base/ord", Seq("o_orderkey", "o_orderpriority"))
      val liKey = Planner.keyProfile(spark, s"$base/li", "o_orderkey")
      val ordKey = Planner.keyProfile(spark, s"$base/ord", "o_orderkey")
      // budgets the RAW dim fails but the ~3/16 band passes — scaled
      // from the profiled table itself, so the contract is SF-invariant
      val cfg = Planner.Config(broadcastMaxRows = ordKey.rows / 2L,
        broadcastMaxBytes = math.max(1L, ordKey.bytes / 2L))
      val cRaw = Planner.chooseJoin(liKey, ordKey, cfg)
      val est = Histogram.estimateRange(spark, s"$base/hist", lo, hiEx - 1L)
      val cF = Planner.chooseJoin(liKey,
        Planner.filteredProfile(ordKey, est.fraction), cfg)
      val dim = ord.filter(col("o_day") >= lo && col("o_day") < hiEx)
      val out = Planner.join(li, dim, "o_orderkey", cF,
          saltSource = col("l_extendedprice"))
        .groupBy(col("o_orderpriority"))
        .agg(lcount().as("n_rows"), dsum(col("l_extendedprice"))
          .as("sum_price"))
        .orderBy(col("o_orderpriority"))
      out.collect() // force execution so the tree walk reads the FINAL plan
      val actualAligned = dim.count()
      // deliberately mis-aligned band: starts mid-bin — the estimate may
      // interpolate, but by the error contract at most straddleRows off
      val est2 = Histogram.estimateRange(spark, s"$base/hist",
        lo + w / 2L, hiEx - 1L)
      val actual2 = ord.filter(col("o_day") >= lo + w / 2L &&
        col("o_day") < hiEx).count()
      import graft.tools.PlanAudit
      out
        .withColumn("raw_refuses", lit(cRaw == Planner.SortMerge))
        .withColumn("filtered_broadcasts",
          lit(cF == Planner.BroadcastHash &&
            PlanAudit.hasBroadcastHashJoin(out)))
        .withColumn("aligned_exact", lit(est.straddleRows == 0L &&
          math.abs(est.estimate - actualAligned.toDouble) < 0.5))
        .withColumn("unaligned_within_bound",
          lit(math.abs(est2.estimate - actual2.toDouble) <=
            est2.straddleRows.toDouble + 0.5))
    },
    Some(s"""WITH d AS (SELECT o_orderkey, o_orderpriority,
        epoch_us(o_orderdate) // 86400000000 AS o_day FROM orders),
      b AS (SELECT MIN(o_day) AS dmin, MAX(o_day) AS dmax FROM d),
      p AS (SELECT GREATEST(1, (dmax - dmin + 1) // 16) AS w, dmin FROM b),
      f AS (SELECT d.* FROM d, p
        WHERE o_day >= (dmin // w + 2) * w
          AND o_day < (dmin // w + 2) * w + 3 * w)
      SELECT f.o_orderpriority, COUNT(*) AS n_rows,
        ${sqlDsum("l.l_extendedprice")} AS sum_price,
        TRUE AS raw_refuses, TRUE AS filtered_broadcasts,
        TRUE AS aligned_exact, TRUE AS unaligned_within_bound
      FROM lineitem l JOIN f ON l.l_orderkey = f.o_orderkey
      GROUP BY 1 ORDER BY 1"""),
    doc = "incrementally-maintained equi-width histogram estimates a " +
      "date band's selectivity; the planner broadcasts the filtered dim " +
      "the raw profile refused (plan tree-walk pinned); aligned estimate " +
      "exact, mis-aligned within its own straddle bound — oracle-replayed")

  /** q157 — STAR ORDERING × HISTOGRAM SELECTIVITY (r20; VERDICT r19
    * item 1): the composition of the two r19 planner features, each
    * already oracle-pinned alone (q151: [[Planner.starJoin]] orders
    * dims most-selective-first; q153: [[Histogram.estimateRange]] +
    * [[Planner.filteredProfile]] flip the chooseJoin rung for a
    * filtered dim). Composed they must do BOTH AT ONCE: a
    * histogram-estimated date band scales the orders profile, and that
    * ONE scaled profile flips the dim's position in the star
    * (survival 1.0 → ~1/16, now ahead of part's ~0.10) AND its ladder
    * rung (sort-merge under the budget the raw profile refuses →
    * broadcast) — the PlannerSpec unit case run against real tables,
    * real published profiles, and a DuckDB oracle.
    *
    * Pinned booleans: `raw_orders_last`/`raw_refuses` — the star
    * planned from the RAW orders profile sorts orders behind part and
    * sort-merges it; `filtered_orders_first`/`all_broadcast` — the same
    * star planned from the band-filtered frame + scaled profile puts
    * orders FIRST and broadcasts every dim (executed-plan tree walk);
    * `fact_unshuffled` — the composed star runs map-side, zero
    * ShuffleExchange below the aggregation (the 100 TB posture: the
    * fact never moves). The band is one ALIGNED bin (lo = a bin
    * multiple, width w = span/16), so the estimate is exact by the
    * Histogram error contract and DuckDB replays the identical band in
    * integer arithmetic — the result must equal the naive two-join SQL
    * regardless of every planning decision. */
  val q157 = GraftQuery(
    "q157_star_histogram_compose",
    (spark, sfDir) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q157_starhist_${ProcessHandle.current().pid()}"
      graft.engine.sources.SnapshotStore.deleteRecursively(
        java.nio.file.Paths.get(base))
      val dayUs = 86400000000L
      val fact = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
      val ord = Tables.orders(spark, sfDir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"),
          expr(s"unix_micros(o_orderdate) div ${dayUs}L").as("o_day"))
      val partF = Tables.part(spark, sfDir).filter(col("p_size") <= 5)
        .select(col("p_partkey").as("l_partkey"))
      // published facts: the fact's two keys, the RAW orders payload
      // (key + the priority column the dim carries), the filtered part
      TableStats.refreshProfile(
        fact.select(col("l_orderkey"), col("l_partkey")),
        s"$base/fact", Seq("l_orderkey", "l_partkey"))
      TableStats.refreshProfile(
        ord.select(col("l_orderkey"), col("o_orderpriority")),
        s"$base/ord", Seq("l_orderkey", "o_orderpriority"))
      TableStats.refreshProfile(partF, s"$base/part", Seq("l_partkey"))
      val factOrd = Planner.keyProfile(spark, s"$base/fact", "l_orderkey")
      val factPart = Planner.keyProfile(spark, s"$base/fact", "l_partkey")
      val ordKey = Planner.keyProfile(spark, s"$base/ord", "l_orderkey")
      val partKey = Planner.keyProfile(spark, s"$base/part", "l_partkey")
      // budgets the RAW orders side fails but the ~1/16 band passes —
      // scaled from the profiled table itself, so SF-invariant
      val cfg = Planner.Config(broadcastMaxRows = ordKey.rows / 2L,
        broadcastMaxBytes = math.max(1L, ordKey.bytes / 2L))
      // one ALIGNED bin of the day histogram (exact by the error
      // contract); bounds in exact long arithmetic DuckDB replays
      val Array(mm) = ord.agg(min(col("o_day")), max(col("o_day"))).collect()
      val (dmin, dmax) = (mm.getLong(0), mm.getLong(1))
      val w = math.max(1L, (dmax - dmin + 1L) / 16L)
      val lo = (dmin / w + 2L) * w
      Histogram.refresh(ord, s"$base/hist", "o_day", binWidth = w)
      val est = Histogram.estimateRange(spark, s"$base/hist", lo, lo + w - 1L)
      val partDim = Planner.Dim(partF, "l_partkey", factPart, partKey)
      // the RAW star: orders' survival is 1.0 — it sorts LAST and its
      // rows refuse the broadcast budget (choices only; never executed)
      val (_, rawChoices) = Planner.starJoin(fact,
        Seq(Planner.Dim(ord.select(col("l_orderkey"),
          col("o_orderpriority")), "l_orderkey", factOrd, ordKey),
          partDim),
        saltSource = col("l_extendedprice"), cfg)
      val rawOrdersLast =
        rawChoices.map(_._1) == Seq("l_partkey", "l_orderkey")
      val rawRefuses = rawChoices.toMap
        .get("l_orderkey").contains(Planner.SortMerge)
      // the COMPOSED star: the band-filtered frame with its
      // histogram-scaled profile flips position AND rung
      val ordF = ord.filter(col("o_day") >= lo && col("o_day") < lo + w)
        .select(col("l_orderkey"), col("o_orderpriority"))
      val (joined, fChoices) = Planner.starJoin(fact,
        Seq(Planner.Dim(ordF, "l_orderkey", factOrd,
          Planner.filteredProfile(ordKey, est.fraction)), partDim),
        saltSource = col("l_extendedprice"), cfg)
      val filteredOrdersFirst =
        fChoices.map(_._1) == Seq("l_orderkey", "l_partkey")
      val allBroadcastChosen =
        fChoices.forall(_._2 == Planner.BroadcastHash)
      val factUnshuffled = Bucketed.shuffleCount(joined) == 0
      val out = joined.groupBy(col("o_orderpriority"))
        .agg(lcount().as("n_rows"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
      out.collect() // force, so the tree walk pins AQE's FINAL plan
      import graft.tools.PlanAudit
      out.withColumn("raw_orders_last", lit(rawOrdersLast))
        .withColumn("raw_refuses", lit(rawRefuses))
        .withColumn("filtered_orders_first", lit(filteredOrdersFirst))
        .withColumn("all_broadcast",
          lit(allBroadcastChosen && PlanAudit.hasBroadcastHashJoin(out)))
        .withColumn("fact_unshuffled", lit(factUnshuffled))
    },
    Some(s"""WITH d AS (SELECT o_orderkey, o_orderpriority,
        epoch_us(o_orderdate) // 86400000000 AS o_day FROM orders),
      b AS (SELECT MIN(o_day) AS dmin, MAX(o_day) AS dmax FROM d),
      p AS (SELECT GREATEST(1, (dmax - dmin + 1) // 16) AS w, dmin FROM b),
      f AS (SELECT d.o_orderkey, d.o_orderpriority FROM d, p
        WHERE o_day >= (dmin // w + 2) * w
          AND o_day < (dmin // w + 2) * w + w)
      SELECT f.o_orderpriority, COUNT(*) AS n_rows,
        ${sqlDsum("l.l_extendedprice")} AS sum_price,
        TRUE AS raw_orders_last, TRUE AS raw_refuses,
        TRUE AS filtered_orders_first, TRUE AS all_broadcast,
        TRUE AS fact_unshuffled
      FROM lineitem l
      JOIN f ON l.l_orderkey = f.o_orderkey
      JOIN part pt ON l.l_partkey = pt.p_partkey AND pt.p_size <= 5
      GROUP BY 1 ORDER BY 1"""),
    doc = "starJoin x filteredProfile composition: one histogram-" +
      "estimated date band (aligned bin, exact) scales the orders " +
      "profile and flips BOTH its star position (last -> first, ~1/16 " +
      "vs part's ~0.10 survival) and its ladder rung (sort-merge -> " +
      "broadcast); composed star runs map-side (zero fact shuffle, " +
      "tree-walk pinned), result equals the naive two-join SQL")

  def queries: Seq[GraftQuery] =
    Seq(q28, q29, q51, q92, q52, q53, q54, x28, q93, q96, q97, q100, q101,
      q102, q105, q106, q110, q147, q151, q153, q157)
}
