package graft.engine

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark
import graft.engine.ml.{Metrics, Stages}
import graft.engine.llm.Dedup

/** Property-style invariants that need a SparkSession: generated inputs via
  * ScalaCheck Gen (fixed seeds, a handful of samples — each sample runs
  * Spark jobs). SURVEY.md §5.2. */
class SparkPropertySpec extends AnyFunSuite {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val labelsGen =
    Gen.nonEmptyListOf(Gen.oneOf("ant", "bee", "cat", "dog", "elk"))

  test("property: decode∘encode = identity for arbitrary label multisets") {
    samples(labelsGen, 5).foreach { labels =>
      val df = labels.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "v")
      val dict = Stages.labelDictionary(df, "v")
      val rt = Stages.decodeWithDictionary(
        Stages.encodeWithDictionary(df, dict, "v", "c"), dict, "c", "v2")
      assert(rt.filter(col("v") =!= col("v2")).count() == 0, s"failed for $labels")
      // codes are dense 0..k-1
      val codes = dict.select("code").collect().map(_.getLong(0)).sorted
      assert(codes.toSeq == (0L until codes.length).toSeq)
    }
  }

  test("property: multiclass metrics stay in [0,1]; accuracy invariant under label permutation") {
    val pairsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 3), Gen.choose(0, 3)))
    samples(pairsGen, 5).foreach { pairs =>
      val df = pairs.toDF("label", "prediction")
      val m = Metrics.multiclassMetrics(df, "label", "prediction").collect()(0)
      Seq("accuracy", "weighted_precision", "weighted_recall", "weighted_f1")
        .foreach { c =>
          val v = m.getAs[Double](c)
          assert(v >= 0.0 && v <= 1.0, s"$c=$v for $pairs")
        }
      // permute class ids consistently: accuracy must not change
      val perm = Map(0 -> 2, 1 -> 3, 2 -> 0, 3 -> 1)
      val permuted = pairs.map { case (l, p) => (perm(l), perm(p)) }
        .toDF("label", "prediction")
      val m2 = Metrics.multiclassMetrics(permuted, "label", "prediction").collect()(0)
      assert(m.getAs[Double]("accuracy") == m2.getAs[Double]("accuracy"))
    }
  }

  test("property: exactDedup is idempotent and keeps one row per distinct text") {
    val docsGen = Gen.nonEmptyListOf(Gen.oneOf(
      "aa bb cc", "dd ee ff", "gg hh", "aa bb cc ", "AA BB CC"))
    samples(docsGen, 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = Dedup.exactDedup(df, "text", "doc_id")
      val twice = Dedup.exactDedup(once, "text", "doc_id")
      assert(once.count() == twice.count())
      val distinctNorm = texts.map(_.trim.toLowerCase).distinct.size
      assert(once.count() == distinctNorm, s"for $texts")
    }
  }

  test("property: hashSample membership is monotone in the fraction") {
    // sample(f1) ⊆ sample(f2) whenever f1 <= f2 — the property that makes a
    // sampled subcorpus extensible without re-deriving it from scratch.
    val keys = spark.range(2000).toDF("doc_id")
    val fracGen = Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0))
    samples(fracGen, 5).foreach { case (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val small = graft.engine.llm.Curation.hashSample(keys, col("doc_id"), lo)
        .collect().map(_.getLong(0)).toSet
      val big = graft.engine.llm.Curation.hashSample(keys, col("doc_id"), hi)
        .collect().map(_.getLong(0)).toSet
      assert(small.subsetOf(big), s"fraction $lo not nested in $hi")
    }
  }

  test("property: binned range joins == naive theta joins for arbitrary " +
      "intervals and bin widths") {
    import graft.engine.relational.RangeJoin
    // coordinates straddle zero and bin boundaries; widths vary per sample
    val coordGen = Gen.choose(-50L, 50L)
    val caseGen = for {
      pts <- Gen.listOfN(30, coordGen)
      ivs <- Gen.nonEmptyListOf(Gen.zip(coordGen, Gen.choose(0L, 25L)))
      w <- Gen.oneOf(1L, 3L, 7L, 10L, 64L)
    } yield (pts, ivs.take(12), w)
    samples(caseGen, 5).foreach { case (pts, ivs, w) =>
      val points = pts.zipWithIndex.map { case (p, i) => (s"p$i", p) }
        .toDF("p_id", "p_v")
      val intervals = ivs.zipWithIndex
        .map { case ((s, len), i) => (s"i$i", s, s + len) }
        .toDF("iv_id", "s_v", "e_v")
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("iv_id", "p_id").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      val naive = points.join(intervals,
        col("s_v") <= col("p_v") && col("p_v") < col("e_v"))
      val binned = RangeJoin.pointInInterval(points, intervals,
        "p_v", "s_v", "e_v", binWidth = w)
      assert(pairs(binned) == pairs(naive), s"w=$w ivs=$ivs")
      // overlap: self-join the interval set against a shifted copy
      val rhs = intervals.select(col("iv_id").as("r_id"),
        (col("s_v") - 3L).as("rs"), (col("e_v") + 2L).as("re"))
      def opairs(df: org.apache.spark.sql.DataFrame) =
        df.select("iv_id", "r_id").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      val onaive = intervals.join(rhs,
        col("s_v") < col("re") && col("rs") < col("e_v"))
      val obinned = RangeJoin.intervalOverlap(intervals, rhs,
        "s_v", "e_v", "rs", "re", binWidth = w)
      assert(opairs(obinned) == opairs(onaive), s"overlap w=$w ivs=$ivs")
    }
  }

  test("property: distributed BPE training == single-threaded reference " +
      "for arbitrary corpora and merge counts") {
    import graft.engine.llm.Tokenizer
    // words over a 3-letter alphabet maximize pair collisions, overlap
    // runs, and count ties — the regimes where a fold-rule or tie-break
    // drift would show
    val wordGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val caseGen = for {
      ws <- Gen.nonEmptyListOf(wordGen)
      n <- Gen.choose(1, 6)
    } yield (ws.take(25), n)

    samples(caseGen, 5).foreach { case (words, n) =>
      val df = Seq(words.mkString(" ")).toDF("t")
      val got = Tokenizer.trainBpeMerges(df, "t", n).toList
      val want = graft.engine.llm.BpeReference.train(words, n)
      assert(got == want, s"words=$words n=$n:\n got $got\n want $want")
    }
  }

  // single-threaded reference for the exact-substring span family:
  // brute-force window counts -> marked positions -> island merge
  private def refSpans(docs: Seq[(Long, String)],
      l: Int): Set[(Long, Long, Long)] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for ((_, t) <- docs if t.length >= l; i <- 0 to t.length - l) {
      val w = t.substring(i, i + l)
      counts(w) = counts.getOrElse(w, 0) + 1
    }
    docs.flatMap { case (id, t) =>
      val hits =
        if (t.length < l) Seq.empty
        else (0 to t.length - l).filter(i => counts(t.substring(i, i + l)) >= 2)
      val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      var start = -1
      var prev = -(l + 1)
      for (p <- hits) {
        if (start < 0) start = p
        else if (p > prev + l) {
          spans += ((start.toLong, (prev + l).toLong)); start = p
        }
        prev = p
      }
      if (start >= 0) spans += ((start.toLong, (prev + l).toLong))
      spans.map { case (s, e) => (id, s, e) }
    }.toSet
  }

  test("property: repeatedSpans (BOTH key paths) and trimRepeatedSpans " +
      "match the single-threaded reference on random 2-letter corpora") {
    // 2-letter alphabet, short docs, l = 3: dense organic repeats,
    // overlap runs, self-repeats, and sub-l docs all arise naturally
    val docGen = Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    val corpusGen = Gen.choose(2, 7).flatMap(k => Gen.listOfN(k, docGen))
    val l = 3
    samples(corpusGen, 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val want = refSpans(docs, l)
      for (hashed <- Seq(false, true)) {
        val got = (if (hashed) Dedup.repeatedSpansHashed(df, "text", "doc_id", l)
                   else Dedup.repeatedSpans(df, "text", "doc_id", l))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
        assert(got == want,
          s"hashed=$hashed texts=$texts:\n got $got\n want $want")
      }
      // trim: reference = drop every char covered by a reference span
      val wantTrim = docs.map { case (id, t) =>
        val covered = Array.fill(t.length)(false)
        want.filter(_._1 == id).foreach { case (_, s, e) =>
          (s.toInt until e.toInt).foreach(covered(_) = true)
        }
        id -> t.zipWithIndex.collect {
          case (c, i) if !covered(i) => c
        }.mkString
      }.toMap
      val gotTrim = Dedup.trimRepeatedSpans(df, "text", "doc_id", l)
        .select(col("doc_id"), col("trimmed_text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(gotTrim == wantTrim, s"texts=$texts")
    }
  }

  test("property: readKeys == unpruned full-scan lookup for arbitrary " +
      "stores and key subsets (composite keys, misses, duplicates)") {
    import graft.engine.sources.SnapshotStore
    // rows over a SMALL composite-key space so re-keys and misses arise;
    // last write wins is irrelevant (publishBucketed takes rows verbatim),
    // so dedupe the generated identities first
    val rowsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 30L), Gen.oneOf("en", "de", "fr"),
        Gen.choose(-5, 5)))
    val keysGen = Gen.listOf(
      Gen.zip(Gen.choose(0L, 40L), Gen.oneOf("en", "de", "fr", "xx")))
    samples(Gen.zip(rowsGen, keysGen, Gen.oneOf(1, 3, 7)), 4)
      .foreach { case (rows, keys, nBuckets) =>
        val r = java.nio.file.Files
          .createTempDirectory("graft-prop-rk").toString + "/tbl"
        val data = rows.map { case (id, lang, v) => (id, lang, v) }
          .distinctBy(t => (t._1, t._2))
        val df = data.toDF("k", "lang", "v")
        SnapshotStore.publishBucketed(df, r, "k,lang", nBuckets)
        val keysDf = keys.toDF("k", "lang")
        val got = SnapshotStore.readKeys(keysDf, r)
          .collect().map(rw => (rw.getLong(0), rw.getString(1),
            rw.getInt(2))).toSet
        val want = data.filter(t => keys.contains((t._1, t._2))).toSet
        assert(got == want,
          s"nBuckets=$nBuckets rows=$data keys=$keys:\n got $got\n want $want")
      }
  }

  test("property: clustered metadata reads (countBox / readTopK / " +
      "tableStats) == direct computation for arbitrary data and boxes") {
    import graft.engine.sources.ClusteredStore
    val rowsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(-100L, 100L), Gen.choose(-50L, 50L)))
    val boxGen = Gen.zip(Gen.choose(-120L, 120L), Gen.choose(0L, 80L),
      Gen.choose(-60L, 60L), Gen.choose(0L, 40L))
    samples(Gen.zip(rowsGen, boxGen, Gen.choose(1, 12)), 5).foreach {
      case (rows, (aLo, aSpan, bLo, bSpan), k) =>
        val df = rows.zipWithIndex
          .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "a", "b")
        val root = s"${System.getProperty("java.io.tmpdir")}/" +
          s"prop_meta_${ProcessHandle.current().pid()}_${System.nanoTime()}"
        ClusteredStore.publishClustered(df, root, Seq("a", "b"), nFiles = 4)
        val box = Seq(("a", aLo, aLo + aSpan), ("b", bLo, bLo + bSpan))
        val (n, _, _) = ClusteredStore.countBox(spark, root, box)
        val want = rows.count { case (a, b) =>
          a >= aLo && a <= aLo + aSpan && b >= bLo && b <= bLo + bSpan }
        assert(n == want.toLong, s"countBox $n != $want for $box on $rows")
        val (stats, envs, statRead, _) = ClusteredStore.tableStats(spark, root)
        assert(stats == rows.size.toLong && statRead == 0)
        assert(envs("a") == ((rows.map(_._1).min, rows.map(_._1).max)))
        val (cand, _, _) = ClusteredStore.readTopK(spark, root, "a", k)
        val got = cand.orderBy(col("a").desc, col("id").desc).limit(k)
          .select(col("id")).collect().map(_.getLong(0)).toSeq
        val wantTop = rows.zipWithIndex
          .map { case ((a, _), i) => (a, i.toLong) }
          .sorted(Ordering[(Long, Long)].reverse).take(k).map(_._2)
        assert(got == wantTop, s"readTopK k=$k $got != $wantTop on $rows")
    }
  }
}
