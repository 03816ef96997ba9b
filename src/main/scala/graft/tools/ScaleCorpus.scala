package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic, PREFIX-STABLE synthetic corpora for the scale
  * rehearsal ([[ScaleRehearsal]]; VERDICT r17 item 1) — the
  * [[ClusteredVectors]] pattern extended to documents and events so the
  * heavy operator families can be measured at 10–100× the driver
  * testdata without new fixtures.
  *
  * Every row is a pure function of (seed, id): generation is a
  * distributed `spark.range(...).map` with no driver materialization and
  * no shared RNG stream, so the same (seed, id) yields the same row at
  * ANY corpus size — corpus(n) is literally the first n rows of
  * corpus(10n). That prefix stability is what makes cross-size timings a
  * scaling measurement instead of a workload change.
  *
  * The DISTRIBUTIONS are chosen so per-row workload statistics stay
  * scale-invariant (the property a naive "replicate sf0.1 ten times"
  * corpus destroys — replication turns every doc into a 10-way near-dup
  * cluster and inflates LSH buckets quadratically):
  *
  *  - documents: ~60-word docs over a cubed-uniform (Zipf-ish) shared
  *    vocabulary — realistic shingle collision rates; a constant 10% of
  *    docs are single-word mutations of their predecessor, so the
  *    near-dup RATE (what MinHash/SimHash candidate counts scale with)
  *    is the same at every n;
  *  - events: 5 weighted event types (constant-fraction hot keys) and a
  *    user population scaling with n (constant events-per-user ≈ the
  *    testdata's ~66), matching sf0.1's skew profile.
  */
object ScaleCorpus {

  /** One doc's words — pure in (seed, docId); `mutate` swaps one word so
    * consecutive (base, mutant) pairs are genuine near-dups (Jaccard
    * well above 0.5 at ~60 words) without being exact dups. */
  private def words(seed: Long, docId: Long, vocab: Int,
      mutate: Boolean): Array[String] = {
    val rnd = new java.util.Random(seed ^ (docId * 2654435761L))
    val n = 40 + rnd.nextInt(41) // 40..80 words
    val w = Array.tabulate(n) { _ =>
      val u = rnd.nextDouble()
      "w" + (u * u * u * vocab).toInt // cubed-uniform: low ids frequent
    }
    if (mutate && n > 2) {
      val mrnd = new java.util.Random(seed * 31L + docId)
      w(mrnd.nextInt(n)) = "m" + mrnd.nextInt(vocab)
    }
    w
  }

  def documents(spark: SparkSession, n: Long, seed: Long = 42L,
      vocab: Int = 50000): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, spark.sparkContext.defaultParallelism)
      .map { boxed =>
        val id = boxed.longValue
        // every 10th doc is a one-word mutation of its predecessor:
        // constant near-dup fraction at any n
        val nearDup = id % 10L == 1L && id > 0L
        val baseId = if (nearDup) id - 1L else id
        val text = words(seed, baseId, vocab, mutate = nearDup)
          .mkString(" ")
        val langs = Array("en", "de", "fr", "es")
        val lang = langs((id % 4L).toInt)
        val source = "src" + (id % 20L)
        (id, text, lang, source, text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  def events(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val users = math.max(1L, n / 66L) // testdata's events-per-user ratio
    val types = Array("view", "click", "purchase", "signup", "error")
    // cumulative weights: view-heavy, error-rare (constant fractions)
    val cum = Array(0.50, 0.75, 0.90, 0.97, 1.0)
    spark.range(0L, n, 1L, spark.sparkContext.defaultParallelism)
      .map { boxed =>
        val id = boxed.longValue
        val rnd = new java.util.Random(seed ^ (id * 2654435761L))
        val u = rnd.nextDouble()
        val t = types(cum.indexWhere(u <= _))
        val ts = new java.sql.Timestamp(
          1700000000000L + (id * 733L) % (86400L * 30L * 1000L))
        (id, ts, rnd.nextLong().abs % users, t, rnd.nextDouble() * 100.0,
          "p" + rnd.nextInt(100))
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }
}
