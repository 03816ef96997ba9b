package graft.engine.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text analysis for LLM-data curation (X4): per-document statistics,
  * quality scoring, heuristic language ID, token counting, TF-IDF.
  * Everything is narrow projections + one aggregation; the only shuffles
  * are the final group-bys, all on low-cardinality or well-distributed keys.
  */
object TextAnalysis {

  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Small function-word marker lists for the heuristic language scorer.
    * Deliberately tiny — the operator shape (argmax over per-language
    * evidence counts) is what scales, not the lists. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "von", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "avec", "de", "un"),
    "es" -> Seq("el", "los", "las", "es", "con", "de", "un", "una"))

  private def markerScore(ws: Column, lang: String): Column =
    size(filter(ws, w => w.isInCollection(markers(lang)))).cast(LongType)

  /** Per-document statistics: token count, distinct tokens, type-token
    * ratio, mean token length. */
  def docStats(df: DataFrame, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    df.withColumn("n_words", size(ws).cast(LongType))
      .withColumn("n_distinct_words", size(array_distinct(ws)).cast(LongType))
      .withColumn("ttr",
        round(col("n_distinct_words").cast("double") / col("n_words"), 6))
      .withColumn("mean_word_len",
        round(aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double")
          / col("n_words"), 6))
  }

  /** Quality signals: length score, stopword ratio, digit ratio, composite
    * score in [0,1] with a keep/drop flag — the standard pre-training
    * heuristics (length bounds + function-word presence + symbol noise). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val allMarkers = markers.values.flatten.toSeq.distinct
    // Ratios stay UNROUNDED until output: rounding intermediates to 6dp can
    // land the weighted sum exactly on a round-half boundary, where Spark
    // and DuckDB round() disagree (observed: 0.8176465 → .817646/.817647).
    df.withColumn("n_words", size(ws).cast(LongType))
      .withColumn("_sw_raw",
        size(filter(ws, w => w.isInCollection(allMarkers))).cast("double")
          / col("n_words"))
      .withColumn("_dg_raw",
        (length(col(textCol)) -
          length(regexp_replace(col(textCol), "[0-9]", ""))).cast("double")
          / length(col(textCol)))
      .withColumn("length_score",
        when(col("n_words").between(20, 2000), 1.0)
          .when(col("n_words").between(5, 5000), 0.5)
          .otherwise(0.0))
      .withColumn("quality",
        round(lit(0.5) * col("length_score")
          + lit(0.3) * least(col("_sw_raw") * 5.0, lit(1.0))
          + lit(0.2) * (lit(1.0) - least(col("_dg_raw") * 10.0, lit(1.0))), 6))
      .withColumn("keep", (col("quality") >= 0.5).cast(LongType))
      .withColumn("stopword_ratio", round(col("_sw_raw"), 6))
      .withColumn("digit_ratio", round(col("_dg_raw"), 6))
      .drop("_sw_raw", "_dg_raw")
  }

  /** Heuristic language ID: argmax of marker-word evidence with a fixed
    * tie-break order (en > de > fr > es > unknown). */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    df.withColumn("s_en", markerScore(ws, "en"))
      .withColumn("s_de", markerScore(ws, "de"))
      .withColumn("s_fr", markerScore(ws, "fr"))
      .withColumn("s_es", markerScore(ws, "es"))
      .withColumn("lang_pred",
        when(col("s_en") + col("s_de") + col("s_fr") + col("s_es") === 0L, "und")
          .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
            col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es"))
  }

  /** BPE-ish token counting: word pieces, numbers, and single non-space
    * symbols — the standard pre-tokenizer regex family. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast(LongType)

  /** Context-window chunking: fixed-size token windows with overlap —
    * the standard pre-training sequence-prep operator. Chunk starts are
    * 0, stride, 2·stride, … while start < n (stride = size − overlap;
    * the last chunk may be short). Narrow: one transform + one explode,
    * no shuffle.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val tok = words(col(textCol))
    df.select(col(idCol).cast(LongType).as("doc_id"), tok.as("tok"))
      .withColumn("n_tok", size(col("tok")))
      .withColumn("chunk", explode(transform(
        sequence(lit(0), ceil((col("n_tok").cast("double")) / stride).cast("int") - 1),
        i => struct(
          i.cast(LongType).as("chunk_idx"),
          slice(col("tok"), i * stride + 1, lit(chunkSize)).as("chunk_tok")))))
      .select(col("doc_id"), col("chunk.chunk_idx").as("chunk_idx"),
        col("chunk.chunk_tok").as("chunk_tok"))
      .filter(size(col("chunk_tok")) > 0)
  }

  /** Deterministic hashing-trick text embedding (feature hashing,
    * Weinberger et al. 2009): each word occurrence lands in bucket
    * `md5(word)[0:4] mod dim` with sign `md5(word)[4] < '8'` (+1/−1),
    * and a document's embedding is the per-bucket signed count vector —
    * the classic signed-hash featurizer, chosen over xxhash so ANY
    * engine with md5 replays the exact vectors (the same md5-prefix
    * trick as [[Curation.hashSample]]). Integer components on purpose:
    * no normalization at embed time (cosine normalizes anyway), so every
    * value is engine-replayable BIGINT arithmetic.
    *
    * This is the documents → embeddings bridge: the [[Similarity]]
    * operators (brute-force/LSH/IVF/PQ top-k, near-dup, semantic dedup)
    * run unchanged on the output, giving text-to-ANN pipelines with no
    * external model (q117 composes exactly that, DuckDB-replayed end to
    * end). Scale shape: explode → two hash-aggregations (map-side
    * partial), output dim·8 bytes per doc; wordless docs embed as the
    * zero vector, not a dropped row. */
  def embedText(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 65536, "need 1 <= dim <= 65536 (16-bit bucket)")
    val h = md5(col("w").cast("binary"))
    // fanOut: the per-word md5 kernel + explode emit one row per WORD
    // into the bucket aggregation's shuffle, so one exchange of the raw
    // text is a rounding error next to it — and it rescues the kernel
    // from the single-task stage a one-row-group input pins it to
    // (guide §2.5; same argument as Dedup.windowKeys).
    val sums = graft.engine.Par.fanOut(df, col(idCol))
      .select(col(idCol).cast(LongType).as("doc_id"),
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+|[0-9]+"), lit(0))).as("w"))
      .select(col("doc_id"),
        (conv(substring(h, 1, 4), 16, 10).cast(LongType) % dim)
          .cast("int").as("bucket"),
        when(substring(h, 5, 1) < "8", 1L).otherwise(-1L).as("sgn"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sgn")).as("v"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v"))))
        .as("m"))
    df.select(col(idCol).cast(LongType).as("doc_id")).distinct()
      .join(sums, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => coalesce(element_at(col("m"), j), lit(0L))).as("embedding"))
  }

  /** Text normalization for dedup/quality pipelines: lowercase, strip
    * non-alphanumerics to spaces, collapse whitespace runs, trim. Pure
    * narrow projection. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** TF-IDF via explode → per-(doc,term) tf → per-term df → idf join.
    * Smoothed idf = ln((N+1)/(df+1)) + 1. Two shuffles (term stats, join
    * back) — at 100 TB the term dimension is Zipf-skewed, so the doc-freq
    * aggregation benefits from partial aggregation (automatic) and AQE skew
    * handling on the join.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count()
    val terms = df.select(col(idCol).cast(LongType).as("doc_id"),
        explode(words(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast(LongType).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast(LongType).as("df"))
    tf.join(dfreq, Seq("term"))
      .withColumn("idf", log((lit(n.toDouble) + 1.0) / (col("df") + lit(1.0))) + lit(1.0))
      .withColumn("tfidf", round(col("tf") * col("idf"), 6))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** PII redaction (the C4/RefinedWeb scrubbing move): count and replace
    * email addresses and simple phone patterns with placeholder tokens.
    * Pure narrow regexp projections — both patterns stay in the common
    * Java-regex/RE2 subset so an oracle engine replays them exactly. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "555-[0-9]{4}"

  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).cast(LongType))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0))).cast(LongType))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"))

  /** Within-document repetition score (RefinedWeb repetition-removal
    * signal): 1 − distinct/total over word 3-grams; 0 = no repeated
    * 3-gram, →1 = the document is one phrase repeated. Narrow. */
  def repetitionScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = graft.engine.functions.F.shingles(words(col(textCol)), 3)
    df.select(col(idCol).cast(LongType).as("doc_id"),
        size(sh).cast(LongType).as("n_3grams"),
        size(array_distinct(sh)).cast(LongType).as("n_distinct_3grams"))
      .withColumn("repetition",
        round(lit(1.0) - col("n_distinct_3grams").cast("double")
          / col("n_3grams"), 6))
  }

  /** Unigram-LM surprisal per document (the KenLM-perplexity-filter
    * analog with the corpus itself as the LM): mean −ln p(token) under
    * corpus unigram frequencies. Low = typical text, high = outlier —
    * the standard "weird text" quality gate.
    *
    * Scale posture: term probabilities are one Zipf-skewed aggregation
    * (map-side partials absorb the hot terms) joined back to the token
    * stream — AQE skew handling applies; per-doc re-aggregation uses the
    * decimal sum so the mean is engine-replayable. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = df.select(col(idCol).cast(LongType).as("doc_id"),
        explode(words(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val total = terms.count()
    val probs = terms.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .withColumn("neg_ln_p", -log(col("cnt") / lit(total.toDouble)))
      .drop("cnt")
    terms.join(probs, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_tokens"),
        graft.engine.relational.Exact.dsum(col("neg_ln_p")).as("sum_s"))
      .withColumn("surprisal", round(col("sum_s") / col("n_tokens"), 6))
      .drop("sum_s")
  }

  /** BM25 retrieval scoring of every document against a fixed query-term
    * set (Robertson/Sparck-Jones idf, k1/b standard defaults) — the
    * relevance-filtering move of a retrieval-augmented data pipeline.
    *
    * score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * Scale posture: the term explode is filtered to the query terms BEFORE
    * the (doc,term) aggregation, so the shuffle carries query-term hits
    * only; corpus stats (N, avgdl) and per-term df are single-row /
    * |terms|-row aggregates broadcast via cross-join. Per-term partial
    * scores re-aggregate with a decimal sum (order-independent — the
    * DuckDB twin replays the exact value). */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val n = df.count()
    val docs = df.select(col(idCol).cast(LongType).as("doc_id"),
      words(col(textCol)).as("ws"))
      .withColumn("doclen", size(col("ws")).cast(LongType))
    // sum over zero rows is NULL — an empty corpus must yield an empty
    // result (see EdgeCasesSpec), not an NPE reading the aggregate
    val avgdlRow = docs.agg(sum(col("doclen")).cast("double") / count(lit(1)))
      .head()
    if (avgdlRow.isNullAt(0)) {
      import df.sparkSession.implicits._
      return Seq.empty[(Long, Long, Double)]
        .toDF("doc_id", "n_matched_terms", "bm25")
    }
    val avgdl = avgdlRow.getDouble(0)
    val hits = docs.select(col("doc_id"), col("doclen"),
        explode(col("ws")).as("term"))
      .filter(col("term").isInCollection(queryTerms))
    val tf = hits.groupBy(col("doc_id"), col("doclen"), col("term"))
      .agg(count(lit(1)).cast(LongType).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast(LongType).as("df"))
    tf.join(broadcast(dfreq), Seq("term"))
      .withColumn("idf",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("part",
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("doclen") / lit(avgdl))))
      .groupBy(col("doc_id"))
      .agg(graft.engine.relational.Exact.dsum(col("part")).as("score_raw"),
        count(lit(1)).cast(LongType).as("n_matched_terms"))
      .withColumn("bm25", round(col("score_raw"), 6))
      .drop("score_raw")
  }
}
