package graft.engine.jobs

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions.col
import graft.engine.ml.{Fit, Metrics, Predict, TrainTestSplit}
import graft.engine.schema.Schemas.IrisColumns._

/** CLI entry points mirroring the reference's mains (SURVEY.md §3
  * entry-point mapping). One main per lifecycle with a `--mode` switch for
  * the pipeline variant — same capability surface as the reference's five
  * ModelFit/Predict pairs:
  *
  *   reference TrainTestSplit            → TrainTestSplitJob
  *   no_pipeline.ModelFit/Predict        → FitJob/PredictJob --mode manual
  *   pipeline.ModelFit/Predict           → FitJob/PredictJob --mode pipeline
  *   cross_validation.ModelFit/Predict   → FitJob/PredictJob --mode cv
  *   xgboost_*                           → FitJob/PredictJob --mode gbt
  */
object TrainTestSplitJob {
  def main(args: Array[String]): Unit = {
    val o = Args.parse(args)
    val spark = graft.engine.GraftSession.create("graft-train-test-split")
    try TrainTestSplit.run(spark,
      input = Args.required(o, "input"),
      trainPath = Args.required(o, "train"),
      testPath = Args.required(o, "test"),
      trainPercent = o.getOrElse("train-percent", "0.7").toDouble,
      seed = o.getOrElse("seed", "42").toLong,
      overwrite = o.getOrElse("overwrite", "false").toBoolean)
    finally spark.stop()
  }
}

object FitJob {
  def main(args: Array[String]): Unit = {
    val o = Args.parse(args)
    val spark = graft.engine.GraftSession.create("graft-fit")
    try {
      val train = spark.read.parquet(Args.required(o, "input"))
      val out = Args.required(o, "model-out")
      o.getOrElse("mode", "pipeline") match {
        case "manual" =>
          // the reference's persistPipelineStage pattern: one dir per stage
          // (reference no_pipeline/ModelFit.scala:143-152)
          val m = Fit.manual(train)
          Predict.saveStage(m.indexer, s"$out/string_indexer")
          Predict.saveStage(m.assembler, s"$out/vector_assembler")
          Predict.saveStage(m.model, s"$out/random_forest")
          Predict.saveStage(m.decoder, s"$out/index_to_string")
          println(reportRf(m.model))
        case "pipeline" =>
          val m = Fit.pipelined(train)
          Predict.saveStage(m, out)
          println(reportRf(m.stages(2)
            .asInstanceOf[org.apache.spark.ml.classification.RandomForestClassificationModel]))
        case "cv" =>
          val cv = Fit.crossValidated(train,
            numFolds = o.getOrElse("folds", "3").toInt,
            parallelism = o.getOrElse("parallelism", "4").toInt)
          // always persist the FITTED best model (the reference saved the
          // unfitted estimator on its non-overwrite branch — SURVEY.md §2.1)
          Predict.saveStage(cv, out)
          println(s"cv avgMetrics: ${cv.avgMetrics.mkString(", ")}")
        case "gbt" =>
          Predict.saveStage(Fit.gbtOneVsRest(train), out)
        case m => throw new IllegalArgumentException(s"unknown --mode $m")
      }
    } finally spark.stop()
  }

  /** A2 — feature-importance report with the CORRECT getters (the
    * reference's main-side report printed getNumTrees four times — bug
    * noted in SURVEY.md §5; the corrected test-copy getters are used). */
  private def reportRf(m: org.apache.spark.ml.classification.RandomForestClassificationModel): String = {
    val importances = m.featureImportances.toArray.zipWithIndex
      .sortBy { case (imp, idx) => (-imp, idx) }
      .map { case (imp, idx) => f"  feature[$idx%d] = $imp%.6f" }
    s"""RandomForest: numClasses=${m.numClasses} numFeatures=${m.numFeatures}
       |trees=${m.getNumTrees} totalNodes=${m.totalNumNodes}
       |featureImportances (desc):
       |${importances.mkString("\n")}""".stripMargin
  }
}

/** Corpus-curation CLI: the X4/curation operators as a runnable pipeline
  * over a documents-shaped parquet (doc_id, text, source, ...).
  *
  *   --mode filter        dedup + quality + language + length gates
  *   --mode sample        deterministic md5-bucket sample (--fraction)
  *   --mode pack          token-budget sequence packing (--budget, sharded
  *                        by source)
  *   --mode decontaminate 13-gram overlap vs --benchmark parquet
  *   --mode spans         per-doc exact-substring dup accounting
  *                        (--min-len, default 40)
  *   --mode trim-spans    boilerplate strip: every repeated span cut
  *                        (--min-len)
  *   --mode shard         deterministic global training shuffle:
  *                        shard_id + shuffle_key columns (--shards)
  */
object CurateJob {
  def run(spark: org.apache.spark.sql.SparkSession,
      o: Map[String, String]): org.apache.spark.sql.DataFrame = {
    import graft.engine.llm.Curation
    val docs = spark.read.parquet(Args.required(o, "input"))
    o.getOrElse("mode", "filter") match {
      case "filter" =>
        Curation.corpusFilter(docs,
          lang = o.getOrElse("lang", "en"),
          minTokens = o.getOrElse("min-tokens", "20").toLong,
          maxTokens = o.getOrElse("max-tokens", "5000").toLong)
      case "sample" =>
        Curation.hashSample(docs, col("doc_id"),
          o.getOrElse("fraction", "0.1").toDouble)
      case "pack" =>
        Curation.packSequences(docs, "doc_id", "text",
          o.getOrElse("budget", "2048").toLong, shardCols = Seq("source"))
      case "decontaminate" =>
        Curation.contamination(docs,
          spark.read.parquet(Args.required(o, "benchmark")),
          "text", "doc_id", n = o.getOrElse("ngram", "13").toInt)
      case "spans" =>
        // per-doc exact-substring dup accounting (q128's operator)
        graft.engine.llm.Dedup.spanDupStats(docs, "text", "doc_id",
          minLen = o.getOrElse("min-len", "40").toInt)
      case "trim-spans" =>
        // boilerplate strip (q131's operator)
        graft.engine.llm.Dedup.trimRepeatedSpans(docs, "text", "doc_id",
          minLen = o.getOrElse("min-len", "40").toInt)
      case "shard" =>
        // deterministic global training shuffle (q130's operator)
        Curation.shuffleShards(docs, "doc_id",
          nShards = o.getOrElse("shards", "16").toInt)
      case "pack-fixed" =>
        // fixed-length packed training sequences (q134's operator);
        // input must carry a token-ID ARRAY column (--ids-col). main()
        // materializes this mode through writePackedSequences so the
        // on-disk artifact gets the trainer layout (shard_id=K/ dirs,
        // seq_idx-sorted within), not a flat parquet dump.
        val (idCol, idsCol, nShards, seqLen) = packFixedOpts(o)
        Curation.packFixedSequences(docs, idCol, idsCol, nShards, seqLen)
      case m => throw new IllegalArgumentException(s"unknown --mode $m")
    }
  }

  /** pack-fixed's option surface, parsed ONCE for both run() (the frame)
    * and main() (the layout write) so the two paths can never drift. */
  private def packFixedOpts(o: Map[String, String]): (String, String, Int, Int) =
    (o.getOrElse("id-col", "doc_id"),
      o.getOrElse("ids-col", "token_ids"),
      o.getOrElse("shards", "16").toInt,
      o.getOrElse("seq-len", "512").toInt)

  def main(args: Array[String]): Unit = {
    val o = Args.parse(args)
    val spark = graft.engine.GraftSession.create("graft-curate")
    // every mode honors --overwrite the same way: default ErrorIfExists
    val saveMode =
      if (o.getOrElse("overwrite", "false").toBoolean)
        org.apache.spark.sql.SaveMode.Overwrite
      else org.apache.spark.sql.SaveMode.ErrorIfExists
    try {
      if (o.getOrElse("mode", "filter") == "pack-fixed") {
        val (idCol, idsCol, nShards, seqLen) = packFixedOpts(o)
        graft.engine.llm.Curation.writePackedSequences(
          spark.read.parquet(Args.required(o, "input")),
          idCol, idsCol, nShards, seqLen,
          path = Args.required(o, "output"), mode = saveMode)
      } else run(spark, o).write
        .mode(saveMode)
        .parquet(Args.required(o, "output"))
    } finally spark.stop()
  }
}

object PredictJob {
  def main(args: Array[String]): Unit = {
    val o = Args.parse(args)
    val spark = graft.engine.GraftSession.create("graft-predict")
    try {
      val test = spark.read.parquet(Args.required(o, "input"))
      val modelDir = Args.required(o, "model")
      val transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        o.getOrElse("mode", "pipeline") match {
          case "manual" =>
            val indexer = Predict.loadStage(
              org.apache.spark.ml.feature.StringIndexerModel, s"$modelDir/string_indexer")
            val assembler = Predict.loadStage(
              org.apache.spark.ml.feature.VectorAssembler, s"$modelDir/vector_assembler")
            val rf = Predict.loadStage(
              org.apache.spark.ml.classification.RandomForestClassificationModel,
              s"$modelDir/random_forest")
            val decoder = Predict.loadStage(
              org.apache.spark.ml.feature.IndexToString, s"$modelDir/index_to_string")
            df => decoder.transform(rf.transform(assembler.transform(indexer.transform(df))))
          case "cv" =>
            val cv = Predict.loadStage(
              org.apache.spark.ml.tuning.CrossValidatorModel, modelDir)
            df => cv.transform(df)
          case _ =>
            val m = Predict.loadStage(PipelineModel, modelDir)
            df => m.transform(df)
        }
      val scored = transform(test).cache()
      try {
        Predict.write(scored.drop(features, "rawPrediction", "probability"),
          Args.required(o, "output"),
          overwrite = o.getOrElse("overwrite", "false").toBoolean,
          singleFile = o.getOrElse("single-file", "false").toBoolean)
        // single-pass metrics (vs the reference's 4 uncached evaluator scans)
        if (scored.columns.contains(label))
          Metrics.multiclassMetrics(scored, label, prediction)
            .collect().foreach(println)
      } finally scored.unpersist()
    } finally spark.stop()
  }
}
