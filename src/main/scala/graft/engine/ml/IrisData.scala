package graft.engine.ml

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic in-memory iris-shaped fixture (FIXTURES.md §1): 150 rows,
  * 3 separable classes, 4 double predictors — generated arithmetically (no
  * RNG) so every run and both split sides are reproducible. Used by the ML
  * golden tests and the rows-only `ml_*` queries; the real iris CSV is not
  * shipped with the repo, and the reference's own data file is external too.
  */
object IrisData {
  val speciesNames: Seq[String] = Seq("setosa", "versicolor", "virginica")

  def generate(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for {
      k <- 0 until 3
      i <- 0 until 50
    } yield {
      val sl = 4.5 + k * 0.9 + (i % 10) * 0.08
      val sw = 2.5 + k * 0.15 + ((i * 7) % 10) * 0.12
      val pl = 1.4 + k * 1.7 + (i % 7) * 0.12
      val pw = 0.2 + k * 0.75 + ((i * 3) % 5) * 0.07
      (sl, sw, pl, pw, speciesNames(k))
    }
    rows.toDF("sepal_length", "sepal_width", "petal_length", "petal_width", "species")
  }
}
