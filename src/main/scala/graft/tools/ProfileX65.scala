package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Scratch profiler for x65's stages (dev-only; delete after use). */
object ProfileX65 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.llm.Dedup
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val bp = " === subscribe to our newsletter for daily updates " +
      "and exclusive offers === "
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), concat(col("text"), lit(bp)).as("text"))
    val table = s"graft_profx65_${ProcessHandle.current().pid()}"
    t("publish") {
      Dedup.publishBoilerplateWindows(docs.filter(col("doc_id") < 250),
        "text", "doc_id", table, minLen = 40)
    }
    val model = spark.table(table)
    val stream = docs.filter(col("doc_id") >= 250)
    (1 to 2).foreach { i =>
      t(s"oneShot$i") {
        Dedup.trimAgainstPublished(stream, model, "text", "doc_id",
          minLen = 40)
          .select(col("doc_id"), col("trimmed_text"),
            col("n_trimmed_chars")).count()
      }
    }
    // a third of the stream, approximating one tick
    t("tick-sized") {
      Dedup.trimAgainstPublished(stream.filter(col("doc_id") % 3 === 0),
        model, "text", "doc_id", minLen = 40).count()
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.stop()
  }
}
