package graft.tools

import graft.engine.Registry

/** Time individual registry queries (dev loop for perf work; Bench is the
  * driver's fixed contract). Usage: runMain graft.tools.TimeQueries
  * [sfDir] [query ...] — repeats each query twice to expose warmup effects.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSet
    // the driver session recipe (UTC timezone included): timings AND row
    // counts from this tool must match driver Verify/Bench runs
    val spark = graft.engine.GraftSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    Registry.all
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val n = q.run(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"TIME ${q.name}%-28s run$i $sec%8.2f s  ($n rows)")
        }
      }
    spark.stop()
  }
}
