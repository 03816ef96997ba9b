package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import graft.engine.Registry

/** Attribute a registry query's wall time to its Spark jobs (dev loop for
  * perf work — guide §1: find WHERE the time goes before changing code).
  * Prints one line per job (duration, #stages, #tasks, description) plus
  * the driver-side gap total (wall − Σjob = planning/FS/local work).
  * Usage: runMain graft.tools.ProfileQuery [sfDir] query [query ...]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSet
    val spark = graft.engine.GraftSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    case class Job(id: Int, var desc: String, var start: Long = 0L,
        var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = js.stageInfos.lastOption.map(_.name).getOrElse("")
        val j = Job(js.jobId, d, js.time)
        j.stages = js.stageIds.size
        jobs.put(js.jobId, j)
        js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageTasks.put(si.stageId, (si.numTasks,
          si.taskMetrics.executorRunTime))
        Option(stageToJob.get(si.stageId))
          .flatMap(j => Option(jobs.get(j)))
          .foreach(j => j.tasks += si.numTasks)
      }
    }

    Registry.all.filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        (1 to 2).foreach { rep =>
          jobs.clear(); stageTasks.clear(); stageToJob.clear()
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          val n = q.run(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          // listener bus is async: let the tail events drain
          Thread.sleep(300)
          spark.sparkContext.removeSparkListener(listener)
          import scala.jdk.CollectionConverters._
          val js = jobs.values().asScala.toSeq.sortBy(_.id)
          val jobSum = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
          println(f"\nPROFILE ${q.name} rep$rep wall=$wall%.2f s " +
            f"jobs=${js.size} jobSum=$jobSum%.2f s " +
            f"gap=${wall - jobSum}%.2f s rows=$n")
          if (rep == 2) {
            js.sortBy(j => -(j.end - j.start)).take(25).foreach { j =>
              println(f"  job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s " +
                f"stages=${j.stages}%2d tasks=${j.tasks}%4d  " +
                j.desc.take(90))
            }
          }
        }
      }
    spark.stop()
  }
}
