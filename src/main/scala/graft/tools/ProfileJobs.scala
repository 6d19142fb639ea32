package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB breakdown of one or more gates: registers a listener, runs the
  * named queries once warm, and prints every job's wall-clock, stage count,
  * task count, and summed executor task time. The gap between wall-clock
  * total and task-time/cores is scheduling + driver overhead — at bench SFs
  * the data is megabytes, so job COUNT (not bytes) is usually the cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileJobs q174_kcore [q198_ktruss ...]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    require(args.nonEmpty, "pass query names")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)

    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
        var stages: Int = 0, var tasks: Int = 0, var taskTimeMs: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, JobRec(js.jobId, js.time))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId); if (r != null) r.end = je.time
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        // attribute the stage to the newest unfinished job (good enough
        // for a sequential profile run)
        val rs = jobs.values().toArray(Array.empty[JobRec]).filter(_.end < 0)
        if (rs.nonEmpty) {
          val r = rs.maxBy(_.id)
          r.stages += 1
          r.tasks += si.numTasks
          r.taskTimeMs += si.taskMetrics.executorRunTime
        }
      }
    }

    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      // warm (codegen/JIT)
      fn(spark, d).write.format("noop").mode("overwrite").save()
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      val rs = jobs.values().toArray(Array.empty[JobRec]).sortBy(_.id)
      println(f"\n===== $name: wall ${wall}%.3f s, ${rs.length} jobs =====")
      var sumJob = 0.0
      for (r <- rs) {
        val secs = if (r.end > 0) (r.end - r.start) / 1e3 else Double.NaN
        sumJob += (if (secs.isNaN) 0 else secs)
        println(f"  job ${r.id}%4d  ${secs}%7.3f s  stages=${r.stages}%3d tasks=${r.tasks}%5d taskTime=${r.taskTimeMs / 1e3}%8.3f s")
      }
      println(f"  [sum of job walls ${sumJob}%.3f s vs query wall ${wall}%.3f s — gap = driver/plan time]")
    }
    spark.stop()
  }
}
