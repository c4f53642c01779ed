package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import scala.collection.mutable

/** Dev profiler: per-JOB breakdown of a query run — job count, wall time
  * per job, task count and summed task time — the local stand-in for the
  * Spark UI's Jobs page (guide §1.1/§7.1; the bench runs with the UI off).
  * Shows where a commit-log-bound query's wall goes: many small jobs
  * (driver/scheduler overhead) vs few big ones (real compute).
  *
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.ProfileJobs /root/testdata/sf0.1 q_table_merge ..."`
  */
object ProfileJobs {

  final case class JobRec(id: Int, var desc: String = "", var started: Long = 0L,
      var ended: Long = 0L, var nTasks: Int = 0, var taskMs: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = DevSession.local()
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (collecting) {
        val r = JobRec(js.jobId)
        // first graft.* frame in the final stage's submission stack =
        // the engine call that triggered this job
        val site = js.stageInfos.lastOption.map(_.details).getOrElse("")
          .split('\n').find(l => l.contains("graft.") && !l.contains("ProfileJobs"))
          .map(_.trim.stripPrefix("at ")).getOrElse("")
        val nm = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '(').trim).getOrElse("")
        r.desc = s"$nm | $site"
        r.started = js.time
        jobs.synchronized { jobs(js.jobId) = r }
        js.stageIds.foreach(s => stageToJob.synchronized { stageToJob(s) = js.jobId })
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (collecting) {
        jobs.synchronized { jobs.get(je.jobId).foreach(_.ended = je.time) }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (collecting) {
        val j = stageToJob.synchronized { stageToJob.get(sc.stageInfo.stageId) }
        j.foreach { jid =>
          jobs.synchronized {
            jobs.get(jid).foreach { r =>
              r.nTasks += sc.stageInfo.numTasks
              r.taskMs += sc.stageInfo.taskMetrics.executorRunTime
            }
          }
        }
      }
    })
    // session warm-up (same shape as Bench)
    spark.range(0, 1000000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm rep (staged artifacts, codegen)
      jobs.synchronized { jobs.clear() }
      collecting = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      Thread.sleep(200) // drain listener bus
      val snap = jobs.synchronized { jobs.values.toVector }
      val jobWall = snap.map(r => math.max(0L, r.ended - r.started)).sum / 1e3
      println(f"PROFILEJOBS $name wall=$wall%.2f s  jobs=${snap.size}  jobWallSum=$jobWall%.2f s  gap=${wall - jobWall}%.2f s")
      snap.sortBy(r => -(r.ended - r.started)).take(40).foreach { r =>
        println(f"  job ${r.id}%4d ${(r.ended - r.started) / 1e3}%6.2f s tasks=${r.nTasks}%4d taskSum=${r.taskMs / 1e3}%6.2f s  ${r.desc.take(90)}")
      }
      snap.groupBy(_.desc).map { case (d, rs) =>
        (rs.size, rs.map(r => math.max(0L, r.ended - r.started)).sum / 1e3, d)
      }.toSeq.sortBy(-_._2).take(20).foreach { case (n, s, d) =>
        println(f"  BYSITE n=$n%3d wall=$s%6.2f s  ${d.take(90)}")
      }
    }
    spark.stop()
  }
}
