package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Ad-hoc job/stage profiler (NOT part of the bench contract — same
  * status as PlanDump): runs one query warm, then re-runs it while a
  * listener records every job's wall time, stage count and task count.
  * The sf0.1 gate corpus is tiny (17 MB), so the slow queries are
  * scheduling-bound — this answers "how many jobs/stages is this query
  * paying for?" which `explain` can't (driver loops span many actions).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.JobProbe gr5_label_prop"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_PROBE_LOOPW").foreach(w =>
      spark.conf.set("spark.graft.loop.partitions", w))

    final case class JobRec(id: Int, var start: Long = 0L, var end: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    final case class StageRec(id: Int, name: String, tasks: Int,
        submitted: Long, completed: Long, taskTimeMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val r = JobRec(j.jobId, j.time)
        r.stages = j.stageInfos.size
        r.tasks = j.stageInfos.map(_.numTasks).sum
        jobs.put(j.jobId, r)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach(_.end = j.time)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        stages.add(StageRec(i.stageId, i.name.takeWhile(_ != '\n').take(60),
          i.numTasks, i.submissionTime.getOrElse(0L),
          i.completionTime.getOrElse(0L),
          i.taskMetrics.executorRunTime))
      }
    }

    for (name <- args) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      spark.catalog.clearCache()
      jobs.clear(); stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let listener events drain
      import scala.jdk.CollectionConverters._
      val recs = jobs.values().asScala.toSeq.sortBy(_.id)
      val jobSec = recs.map(r => (r.end - r.start) / 1e3).sum
      println(f"PROBE $name wall=$wall%.3f s rows=$n jobs=${recs.size} " +
        f"stages=${recs.map(_.stages).sum} tasks=${recs.map(_.tasks).sum} " +
        f"job_time_sum=$jobSec%.3f s (gap=${wall - jobSec}%.3f s driver/planning)")
      recs.foreach { r =>
        println(f"  job ${r.id}%4d  ${(r.end - r.start) / 1e3}%7.3f s  " +
          f"stages=${r.stages}%3d tasks=${r.tasks}%5d")
      }
      if (sys.env.contains("SPARK_GRAFT_PROBE_STAGES")) {
        stages.asScala.toSeq.sortBy(_.id).foreach { s =>
          println(f"  stage ${s.id}%4d wall=${(s.completed - s.submitted) / 1e3}%7.3f" +
            f" taskSum=${s.taskTimeMs / 1e3}%7.3f tasks=${s.tasks}%4d  ${s.name}")
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
