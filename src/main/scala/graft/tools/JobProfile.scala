package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler._

/** Throwaway profiler: run ONE SparkEntry query with a listener and
  * print per-job wall time, stage counts and shuffle bytes — the
  * guide-§1 "where does the time go" view that the disabled UI would
  * otherwise give. Usage: runMain graft.tools.JobProfile <query> [dir]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local("job-profile", cpus)
    val fn = graft.SparkEntry.queries(name)

    final case class JobRow(id: Int, var start: Long = 0L,
                            var end: Long = 0L, var stages: Int = 0,
                            var tasks: Int = 0,
                            var shufRead: Long = 0L,
                            var shufWrite: Long = 0L,
                            var desc: String = "")
    val jobs = mutable.LinkedHashMap[Int, JobRow]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRow(e.jobId, start = e.time)
        r.stages = e.stageIds.size
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        jobs.synchronized { jobs(e.jobId) = r }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.getOrElse(e.stageId, -1)
        jobs.synchronized {
          jobs.get(jid).foreach { r =>
            r.tasks += 1
            val m = e.taskMetrics
            if (m != null) {
              r.shufRead += m.shuffleReadMetrics.totalBytesRead
              r.shufWrite += m.shuffleWriteMetrics.bytesWritten
            }
          }
        }
      }
    }

    // one untimed warm run so JIT/first-job setup doesn't pollute the
    // second run's job profile
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    graft.Housekeeping.release(spark)

    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    graft.Housekeeping.release(spark)

    println(f"PROFILE $name total=$dt%.2f s, jobs=${jobs.size}")
    var acct = 0.0
    jobs.values.toSeq.sortBy(_.start).foreach { r =>
      val sec = math.max(0L, r.end - r.start) / 1e3
      acct += sec
      println(f"  job ${r.id}%3d  ${sec}%6.2f s  stages=${r.stages}%2d " +
        f"tasks=${r.tasks}%4d  shufR=${r.shufRead / 1024}%6d KiB " +
        f"shufW=${r.shufWrite / 1024}%6d KiB  ${r.desc.take(60)}")
    }
    println(f"  sum(job wall)=$acct%.2f s (gaps = driver/planning time)")
    spark.stop()
  }
}
