package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query profiling harness for the optimization rounds: runs a query
  * like QBench (same session shape, same `.count()` action) but attaches a
  * listener that attributes wall time to Spark jobs vs driver-side gaps
  * (planning, codegen, driver logic), and reports per-job task time,
  * shuffle bytes and spill. Usage:
  *   sbt "runMain graft.Prof <sfDir> <reps> <name> [name...]"
  * Measurement-only tooling — never on any query path. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, start: Long, var end: Long = 0L,
                      var nTasks: Int = 0, var taskTimeMs: Long = 0L,
                      var shufReadB: Long = 0L, var shufWriteB: Long = 0L,
                      var inputB: Long = 0L, var spillB: Long = 0L,
                      var desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val r = JobRec(e.jobId, e.time)
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(e.jobId) = r
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        for (jid <- stageToJob.get(e.stageId); r <- jobs.get(jid);
             m <- Option(e.taskMetrics)) {
          r.nTasks += 1
          r.taskTimeMs += m.executorRunTime
          r.shufReadB += m.shuffleReadMetrics.totalBytesRead
          r.shufWriteB += m.shuffleWriteMetrics.bytesWritten
          r.inputB += m.inputMetrics.bytesRead
          r.spillB += m.diskBytesSpilled
        }
      }
    }

    // session warm-up identical to QBench
    try SparkEntry.queries.headOption.foreach { case (_, fn) => fn(spark, sfDir).count(): Unit }
    catch { case _: Throwable => () }

    spark.sparkContext.addSparkListener(listener)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (rep <- 1 to reps) {
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tPlanBuilt = System.nanoTime()
        df.count()
        val t1 = System.nanoTime()
        Thread.sleep(200) // let listener events drain
        val wallMs = (t1 - t0) / 1e6
        val buildMs = (tPlanBuilt - t0) / 1e6
        jobs.synchronized {
          val jobMs = jobs.values.map(r => (r.end - r.start).max(0L)).sum
          println(f"PROF $name rep=$rep wall=${wallMs}%.0fms build=${buildMs}%.0fms " +
            f"jobs=${jobs.size} jobTime=${jobMs}ms gap=${wallMs - jobMs}%.0fms")
          if (rep == reps) { // detail only on last (warmest) rep
            jobs.values.foreach { r =>
              println(f"  job ${r.id}%4d ${(r.end - r.start)}%6dms tasks=${r.nTasks}%4d " +
                f"taskTime=${r.taskTimeMs}%6dms in=${r.inputB / 1024}%7dK " +
                f"sr=${r.shufReadB / 1024}%7dK sw=${r.shufWriteB / 1024}%7dK " +
                f"spill=${r.spillB / 1024}%6dK ${r.desc.take(60)}")
            }
          }
        }
      }
    }
    spark.stop()
  }
}
