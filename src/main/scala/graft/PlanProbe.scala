package graft
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Driver-side planning probe: times logical→physical planning for the
  * named queries against a scale dir.
  *
  * Motivation: the round-6 sf1 "regression" was driver-side planning —
  * checkpoint-stats BigInteger blowups — not data-path cost. Before any
  * 1000x data run, this probe replays the pole plans against the sf100
  * STATISTICS (parquet footers / file sizes) and proves planning time
  * stays flat with data scale. Run:
  *   sbt "runMain graft.PlanProbe <sfDir> <reps> q1 q2 ..."
  *
  * Caveat, made explicit in the output: planning itself submits no job,
  * but some registered BUILDERS are eager — they run bounded collects,
  * fixed-point count() loops, or materialize a front before returning
  * the DataFrame (e.g. the CC/graph iteration gates). For those, the
  * measured time includes real data jobs and scales with data; a job
  * listener counts the jobs submitted during each builder call and tags
  * the line `EAGER(jobs=N)` so a data-sized time is never misread as a
  * planning regression. Only `jobs=0` lines are pure planning time.
  */
object PlanProbe {
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
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      var jobsSeen = 0
      val times = (1 to reps).map { _ =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        // executedPlan forces analysis + optimization + physical
        // planning; under AQE it stops at AdaptiveSparkPlanExec
        // without submitting a job — exactly the driver-side cost
        // (unless the BUILDER itself is eager, flagged below).
        fn(spark, sfDir).queryExecution.executedPlan
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events are async; a short quiesce keeps the count honest
        Thread.sleep(50)
        jobsSeen += jobs.get() - j0
        dt
      }
      val tag = if (jobsSeen > 0) f"  EAGER(jobs=$jobsSeen) time includes data jobs" else ""
      println(f"PLANPROBE $name%-20s ${times.map(t => f"$t%.2f").mkString(" ")}  min=${times.min}%.2f$tag")
    }
    spark.stop()
  }
}
