package graft
import org.apache.spark.sql.SparkSession

/** Driver-side planning probe: times logical→physical planning ONLY
  * (no job is submitted) for the named queries against a scale dir.
  *
  * Motivation: the round-6 sf1 "regression" was driver-side planning —
  * checkpoint-stats BigInteger blowups — not data-path cost. Before any
  * 1000x data run, this probe replays the pole plans against the sf100
  * STATISTICS (parquet footers / file sizes) and proves planning time
  * stays flat with data scale. Run:
  *   sbt "runMain graft.PlanProbe <sfDir> <reps> q1 q2 ..."
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
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // executedPlan forces analysis + optimization + physical
        // planning; under AQE it stops at AdaptiveSparkPlanExec
        // without submitting a job — exactly the driver-side cost.
        fn(spark, sfDir).queryExecution.executedPlan
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PLANPROBE $name%-20s ${times.map(t => f"$t%.2f").mkString(" ")}  min=${times.min}%.2f")
    }
    spark.stop()
  }
}
