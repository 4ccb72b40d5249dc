package graft
import org.apache.spark.sql.SparkSession

/** Single-query micro-bench: `runMain graft.QBench <sfDir> <reps> q1 q2 ...`
  * Times each named SparkEntry query `reps` times (after one warm-up of the
  * first query) and prints per-rep seconds — for isolating one operator's
  * cost without the full bench sweep. */
object QBench {
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
    try SparkEntry.queries.headOption.foreach { case (_, fn) => fn(spark, sfDir).count(): Unit }
    catch { case _: Throwable => () }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QBENCH $name%-20s ${times.map(t => f"$t%.2f").mkString(" ")}  min=${times.min}%.2f")
    }
    spark.stop()
  }
}
