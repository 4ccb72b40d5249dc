package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines: seeded uniform and
  * stratified (per-label) sampling, and class rebalancing. Thin,
  * seed-reproducible wrappers over Spark's Bernoulli samplers (M1
  * companion: the reference only has randomSplit,
  * TestClassifierSVM.scala:41). */
object Sampling {

  def uniform(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Per-stratum fractions on `labelCol` (spark sampleBy). */
  def stratified(df: DataFrame, labelCol: String, fractions: Map[Any, Double], seed: Long): DataFrame =
    df.stat.sampleBy(labelCol, fractions, seed)

  /** Downsample every class to (approximately) the minority class size —
    * the standard class-balance step before training. */
  def balanceClasses(df: DataFrame, labelCol: String, seed: Long): DataFrame = {
    val counts = df.groupBy(col(labelCol)).count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    val minCount = counts.values.min.toDouble
    val fractions = counts.map { case (k, n) => k -> math.min(1.0, minCount / n) }
    df.stat.sampleBy(labelCol, fractions, seed)
  }
}
