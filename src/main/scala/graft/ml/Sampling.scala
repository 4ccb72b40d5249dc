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

  /** Efraimidis–Spirakis weighted-priority key: ln(u)/w with u derived
    * from the portable 60-bit hash of a stable id, so the sample is a
    * pure function of the data — reproducible across engines, runs and
    * cluster sizes (no RNG state, no partition-order dependence). The
    * top-k rows by this key per stratum are a weighted-without-
    * replacement sample of that stratum (the domain-mixing step of a
    * training-data pipeline: heavier docs proportionally likelier, but
    * never duplicated). u = (h60(id)+1)/2^60 ∈ (0,1]; dividing by 2^60
    * (a power of two) is exact in IEEE doubles, so both engines see the
    * same u bit-for-bit and the only cross-engine wiggle is the last
    * ulp of ln — order-relevant only on a near-tie between two hashes. */
  def priorityKey(id: org.apache.spark.sql.Column, weight: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    log((graft.text.TextOps.h60(id.cast("string")) + 1).cast("double") / lit(1.152921504606846976e18)) / weight

  /** SQL twin of [[priorityKey]] (DuckDB). */
  def priorityKeySql(idExpr: String, weightExpr: String): String =
    s"ln((${graft.text.TextOps.h60Sql(s"CAST($idExpr AS VARCHAR)")} + 1) / 1152921504606846976.0) / $weightExpr"

  /** Bounded top-k-by-priority as a mergeable Aggregator: the k best
    * (priority desc, id asc) pairs, O(k) state per group in ANY
    * grouping — which is what makes the weighted sample STREAMABLE: a
    * streaming groupBy with this aggregator holds k pairs per stratum
    * forever, no watermark needed, and complete-mode output converges
    * to exactly the batch sample (StreamingSampleSpec). Merge is
    * order-free (sorted union, take k), proven alongside the other
    * aggregator laws. */
  class TopKPriority(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[(Double, Long), Array[(Double, Long)], Seq[Long]] {
    private def best(xs: Array[(Double, Long)]): Array[(Double, Long)] =
      xs.distinct.sortBy { case (p, id) => (-p, id) }.take(k)
    def zero: Array[(Double, Long)] = Array.empty
    def reduce(b: Array[(Double, Long)], v: (Double, Long)): Array[(Double, Long)] = best(b :+ v)
    def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = best(a ++ b)
    def finish(b: Array[(Double, Long)]): Seq[Long] = best(b).map(_._2).toSeq
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** [[TopKPriority]] as an untyped aggregate column over (priority, id). */
  def topKByPriority(k: Int)(priority: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new TopKPriority(k),
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong))(priority, id)
}
