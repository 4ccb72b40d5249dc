package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Layer histogram surface (A1/A2): the reference computes a
  * GeoTrellis compressing `Histogram[Double]` over all cells, persists
  * it as the `histogramData` attribute at zoom 0 (Utils.scala:85-89) and
  * derives `quantileBreaks(10)` color breaks (ServeLayerAsMap.scala:92).
  *
  * Ours: statistics from exact single-pass sums; breaks from
  * `approx_percentile` (a compressing quantile sketch — the same
  * approximate-but-deterministic contract as GeoTrellis's histogram,
  * with documented binning so breaks are stable across runs).
  */
object Histograms {

  /** Mean/stddev/count/min/max of all data cells of a layer. */
  def statistics(tiles: DataFrame, cols: Int): DataFrame =
    Raster.pixelize(tiles, cols).agg(
      count(lit(1)).as("n_cells"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"),
      (sum(col("v")) / count(lit(1))).as("mean_v"),
      sqrt(sum(col("v") * col("v")) / count(lit(1))
        - (sum(col("v")) / count(lit(1))) * (sum(col("v")) / count(lit(1)))).as("stddev_v"))

  /** quantileBreaks(n): n-quantile break points over the cell
    * distribution (sketch-based: scales to any layer size). */
  def quantileBreaks(tiles: DataFrame, cols: Int, n: Int): Seq[Double] = {
    val probs = (1 to n).map(i => i.toDouble / n)
    Raster.pixelize(tiles, cols)
      .agg(percentile_approx(col("v"),
        array(probs.map(lit): _*), lit(10000)).as("breaks"))
      .head().getSeq[Double](0)
  }

  /** Fixed-width binned histogram (the exact, hash-verifiable form). */
  def binned(tiles: DataFrame, cols: Int, binWidth: Double): DataFrame =
    Raster.pixelize(tiles, cols)
      .groupBy(floor(col("v") / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
}
