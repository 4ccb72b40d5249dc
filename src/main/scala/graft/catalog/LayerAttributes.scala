package graft.catalog

import org.json4s.NoTypeHints
import org.json4s.jackson.Serialization

/** Per-(layer, zoom) attribute record — the engine's analog of the
  * reference's JSON attribute store (api/package.scala:62-65): layer
  * metadata (`UtilsSVM.scala:205-232` keeps cellType/extent/crs/bounds
  * in a sidecar) plus the persisted histogram the tile server renders
  * through (`Utils.scala:85-89` writes `histogramData`;
  * `ServeLayerAsMap.scala:90-92` reads it back for quantile breaks
  * instead of re-aggregating the layer).
  *
  * The histogram is exact fixed-width bins (parallel `bins`/`counts`
  * arrays, bin = floor(v / binWidth)) — hash-verifiable against a
  * relational oracle, and enough to derive quantile breaks driver-side
  * with zero Spark jobs.
  */
case class LayerAttributes(
    cellType: String,
    crs: String,
    tileCols: Int,
    tileRows: Int,
    minCol: Int,
    maxCol: Int,
    minRow: Int,
    maxRow: Int,
    nTiles: Long,
    nCells: Long,
    minV: Double,
    maxV: Double,
    binWidth: Double,
    bins: Seq[Long],
    counts: Seq[Long],
    extent: Seq[Double],
    schemaJson: Option[String] = None) {

  /** GeoTrellis-style quantileBreaks(n) from the stored histogram: the
    * upper edge of the bin where the cumulative count crosses each
    * quantile — no layer scan (the reference reads `histogramData` and
    * calls `hist.quantileBreaks(10)`, ServeLayerAsMap.scala:92). */
  def quantileBreaks(n: Int): Seq[Double] = {
    val total = counts.sum
    if (total == 0L || bins.isEmpty) return Seq.empty
    val sorted = bins.zip(counts).sortBy(_._1)
    (1 to n).map { i =>
      val target = math.ceil(total.toDouble * i / n).toLong
      var cum = 0L
      var edge = (sorted.head._1 + 1) * binWidth
      val it = sorted.iterator
      var done = false
      while (it.hasNext && !done) {
        val (b, c) = it.next()
        cum += c
        edge = (b + 1) * binWidth
        if (cum >= target) done = true
      }
      edge
    }
  }
}

object LayerAttributes {
  private implicit val fmt: org.json4s.Formats = Serialization.formats(NoTypeHints)

  def toJson(a: LayerAttributes): String = Serialization.writePretty(a)
  def fromJson(s: String): LayerAttributes = Serialization.read[LayerAttributes](s)
}
