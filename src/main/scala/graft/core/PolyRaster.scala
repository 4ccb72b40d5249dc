package graft.core

/** Scanline polygon rasterization (pure, no Spark): the general form of
  * the reference's feature burn (RasterizeFeaturesRDD.scala:24-74, which
  * delegates to GeoTrellis's rasterizer). Even-odd rule, pixel-center
  * sampling: cell (x, y) is inside iff point (x+0.5, y+0.5) is inside
  * the polygon — GeoTrellis's default center-containment convention. */
object PolyRaster {

  /** One polygon ring as a closed sequence of (x, y) vertices in global
    * pixel coordinates (last edge implicit). */
  type Ring = Array[(Double, Double)]

  /** Bounding box of rings: (xmin, ymin, xmax, ymax). */
  def bbox(rings: Seq[Ring]): (Double, Double, Double, Double) = {
    var xmin = Double.MaxValue; var ymin = Double.MaxValue
    var xmax = Double.MinValue; var ymax = Double.MinValue
    rings.foreach(_.foreach { case (x, y) =>
      if (x < xmin) xmin = x; if (x > xmax) xmax = x
      if (y < ymin) ymin = y; if (y > ymax) ymax = y
    })
    (xmin, ymin, xmax, ymax)
  }

  /** Burn a polygon (outer rings + holes together, even-odd) into a
    * cols x rows tile at tile key (tileCol, tileRow). Mutates `a`.
    * Scanline: for each pixel row, collect x-crossings of all edges
    * with the horizontal line y = gy + 0.5, sort, fill alternate spans. */
  def burnPolygon(a: Array[Double], cols: Int, rows: Int, tileCol: Int, tileRow: Int,
                  rings: Seq[Ring], value: Double): Unit = {
    val gx0 = tileCol.toLong * cols
    val gy0 = tileRow.toLong * rows
    val xs = new scala.collection.mutable.ArrayBuffer[Double](16)
    var py = 0
    while (py < rows) {
      val sy = gy0 + py + 0.5
      xs.clear()
      rings.foreach { ring =>
        var i = 0
        val n = ring.length
        while (i < n) {
          val (x1, y1) = ring(i)
          val (x2, y2) = ring((i + 1) % n)
          // half-open edge rule avoids double-counting vertices
          if ((y1 <= sy && y2 > sy) || (y2 <= sy && y1 > sy)) {
            xs += x1 + (sy - y1) / (y2 - y1) * (x2 - x1)
          }
          i += 1
        }
      }
      if (xs.nonEmpty) {
        val sorted = xs.toArray
        java.util.Arrays.sort(sorted)
        var k = 0
        while (k + 1 < sorted.length) {
          // span [sorted(k), sorted(k+1)): pixels whose center is inside
          val lo = math.max(0L, math.ceil(sorted(k) - 0.5 - gx0).toLong).toInt
          val hi = math.min(cols.toLong, math.ceil(sorted(k + 1) - 0.5 - gx0).toLong).toInt
          var px = lo
          while (px < hi) { a(px + py * cols) = value; px += 1 }
          k += 2
        }
      }
      py += 1
    }
  }

  /** Pixel-center containment test (the per-cell oracle twin of
    * burnPolygon, used by tests and the SQL oracle derivation). */
  def containsCenter(rings: Seq[Ring], gx: Long, gy: Long): Boolean = {
    val px = gx + 0.5; val py = gy + 0.5
    var crossings = 0
    rings.foreach { ring =>
      var i = 0
      val n = ring.length
      while (i < n) {
        val (x1, y1) = ring(i)
        val (x2, y2) = ring((i + 1) % n)
        if ((y1 <= py && y2 > py) || (y2 <= py && y1 > py)) {
          val xi = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
          if (xi > px) crossings += 1
        }
        i += 1
      }
    }
    (crossings & 1) == 1
  }
}
