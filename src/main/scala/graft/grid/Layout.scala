package graft.grid

/** Grid/layout model (SURVEY §7.1 step 3): layout schemes, key↔extent
  * transforms and the WebMercator math the reference delegates to
  * GeoTrellis/proj4 (ZoomedLayoutScheme(WebMercator, 256),
  * GeotiffTilingExample.scala:56-60). Hand-written because proj4 is not
  * resolvable offline; spherical-Mercator formulas only (EPSG:3857).
  */
final case class Extent(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def width: Double = xmax - xmin
  def height: Double = ymax - ymin
  def combine(o: Extent): Extent =
    Extent(math.min(xmin, o.xmin), math.min(ymin, o.ymin),
      math.max(xmax, o.xmax), math.max(ymax, o.ymax))
  def contains(x: Double, y: Double): Boolean =
    x >= xmin && x < xmax && y > ymin && y <= ymax
}

/** A tiled layout over an extent: layoutCols x layoutRows tiles of
  * tileCols x tileRows cells. Row 0 is the TOP row (map convention, as
  * in GeoTrellis SpatialKey). */
final case class LayoutDefinition(extent: Extent, tileCols: Int, tileRows: Int,
                                  layoutCols: Int, layoutRows: Int) {
  val cellWidth: Double = extent.width / (layoutCols.toLong * tileCols)
  val cellHeight: Double = extent.height / (layoutRows.toLong * tileRows)

  /** Map point -> (tileCol, tileRow). */
  def mapToKey(x: Double, y: Double): (Int, Int) = {
    val tc = math.floor((x - extent.xmin) / (cellWidth * tileCols)).toInt
    val tr = math.floor((extent.ymax - y) / (cellHeight * tileRows)).toInt
    (tc, tr)
  }

  /** Extent of tile (tc, tr). */
  def keyToExtent(tc: Int, tr: Int): Extent = {
    val w = cellWidth * tileCols; val h = cellHeight * tileRows
    Extent(extent.xmin + tc * w, extent.ymax - (tr + 1) * h,
      extent.xmin + (tc + 1) * w, extent.ymax - tr * h)
  }

  /** Center of cell (px, py) of tile (tc, tr). */
  def cellCenter(tc: Int, tr: Int, px: Int, py: Int): (Double, Double) = {
    val gx = tc.toLong * tileCols + px
    val gy = tr.toLong * tileRows + py
    (extent.xmin + (gx + 0.5) * cellWidth, extent.ymax - (gy + 0.5) * cellHeight)
  }

  /** Map point -> global cell indices (gx, gy); may be out of range. */
  def mapToCell(x: Double, y: Double): (Long, Long) =
    (math.floor((x - extent.xmin) / cellWidth).toLong,
      math.floor((extent.ymax - y) / cellHeight).toLong)
}

/** Spherical Mercator (EPSG:3857) — the reference's serving/storage CRS
  * (ZoomedLayoutScheme(WebMercator, ...)). */
object WebMercator {
  val R = 6378137.0
  val WorldHalf: Double = math.Pi * R // 20037508.342789244
  val WorldExtent: Extent = Extent(-WorldHalf, -WorldHalf, WorldHalf, WorldHalf)

  /** (lon, lat) degrees -> meters. */
  def fromLatLng(lon: Double, lat: Double): (Double, Double) = {
    val x = math.toRadians(lon) * R
    val y = math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)) * R
    (x, y)
  }

  /** meters -> (lon, lat) degrees. */
  def toLatLng(x: Double, y: Double): (Double, Double) = {
    val lon = math.toDegrees(x / R)
    val lat = math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2)
    (lon, lat)
  }

  /** ZoomedLayoutScheme: zoom z = 2^z x 2^z tiles over the world. */
  def layoutForZoom(zoom: Int, tileSize: Int): LayoutDefinition =
    LayoutDefinition(WorldExtent, tileSize, tileSize, 1 << zoom, 1 << zoom)

  /** Zoom level whose resolution best matches (is at least) the given
    * cell size in meters (ZoomedLayoutScheme.levelFor analog). */
  def zoomFor(cellSize: Double, tileSize: Int): Int = {
    var z = 0
    while (z < 30 && WorldExtent.width / ((1L << z) * tileSize.toLong) > cellSize) z += 1
    z
  }
}

/** FloatingLayoutScheme (R1 metadata inference,
  * GeotiffTilingExample.scala:50): fit a tile grid snapped to the data
  * extent at native cell size. */
object FloatingLayout {
  def fit(extent: Extent, cellWidth: Double, cellHeight: Double, tileSize: Int): LayoutDefinition = {
    val cols = math.max(1, math.ceil(extent.width / (cellWidth * tileSize)).toInt)
    val rows = math.max(1, math.ceil(extent.height / (cellHeight * tileSize)).toInt)
    // snap the extent to whole tiles (grow right/down like GeoTrellis)
    val snapped = Extent(extent.xmin, extent.ymax - rows.toLong * tileSize * cellHeight,
      extent.xmin + cols.toLong * tileSize * cellWidth, extent.ymax)
    LayoutDefinition(snapped, tileSize, tileSize, cols, rows)
  }
}

/** CRS transforms available offline. Serializable (used inside
  * aggregator kernels on executors). */
sealed trait CrsTransform extends Serializable {
  /** source-CRS point -> target-CRS point */
  def forward(x: Double, y: Double): (Double, Double)
  /** target-CRS point -> source-CRS point */
  def inverse(x: Double, y: Double): (Double, Double)
}
case object IdentityTransform extends CrsTransform {
  def forward(x: Double, y: Double): (Double, Double) = (x, y)
  def inverse(x: Double, y: Double): (Double, Double) = (x, y)
}
/** EPSG:4326 (lon/lat degrees) -> EPSG:3857 (meters). */
case object LatLngToWebMercator extends CrsTransform {
  def forward(x: Double, y: Double): (Double, Double) = WebMercator.fromLatLng(x, y)
  def inverse(x: Double, y: Double): (Double, Double) = WebMercator.toLatLng(x, y)
}
