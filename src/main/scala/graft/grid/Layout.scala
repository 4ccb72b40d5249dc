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

/** WGS84 Universal Transverse Mercator, zones 1-60 N/S — the general-CRS
  * leg the reference gets from proj4 when stacking cross-CRS layers
  * (ManyLayersToMultibandLayer.scala:244-248). Snyder's transverse
  * Mercator series (USGS PP 1395, eq. 8-9..8-17 / 8-18..8-25 — public
  * formulas; proj4 itself is not resolvable offline). Sub-mm accuracy
  * within a zone's normal extent. */
final case class Utm(zone: Int, north: Boolean) {
  require(zone >= 1 && zone <= 60, s"UTM zone $zone out of range")
  import math._
  private val a = 6378137.0                  // WGS84 semi-major
  private val f = 1.0 / 298.257223563
  private val e2 = f * (2 - f)
  private val e4 = e2 * e2
  private val e6 = e4 * e2
  private val ep2 = e2 / (1 - e2)            // e'^2
  private val k0 = 0.9996
  private val falseE = 500000.0
  private val falseN = if (north) 0.0 else 10000000.0
  val lon0: Double = -183.0 + 6.0 * zone     // central meridian, degrees
  private val lam0 = toRadians(lon0)
  private val m0 = 1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256
  private val m2 = 3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024
  private val m4 = 15 * e4 / 256 + 45 * e6 / 1024
  private val m6 = 35 * e6 / 3072
  private val sqrt1me2 = sqrt(1 - e2)
  private val e1 = (1 - sqrt1me2) / (1 + sqrt1me2)

  /** Meridian arc length from the equator (Snyder 3-21). */
  def meridianArc(phi: Double): Double =
    a * (m0 * phi - m2 * sin(2 * phi) + m4 * sin(4 * phi) - m6 * sin(6 * phi))

  /** (lon, lat) degrees -> (easting, northing) meters. */
  def fromLatLng(lon: Double, lat: Double): (Double, Double) = {
    val phi = toRadians(lat)
    val sinP = sin(phi); val cosP = cos(phi); val tanP = tan(phi)
    val nu = a / sqrt(1 - e2 * sinP * sinP)
    val t = tanP * tanP
    val c = ep2 * cosP * cosP
    val aa = cosP * (toRadians(lon) - lam0)
    val m = meridianArc(phi)
    val x = k0 * nu * (aa + (1 - t + c) * pow(aa, 3) / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * ep2) * pow(aa, 5) / 120) + falseE
    val y = k0 * (m + nu * tanP * (aa * aa / 2 +
      (5 - t + 9 * c + 4 * c * c) * pow(aa, 4) / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * ep2) * pow(aa, 6) / 720)) + falseN
    (x, y)
  }

  /** (easting, northing) meters -> (lon, lat) degrees. */
  def toLatLng(x: Double, y: Double): (Double, Double) = {
    val m = (y - falseN) / k0
    val mu = m / (a * m0)
    val phi1 = mu + (3 * e1 / 2 - 27 * pow(e1, 3) / 32) * sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * pow(e1, 4) / 32) * sin(4 * mu) +
      (151 * pow(e1, 3) / 96) * sin(6 * mu) +
      (1097 * pow(e1, 4) / 512) * sin(8 * mu)
    val sinP = sin(phi1); val cosP = cos(phi1); val tanP = tan(phi1)
    val c1 = ep2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = a / sqrt(1 - e2 * sinP * sinP)
    val r1 = a * (1 - e2) / pow(1 - e2 * sinP * sinP, 1.5)
    val d = (x - falseE) / (n1 * k0)
    val phi = phi1 - (n1 * tanP / r1) * (d * d / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * pow(d, 4) / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * pow(d, 6) / 720)
    val lam = lam0 + (d - (1 + 2 * t1 + c1) * pow(d, 3) / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * pow(d, 5) / 120) / cosP
    (toDegrees(lam), toDegrees(phi))
  }
}

/** Lambert conformal conic, 2 standard parallels, ellipsoidal form —
  * the national-grid family (France Lambert-93, Canada Atlas, US state
  * planes) the reference reaches through proj4
  * (ManyLayersToMultibandLayer.scala:244-248). Snyder, USGS PP 1395
  * eq. 14-15, 15-1..15-11 (public formulas). Angles in degrees,
  * lengths in the ellipsoid's meters. The inverse iterates the
  * conformal-latitude fixed point 8 times (converges quadratically;
  * <1e-12 rad after 4). Datum is treated as the lon/lat hub: GRS80 vs
  * WGS84 differ in flattening by ~1e-11 — sub-mm at raster scale. */
final case class LambertConformalConic(a: Double, invF: Double,
    lat0: Double, lon0: Double, sp1: Double, sp2: Double,
    falseE: Double, falseN: Double) {
  import math._
  private val f = 1.0 / invF
  private val e2 = f * (2 - f)
  private val e = sqrt(e2)
  private def m(phi: Double) = cos(phi) / sqrt(1 - e2 * sin(phi) * sin(phi))
  private def t(phi: Double) =
    tan(Pi / 4 - phi / 2) / pow((1 - e * sin(phi)) / (1 + e * sin(phi)), e / 2)
  private val phi0 = toRadians(lat0); private val lam0 = toRadians(lon0)
  private val p1 = toRadians(sp1); private val p2 = toRadians(sp2)
  /** cone constant; 1SP degenerate = sin(sp1) */
  val n: Double =
    if (abs(p1 - p2) < 1e-12) sin(p1)
    else (log(m(p1)) - log(m(p2))) / (log(t(p1)) - log(t(p2)))
  private val bigF = m(p1) / (n * pow(t(p1), n))
  private def rho(phi: Double) = a * bigF * pow(t(phi), n)
  private val rho0 = rho(phi0)

  def fromLatLng(lon: Double, lat: Double): (Double, Double) = {
    val th = n * (toRadians(lon) - lam0)
    val r = rho(toRadians(lat))
    (falseE + r * sin(th), falseN + rho0 - r * cos(th))
  }
  def toLatLng(x: Double, y: Double): (Double, Double) = {
    val dx = x - falseE; val dy = rho0 - (y - falseN)
    val sgn = if (n < 0) -1.0 else 1.0
    val rp = sgn * sqrt(dx * dx + dy * dy)
    val tp = pow(rp / (a * bigF), 1 / n)
    val th = atan2(sgn * dx, sgn * dy)
    var phi = Pi / 2 - 2 * atan(tp)
    var i = 0
    while (i < 8) {
      phi = Pi / 2 - 2 * atan(tp * pow((1 - e * sin(phi)) / (1 + e * sin(phi)), e / 2))
      i += 1
    }
    (toDegrees(th / n + lam0), toDegrees(phi))
  }
}

/** Albers equal-area conic, 2 standard parallels, ellipsoidal form —
  * the continental-statistics projection (CONUS Albers EPSG:5070).
  * Snyder, USGS PP 1395 eq. 14-1..14-12 (public formulas). The inverse
  * iterates Snyder 3-16 on the authalic latitude (10 rounds, far past
  * convergence). Same datum note as [[LambertConformalConic]]. */
final case class AlbersEqualArea(a: Double, invF: Double,
    lat0: Double, lon0: Double, sp1: Double, sp2: Double,
    falseE: Double, falseN: Double) {
  import math._
  private val f = 1.0 / invF
  private val e2 = f * (2 - f)
  private val e = sqrt(e2)
  private def m(phi: Double) = cos(phi) / sqrt(1 - e2 * sin(phi) * sin(phi))
  /** Snyder 3-12: q, the authalic-latitude kernel. */
  private def q(phi: Double) = {
    val s = sin(phi)
    (1 - e2) * (s / (1 - e2 * s * s) - (1 / (2 * e)) * log((1 - e * s) / (1 + e * s)))
  }
  private val phi0 = toRadians(lat0); private val lam0 = toRadians(lon0)
  private val p1 = toRadians(sp1); private val p2 = toRadians(sp2)
  val n: Double = (m(p1) * m(p1) - m(p2) * m(p2)) / (q(p2) - q(p1))
  private val c = m(p1) * m(p1) + n * q(p1)
  private def rho(phi: Double) = a * sqrt(c - n * q(phi)) / n
  private val rho0 = rho(phi0)

  def fromLatLng(lon: Double, lat: Double): (Double, Double) = {
    val th = n * (toRadians(lon) - lam0)
    val r = rho(toRadians(lat))
    (falseE + r * sin(th), falseN + rho0 - r * cos(th))
  }
  def toLatLng(x: Double, y: Double): (Double, Double) = {
    val dx = x - falseE; val dy = rho0 - (y - falseN)
    val sgn = if (n < 0) -1.0 else 1.0
    val rp = sgn * sqrt(dx * dx + dy * dy)
    val th = atan2(sgn * dx, sgn * dy)
    val rn = rp * n / a
    val qp = (c - rn * rn) / n
    var phi = asin(min(1.0, max(-1.0, qp / 2)))
    var i = 0
    while (i < 10) {
      val s = sin(phi)
      phi += pow(1 - e2 * s * s, 2) / (2 * cos(phi)) *
        (qp / (1 - e2) - s / (1 - e2 * s * s) +
          (1 / (2 * e)) * log((1 - e * s) / (1 + e * s)))
      i += 1
    }
    (toDegrees(th / n + lam0), toDegrees(phi))
  }
}

/** Polar stereographic, variant B (standard parallel), ellipsoidal —
  * the polar-scene family (Antarctic EPSG:3031/3032, NSIDC sea-ice
  * grids EPSG:3413/3976) the reference reaches through proj4's
  * any-EPSG warp (GeotiffTilingExample.scala:56-60). EPSG method 9829
  * / Snyder, USGS PP 1395 eq. 21-33..21-41 (public formulas). The
  * hemisphere comes from the SIGN of `latTs` (standard parallel):
  * north aspect for latTs > 0, south otherwise. Forward is closed
  * form; the inverse iterates the conformal-latitude fixed point 8
  * times (quadratic convergence, <1e-12 rad after 4). Angles in
  * degrees, lengths in the ellipsoid's meters; same datum-hub note as
  * [[LambertConformalConic]]. Golden-tested in LayoutSpec against the
  * IOGP GN7-2 variant-B worked example (75°S 120°E → 7255380.79 E,
  * 7053389.56 N on EPSG:3032) to sub-cm. */
final case class PolarStereographic(a: Double, invF: Double,
    latTs: Double, lon0: Double, falseE: Double, falseN: Double) {
  import math._
  private val north = latTs > 0
  private val f = 1.0 / invF
  private val e2 = f * (2 - f)
  private val e = sqrt(e2)
  /** isometric-latitude kernel, aspect-mirrored so t > 0 shrinks
    * toward the projection pole in both hemispheres. */
  private def t(phi: Double): Double =
    if (north)
      tan(Pi / 4 - phi / 2) * pow((1 + e * sin(phi)) / (1 - e * sin(phi)), e / 2)
    else
      tan(Pi / 4 + phi / 2) / pow((1 + e * sin(phi)) / (1 - e * sin(phi)), e / 2)
  private def m(phi: Double) = cos(phi) / sqrt(1 - e2 * sin(phi) * sin(phi))
  private val phic = toRadians(latTs)
  private val lam0 = toRadians(lon0)
  private val tc = t(phic)
  private val mc = m(phic)
  /** radius scale at the standard parallel: rho = a·mc·t/tc. */
  private val rhoK = a * mc / tc

  def fromLatLng(lon: Double, lat: Double): (Double, Double) = {
    val rho = rhoK * t(toRadians(lat))
    val th = toRadians(lon) - lam0
    if (north) (falseE + rho * sin(th), falseN - rho * cos(th))
    else (falseE + rho * sin(th), falseN + rho * cos(th))
  }

  def toLatLng(x: Double, y: Double): (Double, Double) = {
    val dx = x - falseE; val dy = y - falseN
    val rho = sqrt(dx * dx + dy * dy)
    val tp = rho / rhoK
    var phi =
      if (north) Pi / 2 - 2 * atan(tp) else 2 * atan(tp) - Pi / 2
    var i = 0
    while (i < 8) {
      phi =
        if (north)
          Pi / 2 - 2 * atan(tp * pow((1 - e * sin(phi)) / (1 + e * sin(phi)), e / 2))
        else
          2 * atan(tp * pow((1 + e * sin(phi)) / (1 - e * sin(phi)), e / 2)) - Pi / 2
      i += 1
    }
    val lam =
      if (rho == 0.0) lam0
      else if (north) lam0 + atan2(dx, -dy)
      else lam0 + atan2(dx, dy)
    (toDegrees(lam), toDegrees(phi))
  }
}

/** CRS transforms available offline. Serializable (used inside
  * aggregator kernels on executors). Open for extension: a user CRS is
  * just a forward/inverse pair (no exhaustive matches depend on the
  * subtype set — Crs.transform matches on EPSG codes, not types). */
trait CrsTransform extends Serializable {
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
/** EPSG:4326 (lon/lat degrees) -> EPSG:326xx/327xx (UTM meters). */
final case class LatLngToUtm(zone: Int, north: Boolean) extends CrsTransform {
  private val utm = Utm(zone, north)
  def forward(x: Double, y: Double): (Double, Double) = utm.fromLatLng(x, y)
  def inverse(x: Double, y: Double): (Double, Double) = utm.toLatLng(x, y)
}
/** EPSG:4326 -> a Lambert conformal conic grid. */
final case class LatLngToLcc(lcc: LambertConformalConic) extends CrsTransform {
  def forward(x: Double, y: Double): (Double, Double) = lcc.fromLatLng(x, y)
  def inverse(x: Double, y: Double): (Double, Double) = lcc.toLatLng(x, y)
}
/** EPSG:4326 -> an Albers equal-area grid. */
final case class LatLngToAlbers(aea: AlbersEqualArea) extends CrsTransform {
  def forward(x: Double, y: Double): (Double, Double) = aea.fromLatLng(x, y)
  def inverse(x: Double, y: Double): (Double, Double) = aea.toLatLng(x, y)
}
/** EPSG:4326 -> a polar stereographic grid. */
final case class LatLngToPolar(ps: PolarStereographic) extends CrsTransform {
  def forward(x: Double, y: Double): (Double, Double) = ps.fromLatLng(x, y)
  def inverse(x: Double, y: Double): (Double, Double) = ps.toLatLng(x, y)
}
/** Flip a transform's direction. */
final case class Inverted(t: CrsTransform) extends CrsTransform {
  def forward(x: Double, y: Double): (Double, Double) = t.inverse(x, y)
  def inverse(x: Double, y: Double): (Double, Double) = t.forward(x, y)
}
/** a then b (forward); b then a (inverse). */
final case class Composed(a: CrsTransform, b: CrsTransform) extends CrsTransform {
  def forward(x: Double, y: Double): (Double, Double) = {
    val (u, v) = a.forward(x, y); b.forward(u, v)
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val (u, v) = b.inverse(x, y); a.inverse(u, v)
  }
}

/** EPSG-code CRS registry: builds an arbitrary src->dst transform by
  * composing through the lon/lat hub — the role proj4's CRS factory
  * plays in ManyLayersToMultibandLayer.scala:244-248. Supported offline:
  * EPSG:4326, EPSG:3857, EPSG:32601-32660 (UTM N), EPSG:32701-32760
  * (UTM S), EPSG:2154 (Lambert-93), EPSG:3978 (Canada Atlas Lambert),
  * EPSG:3031/3032/3413/3976 (polar stereographic),
  * EPSG:5070 (CONUS Albers). Parameters are the published EPSG
  * registry definitions on GRS80 (treated as the WGS84 lon/lat hub —
  * flattening differs by ~1e-11, sub-mm here). */
object Crs {
  private val Grs80InvF = 298.257222101
  private val Wgs84InvF = 298.257223563

  /** transform whose forward goes lon/lat -> the named CRS;
    * IdentityTransform for EPSG:4326 itself. */
  private def fromLatLngTo(code: String): CrsTransform = code.toUpperCase match {
    case "EPSG:4326" => IdentityTransform
    case "EPSG:3857" => LatLngToWebMercator
    case c if c.startsWith("EPSG:326") && c.length == 10 =>
      LatLngToUtm(c.drop(8).toInt, north = true)
    case c if c.startsWith("EPSG:327") && c.length == 10 =>
      LatLngToUtm(c.drop(8).toInt, north = false)
    // RGF93 / Lambert-93 (France national grid)
    case "EPSG:2154" => LatLngToLcc(LambertConformalConic(
      a = 6378137.0, invF = Grs80InvF, lat0 = 46.5, lon0 = 3.0,
      sp1 = 49.0, sp2 = 44.0, falseE = 700000.0, falseN = 6600000.0))
    // NAD83 / Canada Atlas Lambert
    case "EPSG:3978" => LatLngToLcc(LambertConformalConic(
      a = 6378137.0, invF = Grs80InvF, lat0 = 49.0, lon0 = -95.0,
      sp1 = 49.0, sp2 = 77.0, falseE = 0.0, falseN = 0.0))
    // NAD83 / CONUS Albers (the USGS national products grid)
    case "EPSG:5070" => LatLngToAlbers(AlbersEqualArea(
      a = 6378137.0, invF = Grs80InvF, lat0 = 23.0, lon0 = -96.0,
      sp1 = 29.5, sp2 = 45.5, falseE = 0.0, falseN = 0.0))
    // WGS 84 / Antarctic Polar Stereographic (the Landsat/MODIS
    // Antarctica products grid)
    case "EPSG:3031" => LatLngToPolar(PolarStereographic(
      a = 6378137.0, invF = Wgs84InvF, latTs = -71.0, lon0 = 0.0,
      falseE = 0.0, falseN = 0.0))
    // WGS 84 / Australian Antarctic Polar Stereographic (the IOGP
    // GN7-2 variant-B worked example lives on this grid)
    case "EPSG:3032" => LatLngToPolar(PolarStereographic(
      a = 6378137.0, invF = Wgs84InvF, latTs = -71.0, lon0 = 70.0,
      falseE = 6000000.0, falseN = 6000000.0))
    // WGS 84 / NSIDC Sea Ice Polar Stereographic North
    case "EPSG:3413" => LatLngToPolar(PolarStereographic(
      a = 6378137.0, invF = Wgs84InvF, latTs = 70.0, lon0 = -45.0,
      falseE = 0.0, falseN = 0.0))
    // WGS 84 / NSIDC Sea Ice Polar Stereographic South
    case "EPSG:3976" => LatLngToPolar(PolarStereographic(
      a = 6378137.0, invF = Wgs84InvF, latTs = -70.0, lon0 = 0.0,
      falseE = 0.0, falseN = 0.0))
    case other => throw new IllegalArgumentException(s"unsupported CRS $other (offline registry)")
  }

  def transform(from: String, to: String): CrsTransform =
    (fromLatLngTo(from), fromLatLngTo(to)) match {
      case (IdentityTransform, t) => t
      case (s, IdentityTransform) => Inverted(s)
      case (s, t) => Composed(Inverted(s), t)
    }
}
