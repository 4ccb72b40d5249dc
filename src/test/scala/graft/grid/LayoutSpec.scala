package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

class LayoutSpec extends AnyFunSuite {

  test("WebMercator golden values") {
    val (x0, y0) = WebMercator.fromLatLng(0, 0)
    assert(x0 == 0.0 && math.abs(y0) < 1e-8)
    val (x, _) = WebMercator.fromLatLng(180, 0)
    assert(math.abs(x - 20037508.342789244) < 1e-6)
    val (_, y45) = WebMercator.fromLatLng(0, 45)
    assert(math.abs(y45 - 5621521.486192) < 1e-5) // published EPSG:3857 value
    // round trip
    val (lon, lat) = WebMercator.toLatLng(x, y45)
    assert(math.abs(lon - 180) < 1e-9 && math.abs(lat - 45) < 1e-9)
  }

  test("zoomed layout: key/extent transforms are inverse") {
    val l = WebMercator.layoutForZoom(3, 256)
    assert(l.layoutCols == 8 && l.layoutRows == 8)
    val e = l.keyToExtent(2, 5)
    val (tc, tr) = l.mapToKey((e.xmin + e.xmax) / 2, (e.ymin + e.ymax) / 2)
    assert((tc, tr) == ((2, 5)))
    // top-left world corner is tile (0,0)
    assert(l.mapToKey(-WebMercator.WorldHalf + 1, WebMercator.WorldHalf - 1) == ((0, 0)))
  }

  test("floating layout snaps extent to whole tiles (R1 inference)") {
    val l = FloatingLayout.fit(Extent(0, 0, 100, 50), 1.0, 1.0, 16)
    assert(l.layoutCols == 7 && l.layoutRows == 4) // ceil(100/16), ceil(50/16)
    assert(l.extent.xmax == 112.0 && l.extent.ymin == -14.0)
    assert(math.abs(l.cellWidth - 1.0) < 1e-12)
  }

  test("zoomFor picks the finest zoom at or above the cell size") {
    val z = WebMercator.zoomFor(WebMercator.WorldExtent.width / (4 * 256), 256)
    assert(z == 2)
  }

  test("covered keys: edge-sampled bbox contains every densely projected interior point") {
    val ts = 8
    val src = LayoutDefinition(Extent(0, 0, 64, 64), ts, ts, 2, 2)
    // room for the warp's +-24 vertical swing
    val dst = LayoutDefinition(Extent(0, -32, 64, 96), ts, ts, 2, 4)
    // strongly curved edges with the extremum strictly inside an edge
    // (phase-shifted sine): a corner-only bbox misses the bulge
    val warp = new CrsTransform {
      def forward(x: Double, y: Double): (Double, Double) =
        (x, y + 24.0 * math.sin(x / 64.0 * 2 * math.Pi + 0.7))
      def inverse(x: Double, y: Double): (Double, Double) =
        (x, y - 24.0 * math.sin(x / 64.0 * 2 * math.Pi + 0.7))
    }
    val ck = Reproject.coveredKeysFn(src, dst, warp)
    var checked = 0
    for (tc <- 0 until 2; tr <- 0 until 2) {
      val covered = ck(tc, tr).toSet
      val e = src.keyToExtent(tc, tr)
      for (i <- 0 to 40; j <- 0 to 40) {
        val (wx, wy) = warp.forward(
          e.xmin + i * e.width / 40.0, e.ymin + j * e.height / 40.0)
        val k = dst.mapToKey(wx, wy)
        if (k._1 >= 0 && k._1 < dst.layoutCols && k._2 >= 0 && k._2 < dst.layoutRows) {
          checked += 1
          assert(covered.contains(k),
            s"source tile ($tc,$tr): projected point ($wx,$wy) -> $k not in covered keys $covered")
        }
      }
    }
    assert(checked > 5000)
    // and UTM near the pole: tiles spanning the central meridian off-center
    val utmSrc = LayoutDefinition(Extent(3.5, 67.0, 11.5, 71.0), ts, ts, 4, 4)
    val t32 = LatLngToUtm(32, north = true)
    val pts = for (i <- 0 to 64; j <- 0 to 64)
      yield t32.forward(3.5 + i * 8.0 / 64, 67.0 + j * 4.0 / 64)
    val utmDst = FloatingLayout.fit(
      Extent(pts.map(_._1).min, pts.map(_._2).min, pts.map(_._1).max, pts.map(_._2).max),
      (pts.map(_._1).max - pts.map(_._1).min) / (4.0 * ts),
      (pts.map(_._1).max - pts.map(_._1).min) / (4.0 * ts), ts)
    val uck = Reproject.coveredKeysFn(utmSrc, utmDst, t32)
    for (tc <- 0 until 4; tr <- 0 until 4) {
      val covered = uck(tc, tr).toSet
      val e = utmSrc.keyToExtent(tc, tr)
      for (i <- 0 to 24; j <- 0 to 24) {
        val (ux, uy) = t32.forward(e.xmin + i * e.width / 24.0, e.ymin + j * e.height / 24.0)
        val k = utmDst.mapToKey(ux, uy)
        if (k._1 >= 0 && k._1 < utmDst.layoutCols && k._2 >= 0 && k._2 < utmDst.layoutRows)
          assert(covered.contains(k), s"UTM: tile ($tc,$tr) point -> $k missing from $covered")
      }
    }
  }

  test("UTM golden values: anchors, independent meridian-arc integral, round-trip") {
    val z32 = Utm(32, north = true)
    assert(z32.lon0 == 9.0)
    // central-meridian anchor: equator at lon0 -> (500000, 0)
    val (e0, n0) = z32.fromLatLng(9.0, 0.0)
    assert(math.abs(e0 - 500000.0) < 1e-6 && math.abs(n0) < 1e-6)
    // on the central meridian, northing = k0 * meridian arc. Check the
    // series against an INDEPENDENT numerical integration of the
    // meridian-arc integral a(1-e2)/(1-e2 sin^2 t)^1.5.
    val a = 6378137.0; val f = 1.0 / 298.257223563; val e2 = f * (2 - f)
    def arcNumeric(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg); val n = 20000
      val h = phi / n
      (0 to n).map { i =>
        val t = i * h
        val w = if (i == 0 || i == n) 1.0 else if (i % 2 == 1) 4.0 else 2.0
        w * a * (1 - e2) / math.pow(1 - e2 * math.sin(t) * math.sin(t), 1.5)
      }.sum * h / 3
    }
    for (lat <- Seq(10.0, 45.0, 60.0)) {
      val (_, n) = z32.fromLatLng(9.0, lat)
      assert(math.abs(n - 0.9996 * arcNumeric(lat)) < 1e-3, s"lat $lat")
    }
    // public anchor (Eiffel Tower, zone 31N) to a few meters
    val (ee, en) = Utm(31, north = true).fromLatLng(2.2945, 48.8582)
    assert(math.abs(ee - 448252) < 20 && math.abs(en - 5411935) < 20)
    // southern hemisphere false northing
    val (_, sn) = Utm(33, north = false).fromLatLng(15.0, -30.0)
    assert(sn > 6000000 && sn < 10000000)
    // round-trip over the zone
    for (i <- 0 to 4; j <- 0 to 20) {
      val lon = 6.0 + 1.5 * i
      val lat = -80.0 + 8.0 * j
      val (x, y) = Utm(32, north = lat >= 0).fromLatLng(lon, lat)
      val (lon2, lat2) = Utm(32, north = lat >= 0).toLatLng(x, y)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7, s"($lon,$lat)")
    }
  }

  test("LCC golden values: EPSG worked example, standard-parallel scale, anchors, round-trip") {
    // EPSG Guidance Note 7-2 worked example (LCC 2SP): NAD27 / Texas
    // South Central, Clarke 1866 in US survey feet. Published result
    // for 28°30'N 96°00'W: E = 2963503.91 ft, N = 254759.80 ft.
    val tx = LambertConformalConic(a = 20925832.16, invF = 294.978698214,
      lat0 = 27.0 + 50.0 / 60, lon0 = -99.0,
      sp1 = 28.0 + 23.0 / 60, sp2 = 30.0 + 17.0 / 60,
      falseE = 2000000.0, falseN = 0.0)
    val (te, tn) = tx.fromLatLng(-96.0, 28.5)
    assert(math.abs(te - 2963503.91) < 0.05 && math.abs(tn - 254759.80) < 0.05,
      s"EPSG example: got ($te, $tn)")

    // Lambert-93: the grid origin maps to the false origin exactly
    val l93 = LambertConformalConic(6378137.0, 298.257222101,
      46.5, 3.0, 49.0, 44.0, 700000.0, 6600000.0)
    val (ox, oy) = l93.fromLatLng(3.0, 46.5)
    assert(math.abs(ox - 700000.0) < 1e-6 && math.abs(oy - 6600000.0) < 1e-6)
    // conformal invariant: scale factor is EXACTLY 1 on both standard
    // parallels (finite-difference east-west scale vs the ellipsoidal
    // parallel arc nu*cos(phi)*dLambda)
    val a = 6378137.0; val f = 1 / 298.257222101; val e2 = f * (2 - f)
    def parallelScale(lcc: LambertConformalConic, lat: Double, lon: Double): Double = {
      val h = 1e-6 // degrees
      val (x1, y1) = lcc.fromLatLng(lon - h, lat)
      val (x2, y2) = lcc.fromLatLng(lon + h, lat)
      val proj = math.hypot(x2 - x1, y2 - y1)
      val phi = math.toRadians(lat)
      val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      proj / (nu * math.cos(phi) * math.toRadians(2 * h))
    }
    for (sp <- Seq(49.0, 44.0); lon <- Seq(-1.0, 3.0, 7.0))
      assert(math.abs(parallelScale(l93, sp, lon) - 1.0) < 1e-8, s"k($sp,$lon)")
    // between the parallels the cone cuts below the surface: k < 1
    assert(parallelScale(l93, 46.5, 3.0) < 1.0)
    // outside: k > 1
    assert(parallelScale(l93, 51.5, 3.0) > 1.0)
    // round-trip across France
    for (i <- 0 to 6; j <- 0 to 6) {
      val lon = -4.0 + 2.0 * i; val lat = 42.0 + 1.5 * j
      val (x, y) = l93.fromLatLng(lon, lat)
      val (lon2, lat2) = l93.toLatLng(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("Canada Atlas Lambert (EPSG:3978): anchors, standard-parallel scale, round-trip") {
    val t = Crs.transform("EPSG:4326", "EPSG:3978")
    // grid origin (49N 95W) -> (0, 0)
    val (ox, oy) = t.forward(-95.0, 49.0)
    assert(math.abs(ox) < 1e-6 && math.abs(oy) < 1e-6)
    // k = 1 on both standard parallels (49N, 77N)
    val a = 6378137.0; val f = 1 / 298.257222101; val e2 = f * (2 - f)
    def k(lat: Double, lon: Double): Double = {
      val h = 1e-6
      val (x1, y1) = t.forward(lon - h, lat)
      val (x2, y2) = t.forward(lon + h, lat)
      val phi = math.toRadians(lat)
      val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      math.hypot(x2 - x1, y2 - y1) / (nu * math.cos(phi) * math.toRadians(2 * h))
    }
    for (sp <- Seq(49.0, 77.0); lon <- Seq(-123.0, -95.0, -60.0))
      assert(math.abs(k(sp, lon) - 1.0) < 1e-8, s"k($sp,$lon)=${k(sp, lon)}")
    // round-trip across Canada
    for (i <- 0 to 7; j <- 0 to 5) {
      val lon = -140.0 + 10.0 * i; val lat = 42.0 + 6.0 * j
      val (x, y) = t.forward(lon, lat)
      val (lon2, lat2) = t.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("Albers golden values: equal-area Jacobian, anchors, round-trip (EPSG:5070)") {
    val aea = AlbersEqualArea(6378137.0, 298.257222101,
      23.0, -96.0, 29.5, 45.5, 0.0, 0.0)
    // grid origin
    val (ox, oy) = aea.fromLatLng(-96.0, 23.0)
    assert(math.abs(ox) < 1e-6 && math.abs(oy) < 1e-6)
    // the DEFINING invariant: the projected area element equals the
    // ellipsoidal area element M*nu*cos(phi) everywhere (not just on
    // the standard parallels) — finite-difference Jacobian determinant
    val a = 6378137.0; val f = 1 / 298.257222101; val e2 = f * (2 - f)
    def areaScale(lat: Double, lon: Double): Double = {
      val h = 1e-6
      val (x0, y0) = aea.fromLatLng(lon - h, lat)
      val (x1, y1) = aea.fromLatLng(lon + h, lat)
      val (x2, y2) = aea.fromLatLng(lon, lat - h)
      val (x3, y3) = aea.fromLatLng(lon, lat + h)
      val dxdl = (x1 - x0) / (2 * h); val dydl = (y1 - y0) / (2 * h)
      val dxdp = (x3 - x2) / (2 * h); val dydp = (y3 - y2) / (2 * h)
      val jac = math.abs(dxdl * dydp - dydl * dxdp) * math.pow(180 / math.Pi, 2)
      val phi = math.toRadians(lat)
      val sin2 = math.sin(phi) * math.sin(phi)
      val nu = a / math.sqrt(1 - e2 * sin2)
      val bigM = a * (1 - e2) / math.pow(1 - e2 * sin2, 1.5)
      jac / (bigM * nu * math.cos(phi))
    }
    for (lat <- Seq(25.0, 29.5, 37.0, 45.5, 49.0); lon <- Seq(-120.0, -96.0, -75.0))
      assert(math.abs(areaScale(lat, lon) - 1.0) < 1e-5, s"area($lat,$lon)=${areaScale(lat, lon)}")
    // round-trip across CONUS
    for (i <- 0 to 7; j <- 0 to 5) {
      val lon = -124.0 + 8.0 * i; val lat = 24.0 + 5.0 * j
      val (x, y) = aea.fromLatLng(lon, lat)
      val (lon2, lat2) = aea.toLatLng(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("Polar stereographic golden values: GN7-2 worked example, scale, anchors, round-trip") {
    // IOGP Guidance Note 7-2 worked example (Polar Stereographic
    // variant B): WGS 84 / Australian Antarctic Polar Stereographic
    // (EPSG:3032). Published result for 75°00'00"S 120°00'00"E:
    // E = 7255380.79 m, N = 7053389.56 m.
    val aps = PolarStereographic(a = 6378137.0, invF = 298.257223563,
      latTs = -71.0, lon0 = 70.0, falseE = 6000000.0, falseN = 6000000.0)
    val (ge, gn) = aps.fromLatLng(120.0, -75.0)
    assert(math.abs(ge - 7255380.79) < 0.05 && math.abs(gn - 7053389.56) < 0.05,
      s"GN7-2 example: got ($ge, $gn)")
    // ...and the published inverse leg recovers the input coordinates
    val (glon, glat) = aps.toLatLng(7255380.79, 7053389.56)
    assert(math.abs(glon - 120.0) < 1e-6 && math.abs(glat - (-75.0)) < 1e-6)

    // anchors: each grid's projection pole maps to the false origin
    val s3031 = Crs.transform("EPSG:4326", "EPSG:3031")
    val (px, py) = s3031.forward(45.0, -90.0) // any lon at the pole
    assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6)
    val n3413 = Crs.transform("EPSG:4326", "EPSG:3413")
    val (qx, qy) = n3413.forward(123.0, 90.0)
    assert(math.abs(qx) < 1e-6 && math.abs(qy) < 1e-6)
    // EPSG:3031 axis orientation: on the 0° meridian, Antarctic points
    // sit at x=0 with y > 0 (grid north along 0°E away from the pole)
    val (zx, zy) = s3031.forward(0.0, -75.0)
    assert(math.abs(zx) < 1e-6 && zy > 0)

    // conformal invariant: k = 1 exactly on the standard parallel, in
    // both the east-west and north-south directions (conformality),
    // k < 1 poleward of it, k > 1 equatorward (secant geometry)
    val A = 6378137.0; val f = 1 / 298.257223563; val e2 = f * (2 - f)
    def kPar(t: CrsTransform, lat: Double, lon: Double): Double = {
      val h = 1e-6
      val (x1, y1) = t.forward(lon - h, lat)
      val (x2, y2) = t.forward(lon + h, lat)
      val phi = math.toRadians(lat)
      val nu = A / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      math.hypot(x2 - x1, y2 - y1) / (nu * math.cos(phi) * math.toRadians(2 * h))
    }
    def kMer(t: CrsTransform, lat: Double, lon: Double): Double = {
      val h = 1e-6
      val (x1, y1) = t.forward(lon, lat - h)
      val (x2, y2) = t.forward(lon, lat + h)
      val phi = math.toRadians(lat)
      val rho = A * (1 - e2) / math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
      math.hypot(x2 - x1, y2 - y1) / (rho * math.toRadians(2 * h))
    }
    for (lon <- Seq(-120.0, 0.0, 60.0)) {
      assert(math.abs(kPar(s3031, -71.0, lon) - 1.0) < 5e-8, s"k3031($lon)")
      assert(math.abs(kMer(s3031, -71.0, lon) - 1.0) < 1e-6, s"kM3031($lon)")
      assert(math.abs(kPar(n3413, 70.0, lon) - 1.0) < 5e-8, s"k3413($lon)")
    }
    assert(kPar(s3031, -80.0, 0.0) < 1.0 && kPar(s3031, -60.0, 0.0) > 1.0)
    assert(kPar(n3413, 80.0, 0.0) < 1.0 && kPar(n3413, 60.0, 0.0) > 1.0)

    // round-trip across Antarctica and the Arctic basin
    for (i <- 0 until 12; j <- 0 to 5) {
      val lon = -180.0 + 30.0 * i
      val latS = -88.0 + 5.0 * j
      val (x, y) = s3031.forward(lon, latS)
      val (lon2, lat2) = s3031.inverse(x, y)
      assert(math.abs(lat2 - latS) < 1e-9, s"S($lon,$latS)")
      assert(math.abs(lon2 - lon) < 1e-9 || math.abs(math.abs(lon2 - lon) - 360) < 1e-9)
      val latN = 58.0 + 6.0 * j
      val (nx, ny) = n3413.forward(lon, latN)
      val (lon3, lat3) = n3413.inverse(nx, ny)
      assert(math.abs(lat3 - latN) < 1e-9, s"N($lon,$latN)")
      assert(math.abs(lon3 - lon) < 1e-9 || math.abs(math.abs(lon3 - lon) - 360) < 1e-9)
    }
    // registry composition through the hub, like every other family
    val p2w = Crs.transform("EPSG:3031", "EPSG:3857")
    val (sx, sy) = s3031.forward(10.0, -75.0)
    val (wx, wy) = p2w.forward(sx, sy)
    val (ex, ey) = WebMercator.fromLatLng(10.0, -75.0)
    assert(math.abs(wx - ex) < 1e-3 && math.abs(wy - ey) < 1e-3)
  }

  test("Crs registry composes arbitrary EPSG pairs through lon/lat") {
    val t = Crs.transform("EPSG:32632", "EPSG:3857")
    val (lon, lat) = (9.5, 48.0)
    val (ux, uy) = Utm(32, north = true).fromLatLng(lon, lat)
    val (wx, wy) = t.forward(ux, uy)
    val (ex, ey) = WebMercator.fromLatLng(lon, lat)
    assert(math.abs(wx - ex) < 1e-3 && math.abs(wy - ey) < 1e-3) // <= 1 mm
    val (bx, by) = t.inverse(wx, wy)
    assert(math.abs(bx - ux) < 1e-3 && math.abs(by - uy) < 1e-3)
    assert(Crs.transform("EPSG:4326", "EPSG:32701").isInstanceOf[LatLngToUtm])
    intercept[IllegalArgumentException](Crs.transform("EPSG:4326", "EPSG:9999"))
    // conic families compose through the hub like any other pair
    val l2w = Crs.transform("EPSG:2154", "EPSG:3857")
    val l93 = LambertConformalConic(6378137.0, 298.257222101,
      46.5, 3.0, 49.0, 44.0, 700000.0, 6600000.0)
    val (lx, ly) = l93.fromLatLng(2.35, 48.85)
    val (wx2, wy2) = l2w.forward(lx, ly)
    val (exx, exy) = WebMercator.fromLatLng(2.35, 48.85)
    assert(math.abs(wx2 - exx) < 1e-3 && math.abs(wy2 - exy) < 1e-3)
    val u2a = Crs.transform("EPSG:32614", "EPSG:5070") // Texas UTM -> CONUS Albers
    val (ux14, uy14) = Utm(14, north = true).fromLatLng(-98.0, 31.0)
    val (ax, ay) = u2a.forward(ux14, uy14)
    val (bx2, by2) = u2a.inverse(ax, ay)
    assert(math.abs(bx2 - ux14) < 1e-3 && math.abs(by2 - uy14) < 1e-3)
  }

  test("cross-CRS stack: Lambert-93 layer reprojected to WebMercator hash-matches the native stack") {
    import spark.implicits._
    val ts = 16
    val zoom = 7
    val wm = WebMercator.layoutForZoom(zoom, ts)
    // a patch over central France (inside EPSG:2154's validity)
    val (cwx, cwy) = WebMercator.fromLatLng(3.0, 47.0)
    val (kc, kr) = wm.mapToKey(cwx, cwy)
    val pixels = (for (tc <- kc to kc + 1; tr <- kr to kr + 1; px <- 0 until ts; py <- 0 until ts)
      yield (tc, tr, px, py, (tc * 7 + tr * 3 + (px / 4) + (py / 4)).toDouble))
      .toDF("tile_col", "tile_row", "px", "py", "v")
    val native = graft.ops.Raster.assemble(pixels, ts, ts)
    val wmToLcc = Crs.transform("EPSG:3857", "EPSG:2154")
    val e = wm.keyToExtent(kc, kr).combine(wm.keyToExtent(kc + 1, kr + 1))
    val (lxmin, lymin) = wmToLcc.forward(e.xmin, e.ymin)
    val (lxmax, lymax) = wmToLcc.forward(e.xmax, e.ymax)
    val cell = (lxmax - lxmin) / (2.0 * ts) / 3.2
    val lccLayout = FloatingLayout.fit(
      Extent(lxmin - 10 * cell, lymin - 10 * cell, lxmax + 10 * cell, lymax + 10 * cell), cell, cell, ts)
    val lccPixels = (for {
      tc <- 0 until lccLayout.layoutCols; tr <- 0 until lccLayout.layoutRows
      px <- 0 until ts; py <- 0 until ts
    } yield {
      val (ux, uy) = lccLayout.cellCenter(tc, tr, px, py)
      val (wx, wy) = wmToLcc.inverse(ux, uy)
      val (wtc, wtr) = wm.mapToKey(wx, wy)
      val gx = ((wx - wm.extent.xmin) / wm.cellWidth).toLong
      val gy = ((wm.extent.ymax - wy) / wm.cellHeight).toLong
      val wpx = (gx - wtc.toLong * ts).toInt
      val wpy = (gy - wtr.toLong * ts).toInt
      (tc, tr, px, py, (wtc * 7 + wtr * 3 + (wpx / 4) + (wpy / 4)).toDouble)
    }).toDF("tile_col", "tile_row", "px", "py", "v")
    val lccTiles = graft.ops.Raster.assemble(lccPixels, ts, ts)
    val reproj = Reproject(lccTiles, lccLayout, wm, Inverted(wmToLcc))
      .where($"tile_col".between(kc, kc + 1) && $"tile_row".between(kr, kr + 1))
    val cross = graft.ops.Raster.stackBands(Seq(native, reproj))
    val same = graft.ops.Raster.stackBands(Seq(native, native))
    def bandMap(stack: org.apache.spark.sql.DataFrame, b: Int) =
      graft.ops.Raster.pixelize(graft.ops.Raster.selectBand(stack, b), ts)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) -> r.getDouble(4)).toMap
    assert(bandMap(cross, 0) == bandMap(same, 0))
    assert(bandMap(cross, 1) == bandMap(same, 1))
  }

  test("cross-CRS stack: Antarctic polar (EPSG:3031) layer reprojected to WebMercator hash-matches the native stack") {
    import spark.implicits._
    val ts = 16
    val zoom = 7
    val wm = WebMercator.layoutForZoom(zoom, ts)
    // a patch over Dronning Maud Land (well inside EPSG:3031's range,
    // still inside WebMercator's ±85° validity)
    val (cwx, cwy) = WebMercator.fromLatLng(10.0, -75.0)
    val (kc, kr) = wm.mapToKey(cwx, cwy)
    val pixels = (for (tc <- kc to kc + 1; tr <- kr to kr + 1; px <- 0 until ts; py <- 0 until ts)
      yield (tc, tr, px, py, (tc * 7 + tr * 3 + (px / 4) + (py / 4)).toDouble))
      .toDF("tile_col", "tile_row", "px", "py", "v")
    val native = graft.ops.Raster.assemble(pixels, ts, ts)
    val wmToPs = Crs.transform("EPSG:3857", "EPSG:3031")
    val e = wm.keyToExtent(kc, kr).combine(wm.keyToExtent(kc + 1, kr + 1))
    // polar grid axes are rotated vs WebMercator near this longitude:
    // bound the patch by projecting all four corners
    val corners = Seq((e.xmin, e.ymin), (e.xmin, e.ymax), (e.xmax, e.ymin), (e.xmax, e.ymax))
      .map { case (x, y) => wmToPs.forward(x, y) }
    val lxmin = corners.map(_._1).min; val lxmax = corners.map(_._1).max
    val lymin = corners.map(_._2).min; val lymax = corners.map(_._2).max
    val cell = (lxmax - lxmin) / (2.0 * ts) / 3.2
    val psLayout = FloatingLayout.fit(
      Extent(lxmin - 10 * cell, lymin - 10 * cell, lxmax + 10 * cell, lymax + 10 * cell), cell, cell, ts)
    val psPixels = (for {
      tc <- 0 until psLayout.layoutCols; tr <- 0 until psLayout.layoutRows
      px <- 0 until ts; py <- 0 until ts
    } yield {
      val (ux, uy) = psLayout.cellCenter(tc, tr, px, py)
      val (wx, wy) = wmToPs.inverse(ux, uy)
      val (wtc, wtr) = wm.mapToKey(wx, wy)
      val gx = ((wx - wm.extent.xmin) / wm.cellWidth).toLong
      val gy = ((wm.extent.ymax - wy) / wm.cellHeight).toLong
      val wpx = (gx - wtc.toLong * ts).toInt
      val wpy = (gy - wtr.toLong * ts).toInt
      (tc, tr, px, py, (wtc * 7 + wtr * 3 + (wpx / 4) + (wpy / 4)).toDouble)
    }).toDF("tile_col", "tile_row", "px", "py", "v")
    val psTiles = graft.ops.Raster.assemble(psPixels, ts, ts)
    val reproj = Reproject(psTiles, psLayout, wm, Inverted(wmToPs))
      .where($"tile_col".between(kc, kc + 1) && $"tile_row".between(kr, kr + 1))
    val cross = graft.ops.Raster.stackBands(Seq(native, reproj))
    val same = graft.ops.Raster.stackBands(Seq(native, native))
    def bandMap(stack: org.apache.spark.sql.DataFrame, b: Int) =
      graft.ops.Raster.pixelize(graft.ops.Raster.selectBand(stack, b), ts)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) -> r.getDouble(4)).toMap
    assert(bandMap(cross, 0) == bandMap(same, 0))
    assert(bandMap(cross, 1) == bandMap(same, 1))
  }

  test("cross-CRS stack: UTM layer reprojected to WebMercator hash-matches the native stack") {
    import spark.implicits._
    val ts = 16
    // a WebMercator layout over a patch of zone-32 UTM coverage
    val zoom = 7
    val wm = WebMercator.layoutForZoom(zoom, ts)
    val (cwx, cwy) = WebMercator.fromLatLng(9.0, 48.0)
    val (kc, kr) = wm.mapToKey(cwx, cwy)
    // native layer: value = deterministic function of the WM tile key/cell
    val pixels = (for (tc <- kc to kc + 1; tr <- kr to kr + 1; px <- 0 until ts; py <- 0 until ts)
      yield (tc, tr, px, py, (tc * 7 + tr * 3 + (px / 4) + (py / 4)).toDouble))
      .toDF("tile_col", "tile_row", "px", "py", "v")
    val native = graft.ops.Raster.assemble(pixels, ts, ts)
    // UTM-native layer over the same area, ~3x finer cells, sampled from
    // the same field through the CRS math
    val utm = Utm(32, north = true)
    val wmToUtm = Crs.transform("EPSG:3857", "EPSG:32632")
    val e = wm.keyToExtent(kc, kr).combine(wm.keyToExtent(kc + 1, kr + 1))
    val (uxmin, uymin) = wmToUtm.forward(e.xmin, e.ymin)
    val (uxmax, uymax) = wmToUtm.forward(e.xmax, e.ymax)
    val cell = (uxmax - uxmin) / (2.0 * ts) / 3.2 // ~3x finer than the WM grid
    val utmLayout = FloatingLayout.fit(
      Extent(uxmin - 10 * cell, uymin - 10 * cell, uxmax + 10 * cell, uymax + 10 * cell), cell, cell, ts)
    val utmPixels = (for {
      tc <- 0 until utmLayout.layoutCols; tr <- 0 until utmLayout.layoutRows
      px <- 0 until ts; py <- 0 until ts
    } yield {
      val (ux, uy) = utmLayout.cellCenter(tc, tr, px, py)
      val (wx, wy) = wmToUtm.inverse(ux, uy)
      val (wtc, wtr) = wm.mapToKey(wx, wy)
      val gx = ((wx - wm.extent.xmin) / wm.cellWidth).toLong
      val gy = ((wm.extent.ymax - wy) / wm.cellHeight).toLong
      val wpx = (gx - wtc.toLong * ts).toInt
      val wpy = (gy - wtr.toLong * ts).toInt
      (tc, tr, px, py, (wtc * 7 + wtr * 3 + (wpx / 4) + (wpy / 4)).toDouble)
    }).toDF("tile_col", "tile_row", "px", "py", "v")
    val utmTiles = graft.ops.Raster.assemble(utmPixels, ts, ts)
    // reproject the UTM layer onto the WM layout, stack with native, and
    // compare band-by-band against the same-CRS (native, native) stack
    val reproj = Reproject(utmTiles, utmLayout, wm, Inverted(wmToUtm))
      .where($"tile_col".between(kc, kc + 1) && $"tile_row".between(kr, kr + 1))
    val cross = graft.ops.Raster.stackBands(Seq(native, reproj))
    val same = graft.ops.Raster.stackBands(Seq(native, native))
    def bandMap(stack: org.apache.spark.sql.DataFrame, b: Int) =
      graft.ops.Raster.pixelize(graft.ops.Raster.selectBand(stack, b), ts)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) -> r.getDouble(4)).toMap
    assert(bandMap(cross, 0) == bandMap(same, 0))
    assert(bandMap(cross, 1) == bandMap(same, 1))
  }

  test("identity reproject onto the same layout is lossless") {
    import spark.implicits._
    val ts = 8
    val layout = LayoutDefinition(Extent(0, 0, 32, 32), ts, ts, 4, 4)
    val pixels = (for (tc <- 0 to 2; tr <- 0 to 2; px <- 0 until ts; py <- 0 until ts)
      yield (tc, tr, px, py, tc * 100.0 + tr * 10 + px + py.toDouble))
      .toDF("tile_col", "tile_row", "px", "py", "v")
    val tiles = graft.ops.Raster.assemble(pixels, ts, ts)
    val re = Reproject(tiles, layout, layout, IdentityTransform)
    val back = graft.ops.Raster.pixelize(re, ts)
    assert(back.count() == pixels.count())
    val got = back.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) -> r.getDouble(4)).toMap
    val want = pixels.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) -> r.getDouble(4)).toMap
    assert(got == want)
  }

  test("latlon -> webmercator reproject lands cells at projected keys") {
    import spark.implicits._
    val ts = 16
    // source: whole-world lon/lat grid, 2x1 tiles (cell = 11.25 deg)
    val srcLayout = LayoutDefinition(Extent(-180, -90, 180, 90), ts, ts, 2, 1)
    val pixels = (for (tc <- 0 to 1; px <- 0 until ts; py <- 0 until ts)
      yield (tc, 0, px, py, tc * 1000.0 + px + py * ts))
      .toDF("tile_col", "tile_row", "px", "py", "v")
    val tiles = graft.ops.Raster.assemble(pixels, ts, ts)
    val dst = WebMercator.layoutForZoom(1, ts) // 2x2 world tiles
    val re = Reproject(tiles, srcLayout, dst, LatLngToWebMercator).cache()
    assert(re.count() == 4) // all four web-mercator tiles covered
    // target cell at lon 90.1deg, lat ~0+ (just above equator):
    // source cell: gx = floor((90.1+180)/11.25)=24 -> tile 1, px 8
    val cells = re.where($"tile_col" === 1 && $"tile_row" === 0)
      .select($"cells").as[Seq[Double]].head()
    // dst tile (1,0) of zoom 1, cell (8, 15): center x in (0..pi*R), y just above 0
    val (dx, dy) = dst.cellCenter(1, 0, 8, 15)
    val (lon, lat) = WebMercator.toLatLng(dx, dy)
    val expectedGx = math.floor((lon + 180) / 11.25).toInt
    val expectedV = 1000.0 * (expectedGx / ts) + (expectedGx % ts) +
      math.floor((90 - lat) / 11.25) * ts
    assert(cells(8 + 15 * ts) == expectedV)
  }
}
