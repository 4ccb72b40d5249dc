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
