package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark
import graft.core.TileMath

/** The fixtures use small tiles; this drives the engine's default
  * 256x256 tiles (Utils.scala:21) through the hot operators so the
  * 65k-cell buffer paths (assemble, halo, pyramid, histogram) are
  * exercised at reference geometry. */
class DefaultTileSizeSpec extends AnyFunSuite {
  import spark.implicits._
  val TS = TileMath.DefaultTileSize // 256

  lazy val tiles = {
    // 2x2 tiles of 256x256 = 262k cells, value = f(global coords)
    val pixels = spark.range(0, 4L * TS * TS).select(
      (col("id") / (TS.toLong * TS)).cast("int").as("t"),
      (col("id") % (TS.toLong * TS)).cast("int").as("i"))
      .select(
        (col("t") % 2).as("tile_col"), (col("t") / 2).cast("int").as("tile_row"),
        (col("i") % TS).cast("int").as("px"), (col("i") / TS).cast("int").as("py"),
        ((col("t") * 7 + col("i") % 97) % 13).cast("double").as("v"))
    Raster.assemble(pixels, TS, TS).cache()
  }

  test("assemble produces full 65536-cell tiles") {
    val sizes = tiles.select(size(col("cells"))).as[Int].collect()
    assert(sizes.length == 4 && sizes.forall(_ == TS * TS))
  }

  test("histogram stats over 262k cells") {
    val st = Histograms.statistics(tiles, TS).head()
    assert(st.getAs[Long]("n_cells") == 4L * TS * TS)
    assert(st.getAs[Double]("max_v") <= 12.0)
  }

  test("halo + focal mean at 256x256 stays correct at tile seams") {
    val focal = Raster.focalMean(tiles, TS, TS, radius = 1, circle = false)
    val px = Raster.globalCoords(Raster.pixelize(focal, TS), TS, TS)
    // seam cell (gx=256, gy=10): neighbors span tiles (0,0) and (1,0)
    val got = px.where(col("gx") === TS && col("gy") === 10).select(col("v")).head().getDouble(0)
    def v(t: Long, i: Long): Double = ((t * 7 + i % 97) % 13).toDouble
    def cell(gx: Long, gy: Long): Double = {
      val tc = gx / TS; val tr = gy / TS
      v(tr * 2 + tc, (gx % TS) + (gy % TS) * TS)
    }
    val n = for (dx <- -1 to 1; dy <- -1 to 1) yield cell(TS + dx, 10 + dy)
    assert(math.abs(got - n.sum / n.size) < 1e-12)
  }

  test("pyramid downsamples 2x2 tiles into one 256x256 parent") {
    val up = Raster.pyramidUp(tiles, TS, TS)
    assert(up.count() == 1)
    assert(up.select(size(col("cells"))).as[Int].head() == TS * TS)
  }

  test("quantile breaks are monotone and span the value range") {
    val breaks = Histograms.quantileBreaks(tiles, TS, 10)
    assert(breaks.length == 10)
    assert(breaks == breaks.sorted)
    assert(breaks.last <= 12.0 && breaks.head >= 0.0)
  }
}
