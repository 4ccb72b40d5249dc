package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TileMathSpec extends AnyFunSuite {
  import TileMath._
  val NaN = Double.NaN

  test("combine propagates NoData from either side") {
    val out = combine(Array(1.0, NaN, 3.0, 4.0), Array(2.0, 2.0, NaN, 4.0))(_ + _)
    assert(out(0) == 3.0 && out(1).isNaN && out(2).isNaN && out(3) == 8.0)
  }

  test("merge: incoming wins where defined") {
    val out = merge(Array(1.0, 2.0, NaN), Array(9.0, NaN, 7.0))
    assert(out.toSeq.take(2) == Seq(9.0, 2.0) && out(2) == 7.0)
  }

  test("ndvi formula and guards") {
    assert(ndvi(5, 3) == 0.25)
    assert(ndvi(NaN, 3).isNaN && ndvi(1, -1).isNaN)
  }

  test("downsample2 averages data cells of each 2x2 block") {
    // 4x4 tile: top-left block = {1,2,3,4} -> 2.5; block with NaN hole -> mean of rest
    val t = Array[Double](1, 2, 10, NaN, 3, 4, 20, 30, 5, NaN, NaN, NaN, NaN, NaN, NaN, NaN)
    val out = downsample2(t, 4, 4)
    assert(out(0) == 2.5 && out(1) == 20.0 && out(2) == 5.0 && out(3).isNaN)
  }

  test("upsampleChildNN: children read floor-div parent cells") {
    val t = Array[Double](1, 2, 3, 4) // 2x2
    val c00 = upsampleChildNN(t, 2, 2, 0, 0, 1)
    assert(c00.toSeq == Seq(1.0, 1.0, 1.0, 1.0))
    val c11 = upsampleChildNN(t, 2, 2, 1, 1, 1)
    assert(c11.toSeq == Seq(4.0, 4.0, 4.0, 4.0))
  }

  test("upsampleChildInterp bilinear: hand-computed golden on a 2x2 parent") {
    val t = Array[Double](0, 1, 2, 3) // a(x,y): 0 1 / 2 3
    // child (0,0): centers map to parent (0.25, 0.25)..(0.75, 0.75);
    // out-of-tile neighbors renormalize, interior cell interpolates:
    //   (0,0) -> a00 = 0;  (1,0) -> 0.75*0 + 0.25*1 = 0.25 (x only)
    //   (0,1) -> 0.5;      (1,1) -> full 2x2 blend = 0.75
    val c00 = upsampleChildInterp(t, 2, 2, 0, 0, 1, cubic = false)
    assert(c00.toSeq == Seq(0.0, 0.25, 0.5, 0.75), c00.toSeq)
    // child (1,1): (0,0) = full blend at (1.25, 1.25) = 2.25; (1,1)
    // renormalizes to the corner cell a11 = 3
    val c11 = upsampleChildInterp(t, 2, 2, 1, 1, 1, cubic = false)
    assert(c11(0) == 2.25 && c11(3) == 3.0, c11.toSeq)
    // NaN parent cell: bilinear renormalizes over data neighbors only
    val withHole = Array[Double](0, Double.NaN, 2, 3)
    val h00 = upsampleChildInterp(withHole, 2, 2, 0, 0, 1, cubic = false)
    assert(h00(0) == 0.0 && !h00(3).isNaN)
    // cubic on an all-data interior degrades to bilinear only at edges;
    // constant tiles are reproduced exactly by both kernels
    val const = Array.fill(16)(7.0)
    assert(upsampleChildInterp(const, 4, 4, 1, 0, 1, cubic = true).forall(_ == 7.0))
  }

  test("focalMean radius 1 circle matches hand computation incl NoData") {
    // 3x3 tile, pad 1 of NaN (layer edge); center cell neighborhood = cross
    val pad = 1; val pc = 5
    val padded = TileMath.empty(pc, pc)
    val vals = Array[Double](1, 2, 3, 4, NaN, 6, 7, 8, 9)
    for (y <- 0 until 3; x <- 0 until 3) padded((x + 1) + (y + 1) * pc) = vals(x + y * 3)
    val out = focalMean(padded, 3, 3, pad, 1, circle = true)
    assert(out(0 + 0 * 3) == (1.0 + 2 + 4) / 3) // corner: cross minus edges, center=1
    assert(out(1 + 1 * 3) == (2.0 + 4 + 6 + 8) / 4) // center NaN not counted
  }

  test("convolve: asymmetric kernel golden, orientation and NoData rule") {
    // 3x3 tile, pad 1; only the center cell has a full 3x3 data window.
    val pad = 1; val pc = 5
    val padded = TileMath.empty(pc, pc)
    val vals = Array[Double](1, 2, 3, 4, 5, 6, 7, 8, 9)
    for (y <- 0 until 3; x <- 0 until 3) padded((x + 1) + (y + 1) * pc) = vals(x + y * 3)
    // kernel row 0 = NORTH row: center reads N=2 (w 1), W=4 (w 1),
    // C=5 (w 4), E=6 (w 2), S=8 (w 3) -> 2 + 4 + 20 + 12 + 24 = 62
    val k = Array[Double](0, 1, 0, 1, 4, 2, 0, 3, 0)
    val out = convolve(padded, 3, 3, pad, k)
    assert(out(1 + 1 * 3) == 62.0)
    assert(out(0).isNaN && out(2).isNaN && out(8).isNaN) // edge windows incomplete
    // a transposed kernel must differ (S weight 3 vs E weight 3):
    val kT = Array[Double](0, 1, 0, 1, 4, 3, 0, 2, 0)
    assert(convolve(padded, 3, 3, pad, kT)(1 + 1 * 3) == 2 + 4 + 20 + 18 + 16)
    // NoData anywhere in the window kills the cell, even at weight 0:
    // the NE corner of the center's window has kernel weight 0
    val padded2 = padded.clone()
    padded2(3 + 1 * pc) = Double.NaN
    assert(convolve(padded2, 3, 3, pad, k)(1 + 1 * 3).isNaN)
  }

  test("burnRect clips to tile and burns half-open rect") {
    val a = TileMath.empty(4, 4)
    burnRect(a, 4, 4, 1, 1, 5, 5, 7, 7, 9.0) // tile (1,1) covers global 4..8
    assert(a(1 + 1 * 4) == 9.0 && a(2 + 2 * 4) == 9.0 && a(3 + 3 * 4).isNaN && a(0).isNaN)
  }

  test("bilinear sample: interpolates, honors NaN, hits centers exactly") {
    val t = Array[Double](0, 10, 20, 30) // 2x2
    // dead center between all four: mean
    assert(sampleBilinear(t, 2, 2, 1.0, 1.0) == 15.0)
    // exactly on cell (0,0) center
    assert(sampleBilinear(t, 2, 2, 0.5, 0.5) == 0.0)
    // halfway horizontally on top row
    assert(sampleBilinear(t, 2, 2, 1.0, 0.5) == 5.0)
    // NaN neighbor renormalizes
    val tn = Array[Double](0, Double.NaN, 20, 30)
    assert(sampleBilinear(tn, 2, 2, 1.0, 1.0) == (0.0 + 20 + 30) / 3)
  }

  test("cubic convolution sample: Keys a=-0.5 goldens, identity at centers, safe fallback") {
    // 4x4 tile, value varies only in x: each row = [0, 1, 2, 4]
    val t = Array.tabulate(16)(i => Array(0.0, 1.0, 2.0, 4.0)(i % 4))
    // exactly on a cell center -> identity (partition of unity)
    assert(TileMath.sampleCubic(t, 4, 4, 1.5, 1.5) == 1.0)
    // edge cell center: incomplete 4x4 -> bilinear fallback, still identity
    assert(TileMath.sampleCubic(t, 4, 4, 2.5, 2.5) == 2.0)
    // midpoint between cells 1 and 2 (full neighborhood): Keys midpoint
    // weights (-1/16, 9/16, 9/16, -1/16) . (0, 1, 2, 4) = 1.4375
    assert(math.abs(TileMath.sampleCubic(t, 4, 4, 2.0, 1.5) - 1.4375) < 1e-12)
    // NaN neighbor: the signed kernel must NOT renormalize (weight sum can
    // pass near zero and amplify) -> bilinear fallback over (1,1)-(2,2)
    val tn = t.clone(); tn(0 + 1 * 4) = Double.NaN // row y=1, x=0
    assert(TileMath.sampleCubic(tn, 4, 4, 2.0, 1.5) == 1.5)
    // adversarial sparse tile: only far corners valid, cubic corner weights
    // sum near zero — the old renormalization amplified; fallback gives NaN
    val sparse = Array.fill(16)(Double.NaN); sparse(0) = 10.0; sparse(15) = 10.0
    val v = TileMath.sampleCubic(sparse, 4, 4, 2.0, 2.0)
    assert(v.isNaN, s"expected graceful NaN, got amplified $v")
    // all-NaN neighborhood -> NaN
    assert(TileMath.sampleCubic(Array.fill(16)(Double.NaN), 4, 4, 2.0, 2.0).isNaN)
  }

  test("cubic convolution is selectable in Reproject") {
    import org.apache.spark.sql.functions._
    import graft.SparkTestBase.spark
    import spark.implicits._
    val ts = 8
    val layout = graft.grid.LayoutDefinition(graft.grid.Extent(0, 0, 16, 16), ts, ts, 2, 2)
    val pixels = (for (tc <- 0 to 1; tr <- 0 to 1; px <- 0 until ts; py <- 0 until ts)
      yield (tc, tr, px, py, (tc * ts + px).toDouble))
      .toDF("tile_col", "tile_row", "px", "py", "v")
    val tiles = graft.ops.Raster.assemble(pixels, ts, ts)
    // identity layout: every target center hits a source center -> lossless
    val re = graft.grid.Reproject(tiles, layout, layout,
      graft.grid.IdentityTransform, graft.grid.Reproject.CubicConvolution)
    val got = graft.ops.Raster.pixelize(re, ts).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) -> r.getDouble(4)).toMap
    assert(got.size == 4 * ts * ts)
    assert(got((1, 0, 3, 2)) == (ts + 3).toDouble)
  }

  test("hornSlope: exact gradient on a linear ramp, NoData on partial windows") {
    // 3x3 tile, pad 1 -> padded 5x5 plane of v = 3x + 4y (global coords):
    // Horn's estimator is exact on linear surfaces -> slope = 5 everywhere
    val pc = 5
    val padded = Array.tabulate(pc * pc)(i => 3.0 * (i % pc) + 4.0 * (i / pc))
    val out = TileMath.hornSlope(padded, 3, 3, 1)
    assert(out.length == 9)
    assert(out.forall(_ == 5.0))
    // knock out one padded corner: only the cell whose window uses it dies
    val holed = padded.clone(); holed(0) = Double.NaN // global (0,0) = tl of cell (0,0)
    val out2 = TileMath.hornSlope(holed, 3, 3, 1)
    assert(out2(0).isNaN)
    assert(out2.count(!_.isNaN) == 8)
    // NaN center -> NaN even with 8 data neighbors
    val centerHole = padded.clone(); centerHole(2 + 2 * pc) = Double.NaN
    assert(TileMath.hornSlope(centerHole, 3, 3, 1)(1 + 1 * 3).isNaN)
  }

  test("hornHillshade: flat plane lights at sin45, away-facing slope clamps to 0") {
    val pc = 5
    // flat plane: gradient 0 -> shade = Sin45 exactly (denominator 1)
    val flat = Array.fill(pc * pc)(7.0)
    val s1 = TileMath.hornHillshade(flat, 3, 3, 1)
    assert(s1.forall(_ == TileMath.Sin45))
    // ramp rising toward the light with gradient (-10, 0): numerator
    // Sin45 - 5 < 0 -> clamped to 0 (self-shadowed face)
    val away = Array.tabulate(pc * pc)(i => -10.0 * (i % pc))
    assert(TileMath.hornHillshade(away, 3, 3, 1).forall(_ == 0.0))
    // gradient (3,4): shade = (Sin45 + 3.5) / sqrt(26); NoData on holes
    val ramp = Array.tabulate(pc * pc)(i => 3.0 * (i % pc) + 4.0 * (i / pc))
    val s3 = TileMath.hornHillshade(ramp, 3, 3, 1)
    assert(s3.forall(_ == (TileMath.Sin45 + 0.5 * 3 + 0.5 * 4) / math.sqrt(1 + 9.0 + 16.0)))
    val holed = ramp.clone(); holed(0) = Double.NaN
    assert(TileMath.hornHillshade(holed, 3, 3, 1)(0).isNaN)
  }

  test("d8FlowDir: ramp drains NW, flat is a pit, cardinal beats weighted diagonal") {
    val pc = 5
    // v = 3x + 4y rises toward +x+y -> steepest descent is NW (code 5):
    // drops are -(3dx+4dy)*w; NW = 7*Sin45 ~ 4.95 beats N=4 and W=3
    val ramp = Array.tabulate(pc * pc)(i => 3.0 * (i % pc) + 4.0 * (i / pc))
    assert(TileMath.d8FlowDir(ramp, 3, 3, 1).forall(_ == 5.0))
    // flat tile: no positive drop anywhere -> -1 (pit/flat)
    assert(TileMath.d8FlowDir(Array.fill(pc * pc)(2.0), 3, 3, 1).forall(_ == -1.0))
    // v = x: drop E? no (uphill): descent W (code 4) with drop 1; the
    // SW/NW diagonals drop 1*Sin45 < 1 -> cardinal wins
    val rx = Array.tabulate(pc * pc)(i => (i % pc).toDouble)
    assert(TileMath.d8FlowDir(rx, 3, 3, 1).forall(_ == 4.0))
    // tie between S and E (v = -min(x, y) style): craft center with two
    // equal drops -> lowest code wins. v decreasing equally toward E and
    // S: v = -(x + y) has all of E,SE,S positive: SE = 2*Sin45 ~ 1.41
    // wins over E=S=1; codes: SE=1
    val rd = Array.tabulate(pc * pc)(i => -((i % pc) + (i / pc)).toDouble)
    assert(TileMath.d8FlowDir(rd, 3, 3, 1).forall(_ == 1.0))
    // NoData neighbor -> NaN
    val holed = ramp.clone(); holed(0) = Double.NaN
    assert(TileMath.d8FlowDir(holed, 3, 3, 1)(0).isNaN)
  }

  test("zorder interleave/deinterleave bijection (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (0 until 10000).foreach { _ =>
      val c = rnd.nextInt() & 0xFFFF; val r = rnd.nextInt() & 0xFFFF
      assert(ZOrder.deinterleave(ZOrder.interleave(c, r)) == ((c, r)))
    }
  }

  test("terrainIndex: TPI/TRI/Laplacian goldens on linear and bowl surfaces") {
    val pc = 5
    // linear ramp v = 3x + 4y: TPI and Laplacian vanish (plane = its
    // neighbor mean, second derivative 0); TRI is the fixed rms of the
    // 8 directional drops: diffs {±3, ±4, ±7, ±1} -> sum sq = 2*(9+16+49+1)
    val ramp = Array.tabulate(pc * pc)(i => 3.0 * (i % pc) + 4.0 * (i / pc))
    assert(TileMath.terrainIndex(ramp, 3, 3, 1, 0).forall(_ == 0.0))
    assert(TileMath.terrainIndex(ramp, 3, 3, 1, 1).forall(_ == math.sqrt(150.0)))
    assert(TileMath.terrainIndex(ramp, 3, 3, 1, 2).forall(_ == 0.0))
    // paraboloid bowl v = x² + y² centered on the middle cell (2,2):
    // Laplacian of x²+y² is 4 discretely (exact for quadratics)
    val bowl = Array.tabulate(pc * pc)(i => {
      val x = i % pc - 2.0; val y = i / pc - 2.0; x * x + y * y
    })
    assert(TileMath.terrainIndex(bowl, 3, 3, 1, 2).forall(_ == 4.0))
    // center cell of the bowl: neighbors are the ring {1,2,1,2,1,2,1,2}
    // -> mean 12/8, TPI = 0 - 1.5
    assert(TileMath.terrainIndex(bowl, 3, 3, 1, 0)(1 + 1 * 3) == -1.5)
    // NoData rule: hole kills exactly the windows that read it
    val holed = ramp.clone(); holed(0) = Double.NaN
    assert(TileMath.terrainIndex(holed, 3, 3, 1, 1)(0).isNaN)
    assert(TileMath.terrainIndex(holed, 3, 3, 1, 1).count(!_.isNaN) == 8)
  }

  test("focalMode: majority with smallest-class ties, all-9 data rule") {
    val pc = 5
    // constant class plane -> mode is that class everywhere
    val const = Array.fill(pc * pc)(3.0)
    assert(TileMath.focalMode(const, 3, 3, 1).forall(_ == 3.0))
    // checkerboard of 1/2: every 3x3 window holds 5 of one and 4 of the
    // other; the majority follows the center's color
    val checker = Array.tabulate(pc * pc)(i => ((i % pc + i / pc) % 2 + 1).toDouble)
    val out = TileMath.focalMode(checker, 3, 3, 1)
    for (y <- 0 until 3; x <- 0 until 3)
      assert(out(x + y * 3) == checker((x + 1) + (y + 1) * pc))
    // exact tie: cell (0,0)'s window is the padded top-left 3x3 block —
    // laid out so it holds {1:4, 2:4, 9:1}; tie on count 4 -> smallest
    // class 1 wins
    val tie = Array(
      1.0, 1.0, 2.0, 0.0, 0.0,
      1.0, 2.0, 2.0, 0.0, 0.0,
      1.0, 2.0, 9.0, 0.0, 0.0,
      0.0, 0.0, 0.0, 0.0, 0.0,
      0.0, 0.0, 0.0, 0.0, 0.0)
    assert(TileMath.focalMode(tie, 3, 3, 1)(0) == 1.0)
    // any NaN in the window -> NoData
    val holed = const.clone(); holed(0) = Double.NaN
    assert(TileMath.focalMode(holed, 3, 3, 1)(0).isNaN)
    assert(TileMath.focalMode(holed, 3, 3, 1).count(!_.isNaN) == 8)
  }

  test("zorder orders locally: adjacent cells near in key space") {
    assert(ZOrder.interleave(0, 0) == 0L)
    assert(ZOrder.interleave(1, 0) == 1L)
    assert(ZOrder.interleave(0, 1) == 2L)
    assert(ZOrder.interleave(1, 1) == 3L)
    assert(ZOrder.interleave(2, 0) == 4L)
  }

  test("rookMoments counts each ordered in-tile pair once, skips NoData") {
    // 2x2 tile, no halo data (pad=1 ring of NaN), cell (1,1) is NoData:
    //   1 2
    //   3 .
    // data rook pairs (ordered): (1,2),(2,1),(1,3),(3,1) -> W=4,
    // pxy = 1*2 + 2*1 + 1*3 + 3*1 = 10, xw = 1+2+1+3 = 7
    val pc = 4 // cols + 2*pad
    val padded = Array.fill(pc * pc)(Double.NaN)
    padded(1 + 1 * pc) = 1.0; padded(2 + 1 * pc) = 2.0
    padded(1 + 2 * pc) = 3.0
    val Array(pxy, xw, w) = rookMoments(padded, 2, 2, 1)
    assert((pxy, xw, w) == ((10L, 7L, 4L)))
  }

  test("rookMoments halo pairs: each side counts its own direction") {
    // two horizontally adjacent 1x1 tiles with values 5 | 7: tile A sees
    // neighbor 7 in its east halo, tile B sees 5 in its west halo —
    // summed over tiles the ordered-pair count is 2 and pxy = 2*35,
    // exactly what a single global grid would produce.
    val pc = 3
    def tile(center: Double, east: Option[Double], west: Option[Double]) = {
      val a = Array.fill(pc * pc)(Double.NaN)
      a(1 + 1 * pc) = center
      east.foreach(v => a(2 + 1 * pc) = v)
      west.foreach(v => a(0 + 1 * pc) = v)
      a
    }
    val Array(pa, xa, wa) = rookMoments(tile(5.0, Some(7.0), None), 1, 1, 1)
    val Array(pb, xb, wb) = rookMoments(tile(7.0, None, Some(5.0)), 1, 1, 1)
    assert(pa + pb == 70L && xa + xb == 12L && wa + wb == 2L)
  }
}
