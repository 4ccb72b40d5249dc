package graft.core

/** Pure cell/tile math over row-major `Array[Double]` tiles.
  *
  * Zero Spark dependencies — unit-testable in isolation. NoData is
  * represented as `Double.NaN`, reproducing the reference's
  * `DoubleConstantNoDataCellType` semantics (GeoTrellis converts int
  * sentinel NODATA to double-NaN before arithmetic; reference:
  * NDVILayerExample.scala:68-69, NDVILayerWithCloudMaskExample.scala:55-60).
  *
  * Tiles are row-major: cell (x, y) lives at index `x + y * cols`
  * (reference: TilePixelingExample.scala:100-105, `arr(x + y*256)`).
  */
object TileMath {

  /** Reference tile size (Utils.scala:21). Query fixtures use smaller
    * grids; every function takes explicit cols/rows. */
  val DefaultTileSize = 256

  @inline def isData(v: Double): Boolean = !java.lang.Double.isNaN(v)

  /** Halo geometry: for a contributor tile at offset (dcol, drow) relative
    * to the target, the contributor-local [xlo, xhi) x [ylo, yhi) cell
    * range the target's pad-wide apron needs. (0,0) → the whole tile;
    * edges → a pad-wide strip; corners → a pad x pad square. Shared by
    * the margin slicer (ship side) and PadAssemble (assembly side). */
  def haloBounds(dcol: Int, drow: Int, cols: Int, rows: Int, pad: Int): (Int, Int, Int, Int) = {
    val xlo = math.max(0, -pad - dcol * cols)
    val xhi = math.min(cols, cols + pad - dcol * cols)
    val ylo = math.max(0, -pad - drow * rows)
    val yhi = math.min(rows, rows + pad - drow * rows)
    (xlo, xhi, ylo, yhi)
  }

  /** Row-major copy of the sub-rectangle [xlo, xhi) x [ylo, yhi). */
  def sliceRect(cells: Array[Double], cols: Int, xlo: Int, xhi: Int, ylo: Int, yhi: Int): Array[Double] = {
    val w = xhi - xlo
    val out = new Array[Double]((yhi - ylo) * w)
    var y = ylo
    while (y < yhi) {
      System.arraycopy(cells, xlo + y * cols, out, (y - ylo) * w, w)
      y += 1
    }
    out
  }

  def empty(cols: Int, rows: Int): Array[Double] = {
    val a = new Array[Double](cols * rows)
    java.util.Arrays.fill(a, Double.NaN)
    a
  }

  /** Cell-wise binary combine with NoData propagation: result is NaN
    * unless both inputs are data (reference `combineDouble`,
    * NDVILayerExample.scala:70-75). */
  def combine(a: Array[Double], b: Array[Double])(f: (Double, Double) => Double): Array[Double] = {
    require(a.length == b.length, s"tile length mismatch ${a.length} != ${b.length}")
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) {
      out(i) = if (isData(a(i)) && isData(b(i))) f(a(i), b(i)) else Double.NaN
      i += 1
    }
    out
  }

  /** Cell-wise map skipping NoData (reference `mapDouble`). */
  def mapCells(a: Array[Double])(f: Double => Double): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = if (isData(a(i))) f(a(i)) else Double.NaN; i += 1 }
    out
  }

  /** Pairwise merge: incoming (b) wins where defined, else keep a —
    * GeoTrellis `merge` semantics used by layer upsert
    * (api/package.scala:345, RasterizeFeaturesRDD.scala:62-64). */
  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    require(a.length == b.length)
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = if (isData(b(i))) b(i) else a(i); i += 1 }
    out
  }

  /** NDVI: (nir - red) / (nir + red), NaN-propagating
    * (NDVILayerExample.scala:70-75). */
  def ndvi(nir: Double, red: Double): Double =
    if (isData(nir) && isData(red) && (nir + red) != 0.0) (nir - red) / (nir + red)
    else Double.NaN

  /** 2x downsample by 2x2 block mean over data cells (pyramid build,
    * GeotiffToPyramid.scala:58-69). Input tile cols x rows, output
    * (cols/2) x (rows/2). */
  def downsample2(a: Array[Double], cols: Int, rows: Int): Array[Double] = {
    val oc = cols / 2; val or = rows / 2
    val out = new Array[Double](oc * or)
    var y = 0
    while (y < or) {
      var x = 0
      while (x < oc) {
        var sum = 0.0; var n = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val v = a((2 * x + dx) + (2 * y + dy) * cols)
            if (isData(v)) { sum += v; n += 1 }
            dx += 1
          }
          dy += 1
        }
        out(x + y * oc) = if (n > 0) sum / n else Double.NaN
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor upsample of one tile into the (cx, cy) child of a
    * 2^dz x 2^dz split (zoom resample up, ZoomResampleTEST.scala:65-152,
    * NearestNeighbor default Utils.scala:23). Child has same cols/rows;
    * child cell (x,y) reads parent cell ((cx*cols + x)/f, (cy*rows + y)/f)
    * with f = 2^dz. */
  def upsampleChildNN(a: Array[Double], cols: Int, rows: Int, cx: Int, cy: Int, dz: Int): Array[Double] = {
    val f = 1 << dz
    val out = new Array[Double](cols * rows)
    var y = 0
    while (y < rows) {
      val sy = (cy * rows + y) / f
      var x = 0
      while (x < cols) {
        val sx = (cx * cols + x) / f
        out(x + y * cols) = a(sx + sy * cols)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Interpolating twin of [[upsampleChildNN]] (R7 with a selectable
    * kernel, LayerRDDZoomResampleMethods.scala:28-85 takes the resample
    * method): child cell centers map to fractional parent coordinates
    * (gx + 0.5) / 2^dz and sample bilinearly or cubically. Cells whose
    * 2x2 (or 4x4) support falls outside THIS parent tile renormalize
    * over the in-tile neighbors ([[sampleBilinear]]) — zoom upsampling
    * is per-tile local, like the reference's. */
  def upsampleChildInterp(a: Array[Double], cols: Int, rows: Int,
                          cx: Int, cy: Int, dz: Int, cubic: Boolean): Array[Double] = {
    val f = 1 << dz
    val out = new Array[Double](cols * rows)
    var y = 0
    while (y < rows) {
      val fy = (cy.toDouble * rows + y + 0.5) / f
      var x = 0
      while (x < cols) {
        val fx = (cx.toDouble * cols + x + 0.5) / f
        out(x + y * cols) =
          if (cubic) sampleCubic(a, cols, rows, fx, fy)
          else sampleBilinear(a, cols, rows, fx, fy)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Bilinear sample of a tile at fractional cell coordinates (F3:
    * Bilinear selectable besides NearestNeighbor, Utils.scala:23,
    * GeotiffToPyramid.scala:43). (fx, fy) are in cell units relative to
    * this tile's origin; cell centers sit at k + 0.5. NaN neighbors
    * degrade gracefully to the weighted mean of the data neighbors. */
  def sampleBilinear(a: Array[Double], cols: Int, rows: Int, fx: Double, fy: Double): Double = {
    val x0 = math.floor(fx - 0.5).toInt
    val y0 = math.floor(fy - 0.5).toInt
    val wx = (fx - 0.5) - x0
    val wy = (fy - 0.5) - y0
    var num = 0.0; var den = 0.0
    var dy = 0
    while (dy < 2) {
      var dx = 0
      while (dx < 2) {
        val x = x0 + dx; val y = y0 + dy
        if (x >= 0 && x < cols && y >= 0 && y < rows) {
          val v = a(x + y * cols)
          if (isData(v)) {
            val w = (if (dx == 0) 1 - wx else wx) * (if (dy == 0) 1 - wy else wy)
            num += w * v; den += w
          }
        }
        dx += 1
      }
      dy += 1
    }
    if (den > 0) num / den else Double.NaN
  }

  /** Cubic-convolution sample (F3: the reference's third resample option,
    * Utils.scala:23) at fractional cell coordinates, cell centers at
    * k + 0.5. Keys (1981) kernel with a = -0.5 — the classic 4x4
    * interpolator GDAL/GeoTrellis use. Weights form a partition of unity
    * on a full neighborhood (identity at cell centers).
    *
    * Unlike [[sampleBilinear]] the kernel is SIGNED, so renormalizing
    * over a partial neighborhood is unsound: the remaining weights can
    * sum arbitrarily close to zero and amplify the result by orders of
    * magnitude instead of degrading gracefully. When any of the 16
    * neighbors is NoData or outside the tile, fall back to bilinear
    * (whose non-negative weights renormalize safely) — GDAL's practice
    * for cubic near nodata. Bilinear is also an identity at cell
    * centers, so edge cells on an aligned grid stay lossless. */
  def sampleCubic(a: Array[Double], cols: Int, rows: Int, fx: Double, fy: Double): Double = {
    val A = -0.5
    def h(x: Double): Double = {
      val ax = math.abs(x)
      if (ax <= 1) (A + 2) * ax * ax * ax - (A + 3) * ax * ax + 1
      else if (ax < 2) A * ax * ax * ax - 5 * A * ax * ax + 8 * A * ax - 4 * A
      else 0.0
    }
    val x0 = math.floor(fx - 0.5).toInt
    val y0 = math.floor(fy - 0.5).toInt
    val u = (fx - 0.5) - x0
    val w = (fy - 0.5) - y0
    var num = 0.0; var den = 0.0; var contrib = 0
    var dy = -1
    while (dy <= 2) {
      var dx = -1
      while (dx <= 2) {
        val x = x0 + dx; val y = y0 + dy
        if (x >= 0 && x < cols && y >= 0 && y < rows) {
          val v = a(x + y * cols)
          if (isData(v)) {
            val wt = h(dx - u) * h(dy - w)
            num += wt * v; den += wt; contrib += 1
          }
        }
        dx += 1
      }
      dy += 1
    }
    if (contrib == 16) num / den
    else sampleBilinear(a, cols, rows, fx, fy)
  }

  /** Focal mean over a square (2r+1)^2 or circular kernel on a padded
    * array. `padded` is (cols + 2*pad) x (rows + 2*pad) with halo margins
    * already attached (bufferTiles, ConvolveLayerExample.scala:69);
    * output is the cols x rows core. Mean over *data* cells in the
    * neighborhood; NaN if none. `circle` restricts to dx*dx+dy*dy <= r*r
    * (Kernel.circle, ConvolveLayerExample.scala:62-66). */
  def focalMean(padded: Array[Double], cols: Int, rows: Int, pad: Int, r: Int, circle: Boolean): Array[Double] = {
    val pc = cols + 2 * pad
    val out = new Array[Double](cols * rows)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        var sum = 0.0; var n = 0
        var dy = -r
        while (dy <= r) {
          var dx = -r
          while (dx <= r) {
            if (!circle || dx * dx + dy * dy <= r * r) {
              val v = padded((x + pad + dx) + (y + pad + dy) * pc)
              if (isData(v)) { sum += v; n += 1 }
            }
            dx += 1
          }
          dy += 1
        }
        out(x + y * cols) = if (n > 0) sum / n else Double.NaN
        x += 1
      }
      y += 1
    }
    out
  }

  /** Weighted focal sum (Getis-Ord numerator, SpatialGetisOrd.scala:69-79):
    * kernel weight 1.0 inside the circle. Returns (sum, count) packed as
    * two planes so G* standardization can use both. */
  def focalSumCount(padded: Array[Double], cols: Int, rows: Int, pad: Int, r: Int): (Array[Double], Array[Double]) = {
    val pc = cols + 2 * pad
    val sums = new Array[Double](cols * rows)
    val counts = new Array[Double](cols * rows)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        var sum = 0.0; var n = 0
        var dy = -r
        while (dy <= r) {
          var dx = -r
          while (dx <= r) {
            if (dx * dx + dy * dy <= r * r) {
              val v = padded((x + pad + dx) + (y + pad + dy) * pc)
              if (isData(v)) { sum += v; n += 1 }
            }
            dx += 1
          }
          dy += 1
        }
        sums(x + y * cols) = if (n > 0) sum else Double.NaN
        counts(x + y * cols) = n.toDouble
        x += 1
      }
      y += 1
    }
    (sums, counts)
  }

  /** Horn gradient-magnitude slope over a padded tile (pad >= 1): the
    * standard 3x3 terrain kernel (Horn 1981; the focal-op family the
    * reference reaches via GeoTrellis, ConvolveLayerExample.scala:62-73).
    *
    *   gx = ((tr + 2e + br) - (tl + 2w + bl)) / 8
    *   gy = ((bl + 2s + br) - (tl + 2n + tr)) / 8
    *   out = sqrt(gx^2 + gy^2)
    *
    * Defined only where the center and ALL 8 neighbors are data — a
    * gradient estimated from a partial window is biased, so edge/hole
    * cells become NoData (and drop at pixelize). With integral-valued
    * cells every weighted sum is exact in IEEE754, so the result is
    * bit-portable regardless of accumulation order. */
  /** Generic kernel convolution over a padded tile: out(x,y) =
    * Σ kernel(r)(c)·window(r,c), kernel row-major with r increasing
    * DOWNWARD (pixel y down) and c rightward, window side 2·pad+1.
    * Defined only where every window cell is data — a partial-window
    * convolution is biased (same rule as [[hornSlope]]); zero-weight
    * cells still require data. Accumulation order is fixed row-major,
    * and with integer weights over integral cells every partial sum is
    * IEEE-exact, so an orderless relational twin agrees bitwise. */
  def convolve(padded: Array[Double], cols: Int, rows: Int, pad: Int,
               kernel: Array[Double]): Array[Double] = {
    val pc = cols + 2 * pad
    val k = 2 * pad + 1
    val out = new Array[Double](cols * rows)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        var acc = 0.0
        var ok = true
        var dy = 0
        while (ok && dy < k) {
          var dx = 0
          while (ok && dx < k) {
            val v = padded((x + dx) + (y + dy) * pc)
            if (!isData(v)) ok = false else acc += kernel(dx + dy * k) * v
            dx += 1
          }
          dy += 1
        }
        out(x + y * cols) = if (ok) acc else Double.NaN
        x += 1
      }
      y += 1
    }
    out
  }

  def hornSlope(padded: Array[Double], cols: Int, rows: Int, pad: Int): Array[Double] = {
    val pc = cols + 2 * pad
    val out = new Array[Double](cols * rows)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        val cx = x + pad; val cy = y + pad
        val c = padded(cx + cy * pc)
        val tl = padded((cx - 1) + (cy - 1) * pc); val n = padded(cx + (cy - 1) * pc)
        val tr = padded((cx + 1) + (cy - 1) * pc)
        val w = padded((cx - 1) + cy * pc); val e = padded((cx + 1) + cy * pc)
        val bl = padded((cx - 1) + (cy + 1) * pc); val s = padded(cx + (cy + 1) * pc)
        val br = padded((cx + 1) + (cy + 1) * pc)
        out(x + y * cols) =
          if (isData(c) && isData(tl) && isData(n) && isData(tr) && isData(w)
            && isData(e) && isData(bl) && isData(s) && isData(br)) {
            val gx = ((tr + 2 * e + br) - (tl + 2 * w + bl)) / 8
            val gy = ((bl + 2 * s + br) - (tl + 2 * n + tr)) / 8
            math.sqrt(gx * gx + gy * gy)
          } else Double.NaN
        x += 1
      }
      y += 1
    }
    out
  }

  /** Lambertian hillshade over a padded tile: Horn gradient (see
    * [[hornSlope]]) then illumination by a fixed light vector
    * l = (-0.5, -0.5, sin 45°) — azimuth 315° (upper-left in pixel
    * coords, y down), altitude 45°. That azimuth/altitude pair makes
    * the horizontal components EXACTLY ±0.5 (cos 45° / √2 = 1/2), so
    * with the surface normal n = (-gx, -gy, 1) the whole formula is
    *
    *   shade = max(0, (sin45 + 0.5*gx + 0.5*gy) / sqrt(1 + gx² + gy²))
    *
    * — one literal, two exact halvings, IEEE sqrt and one division:
    * every step is deterministic and identically-ordered in the SQL
    * oracle twin, so the gate hash-matches bitwise (no trig at query
    * time; the only trig value is the compile-time literal). Same
    * all-8-neighbors data rule as [[hornSlope]]. */
  val Sin45: Double = 0.7071067811865476 // nearest double to sin(45°)
  def hornHillshade(padded: Array[Double], cols: Int, rows: Int, pad: Int): Array[Double] = {
    val pc = cols + 2 * pad
    val out = new Array[Double](cols * rows)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        val cx = x + pad; val cy = y + pad
        val c = padded(cx + cy * pc)
        val tl = padded((cx - 1) + (cy - 1) * pc); val n = padded(cx + (cy - 1) * pc)
        val tr = padded((cx + 1) + (cy - 1) * pc)
        val w = padded((cx - 1) + cy * pc); val e = padded((cx + 1) + cy * pc)
        val bl = padded((cx - 1) + (cy + 1) * pc); val s = padded(cx + (cy + 1) * pc)
        val br = padded((cx + 1) + (cy + 1) * pc)
        out(x + y * cols) =
          if (isData(c) && isData(tl) && isData(n) && isData(tr) && isData(w)
            && isData(e) && isData(bl) && isData(s) && isData(br)) {
            val gx = ((tr + 2 * e + br) - (tl + 2 * w + bl)) / 8
            val gy = ((bl + 2 * s + br) - (tl + 2 * n + tr)) / 8
            val lit = (Sin45 + 0.5 * gx + 0.5 * gy) / math.sqrt(1 + gx * gx + gy * gy)
            if (lit > 0) lit else 0.0
          } else Double.NaN
        x += 1
      }
      y += 1
    }
    out
  }

  /** One Horn gradient component over a padded tile (comp 0 = gx,
    * 1 = gy) — same window/NoData rule as [[hornSlope]]; both
    * components NaN at exactly the same cells, so callers may filter
    * on either. */
  def hornGradient(padded: Array[Double], cols: Int, rows: Int, pad: Int, comp: Int): Array[Double] = {
    val pc = cols + 2 * pad
    val out = new Array[Double](cols * rows)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        val cx = x + pad; val cy = y + pad
        val c = padded(cx + cy * pc)
        val tl = padded((cx - 1) + (cy - 1) * pc); val n = padded(cx + (cy - 1) * pc)
        val tr = padded((cx + 1) + (cy - 1) * pc)
        val w = padded((cx - 1) + cy * pc); val e = padded((cx + 1) + cy * pc)
        val bl = padded((cx - 1) + (cy + 1) * pc); val s = padded(cx + (cy + 1) * pc)
        val br = padded((cx + 1) + (cy + 1) * pc)
        out(x + y * cols) =
          if (isData(c) && isData(tl) && isData(n) && isData(tr) && isData(w)
            && isData(e) && isData(bl) && isData(s) && isData(br)) {
            if (comp == 0) ((tr + 2 * e + br) - (tl + 2 * w + bl)) / 8
            else ((bl + 2 * s + br) - (tl + 2 * n + tr)) / 8
          } else Double.NaN
        x += 1
      }
      y += 1
    }
    out
  }

  /** D8 flow direction over a padded tile: the hydrology primitive
    * (O'Callaghan & Mark 1984) — each cell drains toward the neighbor
    * with the steepest positive distance-weighted drop. Direction codes
    * by (dx, dy) with pixel y DOWN: 0=E(1,0) 1=SE(1,1) 2=S(0,1)
    * 3=SW(-1,1) 4=W(-1,0) 5=NW(-1,-1) 6=N(0,-1) 7=NE(1,-1); ties take
    * the LOWEST code (strict > while scanning in code order); cells
    * with no positive drop (pits/flats) get -1. Diagonal weight is the
    * 1/√2 literal [[Sin45]], so every drop is (exact integral diff) ×
    * (one literal) — bit-portable. Same all-8-neighbors data rule as
    * [[hornSlope]]. */
  private val D8dx = Array(1, 1, 0, -1, -1, -1, 0, 1)
  private val D8dy = Array(0, 1, 1, 1, 0, -1, -1, -1)
  def d8FlowDir(padded: Array[Double], cols: Int, rows: Int, pad: Int): Array[Double] = {
    val pc = cols + 2 * pad
    val out = new Array[Double](cols * rows)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        val cx = x + pad; val cy = y + pad
        val c = padded(cx + cy * pc)
        var allData = isData(c)
        var d = 0
        while (allData && d < 8) {
          if (!isData(padded((cx + D8dx(d)) + (cy + D8dy(d)) * pc))) allData = false
          d += 1
        }
        out(x + y * cols) =
          if (allData) {
            var best = 0.0; var bestDir = -1
            d = 0
            while (d < 8) {
              val nv = padded((cx + D8dx(d)) + (cy + D8dy(d)) * pc)
              val w = if (D8dx(d) == 0 || D8dy(d) == 0) 1.0 else Sin45
              val drop = (c - nv) * w
              if (drop > best) { best = drop; bestDir = d }
              d += 1
            }
            bestDir.toDouble
          } else Double.NaN
        x += 1
      }
      y += 1
    }
    out
  }

  /** Terrain index over a padded tile — the three classic local relief
    * measures off the SAME 3x3 window the Horn kernels read (so all of
    * them fuse onto one halo exchange):
    *
    *   comp 0  TPI (topographic position; Weiss 2001):
    *             c - (sum of 8 neighbors) / 8
    *   comp 1  TRI (terrain ruggedness; Riley et al. 1999):
    *             sqrt(sum over 8 neighbors of (c - n_i)^2)
    *   comp 2  Laplacian (4-neighbor discrete curvature):
    *             (n + s + e + w) - 4c
    *
    * With integral-valued cells every sum/difference/square is exact in
    * IEEE754 (order-free), TPI's /8 is a power-of-two scale, and TRI
    * ends in one correctly-rounded sqrt — all three are bit-portable.
    * Same all-8-neighbors data rule as [[hornSlope]]. */
  def terrainIndex(padded: Array[Double], cols: Int, rows: Int, pad: Int, comp: Int): Array[Double] = {
    val pc = cols + 2 * pad
    val out = new Array[Double](cols * rows)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        val cx = x + pad; val cy = y + pad
        val c = padded(cx + cy * pc)
        val tl = padded((cx - 1) + (cy - 1) * pc); val n = padded(cx + (cy - 1) * pc)
        val tr = padded((cx + 1) + (cy - 1) * pc)
        val w = padded((cx - 1) + cy * pc); val e = padded((cx + 1) + cy * pc)
        val bl = padded((cx - 1) + (cy + 1) * pc); val s = padded(cx + (cy + 1) * pc)
        val br = padded((cx + 1) + (cy + 1) * pc)
        out(x + y * cols) =
          if (isData(c) && isData(tl) && isData(n) && isData(tr) && isData(w)
            && isData(e) && isData(bl) && isData(s) && isData(br)) {
            if (comp == 0) c - (tl + n + tr + w + e + bl + s + br) / 8
            else if (comp == 1) {
              val d0 = c - tl; val d1 = c - n; val d2 = c - tr; val d3 = c - w
              val d4 = c - e; val d5 = c - bl; val d6 = c - s; val d7 = c - br
              math.sqrt(d0 * d0 + d1 * d1 + d2 * d2 + d3 * d3
                + d4 * d4 + d5 * d5 + d6 * d6 + d7 * d7)
            } else (n + s + e + w) - 4 * c
          } else Double.NaN
        x += 1
      }
      y += 1
    }
    out
  }

  /** Focal mode (majority filter) over a padded tile — the standard
    * post-classification smoothing pass for land-use class rasters:
    * each cell becomes the most frequent value in its 3x3 window
    * (center included), ties taking the SMALLEST value so the argmax is
    * total-ordered. Cell values are expected to be small non-negative
    * class codes (integral doubles). Defined only where all 9 window
    * cells are data (mode over a partial window is biased at holes,
    * same contract as [[hornSlope]]); pure integer compare/count, so
    * bit-portable. */
  def focalMode(padded: Array[Double], cols: Int, rows: Int, pad: Int): Array[Double] = {
    val pc = cols + 2 * pad
    val out = new Array[Double](cols * rows)
    val win = new Array[Long](9)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        val cx = x + pad; val cy = y + pad
        var ok = true
        var k = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val v = padded((cx + dx) + (cy + dy) * pc)
            if (isData(v)) { win(k) = v.toLong; k += 1 } else ok = false
            dx += 1
          }
          dy += 1
        }
        out(x + y * cols) =
          if (ok) {
            java.util.Arrays.sort(win)
            // one pass over the sorted window: longest run, first-wins on
            // ties = smallest value (sorted order)
            var best = win(0); var bestN = 1
            var cur = win(0); var curN = 1
            var i = 1
            while (i < 9) {
              if (win(i) == cur) curN += 1 else { cur = win(i); curN = 1 }
              if (curN > bestN) { best = cur; bestN = curN }
              i += 1
            }
            best.toDouble
          } else Double.NaN
        x += 1
      }
      y += 1
    }
    out
  }

  /** Burn a half-open axis-aligned rectangle [x0,x1)x[y0,y1) (in global
    * pixel coords) into a tile keyed (tileCol, tileRow); incoming wins
    * (rasterize merge, RasterizeFeaturesRDD.scala:55-64). Mutates `a`. */
  def burnRect(a: Array[Double], cols: Int, rows: Int, tileCol: Int, tileRow: Int,
               x0: Long, y0: Long, x1: Long, y1: Long, value: Double): Unit = {
    val gx0 = tileCol.toLong * cols; val gy0 = tileRow.toLong * rows
    val lx0 = math.max(0L, x0 - gx0).toInt; val lx1 = math.min(cols.toLong, x1 - gx0).toInt
    val ly0 = math.max(0L, y0 - gy0).toInt; val ly1 = math.min(rows.toLong, y1 - gy0).toInt
    var y = ly0
    while (y < ly1) {
      var x = lx0
      while (x < lx1) { a(x + y * cols) = value; x += 1 }
      y += 1
    }
  }

  /** Integer-exact inverse-distance-weighted gap fill: for each NoData
    * cell with at least one data neighbor in the 5×5 Chebyshev window
    * (center excluded), the IDW estimate Σ v/d² / Σ 1/d² multiplied
    * through by lcm(1,2,4,5,8)=40 — the window's only d² values — so
    * both accumulators are exact longs (w = 40/d² ∈ {40,20,10,8,5})
    * and the fill is ONE double division. Returns (filled, nSrc);
    * data cells and isolated holes yield NaN. Cell values must be
    * integral-valued doubles (the raster fixture contract). */
  def idwFill(padded: Array[Double], cols: Int, rows: Int, pad: Int): (Array[Double], Array[Double]) = {
    require(pad >= 2, "idwFill needs a pad-2 halo")
    val pc = cols + 2 * pad
    val out = new Array[Double](cols * rows)
    val ns = new Array[Double](cols * rows)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        val i = x + y * cols
        val c = padded((x + pad) + (y + pad) * pc)
        if (isData(c)) { out(i) = Double.NaN; ns(i) = 0.0 }
        else {
          var num = 0L; var den = 0L; var n = 0
          var dy = -2
          while (dy <= 2) {
            var dx = -2
            while (dx <= 2) {
              if (dx != 0 || dy != 0) {
                val v = padded((x + pad + dx) + (y + pad + dy) * pc)
                if (isData(v)) {
                  val w = 40L / (dx * dx + dy * dy)
                  num += w * v.toLong; den += w; n += 1
                }
              }
              dx += 1
            }
            dy += 1
          }
          out(i) = if (n > 0) num.toDouble / den.toDouble else Double.NaN
          ns(i) = n.toDouble
        }
        x += 1
      }
      y += 1
    }
    (out, ns)
  }

  /** Rook-adjacency pair moments for global spatial autocorrelation
    * (Moran's I): over every data cell i of the tile and each of its
    * four in-grid DATA rook neighbors j (halo cells included, so
    * cross-tile pairs are counted exactly once per direction),
    * accumulate Σ xi·xj, Σ xi and the ordered-pair count W. Cell
    * values are integral-valued doubles (the raster fixture contract),
    * so all three accumulators are exact longs. */
  def rookMoments(padded: Array[Double], cols: Int, rows: Int, pad: Int): Array[Long] = {
    val pc = cols + 2 * pad
    var pxy = 0L; var xw = 0L; var w = 0L
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        val c = padded((x + pad) + (y + pad) * pc)
        if (isData(c)) {
          val xi = c.toLong
          val base = (x + pad) + (y + pad) * pc
          var d = 0
          while (d < 4) {
            val off = d match {
              case 0 => 1; case 1 => -1; case 2 => pc; case 3 => -pc
            }
            val v = padded(base + off)
            if (isData(v)) { pxy += xi * v.toLong; xw += xi; w += 1 }
            d += 1
          }
        }
        x += 1
      }
      y += 1
    }
    Array(pxy, xw, w)
  }
}
