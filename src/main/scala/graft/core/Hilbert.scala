package graft.core

/** Hilbert curve index for space-time keys — the reference's storage
  * index for `SpaceTimeKey` layers (`HilbertKeyIndexMethod`,
  * api/package.scala:148-152). Better locality than Z-order (no long
  * jumps), used when sorting space-time layers before write.
  *
  * Classic bit-twiddle formulation (Hamilton's compact algorithm /
  * Wikipedia d2xy-xy2d): order-n curve over a 2^n x 2^n grid.
  */
object Hilbert {

  /** (x, y) -> distance along the order-n Hilbert curve. */
  def xy2d(n: Int, x0: Int, y0: Int): Long = {
    var rx = 0; var ry = 0
    var x = x0; var y = y0
    var d = 0L
    var s = (1 << n) / 2
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** distance -> (x, y) on the order-n Hilbert curve. */
  def d2xy(n: Int, d: Long): (Int, Int) = {
    var rx = 0; var ry = 0
    var t = d
    var x = 0; var y = 0
    var s = 1
    while (s < (1 << n)) {
      rx = (1 & (t / 2)).toInt
      ry = (1 & (t ^ rx)).toInt
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }
}
