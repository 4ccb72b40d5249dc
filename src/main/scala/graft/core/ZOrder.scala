package graft.core

/** Z-order (Morton) curve: bit-interleave of (col, row) into a Long.
  *
  * Replaces the reference's storage index (`ZCurveKeyIndexMethod` for
  * SpatialKey, api/package.scala:143): tiles sorted by this key before
  * parquet write get spatial locality, so point/range reads prune via
  * parquet row-group min/max stats.
  */
object ZOrder {

  /** Spread the low 32 bits of v so bit i lands at bit 2i. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleave: col bits at even positions, row bits at odd. */
  def interleave(col: Int, row: Int): Long =
    spread(col.toLong) | (spread(row.toLong) << 1)

  private def compact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
    x
  }

  /** Inverse of interleave. */
  def deinterleave(z: Long): (Int, Int) =
    (compact(z).toInt, compact(z >> 1).toInt)
}
