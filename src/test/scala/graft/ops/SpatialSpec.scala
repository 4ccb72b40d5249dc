package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

class SpatialSpec extends AnyFunSuite {
  import spark.implicits._

  // concave L-shape: a 4x4 square with the top-right 3x3 bite removed
  val L = (Seq(0.0, 4.0, 4.0, 1.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0, 1.0, 4.0, 4.0))

  def inL(px: Double, py: Double): Boolean = {
    val df = Seq((px, py)).toDF("px", "py")
      .select(Spatial.pointInRing(col("px"), col("py"),
        typedLit(L._1), typedLit(L._2)).as("in"))
    df.head.getBoolean(0)
  }

  test("even-odd ray cast handles a concave ring") {
    assert(inL(0.5, 3.5))   // the thin vertical arm
    assert(inL(3.5, 0.5))   // the thin horizontal arm
    assert(inL(0.5, 0.5))   // the corner block
    assert(!inL(2.5, 2.5))  // the notch: inside the bbox, outside the ring
    assert(!inL(4.5, 0.5))  // right of everything
    assert(!inL(0.5, 4.5))  // above the arm
  }

  test("gridJoin equals the brute-force cross join, concave shapes included") {
    val polys = Seq(
      (1L, L._1, L._2),                                                  // concave L at origin
      (2L, Seq(10.0, 13.0, 16.0, 13.0), Seq(13.0, 10.0, 13.0, 16.0)),    // diamond
      (3L, Seq(5.0, 9.0, 5.0), Seq(5.0, 5.0, 9.0))                       // right triangle
    ).toDF("fid", "xs", "ys")
    // deterministic off-lattice points covering all three shapes + empty space
    val points = (0 until 400).map { i =>
      (i.toLong, (i % 20) + 0.3, (i / 20) + 0.7)
    }.toDF("pid", "px", "py")

    val grid = Spatial.gridJoin(points, polys, cell = 4.0)
      .select($"pid", $"fid").as[(Long, Long)].collect().toSet
    val brute = points.crossJoin(polys)
      .where(Spatial.pointInRing($"px", $"py", $"xs", $"ys"))
      .select($"pid", $"fid").as[(Long, Long)].collect().toSet
    assert(grid == brute)
    assert(brute.nonEmpty && brute.map(_._2) == Set(1L, 2L, 3L))
  }

  test("a polygon spanning many cells matches each point exactly once") {
    val wide = Seq((7L, Seq(0.0, 19.0, 19.0, 0.0), Seq(0.0, 0.0, 9.0, 9.0)))
      .toDF("fid", "xs", "ys")
    val points = Seq((1L, 10.3, 4.7), (2L, 0.5, 0.5), (3L, 25.0, 4.0))
      .toDF("pid", "px", "py")
    val rows = Spatial.gridJoin(points, wide, cell = 4.0)
      .groupBy($"pid").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 1L, 2L -> 1L)) // pid 3 outside; no duplicates
  }

  test("ringMeasures: shoelace goldens on CCW rectangle and L-shape") {
    def measures(xs: Seq[Long], ys: Seq[Long]): (Long, Long, Long, Long) = {
      val r = Seq((xs, ys)).toDF("xs", "ys")
        .select(Spatial.ringMeasures(col("xs"), col("ys")).as("m"))
        .select("m.area2", "m.perim_sq", "m.cx6", "m.cy6")
        .head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // CCW 4x2 rectangle at origin: area 8, edges 4,2,4,2 -> perim_sq 40,
    // centroid (2, 1) -> cx6 = 2*3*area2 = 96, cy6 = 1*3*16 = 48
    val (a2, p2, cx6, cy6) = measures(Seq(0L, 4L, 4L, 0L), Seq(0L, 0L, 2L, 2L))
    assert(a2 == 16L && p2 == 40L)
    assert(cx6.toDouble / (3.0 * a2) == 2.0 && cy6.toDouble / (3.0 * a2) == 1.0)
    // concave L (CCW): 4x4 square minus the 3x3 bite = area 7 -> area2 14
    val (la2, lp2, _, _) = measures(
      Seq(0L, 4L, 4L, 1L, 1L, 0L), Seq(0L, 0L, 1L, 1L, 4L, 4L))
    assert(la2 == 14L)
    // edges: 4,1,3,3,1,4 -> squares 16+1+9+9+1+16
    assert(lp2 == 52L)
    // CW ring flips the sign of area2 (orientation-signed)
    val (cw, _, _, _) = measures(Seq(0L, 0L, 4L, 4L), Seq(0L, 2L, 2L, 0L))
    assert(cw == -16L)
  }
}
