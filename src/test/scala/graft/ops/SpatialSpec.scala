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
}
