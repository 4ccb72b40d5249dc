package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** The distributed per-tile Dijkstra + halo exchange must equal a
  * single global Dijkstra on every grid — including paths that snake
  * across many tile boundaries (the case a per-tile solver without
  * iteration would get wrong). */
class CostDistanceSpec extends AnyFunSuite {
  import spark.implicits._

  /** Global single-threaded reference Dijkstra (entry-cost semantics). */
  private def reference(cells: Map[(Long, Long), (Long, Boolean)], cap: Long): Map[(Long, Long), Long] = {
    val dist = mutable.HashMap[(Long, Long), Long]()
    val pq = mutable.PriorityQueue[(Long, (Long, Long))]()(Ordering.by(t => -t._1))
    cells.foreach { case (xy, (_, src)) => if (src) { dist(xy) = 0L; pq.enqueue((0L, xy)) } }
    while (pq.nonEmpty) {
      val (d, xy) = pq.dequeue()
      if (dist(xy) == d) {
        for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0) {
          val n = (xy._1 + dx, xy._2 + dy)
          cells.get(n).foreach { case (cost, _) =>
            val nd = d + cost
            if (nd <= cap && nd < dist.getOrElse(n, Long.MaxValue)) {
              dist(n) = nd
              pq.enqueue((nd, n))
            }
          }
        }
      }
    }
    dist.toMap
  }

  private def run(cells: Map[(Long, Long), (Long, Boolean)], ts: Int, cap: Long): Map[(Long, Long), Long] = {
    val df = cells.toSeq.map { case ((x, y), (c, s)) => (x, y, c, s) }
      .toDF("gx", "gy", "cost", "src")
    CostDistance.costDistance(df, ts, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("uniform cost, one source: chessboard distance across 4 tiles") {
    // 8x8 grid, ts=4 → 2x2 tiles; source at (0,0)
    val cells = (for (x <- 0L until 8L; y <- 0L until 8L)
      yield (x, y) -> (1L, x == 0 && y == 0)).toMap
    val got = run(cells, 4, 95)
    assert(got.size == 64)
    cells.keys.foreach { case (x, y) =>
      val expect = math.max(x, y) // chebyshev * cost 1
      assert(got((x, y)) == expect, s"($x,$y)")
    }
  }

  test("random costs and sources equal global Dijkstra; snaking corridor") {
    val rnd = new scala.util.Random(42)
    // 12x12, ts=4 → 3x3 tiles; ~8% sources, costs 1..5, 10% holes
    val cells = (for (x <- 0L until 12L; y <- 0L until 12L if rnd.nextDouble() > 0.1)
      yield (x, y) -> (1L + rnd.nextInt(5).toLong, rnd.nextDouble() < 0.08)).toMap
    val want = reference(cells, 60).filter(_._2 <= 60)
    assert(run(cells, 4, 60) == want)

    // corridor: a single serpentine path — the worst case for rounds —
    // row y=0 left→right, up column x=11, back along y=2, ... forces
    // relaxation to cross tile columns repeatedly
    val corridor = ((0L until 12L).map(x => (x, 0L)) ++
      Seq((11L, 1L)) ++ (0L until 12L).reverse.map(x => (x, 2L)) ++
      Seq((0L, 3L)) ++ (0L until 12L).map(x => (x, 4L))).distinct
    val cor = corridor.map(xy => xy -> (2L, xy == (0L, 0L))).toMap
    val wantCor = reference(cor, 500)
    assert(run(cor, 4, 500) == wantCor)
    // the far end is dozens of steps away — the fixpoint really took
    // multiple halo-exchange rounds to reach it
    assert(wantCor((11L, 4L)) >= 60L, s"far-end dist ${wantCor((11L, 4L))}")
  }

  test("cap drops far cells; regions without a source vanish") {
    val cells = (for (x <- 0L until 8L) yield (x, 0L) -> (10L, x == 0L)).toMap ++
      (for (x <- 0L until 4L) yield (x, 5L) -> (1L, false)).toMap // no source row
    val got = run(cells, 4, 35)
    // d(x) = 10x along the row; cap 35 keeps x <= 3
    assert(got == Map((0L, 0L) -> 0L, (1L, 0L) -> 10L, (2L, 0L) -> 20L, (3L, 0L) -> 30L))
  }
}
