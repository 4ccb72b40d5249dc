package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

class ConnectedComponentsSpec extends AnyFunSuite {
  import spark.implicits._

  test("min-label propagation: chains, separate components, determinism") {
    // components: {1,2,3,4} (a chain — forces >1 round), {10,11}, {20,21,22} (triangle)
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("a", "b")
    val got = TextOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(got == want)
    // deterministic across runs (min labels, not iteration order)
    val again = TextOps.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(again == want)
  }

  test("agrees with a driver-side union-find on the real LSH candidate graph") {
    val pairs = graft.queries.TextQueries
      .minhashLsh(spark, "/root/testdata/sf0.001").select($"a", $"b")
    val edges = pairs.as[(Long, Long)].collect()
    assert(edges.nonEmpty)
    // classic union-find with path compression — an engine-independent
    // third opinion next to the recursive-CTE oracle
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    val got = TextOps.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("long chain converges within the iteration budget (pointer jumping, not one hop per round)") {
    // a 200-path has diameter 199: plain neighbor-min needs ~199 rounds;
    // the pointer-jump step makes it O(log n) — well inside maxIter 25
    val n = 200L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val got = TextOps.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got.size == n.toInt && got.values.forall(_ == 1L))
  }
}
