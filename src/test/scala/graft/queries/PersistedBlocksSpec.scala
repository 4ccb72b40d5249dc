package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** r12 unpersist discipline (r11 verdict what's-wrong #3): eager
  * localCheckpoint blocks used to accumulate for the session lifetime —
  * in a 296-query bench session the pinned MEMORY_AND_DISK blocks crowd
  * the storage fraction and starve execution memory for the late
  * alphabet. These tests bound the RESIDENT set: after a checkpointing
  * query materializes, only the blocks its returned plan still
  * references may remain (node-sized rank tables, the collapse/group
  * tables) — every superseded intermediate must have been freed at the
  * seam where its last eager consumer ran.
  *
  * The assertions are DELTAS between two runs of the same query: the
  * second run's residual is the steady-state leak per invocation, which
  * is what accumulates over a bench sweep. */
class PersistedBlocksSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Residual persistent-RDD growth of one extra query invocation. */
  private def residual(name: String): Int = {
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sf).count() // warm: fronts built, first-run residue paid
    val before = spark.sparkContext.getPersistentRDDs.keySet
    fn(spark, sf).count()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    (after -- before).size
  }

  test("a_hits frees every superseded round's checkpoint (edge set + rounds 1)") {
    // resident: the last round's araw/hraw node-sized tables (the
    // returned plan reads them); the edge set and round-1 tables must
    // be gone. Pre-r12 this leaked 5 blocks per run, one edge-sized.
    assert(residual("a_hits") <= 2)
  }

  test("t_prefix_join frees the shingle table (resident: groups + repSh)") {
    assert(residual("t_prefix_join") <= 2)
  }

  test("the local-path iterative gates leave zero persistent blocks") {
    for (name <- Seq("t_sssp", "t_bfs_dist", "t_kcore", "r_flow_accum", "r_basin_label"))
      assert(residual(name) == 0, s"$name leaked persistent RDDs")
  }

  test("connectedComponents (local path) leaves zero persistent blocks") {
    import spark.implicits._
    val edges = (1L until 50L).map(i => (i, i + 1)).toDF("a", "b")
    graft.text.TextOps.connectedComponents(edges).count()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    graft.text.TextOps.connectedComponents(edges).count()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty)
  }
}
