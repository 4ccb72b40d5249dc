package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** Append-only IVM of the DBSCAN core-label front: folding point
  * batches into the persisted (position, cluster) assignment
  * (DbscanIncrement.appendPoints) must equal the batch gate's full
  * clustering over everything ingested so far — at EVERY batch
  * boundary, bit-for-bit. Exercises the monotone transitions the
  * incremental path must get right: nn counts crossing the core
  * threshold batches later, newly-core positions bridging existing
  * clusters (label merges / remaps), and brand-new positions whose
  * disks contain only old neighbors. */
class IncrementalDbscanFrontSpec extends AnyFunSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** The r_dbscan_core lattice (gate fixture): pid = c_custkey,
    * px = pid % 163, py = pid % 157. */
  private def pts(customers: DataFrame): DataFrame =
    customers.select(
      col("c_custkey").as("pid"),
      (col("c_custkey") % 163).cast("long").as("px"),
      (col("c_custkey") % 157).cast("long").as("py"))

  test("append == rebuild at every batch boundary (core labels)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dbscan_ivm").toString
    val st = DbscanIncrement.State(s"$tmp/state")
    val customers = spark.read.parquet(s"$dir/customer.parquet")
    val ids = customers.select($"c_custkey".cast("long")).as[Long].collect().sorted
    assert(ids.length >= 9)
    val third = ids.length / 3
    val cuts = Seq(ids(third - 1), ids(2 * third - 1), ids.last)

    var lo = Long.MinValue
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val slice = customers.where($"c_custkey" > lo && $"c_custkey" <= hi)
      DbscanIncrement.appendPoints(pts(slice), st)
      lo = hi

      // batch twin over exactly the ingested prefix: the gate reads a
      // customer.parquet, so stage the prefix as its own corpus dir
      val prefixDir = s"$tmp/prefix_$i"
      customers.where($"c_custkey" <= hi)
        .write.mode("overwrite").parquet(s"$prefixDir/customer.parquet")
      val expected = graft.SparkEntry.queries("r_dbscan_core")(spark, prefixDir)
        .as[(Long, Long)].collect().sorted.toVector
      val got = DbscanIncrement.corePoints(
          pts(customers.where($"c_custkey" <= hi)), spark, st)
        .as[(Long, Long)].collect().sorted.toVector
      assert(got == expected,
        s"boundary $i: incremental cores (${got.length}) != gate (${expected.length}); " +
          s"first diff: ${expected.zipAll(got, null, null).find(p => p._1 != p._2)}")
    }
  }

  test("a later batch merges two existing clusters through a newly-core bridge") {
    // hand-built lattice: two 4-point blobs 6 apart (clusters A and B,
    // eps² = 8 so they cannot touch), then a bridge position between
    // them arrives in batch 2 with enough coincident points to be core
    // — A, B and the bridge must collapse into ONE cluster labeled by
    // A's minimum pid, relabeling B's rows (the remap path).
    val tmp = java.nio.file.Files.createTempDirectory("graft_dbscan_bridge").toString
    val st = DbscanIncrement.State(s"$tmp/state")
    def df(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("pid", "px", "py")
    // blob A at x=0..1, blob B at x=6..7 (min gap A↔bridge = 3² = 9 > 8?
    // bridge at x=3: dist² from (1,y)=(4) ≤ 8 ✓, from (6,y)=(9) > 8 —
    // so bridge↔B needs (7,y)? no: put bridge at x=4: A(1)→9 too far.
    // Use A at 0..2, B at 6..8, bridge at 4: bridge↔A(2)=4 ✓,
    // bridge↔B(6)=4 ✓, A(2)↔B(6)=16 ✗ — disjoint until the bridge.
    val blobA = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L), (4L, 0L, 1L))
    val blobB = Seq((10L, 6L, 0L), (11L, 7L, 0L), (12L, 8L, 0L), (13L, 6L, 1L))
    DbscanIncrement.appendPoints(df(blobA ++ blobB), st)
    val lab1 = DbscanIncrement.corePoints(df(blobA ++ blobB), spark, st)
      .as[(Long, Long)].collect().toMap
    assert(lab1.nonEmpty && lab1.values.toSet.size == 2, s"expected two clusters, got $lab1")

    val bridge = Seq((20L, 4L, 0L), (21L, 4L, 0L), (22L, 4L, 0L), (23L, 4L, 0L))
    DbscanIncrement.appendPoints(df(bridge), st)
    val all = blobA ++ blobB ++ bridge
    val lab2 = DbscanIncrement.corePoints(df(all), spark, st)
      .as[(Long, Long)].collect().toMap
    assert(lab2.values.toSet == Set(1L), s"expected one merged cluster labeled 1, got $lab2")
    assert(lab2.keySet.contains(20L), "the bridge position itself must be core")
  }
}
