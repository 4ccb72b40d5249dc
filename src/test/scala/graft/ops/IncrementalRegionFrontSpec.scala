package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.queries.Fixtures

/** Append-only IVM of the region-label front: folding a tile batch
  * into an existing front (RegionIncrement.appendTiles) must equal a
  * full rebuild bit-for-bit — CC labels are stable under local relabel
  * + boundary merge, and all values are exact integers, so the compare
  * is exact set equality, not tolerance.
  *
  * The batch is chosen to exercise every interesting path at once:
  * tile (0,0) holds the GLOBALLY SMALLEST cell ids, so merged regions
  * reaching into the old front must RELABEL old rows (the remap
  * direction), while interior batch tiles bridge old regions ACROSS
  * the batch (old-label↔old-label merges through new cells only).
  */
class IncrementalRegionFrontSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"
  private val TS = Fixtures.TS
  private val W = 4L * TS

  /** All mask cells at tile granularity: the r_region_label mask. */
  private def maskCells: DataFrame =
    Raster.pixelize(Fixtures.tilesA(spark, dir), TS)
      .where(col("v").cast("long") % 3 === 0)
      .select(col("tile_col"), col("tile_row"), col("px"), col("py"))

  private def toGlobal(cells: DataFrame): DataFrame =
    cells.select(
      (col("tile_col").cast("long") * TS + col("px")).as("gx"),
      (col("tile_row").cast("long") * TS + col("py")).as("gy"))

  private def rebuildFront(cells: DataFrame): DataFrame =
    RegionIncrement.labelCells(toGlobal(cells), W)
      .select(expr(s"gx div $TS").cast("int").as("tile_col"),
        expr(s"gy div $TS").cast("int").as("tile_row"),
        (col("gx") % TS).cast("int").as("px"),
        (col("gy") % TS).cast("int").as("py"),
        col("label"))

  private def asSet(df: DataFrame): Set[(Int, Int, Int, Int, Long)] =
    df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toSet

  private def isBatch(keys: Set[(Int, Int)]) =
    keys.map { case (c, r) => (col("tile_col") === c && col("tile_row") === r) }
      .reduce(_ || _)

  test("append == rebuild bit-for-bit on a tile batch (merges + relabels)") {
    // batch spans a corner (forces old-front relabels: tile (0,0) owns
    // the smallest ids) and an interior band (forces old↔old merges
    // through batch cells)
    val batchKeys = Set((0, 0), (2, 1), (1, 2), (3, 3))
    val all = maskCells
    val base = all.where(!isBatch(batchKeys))
    val batch = all.where(isBatch(batchKeys))

    val oldFront = rebuildFront(base)
    val incr = RegionIncrement.appendTiles(oldFront, batch, TS, W)
    val rebuilt = rebuildFront(all)

    val incrSet = asSet(incr)
    val rebuiltSet = asSet(rebuilt)
    assert(incrSet.size === rebuiltSet.size)
    assert(incrSet === rebuiltSet)

    // the scenario really exercised the IVM paths: some old row was
    // relabeled and some batch cell joined an existing region
    val oldSet = asSet(oldFront)
    val oldCoords = oldSet.map(t => (t._1, t._2, t._3, t._4))
    val relabeled = rebuiltSet.filter(t => oldCoords(( t._1, t._2, t._3, t._4))) -- oldSet
    assert(relabeled.nonEmpty, "batch produced no old-front relabel — pick a batch that merges regions")
  }

  test("single-tile append and empty batch are exact") {
    val all = maskCells
    val one = Set((3, 0))
    val base = all.where(!isBatch(one))
    val oldFront = rebuildFront(base)
    val incr = RegionIncrement.appendTiles(oldFront, all.where(isBatch(one)), TS, W)
    assert(asSet(incr) === asSet(rebuildFront(all)))

    val empty = RegionIncrement.appendTiles(oldFront, all.limit(0), TS, W)
    assert(asSet(empty) === asSet(oldFront))
  }

  test("replacing an existing tile key is refused (deletion can split regions)") {
    val all = maskCells
    val front = rebuildFront(all)
    val ex = intercept[IllegalArgumentException] {
      RegionIncrement.appendTiles(front, all.where(isBatch(Set((1, 1)))), TS, W)
    }
    assert(ex.getMessage.contains("append-only"))
  }

  test("K2 upsert delivery: batch arriving through LayerStore.merge rebuilds to the same front") {
    // the IVM's real trigger: new tiles land in the catalog via the K2
    // cell-wise incoming-wins merge; the maintained front must equal a
    // rebuild over what the catalog now serves
    val store = new graft.catalog.LayerStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ivm_cat").toString)
    val batchKeys = Set((0, 1), (2, 3))
    val tiles = Fixtures.tilesA(spark, dir)
    val baseTiles = tiles.where(!isBatch(batchKeys))
    val batchTiles = tiles.where(isBatch(batchKeys))
    store.write(baseTiles, "ivm", 0)
    val oldFront = rebuildFront(
      Raster.pixelize(store.read("ivm", 0), TS)
        .where(col("v").cast("long") % 3 === 0)
        .select(col("tile_col"), col("tile_row"), col("px"), col("py")))

    store.merge(batchTiles, "ivm", 0) // K2 upsert (append: disjoint keys)

    val served = Raster.pixelize(store.read("ivm", 0), TS)
      .where(col("v").cast("long") % 3 === 0)
      .select(col("tile_col"), col("tile_row"), col("px"), col("py"))
    val batchCells = served.where(isBatch(batchKeys))
    val incr = RegionIncrement.appendTiles(oldFront, batchCells, TS, W)
    assert(asSet(incr) === asSet(rebuildFront(served)))
  }
}
