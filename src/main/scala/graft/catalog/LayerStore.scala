package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ZOrderKey.zorder

/** Parquet-backed tile-layer catalog — the engine's spine (SURVEY §1.3).
  *
  * Reference model: an HDFS directory catalog with a JSON attribute store
  * and SFC-indexed layer writer (api/package.scala:62-180). Here:
  *
  *  - one parquet dataset partitioned by (layer_name, zoom) → partition
  *    pruning replaces the attribute-store lookup + index range read;
  *  - rows sorted by zorder(tile_col, tile_row) within partitions before
  *    write (ZCurveKeyIndexMethod analog, api/package.scala:143) so
  *    parquet row-group min/max stats prune point/range reads;
  *  - per-(layer, zoom) metadata + zoom-0 histogram as a JSON sidecar
  *    `_attributes` table (Utils.scala:85-89 `histogramData`).
  */
class LayerStore(spark: SparkSession, val root: String) {

  private def layerPath(name: String, zoom: Int) =
    s"$root/tiles/layer_name=$name/zoom=$zoom"

  /** K1: delete-then-write with Z-curve ordering (api/package.scala:130-146). */
  def write(tiles: DataFrame, name: String, zoom: Int): Unit =
    writeTo(tiles, layerPath(name, zoom))

  private def writeTo(tiles: DataFrame, path: String): Unit =
    tiles
      .repartition(col("tile_col"), col("tile_row"))
      .sortWithinPartitions(zorder(col("tile_col").cast("int"), col("tile_row").cast("int")))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** K1 space-time variant: SpaceTimeKey layers sort by Hilbert distance
    * within each time bucket (HilbertKeyIndexMethod,
    * api/package.scala:148-152) and partition additionally by time. */
  def writeSpaceTime(tiles: DataFrame, name: String, zoom: Int): Unit =
    tiles
      .repartition(col("time"), col("tile_col"), col("tile_row"))
      .sortWithinPartitions(col("time"),
        graft.functions.HilbertKey.hilbert(col("tile_col").cast("int"), col("tile_row").cast("int")))
      .write.mode(SaveMode.Overwrite).partitionBy("time")
      .parquet(layerPath(name, zoom))

  def readSpaceTime(name: String, zoom: Int, time: Option[String] = None): DataFrame = {
    val df = spark.read.parquet(layerPath(name, zoom))
    time.fold(df)(t => df.where(col("time") === t))
  }

  /** S3: pruned read of one (layer, zoom). */
  def read(name: String, zoom: Int): DataFrame =
    spark.read.parquet(layerPath(name, zoom))

  /** S10: point lookup of a single tile — parquet predicate pushdown +
    * zorder-sorted row groups replace the reference's indexed
    * ValueReader (ServeLayerAsMap.scala:33,111). */
  def readTile(name: String, zoom: Int, tileCol: Int, tileRow: Int): DataFrame =
    read(name, zoom).where(col("tile_col") === tileCol && col("tile_row") === tileRow)

  /** K2: merge/upsert — read existing, cell-wise incoming-wins merge,
    * overwrite (api/package.scala:328-385).
    *
    * Durability: the merged output is fully written to a staging dir
    * *before* the live dir is touched, then swapped in by rename. The
    * old cache-then-overwrite approach could silently corrupt — Spark's
    * cache is not durable, and a partition evicted after the overwrite
    * deletes the source files forces a lineage recompute against the
    * destroyed input. With stage-then-swap the merge plan's source files
    * stay intact until the new data is durably on disk, so recompute is
    * always safe and a crash leaves either the old layer or the new one,
    * never a mix. */
  def merge(incoming: DataFrame, name: String, zoom: Int): Unit = {
    if (!exists(name, zoom)) { write(incoming, name, zoom); return }
    val merged = graft.ops.Raster.mergeLayers(read(name, zoom), incoming)
    val live = layerPath(name, zoom)
    val staging = s"$root/.staging/layer_name=$name/zoom=$zoom"
    writeTo(merged, staging) // live files untouched; lineage can still recompute
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val retired = Paths.get(staging + ".retired")
    rmTree(retired.toFile)
    Files.move(Paths.get(live), retired, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(staging), Paths.get(live), StandardCopyOption.ATOMIC_MOVE)
    rmTree(retired.toFile)
  }

  /** S9: catalog listing. */
  def exists(name: String, zoom: Int): Boolean =
    new java.io.File(layerPath(name, zoom)).exists()

  def zoomsOf(name: String): Seq[Int] = {
    val d = new java.io.File(s"$root/tiles/layer_name=$name")
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(_.isDirectory).map(_.getName.stripPrefix("zoom=").toInt).sorted.toSeq
  }

  def maxZoom(name: String): Option[Int] = zoomsOf(name).lastOption

  /** K3: delete one zoom or all zooms of a layer (api/package.scala:67-102). */
  def delete(name: String, zoom: Option[Int] = None): Unit = {
    val target = zoom match {
      case Some(z) => new java.io.File(layerPath(name, z))
      case None => new java.io.File(s"$root/tiles/layer_name=$name")
    }
    rmTree(target)
  }

  private def rmTree(f: java.io.File): Unit = if (f.exists()) {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete(): Unit
  }
}
