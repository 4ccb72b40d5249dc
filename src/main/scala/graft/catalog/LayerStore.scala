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

  /** K1: delete-then-write with Z-curve ordering (api/package.scala:130-146),
    * then the `_attributes.json` sidecar (metadata + exact binned
    * histogram — Utils.scala:85-89 persists `histogramData` so the tile
    * server never re-aggregates the layer). The sidecar lives INSIDE the
    * layer dir: underscore-prefixed files are invisible to Spark's
    * parquet scan, and the merge swap moves data + attributes atomically. */
  def write(tiles: DataFrame, name: String, zoom: Int,
            tileSize: Int = graft.core.TileMath.DefaultTileSize,
            crs: String = "EPSG:4326", binWidth: Double = 1.0,
            withAttributes: Boolean = true): Unit = {
    writeTo(tiles, layerPath(name, zoom))
    if (withAttributes) writeAttrs(layerPath(name, zoom), tileSize, crs, binWidth)
  }

  private def writeTo(tiles: DataFrame, path: String): Unit =
    tiles
      .repartition(col("tile_col"), col("tile_row"))
      .sortWithinPartitions(zorder(col("tile_col").cast("int"), col("tile_row").cast("int")))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Compute + persist the sidecar from the just-written parquet (reading
    * back prunes to exactly the needed columns; the input lineage might
    * be arbitrarily expensive to re-evaluate). Two bounded jobs: a
    * key-column scan for bounds, one pixel pass for the histogram. */
  /** Driver-side histogram rows are bounded by value-range / binWidth,
    * not layer size — but an adversarial range (e.g. raw timestamps at
    * binWidth 1) would still blow the driver. Cap the bin count; the
    * effective width widens to keep the sidecar O(MaxBins). */
  private val MaxBins = 65536

  private def writeAttrs(path: String, tileSize: Int, crs: String, binWidth: Double): Unit = {
    val tiles = spark.read.parquet(path)
    val schemaJson = tiles.schema.json // read() supplies it -> no footer-inference job
    val dataCells = filter(col("cells"), x => not(isnan(x)))
    val b = tiles.agg(
      min(col("tile_col")).as("c0"), max(col("tile_col")).as("c1"),
      min(col("tile_row")).as("r0"), max(col("tile_row")).as("r1"),
      count(lit(1)).as("n"),
      min(array_min(dataCells)).as("vmin"), max(array_max(dataCells)).as("vmax")).head()
    val effWidth =
      if (b.isNullAt(5) || b.isNullAt(6)) binWidth
      else math.max(binWidth, (b.getDouble(6) - b.getDouble(5)) / MaxBins)
    val hist = graft.ops.Raster.pixelize(tiles, tileSize)
      .groupBy(floor(col("v") / effWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect() // <= MaxBins + 1 rows by construction
    val attrs = LayerAttributes(
      cellType = "float64", crs = crs, tileCols = tileSize, tileRows = tileSize,
      minCol = if (b.isNullAt(0)) 0 else b.getInt(0),
      maxCol = if (b.isNullAt(1)) -1 else b.getInt(1),
      minRow = if (b.isNullAt(2)) 0 else b.getInt(2),
      maxRow = if (b.isNullAt(3)) -1 else b.getInt(3),
      nTiles = b.getLong(4),
      nCells = hist.map(_.getLong(1)).sum,
      minV = if (hist.isEmpty) Double.NaN else hist.map(_.getDouble(2)).min,
      maxV = if (hist.isEmpty) Double.NaN else hist.map(_.getDouble(3)).max,
      binWidth = effWidth,
      bins = hist.map(_.getLong(0)).toSeq.sorted,
      counts = hist.sortBy(_.getLong(0)).map(_.getLong(1)).toSeq,
      extent =
        if (b.isNullAt(0)) Seq.empty
        else Seq(b.getInt(0).toDouble * tileSize, b.getInt(2).toDouble * tileSize,
                 (b.getInt(1) + 1).toDouble * tileSize, (b.getInt(3) + 1).toDouble * tileSize),
      schemaJson = Some(schemaJson))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$path/_attributes.json"),
      LayerAttributes.toJson(attrs).getBytes("UTF-8")): Unit
  }

  /** S9: read the attribute sidecar (None for pre-sidecar layers). */
  def readAttributes(name: String, zoom: Int): Option[LayerAttributes] = {
    val f = java.nio.file.Paths.get(s"${layerPath(name, zoom)}/_attributes.json")
    if (java.nio.file.Files.exists(f))
      Some(LayerAttributes.fromJson(new String(java.nio.file.Files.readAllBytes(f), "UTF-8")))
    else None
  }

  /** K1 space-time variant: SpaceTimeKey layers sort by Hilbert distance
    * within each time bucket (HilbertKeyIndexMethod,
    * api/package.scala:148-152) and partition additionally by time. The
    * `_attributes` sidecar (histogram over all time slices + schema)
    * rides along like the spatial write. */
  def writeSpaceTime(tiles: DataFrame, name: String, zoom: Int,
                     tileSize: Int = graft.core.TileMath.DefaultTileSize,
                     crs: String = "EPSG:4326", binWidth: Double = 1.0,
                     withAttributes: Boolean = true): Unit = {
    tiles
      .repartition(col("time"), col("tile_col"), col("tile_row"))
      .sortWithinPartitions(col("time"),
        graft.functions.HilbertKey.hilbert(col("tile_col").cast("int"), col("tile_row").cast("int")))
      .write.mode(SaveMode.Overwrite).partitionBy("time")
      .parquet(layerPath(name, zoom))
    if (withAttributes) writeAttrs(layerPath(name, zoom), tileSize, crs, binWidth)
  }

  /** Time-pruned read: the `time` predicate prunes partition dirs; the
    * sidecar schema (which includes the time partition column) skips
    * footer inference like the spatial read. */
  def readSpaceTime(name: String, zoom: Int, time: Option[String] = None): DataFrame = {
    val schema = readAttributes(name, zoom).flatMap(_.schemaJson)
      .map(js => org.apache.spark.sql.types.DataType.fromJson(js)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    val df = schema.fold(spark.read)(s => spark.read.schema(s)).parquet(layerPath(name, zoom))
    time.fold(df)(t => df.where(col("time") === t))
  }

  /** S3: pruned read of one (layer, zoom). The sidecar's persisted schema
    * skips parquet footer inference (one fewer job per read — the
    * attribute store playing the reference's Metadata role,
    * api/package.scala:62-65). */
  def read(name: String, zoom: Int): DataFrame = {
    val schema = readAttributes(name, zoom).flatMap(_.schemaJson)
      .map(js => org.apache.spark.sql.types.DataType.fromJson(js)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    schema.fold(spark.read)(s => spark.read.schema(s)).parquet(layerPath(name, zoom))
  }

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
  def merge(incoming: DataFrame, name: String, zoom: Int,
            tileSize: Int = graft.core.TileMath.DefaultTileSize,
            crs: String = "EPSG:4326", binWidth: Double = 1.0,
            withAttributes: Boolean = true): Unit = withLayerLock(name, zoom) {
    if (!exists(name, zoom)) { write(incoming, name, zoom, tileSize, crs, binWidth, withAttributes) }
    else {
      val merged = graft.ops.Raster.mergeLayers(read(name, zoom), incoming)
      val live = layerPath(name, zoom)
      val staging = s"$root/.staging/layer_name=$name/zoom=$zoom"
      writeTo(merged, staging) // live files untouched; lineage can still recompute
      if (withAttributes) writeAttrs(staging, tileSize, crs, binWidth) // swapped in with the data
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val retired = Paths.get(staging + ".retired")
      rmTree(retired.toFile)
      Files.move(Paths.get(live), retired, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(staging), Paths.get(live), StandardCopyOption.ATOMIC_MOVE)
      rmTree(retired.toFile)
    }
  }

  /** Writer serialization for merge's read-modify-write: concurrent
    * upserts into one (layer, zoom) would each read the same base and
    * the last swap would silently drop the other's tiles. An atomically
    * created lock file (CREATE_NEW is atomic on POSIX and HDFS-style
    * stores expose the same create-if-absent primitive) serializes
    * writers; locks older than [[StaleLockMs]] are considered crashed
    * and broken. */
  private val StaleLockMs = 300000L
  private val LockWaitMs = 120000L

  private def withLayerLock[T](name: String, zoom: Int)(f: => T): T = {
    import java.nio.file.{Files, Paths, StandardOpenOption}
    val lock = Paths.get(s"$root/.locks/layer_name=$name-zoom=$zoom.lock")
    Files.createDirectories(lock.getParent)
    val deadline = System.currentTimeMillis + LockWaitMs
    var acquired = false
    while (!acquired) {
      try {
        Files.write(lock, ProcessHandle.current().pid().toString.getBytes("UTF-8"),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val age = try System.currentTimeMillis - Files.getLastModifiedTime(lock).toMillis
                    catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }
          if (age > StaleLockMs) Files.deleteIfExists(lock): Unit
          else if (System.currentTimeMillis > deadline)
            throw new IllegalStateException(s"timed out waiting for writer lock on ($name, $zoom)")
          else Thread.sleep(100)
      }
    }
    try f finally Files.deleteIfExists(lock)
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
