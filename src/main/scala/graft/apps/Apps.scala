package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.LayerStore
import graft.ops.{Export, Histograms, Raster}

/** The reference's job surface as thin drivers (SURVEY §7.1 step 7) —
  * same CLI arg shapes as the originals. Each reference `main(args)`
  * example job maps to one object here; the heavy lifting lives in
  * graft.ops / graft.catalog so these stay ~10 lines.
  *
  * Tile size follows the reference default 256 (Utils.scala:21) unless
  * overridden by GRAFT_TILE_SIZE (test fixtures use small grids).
  */
object Apps {
  def tileSize: Int = sys.env.getOrElse("GRAFT_TILE_SIZE", "256").toInt

  def session(app: String): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(app)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def readPixels(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("tile_col").cast("int"), col("tile_row").cast("int"),
        col("px").cast("int"), col("py").cast("int"), col("v").cast("double"))
}

/** Ingest (GeotiffTilingExample.scala:30-64 analog): raster pixels →
  * tiled layer in the catalog. args: pixelParquet catalogDir layerName zoom */
object IngestLayer {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("IngestLayer")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(input, catalog, layer, zoom) = args.take(4)
    val ts = Apps.tileSize
    val tiles = Raster.assemble(Apps.readPixels(spark, input), ts, ts)
    new LayerStore(spark, catalog).write(tiles, layer, zoom.toInt)
  }
}

/** NDVI (NDVILayerExample.scala:28-104 analog): join NIR+Red layers,
  * cell-wise NDVI, write + histogram stats.
  * args: catalogDir nirLayer redLayer outLayer zoom */
object NdviLayer {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("NdviLayer")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(catalog, nir, red, out, zoom) = args.take(5)
    val ts = Apps.tileSize
    val store = new LayerStore(spark, catalog)
    val ndvi = store.read(nir, zoom.toInt).withColumnRenamed("cells", "nir")
      .join(store.read(red, zoom.toInt).withColumnRenamed("cells", "red"),
        Seq("tile_col", "tile_row"))
      .select(col("tile_col"), col("tile_row"),
        Raster.ndviCells(col("nir"), col("red")).as("cells"))
    store.delete(out, Some(zoom.toInt))
    store.write(ndvi, out, zoom.toInt)
    Histograms.statistics(store.read(out, zoom.toInt), ts).show()
  }
}

/** Convolve (ConvolveLayerExample.scala:28-80 analog): focal mean with
  * circular kernel. args: catalogDir layer outLayer zoom radius */
object ConvolveLayer {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("ConvolveLayer")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(catalog, layer, out, zoom, radius) = args.take(5)
    val ts = Apps.tileSize
    val store = new LayerStore(spark, catalog)
    store.write(Raster.focalMean(store.read(layer, zoom.toInt), ts, ts, radius.toInt),
      out, zoom.toInt)
  }
}

/** Pyramid (LayerToPyramid.scala:28-68 analog): build all zoom levels
  * down to 0. args: catalogDir layer maxZoom */
object PyramidLayer {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("PyramidLayer")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(catalog, layer, maxZoom) = args.take(3)
    val ts = Apps.tileSize
    val store = new LayerStore(spark, catalog)
    var z = maxZoom.toInt
    while (z > 0) {
      store.write(Raster.pyramidUp(store.read(layer, z), ts, ts), layer, z - 1)
      z -= 1
    }
  }
}

/** Update/upsert (LayerUpdaterExample.scala:28-60 analog).
  * args: catalogDir sourcePixels layer zoom */
object UpdateLayer {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("UpdateLayer")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(catalog, input, layer, zoom) = args.take(4)
    val ts = Apps.tileSize
    val store = new LayerStore(spark, catalog)
    store.merge(Raster.assemble(Apps.readPixels(spark, input), ts, ts), layer, zoom.toInt)
  }
}

/** Pixelize + keyed CSV handoff (TilePixelingToCSVExample analog, K8).
  * args: catalogDir layer zoom outCsvPath */
object PixelizeLayer {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("PixelizeLayer")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(catalog, layer, zoom, out) = args.take(4)
    val ts = Apps.tileSize
    val store = new LayerStore(spark, catalog)
    val px = Raster.pixelize(store.read(layer, zoom.toInt), ts)
      .select(col("tile_col"), col("tile_row"), col("px"), col("py"),
        col("v").as("label"), array(col("v")).as("features"))
    Export.exportKeyedCsv(px, out,
      s"""{"layer":"$layer","zoom":$zoom,"tileSize":$ts,"cellType":"float64"}""")
  }
}

/** Export (LayerToGeotiff.scala:28-130 analog): tiled or stitched.
  * args: catalogDir layer zoom outDir [stitched] */
object ExportLayer {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("ExportLayer")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(catalog, layer, zoom, out) = args.take(4)
    val stitched = args.length > 4 && args(4) == "stitched"
    val ts = Apps.tileSize
    val tiles = new LayerStore(spark, catalog).read(layer, zoom.toInt)
    if (stitched) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      Export.stitchGeoTiff(tiles, ts, ts, s"$out/stitched.tif")
    } else Export.exportTiled(tiles, out, ts, ts)
  }
}

/** Serve-layer point render (ServeLayerAsMap.scala analog, minus the
  * HTTP actor): render one tile to PNG with histogram quantile breaks.
  * args: catalogDir layer zoom tileCol tileRow outPng */
object RenderTile {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("RenderTile")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(catalog, layer, zoom, tc, tr, out) = args.take(6)
    val ts = Apps.tileSize
    val store = new LayerStore(spark, catalog)
    // breaks come from the persisted _attributes histogram (zero jobs,
    // ServeLayerAsMap.scala:90-92 parity); only the point read runs a job
    val breaks = store.readAttributes(layer, zoom.toInt).map(_.quantileBreaks(10))
      .getOrElse(Histograms.quantileBreaks(store.read(layer, zoom.toInt), ts, 10))
    val tile = store.readTile(layer, zoom.toInt, tc.toInt, tr.toInt)
      .select(col("cells")).head().getSeq[Double](0)
    Export.renderPng(tile, ts, ts, breaks, out)
  }
}

/** WordCount (WordCount.scala:17-27 parity). args: inTextFile outDir */
object WordCountApp {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("WordCountApp")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(in, out) = args.take(2)
    spark.read.text(in)
      .select(explode(split(col("value"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).count()
      .select(concat_ws(",", col("word"), col("count")))
      .write.mode("overwrite").text(out)
  }
}

/** Delete a layer or one zoom of it (DeleteLayer.scala:16-41 analog).
  * args: catalogDir layerName [zoom] */
object DeleteLayerApp {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("DeleteLayerApp")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val store = new LayerStore(spark, args(0))
    store.delete(args(1), args.lift(2).map(_.toInt))
  }
}

/** Stack N single-band layers into one multiband layer
  * (ManyLayersToMultibandLayer.scala:48-260 analog — the cross-CRS
  * reproject leg lives in grid.Reproject/Crs; here layers already share
  * the grid, as in ManySingleBandLayersToMultibandLayer).
  * args: catalogDir outLayer zoom inLayer1 inLayer2 [...] */
object StackLayers {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("StackLayers")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(catalog, out, zoom) = args.take(3)
    val store = new LayerStore(spark, catalog)
    val stacked = Raster.stackBands(args.drop(3).toIndexedSeq.map(store.read(_, zoom.toInt)))
    store.write(stacked, out, zoom.toInt)
  }
}

/** Rasterize vector features into a layer
  * (ShapefilePolygonRasterizer.scala:40-74 analog): GeoJSON (or
  * converted shapefile) polygons → scanline burn → catalog layer.
  * args: featureGeojson burnAttribute catalogDir layerName zoom */
object RasterizeShapes {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("RasterizeShapes")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(input, attribute, catalog, layer, zoom) = args.take(5)
    val ts = Apps.tileSize
    val feats = graft.sources.GeoJson.readFeatures(spark, input, attribute)
    val burned = Raster.rasterizePolygons(feats, ts, ts)
    new LayerStore(spark, catalog).write(burned, layer, zoom.toInt)
  }
}

/** Resample a layer to a deeper zoom (ZoomResampleLayer.scala:42-60
  * analog). args: catalogDir layerName fromZoom toZoom */
object ZoomResampleApp {
  def main(args: Array[String]): Unit = {
    val spark = Apps.session("ZoomResampleApp")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: org.apache.spark.sql.SparkSession, args: Array[String]): Unit = {
    val Array(catalog, layer, fromZoom, toZoom) = args.take(4)
    val ts = Apps.tileSize
    val store = new LayerStore(spark, catalog)
    val dz = toZoom.toInt - fromZoom.toInt
    require(dz > 0, s"toZoom must exceed fromZoom, got $fromZoom -> $toZoom")
    store.write(Raster.zoomResampleUp(store.read(layer, fromZoom.toInt), ts, ts, dz),
      layer, toZoom.toInt)
  }
}
