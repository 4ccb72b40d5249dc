package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector feature sources (SURVEY §2.1 S4/S5): GeoJSON FeatureCollection
  * and minimal ESRI Shapefile polygon reader. Output matches the
  * rasterizer input: (fid, xs, ys, ring_offsets, value) in source
  * coordinates (caller maps to pixel space).
  */
object GeoJson {

  /** S5: GeoJSON FeatureCollection of MultiPolygon features with one
    * numeric attribute (UtilsShape.scala:43-73). CRS parsed from the
    * legacy `crs.properties.name` EPSG field when present. */
  def readFeatures(spark: SparkSession, path: String, attribute: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val hasCrs = raw.columns.contains("crs")
    val crsCol =
      if (hasCrs) regexp_extract(col("crs.properties.name"), "EPSG:*(\\d+)", 1)
      else lit("")
    raw.select(crsCol.as("crs"), posexplode(col("features")).as(Seq("fid", "f")))
      .select(
        col("fid").cast("long").as("fid"),
        col("crs"),
        col("f.geometry.type").as("geom_type"),
        // MultiPolygon: [polygon][ring][point][xy] -> flatten polygons+rings
        flatten(col("f.geometry.coordinates")).as("rings"),
        col(s"f.properties.$attribute").cast("double").as("value"))
      .select(col("fid"), col("crs"), col("value"),
        transform(flatten(col("rings")), p => element_at(p, 1)).cast("array<double>").as("xs"),
        transform(flatten(col("rings")), p => element_at(p, 2)).cast("array<double>").as("ys"),
        ringOffsets(col("rings")).as("ring_offsets"))
  }

  /** Prefix-sum of ring lengths -> start offset of each ring. */
  private def ringOffsets(rings: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    slice(
      aggregate(transform(rings, r => size(r)), array(lit(0)),
        (acc, l) => concat(acc, array(element_at(acc, -1) + l))),
      lit(1), size(rings)).cast("array<int>")

  /** S4: minimal ESRI Shapefile reader — polygon records (shape type 5),
    * one numeric attribute taken from the parallel .dbf, driver-side
    * exactly like the reference's GeoTools path (UtilsShape.scala:26-42:
    * also a driver-side parse into an RDD). Offline build: no GeoTools,
    * so the 100-byte header / record structure is parsed directly. */
  def readShapefile(spark: SparkSession, shpPath: String, attribute: String): DataFrame = {
    import spark.implicits._
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(shpPath))
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val features = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double], Seq[Double], Seq[Int])]
    var pos = 100 // header
    var fid = 0L
    while (pos + 12 <= bytes.length) {
      buf.order(java.nio.ByteOrder.BIG_ENDIAN)
      val contentLen = buf.getInt(pos + 4) * 2 // 16-bit words -> bytes
      buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val shapeType = buf.getInt(pos + 8)
      if (shapeType == 5) { // polygon
        val numParts = buf.getInt(pos + 8 + 36)
        val numPoints = buf.getInt(pos + 8 + 40)
        val partsOff = pos + 8 + 44
        val pointsOff = partsOff + 4 * numParts
        val offsets = (0 until numParts).map(i => buf.getInt(partsOff + 4 * i))
        val xs = (0 until numPoints).map(i => buf.getDouble(pointsOff + 16 * i))
        val ys = (0 until numPoints).map(i => buf.getDouble(pointsOff + 16 * i + 8))
        features += ((fid, xs, ys, offsets))
      }
      fid += 1
      pos += 8 + contentLen
    }
    val attrs = readDbfNumericColumn(shpPath.replaceAll("\\.shp$", ".dbf"), attribute)
    features.toSeq.map { case (id, xs, ys, offs) =>
      (id, xs, ys, offs, attrs.lift(id.toInt).getOrElse(Double.NaN))
    }.toDF("fid", "xs", "ys", "ring_offsets", "value")
  }

  /** Tiny dBASE III reader: one numeric column by name. */
  private def readDbfNumericColumn(path: String, column: String): IndexedSeq[Double] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return IndexedSeq.empty
    val bytes = java.nio.file.Files.readAllBytes(p)
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nRecords = buf.getInt(4)
    val headerLen = buf.getShort(8).toInt
    val recordLen = buf.getShort(10).toInt
    // field descriptors: 32 bytes each from offset 32 until 0x0D
    var off = 32
    var fieldOff = 1 // first byte of record is deletion flag
    var target = -1; var targetLen = 0
    while (off < headerLen - 1 && bytes(off) != 0x0D) {
      val name = new String(bytes, off, 11).takeWhile(_ != 0).trim
      val len = bytes(off + 16) & 0xFF
      if (name.equalsIgnoreCase(column)) { target = fieldOff; targetLen = len }
      fieldOff += len
      off += 32
    }
    if (target < 0) return IndexedSeq.empty
    (0 until nRecords).map { r =>
      val base = headerLen + r * recordLen + target
      val s = new String(bytes, base, targetLen).trim
      if (s.isEmpty) Double.NaN else s.toDouble
    }
  }
}
