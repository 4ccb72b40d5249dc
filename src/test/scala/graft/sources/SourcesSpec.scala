package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** Source/sink round-trips: S6 LibSVM, S7 keyed CSV wire format, S5
  * GeoJSON, K8 metadata sidecar. */
class SourcesSpec extends AnyFunSuite {
  import spark.implicits._

  test("S6/K6: libsvm export -> spark.read.format(libsvm) round-trip") {
    val px = Seq(
      (0, 0, 1, 2, 3.0, Seq(1.5, 0.0, 2.5)),
      (0, 0, 2, 2, 1.0, Seq(0.5, 1.0, 0.0)))
      .toDF("tile_col", "tile_row", "px", "py", "label", "features")
    val dir = java.nio.file.Files.createTempDirectory("graft_libsvm").toString + "/data"
    graft.ops.Export.exportLibsvm(px, dir, filterZeroLabel = false)
    val back = spark.read.format("libsvm").option("numFeatures", "3").load(dir)
    assert(back.count() == 2)
    val labels = back.select($"label").as[Double].collect().sorted.toSeq
    assert(labels == Seq(1.0, 3.0))
  }

  test("S7/K8: keyed CSV + metadata sidecar round-trip via wire codec") {
    val px = Seq((3, 7, 12, 200, 1.0, Seq(0.5, 2.25)))
      .toDF("tile_col", "tile_row", "px", "py", "label", "features")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/data"
    graft.ops.Export.exportKeyedCsv(px, dir, """{"cellType":"float64"}""")
    val back = spark.read.text(dir)
      .select(graft.streaming.PixelStream.decodeWire($"value").as("d")).select($"d.*")
    val r = back.head()
    assert(r.getAs[Int]("tile_col") == 3 && r.getAs[Int]("tile_row") == 7)
    assert(r.getAs[Int]("px") == 12 && r.getAs[Double]("label") == 1.0)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir + ".meta.json"))).contains("float64"))
  }

  test("S5: GeoJSON MultiPolygon FeatureCollection parse") {
    val gj =
      """{"type":"FeatureCollection",
        |"crs":{"type":"name","properties":{"name":"urn:ogc:def:crs:EPSG::4326"}},
        |"features":[
        | {"type":"Feature","properties":{"landcover":7},
        |  "geometry":{"type":"MultiPolygon","coordinates":[[[[0,0],[4,0],[4,4],[0,4]]]]}},
        | {"type":"Feature","properties":{"landcover":9},
        |  "geometry":{"type":"MultiPolygon","coordinates":[[[[10,10],[14,10],[14,14],[10,14]],[[11,11],[12,11],[12,12],[11,12]]]]}}
        |]}""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft_gj", ".json")
    java.nio.file.Files.writeString(f, gj)
    val df = GeoJson.readFeatures(spark, f.toString, "landcover")
    val rows = df.orderBy($"fid").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("crs") == "4326")
    assert(rows(0).getAs[Double]("value") == 7.0)
    assert(rows(0).getAs[scala.collection.Seq[Double]]("xs").toSeq == Seq(0.0, 4.0, 4.0, 0.0))
    // second feature has a hole: two rings, offsets [0, 4]
    assert(rows(1).getAs[scala.collection.Seq[Int]]("ring_offsets").toSeq == Seq(0, 4))
    assert(rows(1).getAs[scala.collection.Seq[Double]]("xs").length == 8)
  }

  test("S5 -> R5: GeoJSON polygons rasterize with even-odd holes") {
    val gj =
      """{"type":"FeatureCollection","features":[
        | {"type":"Feature","properties":{"v":5},
        |  "geometry":{"type":"MultiPolygon","coordinates":[[[[0,0],[8,0],[8,8],[0,8]],[[2,2],[6,2],[6,6],[2,6]]]]}}
        |]}""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft_gj2", ".json")
    java.nio.file.Files.writeString(f, gj)
    val feats = GeoJson.readFeatures(spark, f.toString, "v")
      .select($"fid", $"xs", $"ys", $"ring_offsets", $"value")
    val burned = graft.ops.Raster.pixelize(
      graft.ops.Raster.rasterizePolygons(feats, 8, 8), 8)
    val pts = burned.collect().map(r => (r.getInt(0) * 8 + r.getInt(2), r.getInt(1) * 8 + r.getInt(3))).toSet
    assert(pts.contains((1, 1)) && pts.contains((7, 7)))
    assert(!pts.contains((4, 4))) // inside the hole
    assert(pts.size == 64 - 16) // ring minus hole
  }
}
