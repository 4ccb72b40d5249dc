package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark
import graft.ops.Raster

/** The reference's flagship pipeline end-to-end (WorkflowExample
  * §3.3): ingest two band layers → stack → per-pixel features → train
  * OVA SVM → predict → reassemble the prediction raster → catalog →
  * serve. Labels are a linearly separable function of the bands, so a
  * linear classifier must recover them. */
class WorkflowSpec extends AnyFunSuite {
  import spark.implicits._
  val TS = 8

  test("ingest -> stack -> pixelize -> SVM -> reassemble -> serve") {
    // 1. two deterministic band layers (separable: label = a > b)
    val pixels = (for {
      tc <- 0 to 1; tr <- 0 to 1; px <- 0 until TS; py <- 0 until TS
    } yield {
      val a = ((tc * 31 + tr * 17 + px * 3 + py * 7) % 23).toDouble
      val b = ((tc * 13 + tr * 29 + px * 5 + py * 11) % 23).toDouble
      (tc, tr, px, py, a, b)
    }).toDF("tile_col", "tile_row", "px", "py", "a", "b")
    val bandA = Raster.assemble(pixels.select($"tile_col", $"tile_row", $"px", $"py", $"a".as("v")), TS, TS)
    val bandB = Raster.assemble(pixels.select($"tile_col", $"tile_row", $"px", $"py", $"b".as("v")), TS, TS)

    // 2. catalog ingest (K1) + stack (J3) + per-pixel features (P9)
    val root = java.nio.file.Files.createTempDirectory("graft_wf").toString
    val store = new graft.catalog.LayerStore(spark, root)
    store.write(bandA, "band_a", 3)
    store.write(bandB, "band_b", 3)
    val stacked = Raster.stackBands(Seq(store.read("band_a", 3), store.read("band_b", 3)))
    val feats = Raster.pixelFeatures(stacked, TS, 2)

    // 3. label + train (M1-M4) on the separable target
    val labeled = feats.select($"tile_col", $"tile_row", $"px", $"py",
      org.apache.spark.ml.functions.array_to_vector(
        transform($"features", c => c.cast("float"))).as("features"),
      when(element_at($"features", 1) > element_at($"features", 2), 1.0).otherwise(0.0).as("label"))
    val model = new org.apache.spark.ml.classification.LinearSVC()
      .setMaxIter(100).setRegParam(0.01).fit(labeled)
    val pred = model.transform(labeled)
    val acc = pred.where($"prediction" === $"label").count().toDouble / pred.count()
    assert(acc > 0.95, s"separable pattern should be learnable, got $acc")

    // 4. reassemble the prediction raster (A3) + write (K1)
    val predTiles = Raster.assemble(
      pred.select($"tile_col", $"tile_row", $"px", $"py", $"prediction".as("v")), TS, TS)
    store.write(predTiles, "prediction", 3)
    assert(Raster.pixelize(store.read("prediction", 3), TS).count() == 4L * TS * TS)

    // 5. serve the prediction layer (K11/S10) and fetch a tile PNG
    val srv = new graft.serve.TileServer(spark, root, "prediction", TS)
    val port = srv.start()
    try {
      val conn = new java.net.URI(s"http://127.0.0.1:$port/3/0/0").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val img = javax.imageio.ImageIO.read(conn.getInputStream)
      assert(img.getWidth == TS)
      conn.disconnect()
    } finally srv.stop()
  }
}
