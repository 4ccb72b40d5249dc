package graft.serve

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import graft.catalog.LayerStore
import graft.ops.{Export, Histograms}

/** The reference's tile-serving surface (ServeLayerAsMap.scala:61-124:
  * an HTTP actor on the driver answering /{zoom}/{x}/{y} with a PNG
  * rendered through the stored histogram's quantile breaks). Rebuilt on
  * the JDK's built-in HttpServer — no Spark job per request: tiles come
  * from the catalog's pruned point-read path, and a small LRU keeps hot
  * tiles on the driver exactly like the reference's HadoopValueReader
  * block cache.
  */
class TileServer(spark: SparkSession, catalogRoot: String, layer: String,
                 tileSize: Int = graft.core.TileMath.DefaultTileSize) {

  private val store = new LayerStore(spark, catalogRoot)

  private val breaksCache = scala.collection.concurrent.TrieMap.empty[Int, Seq[Double]]
  private val tileCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(Int, Int, Int), Option[Seq[Double]]](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[(Int, Int, Int), Option[Seq[Double]]]) =
        size() > 256
    })

  /** Color breaks from the persisted `_attributes` histogram — zero Spark
    * jobs, like the reference reading `histogramData` back
    * (ServeLayerAsMap.scala:90-92). Falls back to a live quantile
    * aggregation only for pre-sidecar layers. */
  private def breaks(zoom: Int): Seq[Double] =
    breaksCache.getOrElseUpdate(zoom,
      store.readAttributes(layer, zoom).map(_.quantileBreaks(10)).getOrElse(
        Histograms.quantileBreaks(store.read(layer, zoom), tileSize, 10)))

  private def tile(zoom: Int, x: Int, y: Int): Option[Seq[Double]] = {
    val k = (zoom, x, y)
    val cached = tileCache.get(k)
    if (cached != null) cached
    else {
      val loaded = store.readTile(layer, zoom, x, y)
        .select("cells").collect().headOption.map(_.getSeq[Double](0))
      tileCache.put(k, loaded)
      loaded
    }
  }

  private var server: HttpServer = _

  /** Start serving /{zoom}/{x}/{y} as PNG; returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
          if (parts.length != 3) { ex.sendResponseHeaders(404, -1); return }
          val (z, x, y) = (parts(0).toInt, parts(1).toInt, parts(2).toInt)
          tile(z, x, y) match {
            case None => ex.sendResponseHeaders(204, -1)
            case Some(cells) =>
              val tmp = java.io.File.createTempFile("graft_tile", ".png")
              try {
                Export.renderPng(cells, tileSize, tileSize, breaks(z), tmp.getAbsolutePath)
                val bytes = java.nio.file.Files.readAllBytes(tmp.toPath)
                ex.getResponseHeaders.add("Content-Type", "image/png")
                ex.sendResponseHeaders(200, bytes.length.toLong)
                ex.getResponseBody.write(bytes)
              } finally tmp.delete()
          }
        } catch {
          case _: NumberFormatException => ex.sendResponseHeaders(400, -1)
          case _: Throwable => ex.sendResponseHeaders(500, -1)
        } finally ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)
}

/** Driver app (ServeLayerAsMap parity): args catalogDir layer [port]. */
object ServeLayer {
  def main(args: Array[String]): Unit = {
    val Array(catalog, layer) = args.take(2)
    val port = if (args.length > 2) args(2).toInt else 8080
    val spark = graft.apps.Apps.session("ServeLayer")
    val bound = new TileServer(spark, catalog, layer, graft.apps.Apps.tileSize).start(port)
    println(s"serving layer '$layer' on http://127.0.0.1:$bound/{zoom}/{x}/{y}")
    Thread.currentThread().join()
  }
}
