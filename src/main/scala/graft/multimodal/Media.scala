package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for LLM-data pipelines: image/audio/video as
  * opaque BINARY columns with typed metadata, processed per-partition
  * in batches (the Scala analog of mapInPandas).
  *
  * The actual codec decode is STUBBED (no image/audio libraries in this
  * build): [[decodeStub]] derives a deterministic fake feature vector
  * from the bytes. Everything around it — schema, partition-batched
  * execution, feature dimensionality, frame sampling — is the real
  * plumbing a decoder would plug into (swap `fakeDecode` for the codec
  * call).
  */
object Media {

  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String,
                      width: Int, height: Int, n_frames: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Int,
                           features: Array[Float])

  val FeatureDim = 8

  /** Wrap a text table as a fake media table: payload = UTF-8 bytes.
    * Deterministic stand-in for real binary ingestion (S1-analog). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      concat(lit("fake/"), col("source")).as("media_type"),
      (length(col("text")) % 64 + 1).cast("int").as("width"),
      (length(col("text")) % 48 + 1).cast("int").as("height"),
      (col("doc_id") % 16 + 1).cast("int").as("n_frames"))

  /** STUB decode: deterministic fake "decoder" — samples bytes at a
    * fixed stride and normalizes to [0,1). A real build replaces this
    * one function with an actual codec; the mapPartitions batching,
    * schema and feature shape stay identical. */
  private[multimodal] def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (bytes.nonEmpty) {
      var j = 0
      while (j < FeatureDim) {
        out(j) = (bytes((j * 37) % bytes.length) & 0xFF) / 256.0f
        j += 1
      }
    }
    out
  }

  /** Feature extraction over the binary column, batched per partition
    * (executor-local, no shuffle; partition count = parallelism knob
    * exactly like mapInPandas batches). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.doc_id, r.media_type, r.media.length, fakeDecode(r.media))
      }
    }
  }

  /** Resize plumbing: nearest-neighbor index mapping over the (stubbed)
    * decoded w x h grayscale plane. The resampling arithmetic is the
    * real thing — a codec build swaps the byte plane for decoded pixels
    * and keeps the mapping. Rows whose payload is smaller than w*h are
    * dropped (undecodable under the stub contract). */
  def resize(media: Dataset[MediaRow], outW: Int, outH: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val w = math.max(1, r.width); val h = math.max(1, r.height)
      if (r.media.length < w * h) None
      else {
        val out = new Array[Byte](outW * outH)
        var y = 0
        while (y < outH) {
          val sy = y * h / outH
          var x = 0
          while (x < outW) {
            out(x + y * outW) = r.media(x * w / outW + sy * w)
            x += 1
          }
          y += 1
        }
        Some((r.doc_id, outW, outH, out.map(b => b & 0xFF).toSeq))
      }
    }.toDF("doc_id", "width", "height", "pixels")
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * n_frames equal chunks and keep every k-th chunk (plumbing twin of
    * ffmpeg frame extraction). */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val frameLen = math.max(1, r.media.length / math.max(1, r.n_frames))
      (0 until r.n_frames by everyK).map { f =>
        val from = f * frameLen
        val until = math.min(r.media.length, from + frameLen)
        (r.doc_id, f, if (from < r.media.length) r.media.slice(from, until) else Array.empty[Byte])
      }
    }.toDF("doc_id", "frame", "frame_bytes")
  }
}
