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
