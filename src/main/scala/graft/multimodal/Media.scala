package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for LLM-data pipelines: image/audio/video as
  * opaque BINARY columns with typed metadata, processed per-partition
  * in batches (the Scala analog of mapInPandas).
  *
  * Image decode is REAL: payloads are decoded with JDK ImageIO
  * (PNG/BMP/GIF/JPEG — whatever the JRE's plugin registry reads), and
  * features/resize operate on the decoded pixel plane. The container
  * ships no image fixtures, so ingestion is simulated —
  * [[mediaFromDocuments]] synthesizes a real PNG per document from a
  * deterministic pixel formula — but the bytes are genuine PNG and
  * everything downstream runs the actual codec. Because PNG is
  * lossless, a SQL oracle can predict the decoded pixels from the same
  * formula without an image library, which is what lets the
  * m_media_features / m_media_resize gates hash-match over a real
  * decode path. Audio decode is REAL too: javax.sound.sampled parses
  * WAV containers and the m_audio_features gate hash-matches per-frame
  * energies over decoded PCM (lossless, same oracle trick). Video
  * frame sampling remains a byte-chunking stand-in (no video codec in
  * the JDK); its plumbing (schema, per-row fan-out) is the real shape.
  *
  * Reference analog: the per-pixel features the SVM pipeline consumes
  * (`biggis-landuse` `UtilsML.scala:17-36`).
  */
object Media {

  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String,
                      width: Int, height: Int, n_frames: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Int,
                           width: Int, height: Int, features: Array[Float])

  val FeatureDim = 8

  // ImageIO defaults to a disk-backed stream cache; executors want the
  // pure in-memory path. Global, idempotent, safe under concurrency.
  ImageIO.setUseCache(false)

  /** Deterministic grayscale value for pixel `i` (row-major) of the
    * synthetic image derived from document `docId` — the contract the
    * SQL oracle replays to predict decoded pixels. */
  def synthPixel(docId: Long, i: Long): Int = ((docId * 31 + i) % 256).toInt

  /** Encode a w x h 8-bit grayscale plane with a real JDK codec
    * (`format`: "png", "bmp", "gif"...). `pix` maps row-major index ->
    * 0..255. */
  def encodeGray(w: Int, h: Int, format: String, pix: Int => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pix(y * w + x) & 0xFF); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(img, format, bos))
      throw new IllegalArgumentException(s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** REAL image decode: ImageIO reads whatever format the bytes carry
    * and the result is reduced to a row-major luminance plane —
    * 8-bit grayscale rasters pass through exactly, 16-bit grayscale is
    * scaled to 8-bit (>>8), indexed-color images (GIF, paletted
    * PNG/BMP) resolve through the palette via getRGB (raw raster
    * samples there are LUT indices, not pixel values), and RGB sources
    * use the integer ITU-R 601 weights (r*299+g*587+b*114+500)/1000 —
    * rounding fixed so the result is bit-deterministic. Returns None
    * for bytes no registered reader accepts OR that a reader chokes on
    * mid-stream (plugin readers throw unchecked exceptions on corrupt
    * headers — the undecodable-row contract must absorb those, not
    * fail the task). */
  def decodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes))).map(grayPlane)
    catch { case scala.util.control.NonFatal(_) => None }

  /** The luminance-plane reduction shared by single-image and
    * multi-frame decode (see [[decodeGray]] for the per-kind rules). */
  private def grayPlane(img: BufferedImage): (Int, Int, Array[Int]) = {
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val indexed = img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
    val nb = raster.getNumBands
    val chShift = // 16-bit samples -> 8-bit, gray AND per-RGB-channel
      if (!indexed && img.getColorModel.getComponentSize(0) > 8) 8 else 0
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) =
          if (indexed) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
            (r * 299 + g * 587 + b * 114 + 500) / 1000
          } else if (nb >= 3) {
            val r = raster.getSample(x, y, 0) >> chShift
            val g = raster.getSample(x, y, 1) >> chShift
            val b = raster.getSample(x, y, 2) >> chShift
            (r * 299 + g * 587 + b * 114 + 500) / 1000
          } else raster.getSample(x, y, 0) >> chShift
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** Wrap a text table as a media table with REAL PNG payloads: per
    * document, a (len%64+1) x (len%48+1) grayscale image whose pixels
    * follow [[synthPixel]], encoded through the actual PNG writer.
    * Executor-side and batched per partition — the S1-analog binary
    * ingestion stand-in (no image fixtures ship in this container). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), length(col("text")).cast("int").as("len"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        it.map { case (id, len) =>
          val w = len % 64 + 1
          val h = len % 48 + 1
          MediaRow(id, encodeGray(w, h, "png", i => synthPixel(id, i)),
            "image/png", w, h, (id % 16 + 1).toInt)
        }
      }
  }

  /** Feature extraction over the binary column, batched per partition
    * (executor-local, no shuffle; partition count = parallelism knob,
    * exactly like mapInPandas batches). Each payload is REALLY decoded;
    * features sample the decoded plane at a fixed stride, normalized to
    * [0,1). Undecodable rows are dropped (None contract). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeGray(r.media).map { case (w, h, px) =>
          val out = new Array[Float](FeatureDim)
          var j = 0
          while (j < FeatureDim) {
            out(j) = px(((j * 37) % (w * h)).toInt) / 256.0f
            j += 1
          }
          MediaFeatures(r.doc_id, r.media_type, r.media.length, w, h, out)
        }
      }
    }
  }

  /** Average-hash (aHash) perceptual fingerprint over the REAL decoded
    * plane — the image-side near-dup key: NN-sample a gridW x gridH
    * thumbnail (same index rule as [[resize]]), then bit j = 1 iff
    * n·sample_j > Σ samples (the all-integer form of "above the mean",
    * no division so no rounding to disagree on). Bits pack
    * MSB-first into one long (gridW·gridH ≤ 63 keeps the sign bit
    * clear). Identical-looking payloads — whatever container or
    * compression produced them — collide on this key, so dedup is a
    * hash groupBy, never image×image. Per-partition map work. */
  def aHash(media: Dataset[MediaRow], gridW: Int, gridH: Int): DataFrame = {
    require(gridW * gridH <= 63, "pack target is a signed long")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      decodeGray(r.media).map { case (w, h, px) =>
        val n = gridW * gridH
        val s = new Array[Int](n)
        var tot = 0L
        var j = 0
        while (j < n) {
          val x = (j % gridW) * w / gridW
          val y = (j / gridW) * h / gridH
          s(j) = px(x + y * w); tot += s(j); j += 1
        }
        var bits = 0L
        j = 0
        while (j < n) { if (s(j).toLong * n > tot) bits |= 1L << (n - 1 - j); j += 1 }
        (r.doc_id, bits)
      }
    }.toDF("doc_id", "phash")
  }

  /** Nearest-neighbor resize over the REAL decoded pixel plane to an
    * outW x outH thumbnail. Undecodable rows are dropped. */
  def resize(media: Dataset[MediaRow], outW: Int, outH: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      decodeGray(r.media).map { case (w, h, px) =>
        val out = new Array[Int](outW * outH)
        var y = 0
        while (y < outH) {
          val sy = y * h / outH
          var x = 0
          while (x < outW) {
            out(x + y * outW) = px(x * w / outW + sy * w)
            x += 1
          }
          y += 1
        }
        (r.doc_id, outW, outH, out.toSeq)
      }
    }.toDF("doc_id", "width", "height", "pixels")
  }

  // -------------------------------------------------------------------
  // Audio: REAL WAV codec via javax.sound.sampled (JDK-only, like
  // ImageIO above). PCM is lossless, so the oracle predicts decoded
  // samples from the synthesis formula — same gate design as images.
  // -------------------------------------------------------------------

  case class AudioRow(doc_id: Long, audio: Array[Byte], media_type: String,
                      sample_rate: Int)

  /** Deterministic signed 16-bit sample `i` of the synthetic clip for
    * document `docId` — the contract the SQL oracle replays. */
  def synthSample(docId: Long, i: Long): Int =
    (((docId * 7 + i * 13) % 65536) - 32768).toInt

  /** Encode signed 16-bit mono PCM as a real WAV container through the
    * JDK's audio writer. */
  def encodeWav(samples: Array[Int], rateHz: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rateHz.toFloat, 16, 1, true, false) // PCM16 LE mono
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: the JDK parses the container (WAV/AIFF/AU) and
    * hands back format + PCM frames; 16-bit signed mono is reassembled
    * into exact sample values honoring the container's endianness.
    * Returns (sampleRateHz, samples), or None for bytes no reader
    * accepts or formats outside 16-bit mono PCM. */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Array[Int])] =
    try {
      import javax.sound.sampled._
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val f = ais.getFormat
      if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16 || f.getChannels != 1) None
      else {
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) =
            if (f.isBigEndian) (raw(2 * i) << 8) | (raw(2 * i + 1) & 0xFF)
            else (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF)
          i += 1
        }
        Some((f.getSampleRate.toInt, out))
      }
    } catch {
      // UnsupportedAudioFileException, IOException, AND the unchecked
      // exceptions container parsers throw on corrupt headers — a bad
      // row must drop, not fail the task
      case scala.util.control.NonFatal(_) => None
    }

  /** Wrap a text table as an audio table with REAL WAV payloads:
    * (len%512+64) samples following [[synthSample]], at a
    * doc-dependent sample rate (8000 + (doc_id%8)*1000 Hz) so the gate
    * also proves the decoder recovered the container's format fields,
    * not just the payload. */
  def audioFromDocuments(docs: DataFrame): Dataset[AudioRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), length(col("text")).cast("int").as("len"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        it.map { case (id, len) =>
          val n = len % 512 + 64
          val rate = 8000 + (id % 8).toInt * 1000
          AudioRow(id, encodeWav(Array.tabulate(n)(i => synthSample(id, i.toLong)), rate),
            "audio/wav", rate)
        }
      }
  }

  /** Per-frame mean-square energy over the REAL decoded samples: the
    * clip splits into `nFrames` equal spans (sample i -> frame
    * i*nFrames/n), energy = sum(s^2)/count as exact-integer-sum
    * division so it is bit-deterministic. Executor-local, no shuffle;
    * undecodable rows drop. */
  def audioFrameEnergy(audio: Dataset[AudioRow], nFrames: Int): DataFrame = {
    import audio.sparkSession.implicits._
    audio.flatMap { r =>
      decodeAudio(r.audio).map { case (rate, s) =>
        val n = s.length
        val sums = new Array[Long](nFrames)
        val cnts = new Array[Long](nFrames)
        var i = 0
        while (i < n) {
          val f = (i.toLong * nFrames / n).toInt
          sums(f) += s(i).toLong * s(i)
          cnts(f) += 1
          i += 1
        }
        (r.doc_id, rate, n,
          (0 until nFrames).map(f => if (cnts(f) == 0) 0.0 else sums(f).toDouble / cnts(f)))
      }
    }.toDF("doc_id", "rate_hz", "n_samples", "energy")
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * n_frames equal chunks and keep every k-th chunk (plumbing twin of
    * ffmpeg frame extraction — the JDK has no video codec, so the
    * chunks are raw bytes, not decoded frames; schema and fan-out are
    * the real shape). For a REAL multi-frame container path, see
    * [[encodeGifAnim]] / [[decodeGrayFrames]] / [[sampleDecodedFrames]]. */
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

  // -------------------------------------------------------------------
  // Multi-frame media: REAL animated-GIF container. The JDK ships no
  // video codec, but its GIF READER handles multi-image streams — so
  // the closest honest stand-in for frame extraction is an animated
  // GIF: a real container with N indexed frames, decoded frame-by-frame
  // through ImageIO. The WRITER below is ours (the JDK's GIF writer
  // was measured mangling small grayscale frames — see MiscSpec):
  // GIF89a, one global identity-gray palette, and literal LZW (clear
  // codes every <=253 literals keep the stream at 9 bits — the
  // standard "uncompressed GIF" construction). Identity palette +
  // literal codes make the container lossless, so the SQL oracle can
  // predict every decoded pixel — the same trick the PNG and WAV gates
  // use.
  // -------------------------------------------------------------------

  /** Deterministic pixel `i` of frame `frame` for document `docId` —
    * the contract the frame-sampling oracle replays. */
  def synthFramePixel(docId: Long, frame: Int, i: Long): Int =
    ((docId * 31 + frame * 97 + i) % 256).toInt

  /** Encode w x h 8-bit grayscale planes as one animated GIF89a. */
  def encodeGifAnim(w: Int, h: Int, frames: Seq[Int => Int]): Array[Byte] = {
    require(frames.nonEmpty, "animated GIF needs at least one frame")
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xF7); out.write(0); out.write(0) // GCT: 256 entries; bg 0; aspect 0
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 } // identity gray
    frames.foreach { pix =>
      out.write(0x21); out.write(0xF9); out.write(4) // graphic control ext
      out.write(0); u16(4); out.write(0); out.write(0) // no disposal, 40ms, no transp
      out.write(0x2C); u16(0); u16(0); u16(w); u16(h); out.write(0) // full-frame desc, no LCT
      out.write(8) // LZW min code size -> 9-bit codes; clear=256, EOI=257
      val data = new ByteArrayOutputStream()
      var acc = 0L; var nbits = 0
      def put(code: Int): Unit = {
        acc |= (code.toLong << nbits); nbits += 9
        while (nbits >= 8) { data.write((acc & 0xFF).toInt); acc >>= 8; nbits -= 8 }
      }
      put(256)
      var sinceClear = 0
      var i = 0
      val total = w * h
      while (i < total) {
        put(pix(i) & 0xFF); i += 1; sinceClear += 1
        // the decoder adds a table entry per literal after the first;
        // clear before entry 512 would widen the codes past 9 bits
        if (sinceClear == 253 && i < total) { put(256); sinceClear = 0 }
      }
      put(257)
      if (nbits > 0) data.write((acc & 0xFF).toInt)
      val bytes = data.toByteArray
      var off = 0
      while (off < bytes.length) { // 255-byte sub-blocks
        val len = math.min(255, bytes.length - off)
        out.write(len); out.write(bytes, off, len); off += len
      }
      out.write(0) // image-data terminator
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** REAL multi-frame decode: every image in the container through the
    * JDK reader, each reduced to a luminance plane (palette-resolved,
    * like [[decodeGray]]). None for undecodable bytes — same contract. */
  def decodeGrayFrames(bytes: Array[Byte]): Option[Vector[(Int, Int, Array[Int])]] =
    try {
      // close the stream on every path (including no-reader): this runs
      // once per ROW on executors, and an unclosed ImageInputStream
      // holds its cache buffer (or temp file + fd, if something flips
      // the global useCache back on) until finalization
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            Some((0 until n).map(i => grayPlane(reader.read(i))).toVector)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Wrap a text table as an animated-media table with REAL GIF
    * payloads: (len%16+2) x (len%12+2) frames following
    * [[synthFramePixel]], doc_id%16+1 frames per document. */
  def videoFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), length(col("text")).cast("int").as("len"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        it.map { case (id, len) =>
          val w = len % 16 + 2
          val h = len % 12 + 2
          val nf = (id % 16 + 1).toInt
          MediaRow(id,
            encodeGifAnim(w, h, (0 until nf).map(f => (i: Int) => synthFramePixel(id, f, i))),
            "image/gif", w, h, nf)
        }
      }
  }

  /** Real frame extraction: decode the container, keep every k-th
    * frame, summarize each kept frame from its DECODED plane (first
    * pixel + whole-plane sum — the oracle predicts both). Executor-side
    * batches, no shuffle; undecodable rows drop. */
  def sampleDecodedFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      decodeGrayFrames(r.media).toSeq.flatMap { frames =>
        frames.zipWithIndex.collect { case ((w, h, px), f) if f % everyK == 0 =>
          var s = 0L
          var i = 0
          while (i < px.length) { s += px(i); i += 1 }
          (r.doc_id, f, w, h, px(0), s)
        }
      }
    }.toDF("doc_id", "frame", "width", "height", "p0", "psum")
  }
}
