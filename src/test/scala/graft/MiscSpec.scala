package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

class MiscSpec extends AnyFunSuite {
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("multimodal: real PNG round-trip — decoded features match the pixel formula") {
    import graft.multimodal.Media
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    val media = Media.mediaFromDocuments(docs)
    // payloads are genuine PNG bytes (magic), not raw text
    assert(media.collect().forall(r =>
      (r.media.take(4).map(_ & 0xFF).toSeq == Seq(0x89, 0x50, 0x4E, 0x47)) && r.media_type == "image/png"))
    val f1 = Media.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.length == 20)
    assert(f1.forall(_.features.length == Media.FeatureDim))
    // the decode is the real codec: dimensions and every sampled pixel
    // must round-trip the encoder's formula exactly
    assert(f1.forall { r =>
      r.features.zipWithIndex.forall { case (v, j) =>
        v == Media.synthPixel(r.doc_id, (j * 37) % (r.width * r.height)) / 256.0f
      }
    })
  }

  test("multimodal: decodeGray reads other formats and rejects garbage") {
    import graft.multimodal.Media
    // BMP comes back as an RGB raster; with r=g=b=v the integer 601
    // luminance collapses to v, so the plane round-trips bit-exactly
    val bmp = Media.encodeGray(7, 5, "bmp", i => (i * 11) % 256)
    val Some((w, h, px)) = Media.decodeGray(bmp)
    assert((w, h) == (7, 5))
    assert(px.toSeq == (0 until 35).map(i => (i * 11) % 256))
    // GIF decodes to an INDEXED image: raw raster samples are palette
    // indices (verified below), so decodeGray must resolve through the
    // palette. The JDK's GIF *writer* is itself lossy on small frames
    // (drops pixel runs), so the reference here is ImageIO's own
    // palette-resolved getRGB of the written bytes, not the encoder
    // input — the property under test is index resolution, not the
    // writer's fidelity.
    // an RGB-sourced GIF gets a COMPACT palette (raster samples are
    // LUT indices 0,1,2..., NOT pixel values) — the case the palette
    // resolution exists for
    val rgbImg = new java.awt.image.BufferedImage(3, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 3) {
      val v = (y * 3 + x) * 20; rgbImg.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val gifBos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgbImg, "gif", gifBos)
    val gif = gifBos.toByteArray
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel])
    val viaRgb = for (y <- 0 until 3; x <- 0 until 3) yield {
      val rgb = img.getRGB(x, y)
      (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114 + 500) / 1000
    }
    val rawIdx = for (y <- 0 until 3; x <- 0 until 3) yield img.getRaster.getSample(x, y, 0)
    assert(rawIdx != viaRgb, "fixture: raster samples should be LUT indices here")
    val Some((gw, gh, gpx)) = Media.decodeGray(gif)
    assert((gw, gh) == (3, 3))
    assert(gpx.toSeq == viaRgb, "decodeGray must resolve the palette, not return indices")
    assert(Media.decodeGray(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Media.decodeGray("not an image at all".getBytes).isEmpty)
  }

  test("multimodal: real WAV round-trip — decoded samples and format match the synth contract") {
    import graft.multimodal.Media
    val samples = Array.tabulate(200)(i => Media.synthSample(3L, i.toLong))
    val wav = Media.encodeWav(samples, 11000)
    // genuine RIFF/WAVE container
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val Some((rate, back)) = Media.decodeAudio(wav)
    assert(rate == 11000)               // format recovered from the container
    assert(back.toSeq == samples.toSeq) // PCM lossless round-trip
    // garbage and non-audio bytes are rejected, not mis-decoded
    assert(Media.decodeAudio("definitely not audio".getBytes).isEmpty)
    assert(Media.decodeAudio(Media.encodeGray(4, 4, "png", _ => 1)).isEmpty)
  }

  test("multimodal: frame sampling splits payload into n_frames chunks") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(5)
    val media = graft.multimodal.Media.mediaFromDocuments(docs)
      .as[graft.multimodal.Media.MediaRow]
    val frames = graft.multimodal.Media.sampleFrames(media, everyK = 2)
    val byDoc = frames.groupBy($"doc_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = media.collect().map(r => r.doc_id -> ((r.n_frames + 1) / 2).toLong).toMap
    assert(byDoc == expected)
  }

  test("multimodal: animated GIF round-trip — every frame's decoded plane is exact") {
    import graft.multimodal.Media
    // our GIF89a writer (identity palette + literal LZW) against the
    // JDK's own multi-frame reader: bit-exact planes, per frame —
    // including sizes that cross the 253-literal clear boundary
    for ((w, h, nf) <- Seq((3, 2, 1), (17, 13, 4), (16, 16, 3))) {
      val frames = (0 until nf).map(f => (i: Int) => Media.synthFramePixel(42L, f, i))
      val gif = Media.encodeGifAnim(w, h, frames)
      val Some(decoded) = Media.decodeGrayFrames(gif)
      assert(decoded.length == nf, s"${w}x$h")
      decoded.zipWithIndex.foreach { case ((dw, dh, px), f) =>
        assert((dw, dh) == (w, h))
        assert(px.toSeq == (0 until w * h).map(i => Media.synthFramePixel(42L, f, i)), s"frame $f of ${w}x$h")
      }
    }
    // undecodable bytes keep the None contract
    assert(Media.decodeGrayFrames(Array[Byte](9, 9, 9)).isEmpty)
    // sampleDecodedFrames keeps every k-th frame with plane-true summaries
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(6)
    val vids = Media.videoFromDocuments(docs)
    val sampled = Media.sampleDecodedFrames(vids, everyK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(4), r.getLong(5))).toMap
    val expected = vids.collect().flatMap { r =>
      (0 until r.n_frames by 2).map { f =>
        val plane = (0 until r.width * r.height).map(i => Media.synthFramePixel(r.doc_id, f, i))
        (r.doc_id, f) -> ((plane.head, plane.map(_.toLong).sum))
      }
    }.toMap
    assert(sampled == expected && sampled.nonEmpty)
  }

  test("ml: confusion-count gate has teeth — seeded per-class bands at sf0.01") {
    // The SGD trainer is NOT driver-registered (boundary floats have no
    // engine-independent oracle; the OVA semantics are driver-gated via
    // the hash-matched m_svm_fixedpoint twin); this spec is the SGD
    // path's declared backstop: the SAME query at the SAME scale must
    // produce a complete, seeded-stable confusion matrix with per-class
    // marginals in a tolerance band, not just rows > 0.
    val emb10 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cm = graft.ml.Classify.trainPredictCounts(emb10)
      .select($"label".cast("long"), $"prediction".cast("long"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val labels = emb10.select($"label").distinct().as[Long].collect().toSet
    // all cells reference real classes; totals cover the whole test split
    assert(cm.forall { case (l, p, _) => labels.contains(l) && labels.contains(p) })
    val total = cm.map(_._3).sum
    val (_, te) = graft.ml.Classify.split(graft.ml.Classify.toFeatures(emb10, "embedding"))
    assert(total == te.count(), "every test row classified exactly once")
    // per-class true marginals: the seeded split keeps classes balanced
    // within a generous band of the uniform share
    val byLabel = cm.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val uniform = total.toDouble / labels.size
    byLabel.foreach { case (l, n) =>
      assert(n > uniform * 0.5 && n < uniform * 2.0,
        s"class $l test share $n far from uniform $uniform")
    }
    // the learner beats the majority baseline on aggregate (the labels
    // carry no generalizable signal, so the bar is chance-level bands,
    // not high accuracy): no predicted class may absorb the matrix
    val byPred = cm.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    assert(byPred.values.max < total * 0.5,
      s"one class absorbs ${byPred.values.max} of $total predictions")
  }

  test("ml: fixed-point trainer — coverage, determinism across partitionings, guard trips") {
    import graft.ml.Classify
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cm = Classify.fixedPointConfusion(emb)
      .select($"label".cast("long"), $"pred".cast("long"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // every test row classified exactly once
    val nTest = emb.where(graft.text.TextOps.hashBucket($"vec_id", 10) === 9).count()
    assert(cm.map(_._3).sum == nTest && cm.nonEmpty)
    // bit-determinism under a different physical partitioning (the
    // closed-form moments are exact integers — no fold-order wiggle)
    val cm2 = Classify.fixedPointConfusion(emb.repartition(13))
      .select($"label".cast("long"), $"pred".cast("long"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(cm == cm2)
    // degenerate-feature guard: constant embeddings have zero variance
    // on every Walsh projection
    val flat = spark.range(40).select($"id".as("vec_id"),
      typedLit(Seq.fill(64)(0.5f)).as("embedding"), lit(0).as("label"))
    val e = intercept[Exception](Classify.fixedPointConfusion(flat))
    assert(e.getMessage.contains("zero train variance"))
  }

  test("ml: OVA LinearSVC fits the training set beyond majority baseline") {
    // The synthetic labels carry no generalizable signal (test acc ==
    // chance for every model family), so the meaningful check is that
    // the optimizer actually learns: train accuracy >> majority class.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val data = graft.ml.Classify.toFeatures(emb, "embedding")
    val (tr, _) = graft.ml.Classify.split(data)
    val model = graft.ml.Classify.train(tr)
    val (_, acc) = graft.ml.Classify.evaluate(model, tr)
    val majority = tr.groupBy($"label").count().agg(max($"count")).head().getLong(0).toDouble /
      tr.count()
    assert(acc > majority * 2, s"train accuracy $acc should far exceed majority baseline $majority")
  }

  test("ml: model save/load round-trip predicts identically") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(100)
    val data = graft.ml.Classify.toFeatures(emb, "embedding")
    val model = graft.ml.Classify.train(data)
    val path = java.nio.file.Files.createTempDirectory("graft_model").toString + "/m"
    graft.ml.Classify.save(model, path)
    val loaded = graft.ml.Classify.load(path)
    val p1 = model.transform(data).select($"prediction").as[Double].collect().toSeq
    val p2 = loaded.transform(data).select($"prediction").as[Double].collect().toSeq
    assert(p1 == p2)
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has unique name and every oracle has a query") {
    val q = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(q.keySet))
    assert(q.nonEmpty)
  }
}
