package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema, determinism, and batch-shape checks for
  * the stubbed decoder (the codec-independent contract). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def media = Multimodal.asMediaTable(
    Tables(spark, TestSpark.sf, "documents"))

  test("media table carries typed metadata and opaque payload") {
    val m = media
    assert(m.schema.fieldNames.toSet ===
      Set("doc_id", "media_type", "content", "width", "height", "sample_rate"))
    val types = m.select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types === Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and dimension-stable") {
    val f1 = Multimodal.extractFeatures(media, dim = 8).toDF()
      .select("doc_id", "checksum", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2))).sortBy(_._1)
    val f2 = Multimodal.extractFeatures(media, dim = 8).toDF()
      .select("doc_id", "checksum", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2))).sortBy(_._1)
    assert(f1.map(_._2).toSeq === f2.map(_._2).toSeq)
    assert(f1.zip(f2).forall { case (a, b) => a._3 == b._3 })
    assert(f1.forall(_._3.length === 8))
  }

  test("byte metadata matches the source text (ASCII payload)") {
    val feats = Multimodal.extractFeatures(media).toDF()
    val joined = feats.join(
      Tables(spark, TestSpark.sf, "documents"), Seq("doc_id"))
    val bad = joined.filter(col("byte_len") =!= length(col("text"))).count()
    assert(bad === 0)
  }

  test("real GIF video: payloads are genuine GIF89a containers; the " +
      "decoded frame count, sampled frames, and per-frame pixels all " +
      "equal the analytic formula (lossless 8-color palette)") {
    val docs = Tables(spark, TestSpark.sf, "documents")
      .filter(col("doc_id") < 40)
    val vids = Multimodal.videoTable(docs)
    val payloads = vids.collect()
    assert(payloads.nonEmpty)
    // genuine GIF89a magic on every payload
    assert(payloads.forall { v =>
      new String(v.content.take(6), "US-ASCII") == "GIF89a"
    })
    val frames = Multimodal.sampleVideoFrames(vids, stride = 2).collect()
    // every doc: frame count from the REAL container, stride-2 sampling
    payloads.foreach { v =>
      val nF = Multimodal.synthFrameCount(v.doc_id)
      val mine = frames.filter(_.doc_id == v.doc_id).sortBy(_.frame_idx)
      assert(mine.map(_.frame_idx).toSeq === (0 until nF by 2).toSeq)
      assert(mine.forall(_.n_frames == nF))
    }
    // decoded pixels equal the palette-index formula (GIF lossless)
    assert(frames.forall { f =>
      val (w, h) = Multimodal.synthDims(f.doc_id)
      var sr = 0L; var crc = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val i = Multimodal.synthFramePixel(f.doc_id, f.frame_idx, x, y)
        val (r, g, b) = (36 * i, 28 * i, 20 * i)
        sr += r
        crc = (crc * 131 + ((r << 16) | (g << 8) | b)) % 1000000007L
      }
      f.width == w && f.height == h && f.sum_r == sr &&
        f.pix_checksum == crc
    })
  }

  private def docs50 = Tables(spark, TestSpark.sf, "documents")
    .filter(col("doc_id") < 50)

  test("real PNG roundtrip: payloads are genuine PNGs and decoded " +
      "stats equal the analytic pixel formula") {
    val imgs = Multimodal.imageTable(docs50)
    // Genuine PNG magic bytes on every payload.
    val magics = imgs.collect()
    assert(magics.nonEmpty)
    assert(magics.forall { im =>
      val b = im.content
      (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    })
    val feats = Multimodal.decodeImages(imgs).collect()
    assert(feats.forall { f =>
      val (w, h) = Multimodal.synthDims(f.doc_id)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.synthPixel(f.doc_id, x, y)
        sr += r; sg += g; sb += b
      }
      f.width == w && f.height == h &&
        f.sum_r == sr && f.sum_g == sg && f.sum_b == sb
    })
  }

  test("real resize re-encodes and re-decodes losslessly") {
    val out = Multimodal.resizeImages(Multimodal.imageTable(docs50),
      factor = 2).collect()
    assert(out.length === 50)
    assert(out.forall(_.roundtrip_ok))
    assert(out.forall(_.png_len > 0))
    assert(out.forall { t =>
      val (w, h) = Multimodal.synthDims(t.doc_id)
      t.out_w == w / 2 && t.out_h == h / 2
    })
  }

  test("unknown image format falls back (no crash, flagged dims)") {
    import spark.implicits._
    val junk = Seq(
      Multimodal.ImageItem(1L, Array[Byte](1, 2, 3, 4, 5))).toDS()
    val f = Multimodal.decodeImages(junk).collect()
    assert(f.length === 1 && f.head.width === -1 && f.head.height === -1)
  }

  test("real WAV roundtrip: genuine RIFF header, parsed rate and " +
      "frame count, decoded samples equal the synthetic waveform") {
    val wavs = Multimodal.audioTable(docs50)
    val raw = wavs.collect()
    assert(raw.forall { a =>
      val b = a.content
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    })
    val feats = Multimodal.decodeAudio(wavs).collect()
    assert(feats.forall { f =>
      val n = Multimodal.synthSampleCount(f.doc_id)
      val samples = (0 until n).map(i => Multimodal.synthSample(f.doc_id, i))
      f.sample_rate == 8000 && f.n_samples == n &&
        f.min_amp == samples.min && f.max_amp == samples.max &&
        f.sum_sq == samples.map(s => s.toLong * s).sum
    })
  }
}
