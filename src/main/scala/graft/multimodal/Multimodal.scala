package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time per
  * partition.
  *
  * The image, audio AND video paths are REAL codecs — `javax.imageio`
  * (PNG/JPEG/BMP, multi-frame GIF for video) and `javax.sound.sampled`
  * (WAV/PCM), all JDK-builtin: payloads are genuinely encoded,
  * decoded, resized/frame-sampled and re-encoded inside the
  * partition-wise batch loop. `decodeStub` remains as the documented
  * FALLBACK for formats the JDK cannot decode (e.g. H.264), keeping
  * the pipeline total.
  *
  * Scale: content bytes never pass through a shuffle wider than their
  * partition; feature extraction is mapPartitions (one JVM-local pass,
  * no per-row setup cost — the same batch shape Pandas-UDF pipelines
  * use), and downstream analytics join on doc_id against the small
  * feature table, not the blobs.
  */
object Multimodal {

  final case class MediaItem(
      doc_id: Long,
      media_type: String,        // image | audio | video
      content: Array[Byte],      // opaque payload
      width: Int, height: Int,   // typed metadata
      sample_rate: Int)

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Int,
      first_byte: Int,
      last_byte: Int,
      checksum: Long,            // deterministic rolling checksum
      embedding: Array[Float])   // stubbed "decoded" feature vector

  /** Wrap the documents table as a media table: text bytes stand in for
    * the opaque payload (deterministic across engines). */
  def asMediaTable(docs: DataFrame): Dataset[MediaItem] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("media_type"),
        encode(col("text"), "UTF-8").as("content"),
        (col("n_chars") % 640).cast(IntegerType).as("width"),
        (col("n_chars") % 480).cast(IntegerType).as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaItem]
  }

  /** ===== STUB ===== deterministic fake "decode": a real deployment
    * replaces this body with the codec call (e.g. JNI/FFI decode of the
    * payload). Signature and batch shape are the real contract. */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(i % dim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    out(0) = (h & 0xFFFF) / 65536.0f // mix the rolling hash in
    out
  }

  /** Partition-wise feature extraction — the mapInPandas-equivalent
    * batch loop in Scala. */
  def extractFeatures(media: Dataset[MediaItem], dim: Int = 8)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val b = m.content
        var crc = 0L
        var i = 0
        while (i < b.length) { crc = (crc * 131 + (b(i) & 0xFF)) % 1000000007L; i += 1 }
        MediaFeatures(
          m.doc_id, m.media_type, b.length,
          if (b.isEmpty) -1 else b(0) & 0xFF,
          if (b.isEmpty) -1 else b(b.length - 1) & 0xFF,
          crc,
          decodeStub(b, dim))
      }
    }
  }

  final case class Thumb(
      doc_id: Long,
      out_w: Int, out_h: Int,    // scaled metadata
      thumb_len: Int,
      thumb_md5: String)         // content hash of the resized payload

  /** ===== FALLBACK ===== deterministic fake "resize" for payloads in
    * formats the JDK cannot decode (the REAL image path is
    * [[resizeImages]] — javax.imageio decode→scale→re-encode): the
    * thumbnail is a fixed-size prefix crop of the payload and the
    * metadata is scaled by the factor. Same partition-wise batch loop,
    * typed output schema, and small-feature-table-out contract. */
  def resizeStub(media: Dataset[MediaItem], factor: Int = 4,
      thumbBytes: Int = 48): Dataset[Thumb] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "image").mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val thumb = m.content.take(thumbBytes)
        md.reset()
        val hex = md.digest(thumb).map("%02x".format(_)).mkString
        Thumb(m.doc_id, m.width / factor, m.height / factor,
          thumb.length, hex)
      }
    }
  }

  // ===================================================================
  // REAL image codec path (javax.imageio — JDK builtin; PNG is
  // lossless, so a synthetic image whose pixels are a pure function of
  // (doc_id, x, y) survives encode→decode bit-exactly and every
  // decoded statistic is analytically recomputable by an engine that
  // cannot decode PNG at all — that is how the DuckDB oracle checks
  // this REAL codec roundtrip end-to-end).
  // ===================================================================

  /** Deterministic synthetic pixel: channel values are pure functions
    * of (doc_id, x, y) — the analytic ground truth for the codec
    * roundtrip. */
  @inline def synthPixel(docId: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((x * 7 + y * 13 + docId * 31) % 256).toInt,
    ((x * 3 + y * 5 + docId * 17) % 256).toInt,
    ((x * 11 + y * 2 + docId * 23) % 256).toInt)

  @inline def synthDims(docId: Long): (Int, Int) =
    (8 + (docId % 9).toInt, 8 + (docId % 7).toInt)

  /** REAL PNG payload for a doc id: render the synthetic pixels into a
    * BufferedImage and encode with ImageIO — a genuine PNG byte
    * stream, not a fake. */
  def synthPng(docId: Long): Array[Byte] = {
    val (w, h) = synthDims(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = synthPixel(docId, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false) // in-memory, no tmp files
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  final case class ImageItem(doc_id: Long, content: Array[Byte])

  final case class ImageFeatures(
      doc_id: Long,
      width: Int, height: Int,   // REAL decoded dimensions
      sum_r: Long, sum_g: Long, sum_b: Long, // channel sums over pixels
      pix_checksum: Long)        // rolling hash over row-major pixels

  final case class ResizedImage(
      doc_id: Long,
      out_w: Int, out_h: Int,    // dimensions of the re-decoded thumb
      png_len: Int,              // re-encoded PNG byte length (>0)
      pix_checksum: Long,        // rolling hash over re-DECODED pixels
      roundtrip_ok: Boolean)     // re-decoded pixels == picked pixels

  private val ChecksumP = 1000000007L

  @inline private def pixChecksum(acc: Long, r: Int, g: Int, b: Int): Long =
    (acc * 131 + ((r << 16) | (g << 8) | b)) % ChecksumP

  /** Image fixture: one REAL PNG per document id. */
  def imageTable(docs: DataFrame): Dataset[ImageItem] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => ImageItem(id, synthPng(id))))
  }

  /** REAL decode: ImageIO.read each payload, emit decoded dimensions,
    * per-channel sums, and a rolling pixel checksum. Unknown formats
    * (ImageIO.read → null) fall back to [[decodeStub]]-style features
    * with width = height = -1, keeping the pipeline total. */
  def decodeImages(images: Dataset[ImageItem]): Dataset[ImageFeatures] = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { im =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(im.content))
        if (img == null) {
          // FALLBACK: non-decodable payload → stub features, flagged
          // by the impossible dimensions.
          val f = decodeStub(im.content, 3)
          ImageFeatures(im.doc_id, -1, -1,
            (f(0) * 255).toLong, (f(1) * 255).toLong, (f(2) * 255).toLong, -1L)
        } else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L; var crc = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF
              val b = p & 0xFF
              sr += r; sg += g; sb += b
              crc = pixChecksum(crc, r, g, b)
              x += 1
            }
            y += 1
          }
          ImageFeatures(im.doc_id, w, h, sr, sg, sb, crc)
        }
      }
    }
  }

  /** REAL resize: decode → nearest-neighbor downscale (out(x,y) =
    * in(x*factor, y*factor) — deterministic, unlike Graphics2D
    * filtering) → RE-ENCODE to PNG → RE-DECODE the new PNG and
    * checksum its pixels. The emitted checksum therefore crosses the
    * encoder AND decoder a second time; `roundtrip_ok` pins that the
    * re-decoded thumb matches the picked pixels exactly (PNG is
    * lossless). Non-decodable payloads are dropped (filter, not
    * crash). */
  def resizeImages(images: Dataset[ImageItem], factor: Int = 2)
      : Dataset[ResizedImage] = {
    import images.sparkSession.implicits._
    require(factor >= 1, s"factor must be >= 1: $factor")
    images.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { im =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(im.content))
        if (img == null) None
        else {
          val ow = math.max(img.getWidth / factor, 1)
          val oh = math.max(img.getHeight / factor, 1)
          val out = new java.awt.image.BufferedImage(
            ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              out.setRGB(x, y, img.getRGB(x * factor, y * factor))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          val png = bos.toByteArray
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          var crc = 0L; var ok = back.getWidth == ow && back.getHeight == oh
          y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              val p = back.getRGB(x, y)
              ok &&= p == out.getRGB(x, y)
              crc = pixChecksum(crc, (p >> 16) & 0xFF, (p >> 8) & 0xFF,
                p & 0xFF)
              x += 1
            }
            y += 1
          }
          Some(ResizedImage(im.doc_id, ow, oh, png.length, crc, ok))
        }
      }
    }
  }

  // ===================================================================
  // REAL audio codec path (javax.sound.sampled — JDK builtin WAV).
  // Synthetic integer waveform (pure function of doc_id and sample
  // index; no float trig, so the oracle recomputes it exactly) →
  // genuine RIFF/WAVE encode via AudioSystem.write → genuine parse +
  // PCM decode via AudioSystem.getAudioInputStream.
  // ===================================================================

  final case class AudioItem(doc_id: Long, content: Array[Byte])

  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int, n_samples: Long, // from the REAL parsed header
      min_amp: Int, max_amp: Int,
      sum_sq: Long)                      // energy over decoded samples

  @inline def synthSample(docId: Long, i: Int): Int =
    (((i.toLong * (3 + docId % 5) + docId) % 2001) - 1000).toInt

  @inline def synthSampleCount(docId: Long): Int =
    400 + (docId % 5).toInt * 40

  /** REAL WAV payload: 16-bit mono little-endian PCM of the synthetic
    * waveform, wrapped in a genuine RIFF header by AudioSystem. */
  def synthWav(docId: Long, sampleRate: Int = 8000): Array[Byte] = {
    val n = synthSampleCount(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = synthSample(docId, i)
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // signed, little-endian
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Audio fixture: one REAL WAV per document id. */
  def audioTable(docs: DataFrame): Dataset[AudioItem] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => AudioItem(id, synthWav(id))))
  }

  /** REAL WAV parse + PCM decode: header gives rate/frame count, the
    * stream gives the samples; min/max/energy come from the decoded
    * values. */
  def decodeAudio(audio: Dataset[AudioItem]): Dataset[AudioFeatures] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { it =>
      it.map { a =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.content))
        val fmt = ais.getFormat
        val n = ais.getFrameLength
        val bytes = ais.readAllBytes()
        var mn = Int.MaxValue; var mx = Int.MinValue; var ss = 0L
        var i = 0
        while (i + 1 < bytes.length) {
          val s = ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort.toInt
          if (s < mn) mn = s
          if (s > mx) mx = s
          ss += s.toLong * s
          i += 2
        }
        AudioFeatures(a.doc_id, fmt.getSampleRate.toInt, n, mn, mx, ss)
      }
    }
  }

  // ===================================================================
  // REAL video path (animated GIF via javax.imageio — the JDK's one
  // multi-frame container; reference: the video/frame-sampling stage a
  // training-data pipeline runs before vision encoders). Frames carry
  // an EXPLICIT 8-color palette (TYPE_BYTE_INDEXED + IndexColorModel),
  // so GIF's 256-color limit is never hit and encode→decode is
  // LOSSLESS; each frame's palette index is a pure function of
  // (doc_id, frame, x, y), so every decoded statistic is analytically
  // recomputable by an oracle that cannot decode GIF at all.
  // ===================================================================

  /** 8-color palette: index i → (36i, 28i, 20i). Multipliers < 256/7
    * keep each channel in range without a mod, so the oracle's SQL
    * recompute is a plain product. */
  private val PaletteR = Array.tabulate(8)(i => (36 * i).toByte)
  private val PaletteG = Array.tabulate(8)(i => (28 * i).toByte)
  private val PaletteB = Array.tabulate(8)(i => (20 * i).toByte)

  /** Palette index of a synthetic video pixel — the analytic ground
    * truth for the GIF codec roundtrip. */
  @inline def synthFramePixel(docId: Long, frame: Int, x: Int, y: Int): Int =
    ((x * 3 + y * 5 + frame * 7 + docId * 11) % 8).toInt

  @inline def synthFrameCount(docId: Long): Int = 3 + (docId % 4).toInt

  /** REAL animated-GIF payload: render every synthetic frame into an
    * indexed-color BufferedImage and write the sequence with the JDK
    * GIF ImageWriter — a genuine multi-frame GIF89a byte stream. */
  def synthGif(docId: Long): Array[Byte] = {
    val (w, h) = synthDims(docId)
    val nF = synthFrameCount(docId)
    val cm = new java.awt.image.IndexColorModel(
      8, 8, PaletteR, PaletteG, PaletteB)
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nF) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, synthFramePixel(docId, f, x, y))
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  final case class VideoItem(doc_id: Long, content: Array[Byte])

  final case class VideoFrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      n_frames: Int,             // from the REAL container (frame count)
      width: Int, height: Int,   // REAL decoded frame dimensions
      sum_r: Long, sum_g: Long, sum_b: Long,
      pix_checksum: Long)        // rolling hash over decoded RGB pixels

  /** Video fixture: one REAL animated GIF per document id. */
  def videoTable(docs: DataFrame): Dataset[VideoItem] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => VideoItem(id, synthGif(id))))
  }

  /** REAL frame sampling + decode: open the GIF container, read the
    * frame count from the stream, decode every `stride`-th frame, and
    * emit per-frame channel sums + a pixel checksum. Blobs never cross
    * a shuffle — one partition-local pass, small feature rows out. */
  def sampleVideoFrames(videos: Dataset[VideoItem], stride: Int = 2)
      : Dataset[VideoFrameFeatures] = {
    import videos.sparkSession.implicits._
    require(stride >= 1, s"stride must be >= 1: $stride")
    videos.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { v =>
        val reader =
          javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        try {
          reader.setInput(javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(v.content)))
          val n = reader.getNumImages(true)
          (0 until n by stride).map { f =>
            val img = reader.read(f)
            val w = img.getWidth; val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L; var crc = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF
                val b = p & 0xFF
                sr += r; sg += g; sb += b
                crc = pixChecksum(crc, r, g, b)
                x += 1
              }
              y += 1
            }
            VideoFrameFeatures(v.doc_id, f, n, w, h, sr, sg, sb, crc)
          }
        } finally reader.dispose()
      }
    }
  }
}
