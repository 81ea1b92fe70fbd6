package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time per
  * partition. The container has no media codecs, so `decodeStub` is a
  * DETERMINISTIC FAKE decoder (clearly marked); everything around it —
  * the schema, the partition-wise batch shape, the feature-vector
  * contract, frame sampling — is the real plumbing a codec would drop
  * into.
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

  /** ===== STUB ===== deterministic fake "resize" for image payloads:
    * the thumbnail is a fixed-size prefix crop of the payload and the
    * metadata is scaled by the factor — a real deployment replaces the
    * crop with the codec's decode→scale→encode. The partition-wise
    * batch loop, the typed output schema, and the
    * small-feature-table-out contract are the real plumbing. */
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

  /** Frame sampling for "video" payloads: every `stride`-th chunk of
    * `frameLen` bytes becomes one frame row (explode keeps it narrow). */
  def sampleFrames(media: Dataset[MediaItem], frameLen: Int = 64,
      stride: Int = 4): DataFrame = {
    val m = media.toDF()
    m.filter(col("media_type") === "video")
      .select(col("doc_id"),
        posexplode(sequence(lit(0),
          greatest((length(col("content")) / (frameLen * stride))
            .cast(IntegerType) - 1, lit(0)))))
      .select(col("doc_id"), col("pos").as("frame_idx"))
  }
}
