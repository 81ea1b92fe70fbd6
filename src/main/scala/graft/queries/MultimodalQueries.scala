package graft.queries

import graft.{GraftQuery, QueryModule, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing surface: binary payload metadata is exact and
  * oracle-checkable (ASCII text bytes ≙ chars, so DuckDB can recompute
  * byte_len/first/last/checksum); the stubbed decode embedding is
  * rows-only + MultimodalSpec. */
object MultimodalQueries extends QueryModule {

  private def media(s: SparkSession, dir: String) =
    Multimodal.asMediaTable(Tables(s, dir, "documents"))

  /** Binary metadata + deterministic checksum over payload bytes. */
  private val meta = GraftQuery(
    "mm_binary_metadata",
    (s, dir) =>
      Multimodal.extractFeatures(media(s, dir)).toDF()
        .select(col("doc_id"), col("media_type"), col("byte_len"),
          col("first_byte"), col("last_byte"), col("checksum"))
        .filter(col("doc_id") < 100)
        .orderBy(col("doc_id")),
    Some("""WITH payload AS (
        SELECT doc_id,
          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
          text FROM documents WHERE doc_id < 100)
      SELECT doc_id, media_type,
        length(text) AS byte_len,
        ascii(substring(text, 1, 1)) AS first_byte,
        ascii(substring(text, length(text), 1)) AS last_byte,
        list_reduce(list_transform(range(1, length(text) + 1),
          i -> CAST(ascii(text[i]) AS BIGINT)),
          (acc, b) -> (acc * 131 + b) % 1000000007) AS checksum
      FROM payload ORDER BY doc_id"""))

  /** Per-type feature aggregates over the STUBBED decode vectors.
    * Every emitted column is deterministic plumbing (counts, payload
    * bytes, fixed dim-8 vector length), so DuckDB recomputes it exactly
    * from the documents table; per-value embedding invariants stay in
    * MultimodalSpec. */
  private val features = GraftQuery(
    "mm_feature_extract",
    (s, dir) =>
      Multimodal.extractFeatures(media(s, dir)).toDF()
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("byte_len")).as("total_bytes"),
          avg(size(col("embedding"))).as("avg_dim"))
        .orderBy(col("media_type")),
    Some("""SELECT
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
          WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        COUNT(*) AS n_items,
        CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
        CAST(8.0 AS DOUBLE) AS avg_dim
      FROM documents GROUP BY 1 ORDER BY 1"""))

  /** Frame sampling row counts per video payload. */
  private val frames = GraftQuery(
    "mm_frame_sample",
    (s, dir) =>
      Multimodal.sampleFrames(media(s, dir))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
        GREATEST(length(text) // 256 - 1, 0) + 1 AS n_frames
      FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id"""))

  /** Resize stub for image payloads: prefix-crop thumbnail + scaled
    * metadata, exact-oracled via the ASCII char≙byte equivalence
    * (md5 of the cropped chars ≡ md5 of the cropped bytes). */
  private val resize = GraftQuery(
    "mm_resize_stub",
    (s, dir) =>
      Multimodal.resizeStub(media(s, dir)).toDF()
        .filter(col("doc_id") < 100)
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
        CAST((n_chars % 640) // 4 AS INT) AS out_w,
        CAST((n_chars % 480) // 4 AS INT) AS out_h,
        CAST(LEAST(length(text), 48) AS INT) AS thumb_len,
        md5(substring(text, 1, 48)) AS thumb_md5
      FROM documents WHERE doc_id % 3 = 0 AND doc_id < 100
      ORDER BY doc_id"""))

  override val queries: Seq[GraftQuery] = Seq(meta, features, frames, resize)
}
