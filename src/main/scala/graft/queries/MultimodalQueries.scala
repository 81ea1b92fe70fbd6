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

  /** REAL frame sampling: each payload is a genuine multi-frame GIF;
    * the sampled-frame count per doc comes from the decoded container
    * (stride 2 over the real frame count), not byte math. */
  private val frames = GraftQuery(
    "mm_frame_sample",
    (s, dir) =>
      Multimodal.sampleVideoFrames(Multimodal.videoTable(
          Tables(s, dir, "documents").filter(col("doc_id") < 150))).toDF()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"),
          max(col("n_frames")).cast("int").as("n_frames"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
        (CAST(3 + doc_id % 4 AS BIGINT) + 1) // 2 AS n_sampled,
        CAST(3 + doc_id % 4 AS INT) AS n_frames
      FROM documents WHERE doc_id < 150 ORDER BY doc_id"""))

  /** REAL video decode (javax.imageio multi-frame GIF): genuine
    * animated-GIF payloads whose frames use an explicit 8-color
    * palette (lossless); Spark opens the actual container, reads the
    * frame count, decodes every 2nd frame and checksums its pixels;
    * the oracle — which cannot decode GIF — recomputes every decoded
    * statistic analytically from the palette-index formula. */
  private val videoFrames = GraftQuery(
    "mm_video_frames",
    (s, dir) =>
      Multimodal.sampleVideoFrames(Multimodal.videoTable(
          Tables(s, dir, "documents").filter(col("doc_id") < 100))).toDF()
        .orderBy(col("doc_id"), col("frame_idx")),
    Some("""WITH v AS (
        SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
               CAST(8 + doc_id % 7 AS INT) AS h,
               CAST(3 + doc_id % 4 AS INT) AS nf
        FROM documents WHERE doc_id < 100),
      f AS (
        SELECT doc_id, w, h, nf, unnest(range(0, nf, 2)) AS fi FROM v)
      SELECT doc_id, CAST(fi AS INT) AS frame_idx, nf AS n_frames,
        w AS width, h AS height,
        CAST(list_sum(list_transform(range(w*h),
          i -> (((i % w) * 3 + (i // w) * 5 + fi * 7 + doc_id * 11) % 8)
               * 36)) AS BIGINT) AS sum_r,
        CAST(list_sum(list_transform(range(w*h),
          i -> (((i % w) * 3 + (i // w) * 5 + fi * 7 + doc_id * 11) % 8)
               * 28)) AS BIGINT) AS sum_g,
        CAST(list_sum(list_transform(range(w*h),
          i -> (((i % w) * 3 + (i // w) * 5 + fi * 7 + doc_id * 11) % 8)
               * 20)) AS BIGINT) AS sum_b,
        list_reduce(list_transform(range(w*h),
          i -> (((i % w) * 3 + (i // w) * 5 + fi * 7 + doc_id * 11) % 8)
                 * 36 * 65536
             + (((i % w) * 3 + (i // w) * 5 + fi * 7 + doc_id * 11) % 8)
                 * 28 * 256
             + (((i % w) * 3 + (i // w) * 5 + fi * 7 + doc_id * 11) % 8)
                 * 20),
          (acc, p) -> (acc * 131 + p) % 1000000007) AS pix_checksum
      FROM f ORDER BY doc_id, frame_idx"""))

  /** REAL image decode (javax.imageio): each payload is a genuine PNG
    * rendered from pixels that are a pure function of (doc_id, x, y).
    * Spark decodes the actual PNG bytes; the oracle — which cannot
    * decode PNG — recomputes every decoded statistic analytically from
    * the pixel formula. PNG is lossless, so a value-level match proves
    * the real encode→decode roundtrip end-to-end. */
  private val imageDecode = GraftQuery(
    "mm_image_decode",
    (s, dir) =>
      Multimodal.decodeImages(Multimodal.imageTable(
          Tables(s, dir, "documents").filter(col("doc_id") < 120))).toDF()
        .orderBy(col("doc_id")),
    Some("""WITH dims AS (
        SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
               CAST(8 + doc_id % 7 AS INT) AS h
        FROM documents WHERE doc_id < 120)
      SELECT doc_id, w AS width, h AS height,
        CAST(list_sum(list_transform(range(w*h),
          i -> ((i % w) * 7 + (i // w) * 13 + doc_id * 31) % 256))
          AS BIGINT) AS sum_r,
        CAST(list_sum(list_transform(range(w*h),
          i -> ((i % w) * 3 + (i // w) * 5 + doc_id * 17) % 256))
          AS BIGINT) AS sum_g,
        CAST(list_sum(list_transform(range(w*h),
          i -> ((i % w) * 11 + (i // w) * 2 + doc_id * 23) % 256))
          AS BIGINT) AS sum_b,
        list_reduce(list_transform(range(w*h),
          i -> (((i % w) * 7 + (i // w) * 13 + doc_id * 31) % 256) * 65536
             + (((i % w) * 3 + (i // w) * 5 + doc_id * 17) % 256) * 256
             + (((i % w) * 11 + (i // w) * 2 + doc_id * 23) % 256)),
          (acc, v) -> (acc * 131 + v) % 1000000007) AS pix_checksum
      FROM dims ORDER BY doc_id"""))

  /** REAL image resize: decode the PNG → nearest-neighbor downscale by
    * 2 → RE-ENCODE to PNG → RE-DECODE → checksum the re-decoded
    * pixels. The checksum column therefore crosses the real encoder
    * and decoder twice; roundtrip_ok pins lossless fidelity. */
  private val imageResize = GraftQuery(
    "mm_image_resize",
    (s, dir) =>
      Multimodal.resizeImages(Multimodal.imageTable(
          Tables(s, dir, "documents").filter(col("doc_id") < 120))).toDF()
        .select(col("doc_id"), col("out_w"), col("out_h"),
          col("pix_checksum"), col("roundtrip_ok"))
        .orderBy(col("doc_id")),
    Some("""WITH dims AS (
        SELECT doc_id, CAST((8 + doc_id % 9) // 2 AS INT) AS ow,
               CAST((8 + doc_id % 7) // 2 AS INT) AS oh
        FROM documents WHERE doc_id < 120)
      SELECT doc_id, ow AS out_w, oh AS out_h,
        list_reduce(list_transform(range(ow*oh),
          i -> ((2*(i % ow) * 7 + 2*(i // ow) * 13 + doc_id * 31) % 256)
                 * 65536
             + ((2*(i % ow) * 3 + 2*(i // ow) * 5 + doc_id * 17) % 256)
                 * 256
             + ((2*(i % ow) * 11 + 2*(i // ow) * 2 + doc_id * 23) % 256)),
          (acc, v) -> (acc * 131 + v) % 1000000007) AS pix_checksum,
        TRUE AS roundtrip_ok
      FROM dims ORDER BY doc_id"""))

  /** REAL audio decode (javax.sound.sampled): genuine RIFF/WAVE
    * payloads of a synthetic integer waveform; Spark parses the actual
    * header (rate, frame count) and decodes the PCM; the oracle
    * recomputes the waveform statistics analytically. */
  private val audioDecode = GraftQuery(
    "mm_audio_decode",
    (s, dir) =>
      Multimodal.decodeAudio(Multimodal.audioTable(
          Tables(s, dir, "documents").filter(col("doc_id") < 150))).toDF()
        .orderBy(col("doc_id")),
    Some("""WITH a AS (
        SELECT doc_id, CAST(400 + (doc_id % 5) * 40 AS BIGINT) AS n,
          list_transform(range(400 + (doc_id % 5) * 40),
            i -> (i * (3 + doc_id % 5) + doc_id) % 2001 - 1000) AS s
        FROM documents WHERE doc_id < 150)
      SELECT doc_id, CAST(8000 AS INT) AS sample_rate, n AS n_samples,
        CAST(list_min(s) AS INT) AS min_amp,
        CAST(list_max(s) AS INT) AS max_amp,
        CAST(list_sum(list_transform(s, v -> v*v)) AS BIGINT) AS sum_sq
      FROM a ORDER BY doc_id"""))

  override val queries: Seq[GraftQuery] =
    Seq(meta, features, frames, imageDecode, imageResize, audioDecode,
      videoFrames)
}
