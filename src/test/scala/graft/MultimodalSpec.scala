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

  test("frame sampling yields at least one frame per video payload") {
    val frames = Multimodal.sampleFrames(media)
      .groupBy("doc_id").count()
    val videos = media.filter(col("media_type") === "video")
    assert(frames.count() === videos.count())
    assert(frames.filter(col("count") < 1).count() === 0)
  }
}
