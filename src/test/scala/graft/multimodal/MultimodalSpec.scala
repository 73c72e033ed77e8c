package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(
    graft.Tables.documents(spark, TestSpark.sf).limit(60), "doc_id", "text").cache()

  test("media schema: opaque binary payload + typed metadata struct") {
    val schema = media.toDF().schema
    assert(schema("payload").dataType === BinaryType)
    val meta = schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq ===
      Seq("media_type", "width", "height", "sample_rate", "duration_ms", "codec"))
    assert(media.count() === 60)
  }

  test("feature extraction: fixed dim, deterministic, batch-shaped") {
    val f1 = Multimodal.extractFeatures(media, dim = 32, batchSize = 7)
    val f2 = Multimodal.extractFeatures(media, dim = 32, batchSize = 64)
    assert(f1.toDF().schema("features").dataType === ArrayType(FloatType, containsNull = false))
    val a = f1.collect().map(r => r.media_id -> r.features.toSeq).toMap
    val b = f2.collect().map(r => r.media_id -> r.features.toSeq).toMap
    assert(a == b, "batch size must not change results")
    assert(a.values.forall(_.length == 32))
  }

  test("resize updates metadata for visual media only") {
    val resized = Multimodal.resize(media, 224, 224).collect()
    resized.foreach { r =>
      if (r.meta.media_type == "audio") assert(r.meta.width === 0)
      else { assert(r.meta.width === 224); assert(r.meta.height === 224) }
      assert(r.payload.nonEmpty)
    }
  }

  test("frame sampling: n frames per video row, generator shape") {
    val frames = Multimodal.sampleFrames(media, 4)
    val perVideo = frames.groupByKey(_.media_id).count().collect().toMap
    val nVideos = media.filter(_.meta.media_type == "video").count()
    assert(perVideo.size.toLong === nVideos)
    assert(perVideo.values.forall(_ == 4))
    val idx = frames.filter(_.media_id == perVideo.keys.head)
      .collect().map(_.frame_idx).sorted
    assert(idx.toSeq === Seq(0, 1, 2, 3))
  }

  test("features join back to relational side without shuffling payloads") {
    val feats = Multimodal.extractFeatures(media, dim = 16)
    val joined = feats.toDF().join(
      graft.Tables.documents(spark, TestSpark.sf).limit(60),
      col("media_id") === col("doc_id"))
    assert(joined.count() === 60)
    assert(!joined.columns.contains("payload"))
  }
}
