package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` payloads
  * plus a typed metadata struct, with decode / feature-extract / resize /
  * frame-sample stages as batch-shaped `mapPartitions` transforms.
  *
  * The decode kernels are DETERMINISTIC STUBS — this container ships no
  * image/audio codecs — but everything Spark-side is real and tested:
  * schema, encoders, partition-preserving batch iteration (the Scala
  * analogue of `mapInPandas` arrow-batch shape), and the metadata
  * contract. Swapping a stub for a JNI/codec call changes one function.
  *
  * Scale design: payloads stay opaque binary all the way through —
  * never parsed by Catalyst, never shuffled unless an op explicitly
  * repartitions; feature extraction emits small fixed-width vectors so
  * downstream joins/aggs shuffle features, not media bytes.
  */
object Multimodal {

  final case class MediaMeta(
      media_type: String,      // "image" | "audio" | "video"
      width: Int, height: Int, // image/video
      sample_rate: Int,        // audio
      duration_ms: Long,       // audio/video
      codec: String)

  final case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(media_id: Long, features: Array[Float],
                                 meta: MediaMeta)

  final case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic fake corpus: wraps a text table's bytes as media
    * payloads so the plumbing is testable without real codecs. */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val mt = (id % 3) match {
          case 0 => MediaMeta("image", 640, 480, 0, 0L, "png")
          case 1 => MediaMeta("audio", 0, 0, 16000, payload.length.toLong, "pcm")
          case _ => MediaMeta("video", 1280, 720, 0, payload.length.toLong, "h264")
        }
        MediaRecord(id, payload, mt)
      }
  }

  /** STUB decode+feature-extract: batch-shaped mapPartitions. A real
    * implementation decodes `batch` payloads with a codec library and runs
    * a vision/audio model; the stub derives `dim` deterministic floats
    * from the payload bytes. Batch iteration (not per-record) is the
    * load-bearing part: codecs and models amortize per-batch setup. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real impl: decode(batch) -> model.forward(batch)
        batch.map { r =>
          val base = graft.functions.TextHashing.fnv64(r.payload)
          val feats = Array.tabulate(dim) { i =>
            val h = graft.functions.TextHashing.splitmix64(base + i)
            ((h >>> 40).toDouble / (1 << 24).toDouble - 0.5).toFloat
          }
          MediaFeatures(r.media_id, feats, r.meta)
        }
      }
    }
  }

  /** STUB resize: metadata-true, payload deterministically re-derived.
    * Real impl: codec decode → scale → re-encode. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int,
             batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        if (r.meta.media_type == "audio") r
        else {
          val scaled = java.util.Arrays.copyOf(
            r.payload, math.max(1, math.min(r.payload.length, w * h / 1024 + 16)))
          r.copy(payload = scaled, meta = r.meta.copy(width = w, height = h))
        }
      })
    }
  }

  /** STUB frame sampling: emits `n` deterministic byte-slices per video
    * (a generator/explode shape: one input row → n output rows). */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.media_type == "video").flatMap { r =>
      val len = r.payload.length
      (0 until n).map { i =>
        val from = if (n <= 1) 0 else (i.toLong * len / n).toInt
        val until = math.min(len, from + math.max(1, len / n))
        MediaFrame(r.media_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }
}
