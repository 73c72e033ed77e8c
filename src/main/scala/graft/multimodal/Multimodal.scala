package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` payloads
  * plus a typed metadata struct, with decode / feature-extract / resize /
  * frame-sample stages as batch-shaped `mapPartitions` transforms.
  *
  * Image (PNG/JPEG/BMP/GIF) and WAV-PCM audio stages are REAL pixel/sample
  * paths over the JDK's built-in codecs ([[ImageCodec]], [[AudioCodec]] —
  * no external dependencies): [[decodeImages]], [[resizeImages]],
  * [[imageFeatures]], [[audioFeatures]]. Video decode remains a
  * DETERMINISTIC STUB ([[sampleFrames]]) — the JDK has no H.264 codec and
  * this container ships none; the generic [[extractFeatures]] likewise
  * stays a payload-hash stub usable for any media type. Undecodable
  * payloads route to a dead-letter channel ([[decodeImages]]' `_err`),
  * mirroring the embedding stage's contract.
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

  /** Codec work is per-row CPU, so its parallelism is the input's
    * partitioning — and a small corpus read from one parquet file is ONE
    * partition, serializing every render/decode onto a single core
    * (measured 19× vs the oracle on q_image_neardup). Widen narrow inputs
    * to cluster parallelism; wide inputs pass through untouched. */
  private def widen[T](ds: Dataset[T]): Dataset[T] = {
    val par = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions < par) ds.repartition(par) else ds
  }

  /** Deterministic REAL-PNG image corpus derived from a table's id column —
    * what makes the image path ORACLE-CHECKABLE: ids in the same family
    * (`id % nFamilies`) render the same 9×8-block luminance pattern, plus
    * per-id ±3 pixel noise, so the expected near-dup pair set is pure id
    * arithmetic a SQL oracle can recompute, while Spark has to earn it
    * through the full decode → dHash → Hamming-join path. Block luminances
    * are drawn from 4 levels 64 apart with horizontally-adjacent blocks
    * forced to differ, so every dHash bit has ≥64 luminance margin against
    * the ±3 noise: within-family Hamming is 0 by construction, cross-family
    * ~32 (independent patterns). Each 8×8 pixel block maps to exactly one
    * dHash cell (72×64 → 9×8 downscale). */
  /** The 72×64 9×8-block luminance renderer behind every oracle-checkable
    * visual corpus: block levels from `patternKey` (4 levels 64 apart,
    * horizontally-adjacent blocks forced to differ → every dHash bit has
    * ≥64 margin), per-pixel ±3 noise from `noiseKey`. Same patternKey ⇒
    * dHash-identical images regardless of noiseKey. */
  private def blockImage(patternKey: Long, noiseKey: Long): BufferedImage = {
    import graft.functions.TextHashing.splitmix64
    val img = new BufferedImage(72, 64, BufferedImage.TYPE_INT_RGB)
    val levels = Array(16, 80, 144, 208)
    var by = 0
    while (by < 8) {
      var prev = -1
      var bx = 0
      while (bx < 9) {
        var li = (splitmix64(patternKey + by * 9 + bx) >>> 32).toInt & 3
        if (li == prev) li = (li + 1) & 3 // adjacent blocks must differ
        prev = li
        val base = levels(li)
        var py = 0
        while (py < 8) {
          var px = 0
          while (px < 8) {
            val x = bx * 8 + px
            val y = by * 8 + py
            val noise = ((splitmix64(noiseKey + y * 72 + x) >>> 32) % 7).toInt - 3
            val v = math.max(0, math.min(255, base + noise))
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            px += 1
          }
          py += 1
        }
        bx += 1
      }
      by += 1
    }
    img
  }

  def syntheticImages(docs: DataFrame, idCol: String,
                      nFamilies: Long): Dataset[MediaRecord] = {
    require(nFamilies > 0, "nFamilies must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    widen(docs.select(col(idCol).cast("long")).as[Long]).map { id =>
      val fam = id % nFamilies
      MediaRecord(id, ImageCodec.encodePng(blockImage(fam * 1000003L, id * 7919L)),
        MediaMeta("image", 72, 64, 0, 0L, "png"))
    }
  }

  /** Deterministic animated-GIF corpus with planted near-dup FAMILIES —
    * the [[syntheticImages]] recipe extended to the time axis for the
    * video member of the perceptual-dedup family: ids in the same family
    * (`id % nFamilies`) share a SEQUENCE of block patterns (frame j's
    * pattern keyed by (family, j)) and the family fixes the frame count
    * (3 + fam % 3), while each ID carries its own per-pixel noise — so
    * the per-frame dHashes are family-identical (≥64 luminance margin vs
    * ±3 noise, GIF's 256-entry palette holds every gray exactly) and the
    * majority-bit video signature has within-family Hamming 0, cross-
    * family ~32. Expected pair set = pure id arithmetic. */
  def syntheticGifFamilies(docs: DataFrame, idCol: String,
                           nFamilies: Long): Dataset[MediaRecord] = {
    require(nFamilies > 0, "nFamilies must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    widen(docs.select(col(idCol).cast("long")).as[Long]).map { id =>
      val fam = id % nFamilies
      val n = (3 + fam % 3).toInt
      val frames = (0 until n).map { j =>
        blockImage((fam * 97L + j) * 1000003L, (id * 53L + j) * 7919L)
      }
      MediaRecord(id, VideoCodec.encodeGif(frames),
        MediaMeta("video", 72, 64, 0, n * 100L, "gif"))
    }
  }

  /** Deterministic animated-GIF video corpus from an id column — what makes
    * the video frame-sampling path ORACLE-CHECKABLE: id `i` becomes a
    * 16×16 GIF with `3 + i % 5` solid-gray frames, frame `j` at level
    * `LEVELS[(i + 3j) % 4]` with levels 64 apart — GIF palette
    * quantization shifts grays by up to ~8, so NEAREST-LEVEL
    * classification (margin 32) survives the codec exactly and a SQL
    * oracle can restate every sampled frame's level from id arithmetic,
    * while Spark must earn it through encode → frame decode → even
    * sampling → PNG re-encode → decode. */
  def syntheticGifs(docs: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val levels = Array(32, 96, 160, 224)
    widen(docs.select(col(idCol).cast("long")).as[Long]).map { id =>
      val n = (3 + id % 5).toInt
      val frames = (0 until n).map { j =>
        val v = levels(((id + 3 * j) % 4).toInt)
        val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) { img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1 }
          y += 1
        }
        img
      }
      MediaRecord(id, VideoCodec.encodeGif(frames),
        MediaMeta("video", 16, 16, 0, n * 100L, "gif"))
    }
  }

  /** Deterministic REAL-WAV audio corpus from an id column: a pure sine at
    * `200 + (id % 20)·100` Hz, amplitude 0.5, 4000 samples at 8 kHz
    * (500 ms) — closed-form expectations (RMS = A/√2 per window, zero-cross
    * rate = 2f/fs) that a SQL oracle can restate from id arithmetic while
    * Spark recovers them through the real WAV decode + feature path. */
  def syntheticWavs(docs: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    widen(docs.select(col(idCol).cast("long")).as[Long]).map { id =>
      val freq = 200.0 + (id % 20) * 100.0
      val n = 4000
      val rate = 8000
      val samples = Array.tabulate(n)(i =>
        (0.5 * math.sin(2.0 * math.Pi * freq * i / rate)).toFloat)
      MediaRecord(id, AudioCodec.encodeWavPcm16(samples, rate),
        MediaMeta("audio", 0, 0, rate, 500L, "wav"))
    }
  }

  /** Deterministic REAL-WAV audio corpus with planted near-dup FAMILIES —
    * what makes the audio perceptual-dedup path ORACLE-CHECKABLE (the
    * [[syntheticImages]] recipe for sound): ids in the same family
    * (`id % nFamilies`) share a chord of exactly 24 of the 64 DFT-bin
    * frequencies (band centers of [[AudioCodec.spectralFeatures]] at
    * n = 512 / 8 kHz, so every tone completes an integer cycle count —
    * zero spectral leakage), while each ID gets its own volume (gain
    * 0.6–1.4) and additive noise (±10⁻³) — the re-scaled/noisy-copy
    * perturbations a perceptual hash must see through. Chord bands carry
    * a 1/24 share of the magnitude spectrum vs the 1/64 hash threshold
    * (2.7× margin); non-chord bands carry only noise (≪ 1/64), so
    * within-family [[AudioCodec.perceptualHash]] Hamming distance is 0 by
    * construction and cross-family ~30 (independent 24-of-64 chords) —
    * the expected pair set is pure id arithmetic a SQL oracle recomputes. */
  def syntheticWavFamilies(docs: DataFrame, idCol: String,
                           nFamilies: Long): Dataset[MediaRecord] = {
    require(nFamilies > 0, "nFamilies must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.TextHashing.splitmix64
    val n = 512
    val rate = 8000
    widen(docs.select(col(idCol).cast("long")).as[Long]).map { id =>
      val fam = id % nFamilies
      // exactly 24 distinct chord bands from the family hash (the
      // deterministic distinct-pick loop trainCentroids uses)
      val bands = scala.collection.mutable.LinkedHashSet.empty[Int]
      var s = fam * 0x9E3779B97F4A7C15L + 1
      while (bands.size < 24) {
        s = splitmix64(s)
        bands += java.lang.Math.floorMod(s, 64L).toInt
      }
      val gain = 0.6 + 0.8 * ((splitmix64(id * 7919L + 17) >>> 40).toDouble / (1 << 24))
      val amp = 0.02 * gain
      val bandArr = bands.toArray
      val omega = bandArr.map(b => 2.0 * math.Pi * (62.5 * (b + 1)) / rate)
      val phase = bandArr.map(b => 2.0 * math.Pi *
        ((splitmix64(fam * 131L + b) >>> 40).toDouble / (1 << 24)))
      val samples = new Array[Float](n)
      var i = 0
      while (i < n) {
        var v = 0.0
        var t = 0
        while (t < bandArr.length) {
          v += amp * math.sin(omega(t) * i + phase(t))
          t += 1
        }
        val noise = ((splitmix64(id * 31L + i) >>> 40).toDouble / (1 << 24) - 0.5) * 2e-3
        samples(i) = (v + noise).toFloat
        i += 1
      }
      MediaRecord(id, AudioCodec.encodeWavPcm16(samples, rate),
        MediaMeta("audio", 0, 0, rate, n * 1000L / rate, "wav"))
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

  final case class MediaDecodeResult(media_id: Long, payload: Array[Byte],
                                     meta: MediaMeta, _err: String)

  /** REAL image decode (JDK ImageIO): verifies the payload decodes and
    * rewrites metadata from the actual pixels. Non-image rows pass through;
    * undecodable images become dead-letter rows (`_err` non-null) instead
    * of failing the task. */
  def decodeImages(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaDecodeResult] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        if (r.meta.media_type != "image")
          MediaDecodeResult(r.media_id, r.payload, r.meta, null)
        else try {
          val img = ImageCodec.decode(r.payload)
          MediaDecodeResult(r.media_id, r.payload,
            r.meta.copy(width = img.getWidth, height = img.getHeight), null)
        } catch {
          case e: Exception =>
            MediaDecodeResult(r.media_id, r.payload, r.meta,
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
        }
      })
    }
  }

  /** REAL image resize: decode → bilinear scale → PNG re-encode, metadata
    * true to the new pixels. Non-image rows pass through unchanged. */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int,
                   batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        if (r.meta.media_type != "image") r
        else {
          val scaled = ImageCodec.resize(ImageCodec.decode(r.payload), w, h)
          r.copy(payload = ImageCodec.encodePng(scaled),
            meta = r.meta.copy(width = w, height = h, codec = "png"))
        }
      })
    }
  }

  /** REAL image features: normalized luminance histogram over the decoded
    * pixels (fixed width `bins`). Only image rows are emitted. */
  def imageFeatures(media: Dataset[MediaRecord], bins: Int = 64,
                    batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.media_type == "image").mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        MediaFeatures(r.media_id,
          ImageCodec.luminanceHistogram(ImageCodec.decode(r.payload), bins), r.meta)
      })
    }
  }

  /** REAL audio features: WAV-PCM decode → per-window RMS energy + global
    * zero-crossing rate (fixed width `windows + 1`), metadata corrected
    * from the actual stream. Only audio rows are emitted. */
  def audioFeatures(media: Dataset[MediaRecord], windows: Int = 31,
                    batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.media_type == "audio").mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val pcm = AudioCodec.decodeWav(r.payload)
        val durMs = if (pcm.sampleRate == 0) 0L
          else pcm.samples.length.toLong * 1000 / pcm.sampleRate
        MediaFeatures(r.media_id, AudioCodec.features(pcm, windows),
          r.meta.copy(sample_rate = pcm.sampleRate, duration_ms = durMs))
      })
    }
  }

  /** Perceptual image near-dup pairs: decode → 64-bit dHash per image →
    * the SAME chunk-blocked Hamming join the text path uses
    * ([[graft.ops.Dedup.hammingNearDups]]) — multimodal dedup rides the
    * scale-hardened text machinery, payload bytes never shuffle (only
    * (id, hash64) rows reach the exchange). Undecodable images are skipped
    * (they can't be perceptual near-dups of anything). */
  def imageNearDups(media: Dataset[MediaRecord], maxHamming: Int = 6,
                    batchSize: Int = 64): org.apache.spark.sql.DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media.filter(_.meta.media_type == "image").mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { r =>
        try Some((r.media_id, ImageCodec.dHash(ImageCodec.decode(r.payload))))
        catch { case scala.util.control.NonFatal(_) => None }
      })
    }.toDF("media_id", "dhash")
    graft.ops.Dedup.hammingNearDups(hashed, "media_id", "dhash", maxHamming)
  }

  /** Perceptual audio near-dup pairs — completes the multimodal dedup
    * triangle (text SimHash, image dHash, audio band-signature): WAV
    * decode → 64-bit [[AudioCodec.perceptualHash]] per clip → the SAME
    * chunk-blocked Hamming join the text and image paths use
    * ([[graft.ops.Dedup.hammingNearDups]], recall-exact through
    * Hamming 7). Volume-rescaled / re-encoded / lightly-noised copies
    * hash identically (the hash thresholds band RATIOS); payload bytes
    * never shuffle — only (id, hash64) rows reach the exchange.
    * Undecodable clips are skipped (dead-letter semantics). */
  def audioNearDups(media: Dataset[MediaRecord], maxHamming: Int = 2,
                    batchSize: Int = 64): org.apache.spark.sql.DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media.filter(_.meta.media_type == "audio").mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { r =>
        try Some((r.media_id, AudioCodec.perceptualHash(AudioCodec.decodeWav(r.payload))))
        catch { case scala.util.control.NonFatal(_) => None }
      })
    }.toDF("media_id", "phash")
    graft.ops.Dedup.hammingNearDups(hashed, "media_id", "phash", maxHamming)
  }

  /** Perceptual video near-dup pairs — the last side of the multimodal
    * dedup square (text SimHash, image dHash, audio band signature,
    * video majority-dHash): decode frames → sample ≤ `sampleN` evenly →
    * 64-bit dHash per frame → MAJORITY bit across sampled frames (strict
    * > k/2, ties → 0 — deterministic) → the shared chunk-blocked
    * [[graft.ops.Dedup.hammingNearDups]]. The majority vote makes the
    * signature robust to a minority of perturbed/re-encoded frames while
    * identical frame sequences collapse to identical signatures; payload
    * bytes never shuffle. Undecodable videos are skipped. */
  def videoNearDups(media: Dataset[MediaRecord], maxHamming: Int = 6,
                    sampleN: Int = 4, batchSize: Int = 16): org.apache.spark.sql.DataFrame = {
    require(sampleN >= 1, s"sampleN must be ≥ 1: $sampleN")
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media.filter(_.meta.media_type == "video").mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { r =>
        try {
          val frames = VideoCodec.decodeFrames(r.payload)
          if (frames.isEmpty) None
          else {
            val k = math.min(sampleN, frames.length)
            val hashes = (0 until k).map { i =>
              val idx = if (k <= 1) 0 else (i.toLong * (frames.length - 1) / (k - 1)).toInt
              ImageCodec.dHash(frames(idx))
            }
            var sig = 0L
            var b = 0
            while (b < 64) {
              var ones = 0
              hashes.foreach(h => if (((h >>> b) & 1L) == 1L) ones += 1)
              if (2 * ones > k) sig |= (1L << b)
              b += 1
            }
            Some((r.media_id, sig))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      })
    }.toDF("media_id", "vhash")
    graft.ops.Dedup.hammingNearDups(hashed, "media_id", "vhash", maxHamming)
  }

  /** REAL frequency-domain audio features: per-band spectrum + spectral
    * centroid over the decoded PCM (fixed width `bins + 1`). Only audio
    * rows are emitted. */
  def audioSpectralFeatures(media: Dataset[MediaRecord], bins: Int = 32,
                            batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.media_type == "audio").mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val pcm = AudioCodec.decodeWav(r.payload)
        val durMs = if (pcm.sampleRate == 0) 0L
          else pcm.samples.length.toLong * 1000 / pcm.sampleRate
        MediaFeatures(r.media_id, AudioCodec.spectralFeatures(pcm, bins),
          r.meta.copy(sample_rate = pcm.sampleRate, duration_ms = durMs))
      })
    }
  }

  /** REAL frame sampling for JDK-decodable multi-frame containers (animated
    * GIF via [[VideoCodec.decodeFrames]]): `n` frames sampled evenly across
    * the sequence, re-encoded as PNG. A generator/explode shape: one input
    * row → n output rows.
    *
    * Degraded path (documented, not hidden): H.264-family payloads have no
    * pure-JDK decoder, so undecodable videos fall back to the deterministic
    * byte-slice pseudo-frames — the Spark-side plumbing (schema,
    * partitioning, batch shape) is identical either way, and swapping in a
    * real codec library touches only the decode call. */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.media_type == "video").flatMap { r =>
      val decoded =
        try VideoCodec.decodeFrames(r.payload)
        catch { case scala.util.control.NonFatal(_) => IndexedSeq.empty }
      if (decoded.nonEmpty) {
        val k = math.min(n, decoded.length)
        (0 until k).map { i =>
          val idx = if (k <= 1) 0 else (i.toLong * (decoded.length - 1) / (k - 1)).toInt
          MediaFrame(r.media_id, i, ImageCodec.encodePng(decoded(idx)))
        }
      } else {
        val len = r.payload.length
        (0 until n).map { i =>
          val from = if (n <= 1) 0 else (i.toLong * len / n).toInt
          val until = math.min(len, from + math.max(1, len / n))
          MediaFrame(r.media_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
    }
  }
}
