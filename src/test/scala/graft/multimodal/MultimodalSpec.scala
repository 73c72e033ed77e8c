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

  // ---- real-codec path: payloads generated with the same JDK codecs ----

  private def pngPayload(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, graft.functions.TextHashing.splitmix64(seed.toLong * 31 + y * w + x).toInt & 0xffffff)
    ImageCodec.encodePng(img)
  }

  private def wavPayload(nSamples: Int, sampleRate: Int, freq: Double): Array[Byte] = {
    import javax.sound.sampled._
    val samples = Array.tabulate(nSamples)(i =>
      (math.sin(2 * math.Pi * freq * i / sampleRate) * 20000).toShort)
    val bytes = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(new java.io.ByteArrayInputStream(bytes), fmt, nSamples)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private lazy val realMedia = {
    val rows = Seq(
      Multimodal.MediaRecord(1L, pngPayload(32, 16, 1),
        Multimodal.MediaMeta("image", 0, 0, 0, 0L, "png")),
      Multimodal.MediaRecord(2L, pngPayload(8, 8, 2),
        Multimodal.MediaMeta("image", 0, 0, 0, 0L, "png")),
      Multimodal.MediaRecord(3L, "not an image".getBytes,
        Multimodal.MediaMeta("image", 0, 0, 0, 0L, "png")),
      Multimodal.MediaRecord(4L, wavPayload(16000, 16000, 440.0),
        Multimodal.MediaMeta("audio", 0, 0, 0, 0L, "wav")))
    spark.createDataset(rows)
  }

  test("RIFF fast path == javax.sound decode, both directions") {
    // javax-written container through the fast path
    val javaxWav = wavPayload(4000, 8000, 300.0)
    val fast = AudioCodec.parseRiffPcm(javaxWav)
    assert(fast.isDefined, "javax-written canonical WAV must hit the fast path")
    val slow = AudioCodec.decodeWavJavax(javaxWav)
    assert(fast.get.sampleRate === slow.sampleRate)
    assert(fast.get.samples.toSeq === slow.samples.toSeq)
    // manually-written container through javax
    val manual = AudioCodec.encodeWavPcm16(
      Array.tabulate(1000)(i => (0.4 * math.sin(2 * math.Pi * 200 * i / 8000)).toFloat), 8000)
    val viaJavax = AudioCodec.decodeWavJavax(manual)
    val viaFast = AudioCodec.parseRiffPcm(manual).get
    assert(viaJavax.sampleRate === 8000)
    assert(viaFast.samples.toSeq === viaJavax.samples.toSeq)
    // non-RIFF bytes skip the fast path (fallback owns the error contract)
    assert(AudioCodec.parseRiffPcm("definitely not a wav".getBytes).isEmpty)
  }

  test("real image decode: true dimensions, undecodable rows dead-letter") {
    val decoded = Multimodal.decodeImages(realMedia).collect().map(r => r.media_id -> r).toMap
    assert(decoded(1L)._err == null)
    assert(decoded(1L).meta.width === 32 && decoded(1L).meta.height === 16)
    assert(decoded(2L).meta.width === 8 && decoded(2L).meta.height === 8)
    assert(decoded(3L)._err != null, "garbage bytes must dead-letter, not crash")
    assert(decoded(4L)._err == null, "audio passes through")
  }

  test("real image resize: output re-decodes at the requested size") {
    val ok = realMedia.filter(_.media_id != 3L)
    val resized = Multimodal.resizeImages(ok, 10, 6).collect().map(r => r.media_id -> r).toMap
    val img1 = ImageCodec.decode(resized(1L).payload)
    assert(img1.getWidth === 10 && img1.getHeight === 6)
    assert(resized(1L).meta.width === 10 && resized(1L).meta.codec === "png")
    assert(resized(4L).meta.media_type === "audio")   // untouched
  }

  test("real image features: histogram is a distribution over luminance bins") {
    val feats = Multimodal.imageFeatures(realMedia.filter(_.media_id != 3L), bins = 16)
      .collect().map(r => r.media_id -> r.features).toMap
    assert(feats.keySet === Set(1L, 2L))
    feats.values.foreach { h =>
      assert(h.length === 16)
      assert(math.abs(h.map(_.toDouble).sum - 1.0) < 1e-5, "histogram must sum to 1")
      assert(h.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("real audio features: WAV round-trip recovers rate, RMS of a sine is ~A/sqrt(2)") {
    val feats = Multimodal.audioFeatures(realMedia, windows = 8)
      .collect()
    assert(feats.length === 1)
    val f = feats.head
    assert(f.meta.sample_rate === 16000)
    assert(f.meta.duration_ms === 1000L)
    assert(f.features.length === 9)
    val expectedRms = 20000.0 / 32768.0 / math.sqrt(2)
    f.features.take(8).foreach(v => assert(math.abs(v - expectedRms) < 0.02, s"rms $v"))
    // 440 Hz over 1 s → ~880 crossings / 16000 samples
    assert(math.abs(f.features(8) - 880.0 / 15999) < 0.01)
  }

  test("real spectral features: a pure sine concentrates in its band, centroid ≈ f0") {
    // 500 Hz sine at 16 kHz → Nyquist 8 kHz; 16 bands of 500 Hz put the
    // tone EXACTLY at band 0's center frequency — no leakage ambiguity
    val wav = wavPayload(16000, 16000, 500.0)
    val pcm = AudioCodec.decodeWav(wav)
    val feats = AudioCodec.spectralFeatures(pcm, bins = 16)
    assert(feats.length === 17)
    assert(feats(0) > 0.9, s"band 0 (500 Hz) holds ${feats(0)} of the mass")
    assert(math.abs(feats(16) - 500.0) < 25.0, s"centroid ${feats(16)} Hz")
    // dataset-level wrapper: only audio rows, fixed width
    val ds = Seq(Multimodal.MediaRecord(5L, wav,
      Multimodal.MediaMeta("audio", 0, 0, 16000, 1000L, "wav"))).toDS()
    val row = Multimodal.audioSpectralFeatures(ds, bins = 16).collect().head
    assert(row.features.toSeq == feats.toSeq)
  }

  test("perceptual image near-dups: noisy/re-encoded copies pair, distinct images don't") {
    val rnd = new java.util.Random(23)
    // base images: sinusoidal patterns with DISTINCT frequencies and
    // orientations — monotone gradients would all hash identically (every
    // "brighter than right neighbour" bit equal), sinusoids flip different
    // neighbour comparisons per frequency, and the structure survives the
    // 9×8 downscale (pure noise would not)
    def pattern(seed: Int, w: Int = 64, h: Int = 48): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val (fx, fy) = (1.0 + seed % 4, 1.0 + (seed / 4) % 4)
      for (y <- 0 until h; x <- 0 until w) {
        val s = math.sin(2 * math.Pi * (fx * x / w + fy * y / h + seed * 0.17))
        val v = math.min(255, math.max(0, (128 + 120 * s).toInt))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def noisy(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val v0 = img.getRGB(x, y) & 0xff
        val v = math.min(255, math.max(0, v0 + rnd.nextInt(9) - 4))
        out.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      out
    }
    def rec(id: Long, img: java.awt.image.BufferedImage) =
      Multimodal.MediaRecord(id, ImageCodec.encodePng(img),
        Multimodal.MediaMeta("image", img.getWidth, img.getHeight, 0, 0L, "png"))
    val bases = Seq(pattern(1), pattern(6), pattern(11), pattern(14))
    val records =
      bases.zipWithIndex.map { case (b, i) => rec(i.toLong, b) } ++
      Seq(rec(100L, noisy(bases(0))),                       // noisy copy of 0
          rec(101L, ImageCodec.resize(bases(1), 48, 36)))   // rescaled copy of 1
    val pairs = Multimodal.imageNearDups(records.toDS(), maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)), s"noisy copy must pair: $pairs")
    assert(pairs.contains((1L, 101L)), s"rescaled copy must pair: $pairs")
    // no cross-pairs between distinct base images
    assert(!pairs.exists { case (a, b) => (a % 100) != (b % 100) },
      s"distinct images must not pair: $pairs")
  }

  test("perceptual audio near-dups: noisy/re-scaled copies pair, distinct chords don't") {
    val n = 512
    val rate = 8000
    def chordWav(bands: Seq[Int], gain: Double, noiseSeed: Int): Array[Byte] = {
      val rnd = new java.util.Random(noiseSeed)
      val samples = Array.tabulate(n) { i =>
        var v = 0.0
        bands.foreach(b => v += 0.02 * gain * math.sin(2 * math.Pi * 62.5 * (b + 1) * i / rate))
        (v + (rnd.nextDouble() - 0.5) * 2e-3).toFloat
      }
      AudioCodec.encodeWavPcm16(samples, rate)
    }
    val chordA = (0 until 48 by 2).toSeq // 24 even bands
    val chordB = (1 until 48 by 2).toSeq // 24 odd bands — disjoint, Hamming 48
    def rec(id: Long, wav: Array[Byte]) =
      Multimodal.MediaRecord(id, wav, Multimodal.MediaMeta("audio", 0, 0, rate, 64L, "wav"))
    // volume invariance of the hash itself: same chord at gain 1.0 vs a
    // decoded-and-halved copy hashes identically
    val base = AudioCodec.decodeWav(chordWav(chordA, 1.0, 7))
    val halved = AudioCodec.Pcm(base.samples.map(_ * 0.5f), base.sampleRate)
    assert(AudioCodec.perceptualHash(base) === AudioCodec.perceptualHash(halved))
    val records = Seq(
      rec(0L, chordWav(chordA, 1.0, 7)),
      rec(100L, chordWav(chordA, 0.4, 99)),  // quiet, differently-noised copy
      rec(1L, chordWav(chordB, 1.0, 7)),
      rec(101L, chordWav(chordB, 1.3, 123))) // loud copy of the other chord
    val pairs = Multimodal.audioNearDups(records.toDS(), maxHamming = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)), s"re-scaled noisy copy must pair: $pairs")
    assert(pairs.contains((1L, 101L)), s"re-scaled copy must pair: $pairs")
    assert(!pairs.exists { case (a, b) => (a % 100) != (b % 100) },
      s"distinct chords must not pair: $pairs")
  }

  test("synthetic WAV families: within-family Hamming 0, expected pair set is id arithmetic") {
    val docs = spark.range(0, 40).select($"id".as("doc_id"))
    val media = Multimodal.syntheticWavFamilies(docs, "doc_id", nFamilies = 4)
    val pairs = Multimodal.audioNearDups(media, maxHamming = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L; if a % 4 == b % 4
    } yield (a, b)).toSet
    assert(pairs === expected)
  }

  test("perceptual video near-dups: noisy family copies pair, distinct sequences don't") {
    val docs = spark.range(0, 30).select($"id".as("doc_id"))
    val media = Multimodal.syntheticGifFamilies(docs, "doc_id", nFamilies = 3)
    val pairs = Multimodal.videoNearDups(media, maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      a <- 0L until 30L; b <- (a + 1) until 30L; if a % 3 == b % 3
    } yield (a, b)).toSet
    assert(pairs === expected)
    // family frame counts survive the codec round-trip (3 + fam % 3)
    import spark.implicits._
    val lens = media.map(r => (r.media_id,
      VideoCodec.decodeFrames(r.payload).length)).collect().toMap
    assert((0L until 30L).forall(id => lens(id) == 3 + (id % 3).toInt))
  }

  test("real video frames: animated GIF decodes to per-frame pixels, sampled evenly") {
    // 9-frame animated GIF, frame f filled with a distinct gray level
    val gifFrames = (0 until 9).map { f =>
      val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val v = 20 + f * 25
      for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      img
    }
    val gif = VideoCodec.encodeGif(gifFrames)
    assert(VideoCodec.decodeFrames(gif).length === 9)
    val ds = Seq(Multimodal.MediaRecord(77L, gif,
      Multimodal.MediaMeta("video", 8, 6, 0, 900L, "gif"))).toDS()
    val frames = Multimodal.sampleFrames(ds, 3).collect().sortBy(_.frame_idx)
    assert(frames.length === 3)
    // sampled evenly: frames 0, 4, 8 → gray levels 20, 120, 220
    val grays = frames.map { fr =>
      val img = ImageCodec.decode(fr.frame)
      img.getRGB(4, 3) & 0xff
    }
    // GIF palette quantization can shift levels slightly
    assert(grays.zip(Seq(20, 120, 220)).forall { case (g, e) => math.abs(g - e) <= 8 },
      s"sampled gray levels: ${grays.toSeq}")
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
