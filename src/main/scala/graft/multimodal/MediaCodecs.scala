package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** REAL media codecs with zero external dependencies: the JDK ships image
  * (PNG/JPEG/BMP/GIF via `javax.imageio`), multi-frame containers (animated
  * GIF via the same reader's image sequence API — [[VideoCodec]]), and
  * WAV-PCM (`javax.sound.sampled`), so decode / resize / feature-extract /
  * frame-sample over those formats is a genuine pixel/sample path, not a
  * stub. H.264-family codecs remain undecodable in a pure JDK (documented,
  * not hidden): [[Multimodal.sampleFrames]] degrades those payloads to
  * deterministic byte-slice pseudo-frames.
  *
  * All functions are pure byte→value transforms, callable from executor
  * tasks with no per-call setup; [[Multimodal]] wraps them batch-shaped.
  */
object ImageCodec {

  /** Decode PNG/JPEG/BMP/GIF bytes. Throws on undecodable payloads — callers
    * route that to a dead-letter channel, mirroring the embed stage. */
  def decode(bytes: Array[Byte]): BufferedImage = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null)
      throw new IllegalArgumentException(s"undecodable image payload (${bytes.length} bytes)")
    img
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Bilinear resize via Graphics2D (headless-safe). */
  def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    dst
  }

  /** 64-bit difference hash (dHash), the standard perceptual fingerprint
    * for image near-dup detection: bilinear-downscale to 9×8 luminance,
    * then bit (x, y) = "pixel brighter than its right neighbour". Robust
    * to re-encoding, mild resizing and noise; Hamming distance between
    * dHashes ranks perceptual similarity — feed through
    * [[graft.ops.Dedup.hammingNearDups]] exactly like a text simhash. */
  def dHash(img: BufferedImage): Long = {
    val small = resize(img, 9, 8)
    var out = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        def lum(px: Int): Double = {
          val rgb = small.getRGB(px, y)
          0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        }
        if (lum(x) > lum(x + 1)) out |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Normalized luminance histogram — a real, deterministic fixed-width
    * image feature (the classic pre-deep-learning descriptor). */
  def luminanceHistogram(img: BufferedImage, bins: Int): Array[Float] = {
    require(bins > 0, "bins must be positive")
    val hist = new Array[Int](bins)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        hist(math.min(bins - 1, (lum / 256.0 * bins).toInt)) += 1
        x += 1
      }
      y += 1
    }
    val total = math.max(1, img.getWidth * img.getHeight).toFloat
    hist.map(_ / total)
  }
}

object AudioCodec {

  /** Decoded mono PCM: samples normalized to [-1, 1] + the sample rate. */
  final case class Pcm(samples: Array[Float], sampleRate: Int)

  /** Decode a WAV payload (PCM 8/16-bit, any channel count — channels are
    * averaged to mono). Throws on non-WAV/unsupported encodings. */
  def decodeWav(bytes: Array[Byte]): Pcm = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED,
        s"unsupported WAV encoding: ${fmt.getEncoding}")
      val data = in.readAllBytes()
      val channels = fmt.getChannels
      val bytesPerSample = fmt.getSampleSizeInBits / 8
      require(bytesPerSample == 1 || bytesPerSample == 2,
        s"unsupported sample size: ${fmt.getSampleSizeInBits} bits")
      val frameBytes = bytesPerSample * channels
      val nFrames = data.length / frameBytes
      val out = new Array[Float](nFrames)
      var f = 0
      while (f < nFrames) {
        var acc = 0.0f
        var c = 0
        while (c < channels) {
          val off = f * frameBytes + c * bytesPerSample
          val v =
            if (bytesPerSample == 1) {
              if (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)
                ((data(off) & 0xff) - 128) / 128.0f
              else data(off) / 128.0f
            } else {
              val lo = if (fmt.isBigEndian) data(off + 1) else data(off)
              val hi = if (fmt.isBigEndian) data(off) else data(off + 1)
              (((hi << 8) | (lo & 0xff)).toShort) / 32768.0f
            }
          acc += v
          c += 1
        }
        out(f) = acc / channels
        f += 1
      }
      Pcm(out, fmt.getSampleRate.toInt)
    } finally in.close()
  }

  /** Encode mono float samples as 16-bit little-endian PCM WAV — the
    * fixture writer dual of [[decodeWav]] (same container the JDK's
    * `AudioSystem` reads back). */
  def encodeWavPcm16(samples: Array[Float], sampleRate: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-1.0f, math.min(1.0f, samples(i)))
      val s = math.round(v * 32767.0f).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    try AudioSystem.write(in, AudioFileFormat.Type.WAVE, out) finally in.close()
    out.toByteArray
  }

  /** Fixed-width audio descriptor: per-window RMS energy (`windows` values)
    * + global zero-crossing rate as the last element. */
  def features(pcm: Pcm, windows: Int): Array[Float] = {
    require(windows > 0, "windows must be positive")
    val n = pcm.samples.length
    val out = new Array[Float](windows + 1)
    if (n == 0) return out
    var w = 0
    while (w < windows) {
      val from = (w.toLong * n / windows).toInt
      val until = math.max(from + 1, ((w + 1).toLong * n / windows).toInt)
      var sumSq = 0.0
      var i = from
      while (i < math.min(until, n)) { sumSq += pcm.samples(i) * pcm.samples(i); i += 1 }
      out(w) = math.sqrt(sumSq / math.max(1, math.min(until, n) - from)).toFloat
      w += 1
    }
    var crossings = 0
    var i = 1
    while (i < n) {
      if ((pcm.samples(i - 1) >= 0) != (pcm.samples(i) >= 0)) crossings += 1
      i += 1
    }
    out(windows) = crossings.toFloat / math.max(1, n - 1)
    out
  }

  /** Frequency-domain descriptor: normalized magnitude at `bins` evenly
    * spaced frequencies in (0, Nyquist], plus the spectral centroid in Hz
    * as the last element. Direct DFT per bin — O(n·bins), deterministic,
    * dependency-free; an FFT is an optimization, not a semantic change,
    * and at feature-extraction bin counts the direct form is plenty. */
  def spectralFeatures(pcm: Pcm, bins: Int): Array[Float] = {
    require(bins > 0, "bins must be positive")
    val n = pcm.samples.length
    val out = new Array[Float](bins + 1)
    if (n == 0 || pcm.sampleRate == 0) return out
    val nyquist = pcm.sampleRate / 2.0
    val mags = new Array[Double](bins)
    var b = 0
    while (b < bins) {
      val f = (b + 1).toDouble / bins * nyquist
      val w = 2.0 * math.Pi * f / pcm.sampleRate
      var re = 0.0
      var im = 0.0
      var i = 0
      while (i < n) {
        re += pcm.samples(i) * math.cos(w * i)
        im -= pcm.samples(i) * math.sin(w * i)
        i += 1
      }
      mags(b) = math.sqrt(re * re + im * im) / n
      b += 1
    }
    val total = mags.sum
    if (total > 0) {
      var centroid = 0.0
      b = 0
      while (b < bins) {
        out(b) = (mags(b) / total).toFloat
        centroid += ((b + 1).toDouble / bins * nyquist) * (mags(b) / total)
        b += 1
      }
      out(bins) = centroid.toFloat
    }
    out
  }
}

/** Multi-frame container codec: the JDK's ImageIO readers expose an image
  * SEQUENCE per input (`getNumImages`/`read(i)`), which for animated GIF —
  * the one multi-frame format the JDK ships a decoder for — yields real
  * per-frame pixels. MJPEG-in-anything and H.264 need external codecs this
  * container doesn't have; callers treat an empty/failed decode as the
  * degraded path. */
object VideoCodec {

  /** Decode every frame of a multi-frame container (animated GIF). GIF
    * delta frames are returned as stored (possibly smaller than the canvas,
    * per the frame's dirty rectangle) — correct for sampling/feature use;
    * full-canvas composition is a presentation concern. Throws if no
    * ImageIO reader claims the payload. */
  def decodeFrames(bytes: Array[Byte]): IndexedSeq[BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException(s"undecodable video payload (${bytes.length} bytes)")
      val reader = readers.next()
      reader.setInput(iis)
      try (0 until reader.getNumImages(true)).map(reader.read)
      finally reader.dispose()
    } finally iis.close()
  }

  /** Encode frames as an animated GIF (test-fixture writer: the JDK GIF
    * writer supports `writeToSequence`). */
  def encodeGif(frames: Seq[BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val out = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }
}
