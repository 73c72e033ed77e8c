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

  // ImageIO's default stream cache spools every decode through a TEMP FILE
  // (disk I/O + lock per image) — with in-memory byte-array payloads the
  // cache buys nothing and serializes concurrent executor threads. One-time
  // JVM-wide switch to heap-backed streams.
  javax.imageio.ImageIO.setUseCache(false)

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
    * averaged to mono). Throws on non-WAV/unsupported encodings.
    *
    * Canonical little-endian RIFF/PCM payloads take a direct header-parse
    * fast path: `AudioSystem.getAudioInputStream` runs a synchronized
    * service-provider lookup per call, which serializes concurrent
    * executor threads (measured: the whole per-record cost on a 5000-WAV
    * corpus). Anything the fast path doesn't recognize — RIFX, compressed
    * encodings, exotic chunk layouts — falls back to javax.sound, so the
    * accepted format surface is unchanged. */
  def decodeWav(bytes: Array[Byte]): Pcm =
    parseRiffPcm(bytes).getOrElse(decodeWavJavax(bytes))

  /** Direct parser for canonical RIFF little-endian PCM: walks the chunk
    * list for `fmt ` (format 1, 8/16-bit) and `data`. Returns None for
    * anything else — the javax.sound fallback owns those. */
  private[multimodal] def parseRiffPcm(bytes: Array[Byte]): Option[Pcm] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, length)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(off)
      val sz = u32(off + 4).toInt
      if (sz < 0 || off + 8 + sz > bytes.length) return None
      if (id == "fmt ") {
        if (sz < 16 || u16(off + 8) != 1) return None // PCM only
        fmt = Some((u16(off + 10), u32(off + 12).toInt, u16(off + 22)))
      } else if (id == "data") data = Some((off + 8, sz))
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((channels, rate, bits)), Some((dOff, dLen)))
          if channels > 0 && rate > 0 && (bits == 8 || bits == 16) =>
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * channels
        val nFrames = dLen / frameBytes
        val out = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0f
          var c = 0
          while (c < channels) {
            val o = dOff + f * frameBytes + c * bytesPerSample
            val v =
              if (bits == 8) ((bytes(o) & 0xff) - 128) / 128.0f // 8-bit WAV is unsigned
              else (((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort) / 32768.0f
            acc += v
            c += 1
          }
          out(f) = acc / channels
          f += 1
        }
        Some(Pcm(out, rate))
      case _ => None
    }
  }

  private[multimodal] def decodeWavJavax(bytes: Array[Byte]): Pcm = {
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
    * fixture writer dual of [[decodeWav]]. Canonical 44-byte RIFF header
    * written directly: `AudioSystem.write` pays the same synchronized
    * service-provider machinery as the decode side (measured ~1.3 s over a
    * 5000-WAV corpus), and the canonical container needs none of it. */
  def encodeWavPcm16(samples: Array[Float], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def tag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def le32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    tag(0, "RIFF"); le32(4, 36L + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, sampleRate)
    le32(28, sampleRate.toLong * 2) // byte rate
    le16(32, 2) // block align
    le16(34, 16) // bits per sample
    tag(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-1.0f, math.min(1.0f, samples(i)))
      val s = math.round(v * 32767.0f).toShort
      out(44 + 2 * i) = (s & 0xff).toByte
      out(44 + 2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
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

  /** 64-bit perceptual audio fingerprint — the audio member of the
    * dedup-signature family next to text SimHash and image dHash: bit `b`
    * is set iff band `b`'s share of the [[spectralFeatures]] magnitude
    * spectrum exceeds the uniform share 1/64 ("is band b louder than
    * average"). The comparison is a RATIO of magnitudes, so the hash is
    * invariant to volume (gain rescaling multiplies every band equally)
    * and robust to additive noise far below the band margins — re-encoded,
    * re-scaled and lightly-noised copies hash identically, distinct
    * spectral content flips ~half the populated bands. Feed through
    * [[graft.ops.Dedup.hammingNearDups]] exactly like a text simhash. */
  def perceptualHash(pcm: Pcm): Long = {
    val spec = spectralFeatures(pcm, 64)
    var out = 0L
    var b = 0
    while (b < 64) {
      if (spec(b) > 1.0f / 64) out |= (1L << b)
      b += 1
    }
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
