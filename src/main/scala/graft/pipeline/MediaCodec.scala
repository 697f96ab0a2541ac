package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import scala.jdk.CollectionConverters._

/** Pure-JVM media encode/decode for the multimodal pipeline.
  *
  * The container ships no external image/audio libraries, but the JDK
  * itself carries real codecs: `javax.imageio` (PNG/BMP/GIF readers and
  * writers, here PNG — lossless 8-bit grayscale, so pixel values
  * roundtrip bit-exactly) and `javax.sound.sampled` (RIFF/WAVE PCM).
  * These replace the round-1..4 byte-statistics *stub* for the decode
  * step: `mm_image_decode`/`mm_wav_decode` now push payloads through
  * the actual PNG and WAV codec paths inside `mapPartitions`, which is
  * the 100 TB shape — blob to features in the scan stage, media bytes
  * never cross a shuffle.
  *
  * Lossy formats (JPEG) and video codecs stay out: their outputs are
  * not bit-deterministic across decoder versions, so they cannot sit
  * behind a hash-compared oracle. The byte-stat path (`mm_decode_features`)
  * remains as the format-agnostic fallback.
  *
  * Reference shape: pandas has no media IO; this mirrors the
  * `mapInPandas`-batch decode pattern the brief's training-data
  * pipeline needs (decode / feature-extract / resize / frame-sample).
  */
object MediaCodec {

  /** Codec providers resolved ONCE per JVM.
    *
    * The convenience entry points (`ImageIO.read/write`,
    * `AudioSystem.getAudioInputStream/write`) re-scan the provider
    * registry on EVERY call, and the audio scan serializes on a
    * global class monitor (`JSSecurityManager.getProviders`): at sf100
    * all 32 executor threads sat BLOCKED on that lock and
    * `mm_wav_decode` degraded to single-threaded — the classic
    * works-at-sf0.01, dies-at-100× shape. `ImageIO` additionally
    * routes streams through a DISK-backed cache (a temp file per
    * call) unless told otherwise. So: resolve the PNG reader/writer
    * SPIs and the WAVE file reader/writer SPIs once (lazy init takes
    * the registry locks a single time), then decode through cheap
    * per-call provider instances over memory-cached streams. Same
    * genuine JDK codec classes, no global lock in the row loop.
    */
  private lazy val pngReaderSpi = {
    ImageIO.setUseCache(false)
    ImageIO.getImageReadersByFormatName("png").next().getOriginatingProvider
  }
  private lazy val pngWriterSpi = {
    ImageIO.setUseCache(false)
    ImageIO.getImageWritersByFormatName("png").next().getOriginatingProvider
  }
  private lazy val wavReaderSpi: javax.sound.sampled.spi.AudioFileReader = {
    // deterministic selection without naming JDK-internal classes:
    // the provider that parses a one-sample WAVE built via the (locked,
    // one-time) AudioSystem path
    val probe = encodeWavViaAudioSystem(Array(0))
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.find { r =>
        try r.getAudioFileFormat(new ByteArrayInputStream(probe))
              .getType == AudioFileFormat.Type.WAVE
        catch { case _: Exception => false }
      }.getOrElse(sys.error("no WAVE AudioFileReader provider on this JVM"))
  }
  private lazy val wavWriterSpi: javax.sound.sampled.spi.AudioFileWriter =
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no WAVE AudioFileWriter provider on this JVM"))

  /** Encode `n = 16 * (bytes.length / 16)` leading bytes as a 16-wide
    * 8-bit grayscale PNG (one byte per pixel, row-major). */
  def encodeGrayPng(bytes: Array[Byte]): Array[Byte] = {
    val w = 16
    val h = bytes.length / w
    require(h >= 1, s"need at least $w bytes, got ${bytes.length}")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, bytes(i) & 0xff)
      i += 1
    }
    val out = new ByteArrayOutputStream()
    val writer = pngWriterSpi.createWriterInstance()
    val ios = new MemoryCacheImageOutputStream(out)
    try { writer.setOutput(ios); writer.write(img) }
    finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Decode a PNG through the JDK codec: (width, height, row-major
    * pixel samples). Grayscale 8-bit in == the same values out. */
  def decodePng(png: Array[Byte]): (Int, Int, Array[Int]) = {
    val reader = pngReaderSpi.createReaderInstance()
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(png))
    val img =
      try { reader.setInput(iis, true, true); reader.read(0) }
      finally { reader.dispose(); iis.close() }
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      px(i) = raster.getSample(i % w, i / w, 0)
      i += 1
    }
    (w, h, px)
  }

  /** Nearest-neighbor 2x downsample of a row-major image: output pixel
    * (r, c) = input pixel (2r, 2c). Explicit index math (not
    * AffineTransformOp) so the resample is oracle-exact. */
  def downsample2x(w: Int, h: Int, px: Array[Int]): (Int, Int, Array[Int]) = {
    val (rw, rh) = (w / 2, h / 2)
    val out = new Array[Int](rw * rh)
    var r = 0
    while (r < rh) {
      var c = 0
      while (c < rw) {
        out(r * rw + c) = px(2 * r * w + 2 * c)
        c += 1
      }
      r += 1
    }
    (rw, rh, out)
  }

  /** WAV sample rate used by [[encodeWav]] (mono 16-bit PCM LE). */
  val WavRate = 8000f

  /** One-time probe helper: the only remaining `AudioSystem.write`
    * call site (runs once, inside [[wavReaderSpi]]'s lazy init). */
  private def encodeWavViaAudioSystem(samples: Array[Int]): Array[Byte] = {
    val ais = pcmStream(samples)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def pcmStream(samples: Array[Int]): AudioInputStream = {
    val fmt = new AudioFormat(WavRate, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
  }

  /** Encode signed 16-bit samples as a RIFF/WAVE container. */
  def encodeWav(samples: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    wavWriterSpi.write(pcmStream(samples), AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAV through the JDK codec: (sampleRate, signed samples). */
  def decodeWav(wav: Array[Byte]): (Int, Array[Int]) = {
    val ais = wavReaderSpi.getAudioInputStream(new ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"unexpected decoded format: $fmt")
    val data = ais.readAllBytes()
    val n = data.length / 2
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) {
      samples(i) = ((data(2 * i + 1).toInt) << 8) | (data(2 * i) & 0xff)
      i += 1
    }
    (fmt.getSampleRate.toInt, samples)
  }
}
