package graft

import graft.pipeline.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the pure-JVM codec contracts the mm_* oracles rely on:
  * grayscale-8 PNG and 16-bit PCM WAV roundtrip bit-exactly, the
  * containers are genuine (magic bytes), and the NN downsample is the
  * exact index map the oracle mirrors.
  */
class MultimodalSpec extends AnyFunSuite {

  private val text =
    "The quick brown fox jumps over the lazy dog 0123456789 etaoin shrdlu"

  test("PNG grayscale roundtrip is bit-exact and container is real PNG") {
    val bytes = text.getBytes("UTF-8")
    val png = MediaCodec.encodeGrayPng(bytes)
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (w, h, px) = MediaCodec.decodePng(png)
    assert(w == 16 && h == bytes.length / 16)
    assert(px.toSeq == bytes.take(w * h).map(_ & 0xff).toSeq)
  }

  test("PNG roundtrip over the full byte alphabet 0..255") {
    val bytes = Array.tabulate(256)(_.toByte)
    val (w, h, px) = MediaCodec.decodePng(MediaCodec.encodeGrayPng(bytes))
    assert(w * h == 256)
    assert(px.toSeq == bytes.map(_ & 0xff).toSeq)
  }

  test("NN downsample2x is out(r,c) = in(2r,2c)") {
    val bytes = Array.tabulate(64)(_.toByte) // 16x4 image
    val (w, h, px) = MediaCodec.decodePng(MediaCodec.encodeGrayPng(bytes))
    val (rw, rh, rpx) = MediaCodec.downsample2x(w, h, px)
    assert(rw == 8 && rh == 2)
    for (r <- 0 until rh; c <- 0 until rw)
      assert(rpx(r * rw + c) == px(2 * r * w + 2 * c))
  }

  test("WAV PCM16 roundtrip is bit-exact and container is real RIFF/WAVE") {
    val samples = text.map(c => (c.toInt - 79) * 256).toArray
    val wav = MediaCodec.encodeWav(samples)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, back) = MediaCodec.decodeWav(wav)
    assert(rate == 8000)
    assert(back.toSeq == samples.toSeq)
  }

  test("WAV roundtrip at the 16-bit extremes") {
    val samples = Array(Short.MinValue.toInt, -1, 0, 1, Short.MaxValue.toInt)
    val (_, back) = MediaCodec.decodeWav(MediaCodec.encodeWav(samples))
    assert(back.toSeq == samples.toSeq)
  }
}
