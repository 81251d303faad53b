package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM codec tests (no Spark): the BMP / WAV / BMP-sequence
  * decoders do real parsing — dimensions, pixel statistics and sample
  * statistics must reflect the actual payload content, and malformed
  * payloads must be rejected, never crash.
  */
class MultimodalCodecSpec extends AnyFunSuite {

  test("BMP decode recovers dimensions and pixel statistics") {
    val bmp = Multimodal.syntheticBmp(16, 8, seed = 42L)
    val Some((f, len)) = Multimodal.PureJvmDecoder.decodeBmp(bmp, 0)
    assert(len == bmp.length)
    assert(f(4) == 16 / 1024.0f && f(5) == 8 / 1024.0f)
    assert(f(6) == 2.0f) // aspect
    assert(f(0) > 0f && f(0) < 1f) // mean R of pseudo-random pixels
    assert(f(3) > 0f) // non-zero luma spread
  }

  test("BMP decode is content-sensitive, not metadata-sensitive") {
    val a = Multimodal.PureJvmDecoder.decodeBmp(Multimodal.syntheticBmp(16, 8, 1L), 0).get._1
    val b = Multimodal.PureJvmDecoder.decodeBmp(Multimodal.syntheticBmp(16, 8, 2L), 0).get._1
    assert(!(a sameElements b))
  }

  test("solid-color BMP decodes to exact channel means and zero spread") {
    // hand-built 2x1 all-white 24-bit BMP
    val w = 2; val h = 1
    val bmp = Multimodal.syntheticBmp(w, h, 0L)
    java.util.Arrays.fill(bmp, 54, bmp.length, 0xff.toByte)
    val Some((f, _)) = Multimodal.PureJvmDecoder.decodeBmp(bmp, 0)
    assert(f(0) == 1.0f && f(1) == 1.0f && f(2) == 1.0f)
    assert(f(3) == 0.0f)
  }

  test("WAV decode recovers rate, sample count and signal statistics") {
    val wav = Multimodal.syntheticWav(640, 16000, seed = 7L)
    val Some(f) = Multimodal.PureJvmDecoder.decodeWav(wav)
    assert(f(4) == 16000 / 48000.0f)
    assert(f(6) == 640 / 100000.0f)
    assert(f(0) > 0.2f && f(0) < 0.5f) // sine-carrier RMS ~ 12000/32768/sqrt(2)
    assert(f(1) > f(0)) // peak >= rms
    assert(f(2) > 0f && f(2) < 0.2f) // ~2 zero crossings per 64-sample period
  }

  test("BMP-sequence video counts and samples real frames") {
    val frames = (0 until 5).map(i => Multimodal.syntheticBmp(8, 8, 100L + i)).reduce(_ ++ _)
    val Some(d) = Multimodal.PureJvmDecoder.decodeBmpSequence(frames)
    assert(d.frames == 5)
    assert(d.features.length == 8)
    assert(d.features(6) == 1.0f) // aspect of 8x8 frames
  }

  test("malformed payloads are rejected, never crash") {
    val dec = Multimodal.PureJvmDecoder
    assert(dec.decode("image", Array.emptyByteArray, 8, 8, 0).isEmpty)
    assert(dec.decode("audio", Array.emptyByteArray, 0, 0, 0).isEmpty)
    assert(dec.decode("video", Array.emptyByteArray, 8, 8, 1000).isEmpty)
    val bmp = Multimodal.syntheticBmp(16, 8, 1L)
    assert(dec.decode("image", bmp.take(bmp.length / 2), 16, 8, 0).isEmpty) // truncated
    val wav = Multimodal.syntheticWav(640, 16000, 1L)
    assert(dec.decode("audio", wav.take(50), 0, 0, 0).isEmpty)
    val garbage = Array.fill[Byte](200)(0x5a)
    assert(dec.decode("image", garbage, 8, 8, 0).isEmpty)
    assert(dec.decode("audio", garbage, 0, 0, 0).isEmpty)
  }
}
