package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM codec tests (no Spark): the BMP / WAV / image-sequence /
  * MP3 / H.264 / Ogg-Opus decoders do real parsing — dimensions, pixel
  * and sample statistics, frame counts and durations must reflect the
  * actual payload content, and malformed payloads must be rejected,
  * never crash.
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

  test("PNG decode (ImageIO path) matches the BMP path bit-for-bit on channel means") {
    val dec = Multimodal.PureJvmDecoder
    val bmpF = dec.decodeBmp(Multimodal.syntheticBmp(16, 8, 42L), 0).get._1
    val pngF = dec.decodeImageIo(Multimodal.syntheticPng(16, 8, 42L)).get
    // identical pixel multiset + integer channel sums → exact equality
    assert(pngF(0) == bmpF(0) && pngF(1) == bmpF(1) && pngF(2) == bmpF(2))
    // luma stddev accumulates doubles in a different pixel order
    assert(math.abs(pngF(3) - bmpF(3)) < 1e-6f)
    assert(pngF(4) == bmpF(4) && pngF(5) == bmpF(5) && pngF(6) == bmpF(6))
  }

  test("JPEG decode does real DCT work: dims exact, stats near the lossless source") {
    val dec = Multimodal.PureJvmDecoder
    val ref = dec.decodeBmp(Multimodal.syntheticBmp(16, 8, 42L), 0).get._1
    val jpgF = dec.decodeImageIo(Multimodal.syntheticJpeg(16, 8, 42L)).get
    assert(jpgF(4) == 16 / 1024.0f && jpgF(5) == 8 / 1024.0f && jpgF(6) == 2.0f)
    // lossy but mean-preserving: channel means within JPEG quantization error
    (0 to 2).foreach(i => assert(math.abs(jpgF(i) - ref(i)) < 0.05f, s"channel $i"))
    assert(jpgF(3) > 0f)
  }

  test("JPEG decode is content-sensitive") {
    val dec = Multimodal.PureJvmDecoder
    val a = dec.decodeImageIo(Multimodal.syntheticJpeg(16, 8, 1L)).get
    val b = dec.decodeImageIo(Multimodal.syntheticJpeg(16, 8, 2L)).get
    assert(!(a sameElements b))
  }

  test("MJPEG video counts and samples real JPEG frames") {
    val frames = (0 until 4).map(i => Multimodal.syntheticJpeg(8, 8, 100L + i)).reduce(_ ++ _)
    val Some(d) = Multimodal.PureJvmDecoder.decodeJpegSequence(frames)
    assert(d.frames == 4)
    assert(d.features.length == 8)
    assert(d.features(6) == 1.0f)
    // truncated final frame (no EOI) must reject the whole sequence
    assert(Multimodal.PureJvmDecoder.decodeJpegSequence(frames.dropRight(3)).isEmpty)
  }

  test("MJPEG frame walk is segment-aware: an EXIF-style embedded EOI does not split the frame") {
    // inject an APP1 segment whose payload contains a bare FF D9 (the
    // shape of an EXIF thumbnail's own EOI) right after each frame's SOI
    def withApp1(jpeg: Array[Byte]): Array[Byte] = {
      val payload = Array[Byte](
        'E', 'x', 'i', 'f', 0, 0,
        0xff.toByte, 0xd8.toByte, 0x01, 0x02, 0xff.toByte, 0xd9.toByte, 0x03)
      val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
      jpeg.take(2) ++ seg ++ jpeg.drop(2)
    }
    val dec = Multimodal.PureJvmDecoder
    val f1 = withApp1(Multimodal.syntheticJpeg(8, 8, 1L))
    val f2 = withApp1(Multimodal.syntheticJpeg(8, 8, 2L))
    // single frame decodes (ImageIO skips the unknown APP1)...
    assert(dec.decodeImageIo(f1).isDefined)
    // ...and the sequence walk counts 2 frames, not 4 thumbnail-split ones
    val Some(d) = dec.decodeJpegSequence(f1 ++ f2)
    assert(d.frames == 2)
  }

  test("decompression-bomb PNG (tiny payload, huge declared WxH) is flagged, not decoded") {
    // patch a valid PNG's IHDR to declare 50000x50000 (2.5 Gpx ≈ 10 GB
    // ARGB) and fix the chunk CRC so the header parses — the dimension
    // cap must reject it BEFORE any pixel allocation (an OOM here is an
    // Error, outside the corrupt-payload catch set)
    val png = Multimodal.syntheticPng(16, 8, 42L).clone()
    def putInt(off: Int, v: Int): Unit = {
      png(off) = (v >>> 24).toByte; png(off + 1) = (v >>> 16).toByte
      png(off + 2) = (v >>> 8).toByte; png(off + 3) = v.toByte
    }
    putInt(16, 50000) // IHDR width  (8-byte sig + 4 len + 4 "IHDR")
    putInt(20, 50000) // IHDR height
    val crc = new java.util.zip.CRC32
    crc.update(png, 12, 4 + 13) // chunk type + IHDR payload
    putInt(12 + 4 + 13, crc.getValue.toInt)
    val t0 = System.nanoTime()
    assert(Multimodal.PureJvmDecoder.decodeImageIo(png).isEmpty)
    // header peek only: milliseconds, no 10 GB allocation attempt
    assert((System.nanoTime() - t0) / 1e9 < 5.0)
  }

  test("MP3 frame-header walk: duration, bitrate, channels, frame count from a synthesized CBR stream") {
    // MPEG1 Layer III, 128 kbps, 44100 Hz, mono: frameLen = 144*128000/44100 = 417 (+padding)
    def frame(padding: Int): Array[Byte] = {
      val len = 144 * 128000 / 44100 + padding
      val f = new Array[Byte](len)
      f(0) = 0xff.toByte
      f(1) = 0xfb.toByte // sync + MPEG1 + Layer III + no CRC
      f(2) = ((9 << 4) | (0 << 2) | (padding << 1)).toByte // 128 kbps, 44100 Hz
      f(3) = (3 << 6).toByte // mono
      f
    }
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0) ++ Array[Byte](0, 0, 0, 10) ++ new Array[Byte](10)
    val id3v1 = "TAG".getBytes ++ new Array[Byte](125)
    val frames = 200
    val stream = id3 ++ (0 until frames).flatMap(i => frame(i % 2)).toArray ++ id3v1
    val f = Multimodal.PureJvmDecoder.decodeMp3Stats(stream).get
    val expectedSec = frames * 1152.0 / 44100.0 // ≈ 5.22 s
    assert(math.abs(f(0) * 60 - expectedSec) < 1e-3, s"duration=${f(0) * 60}")
    assert(f(1) == 128f / 320f) // CBR 128 kbps
    assert(f(2) == 44100f / 48000f)
    assert(f(3) == 1f) // mono
    assert(f(4) == frames / 10000.0f)
    assert(f(5) == 0f) // not VBR
    // dispatched through the audio kind as a real decode
    assert(Multimodal.PureJvmDecoder.decode("audio", stream, 0, 0, 0).isDefined)
    // truncated mid-frame and mid-stream garbage are corrupt, not fatal
    assert(Multimodal.PureJvmDecoder.decodeMp3Stats(stream.dropRight(200)).isEmpty)
    val garbled = stream.clone(); garbled(id3.length + 417 * 2 + 1) = 0x00 // break a later sync
    assert(Multimodal.PureJvmDecoder.decodeMp3Stats(garbled).isEmpty)
  }

  test("MP3 with ID3v2.4 footer flag decodes (footer bytes not counted in the syncsafe size)") {
    def frame(): Array[Byte] = {
      val f = new Array[Byte](144 * 128000 / 44100)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte
      f(2) = (9 << 4).toByte; f(3) = (3 << 6).toByte
      f
    }
    // flags bit 4 set → a 10-byte "3DI" footer follows the tag body
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0x10) ++ Array[Byte](0, 0, 0, 10) ++
      new Array[Byte](10) ++ ("3DI".getBytes ++ new Array[Byte](7))
    val stream = id3 ++ (0 until 10).flatMap(_ => frame()).toArray
    val f = Multimodal.PureJvmDecoder.decodeMp3Stats(stream).get
    assert(f(4) == 10 / 10000.0f, f.mkString(","))
  }

  test("MP3 VBR stream is flagged and mean bitrate averages the frame rates") {
    def frame(brIdx: Int, kbps: Int): Array[Byte] = {
      val len = 144 * kbps * 1000 / 44100
      val f = new Array[Byte](len)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte
      f(2) = ((brIdx << 4) | (0 << 2)).toByte
      f(3) = 0 // stereo
      f
    }
    // alternate 128 (idx 9) and 192 (idx 11) kbps frames
    val stream = (0 until 50).flatMap(i => if (i % 2 == 0) frame(9, 128) else frame(11, 192)).toArray
    val f = Multimodal.PureJvmDecoder.decodeMp3Stats(stream).get
    assert(f(5) == 1f) // VBR
    assert(f(1) == 160f / 320f) // mean of 128/192
    assert(f(3) == 2f) // stereo
  }

  test("H.264 stats walk: SPS resolution (cropped and uncropped), frames, IDR share, profile/level") {
    val dec = Multimodal.PureJvmDecoder
    // even seed: no cropping → exact macroblock grid
    val a = dec.decodeH264Stats(Multimodal.syntheticH264(wMbs = 8, hMbs = 6, frames = 7, seed = 42L)).get
    assert(a.frames == 7)
    assert(a.features(0) == 128 / 1024.0f && a.features(1) == 96 / 1024.0f, a.features.mkString(","))
    assert(a.features(4) == 1f / 7f) // one IDR of 7 slices
    assert(a.features(5) == 66 / 255.0f && a.features(6) == 30 / 255.0f) // Baseline, level 3.0
    // odd seed: frame cropping of one 2px unit right+bottom
    val b = dec.decodeH264Stats(Multimodal.syntheticH264(8, 6, 3, seed = 43L)).get
    assert(b.features(0) == 126 / 1024.0f && b.features(1) == 94 / 1024.0f, b.features.mkString(","))
    // dispatched through the video kind
    assert(dec.decode("video", Multimodal.syntheticH264(2, 2, 4, 0L), 0, 0, 0).exists(_.frames == 4))
    // escape/start-code robustness across seeds (slice filler embeds
    // raw 00 00 01 bytes that MUST be emulation-prevention-escaped)
    (0L until 20L).foreach { s =>
      assert(dec.decodeH264Stats(Multimodal.syntheticH264(3, 2, 5, s)).exists(_.frames == 5), s"seed $s")
    }
  }

  test("H.264 frame counting is slice-aware: a second slice of the same picture does not double-count") {
    val base = Multimodal.syntheticH264(4, 4, 3, 2L)
    // append a non-IDR slice NAL whose first_mb_in_slice = 5 (ue bits
    // 00110) — a continuation slice of the last picture, not a new frame
    val contSlice = Array[Byte](0, 0, 0, 1, 0x21, 0x34, 0x80.toByte) // 0x34 = 00110100₂

    val d = Multimodal.PureJvmDecoder.decodeH264Stats(base ++ contSlice).get
    assert(d.frames == 3, s"frames=${d.frames}")
  }

  test("H.264 malformed streams are rejected, never crash") {
    val dec = Multimodal.PureJvmDecoder
    val good = Multimodal.syntheticH264(4, 2, 3, 6L)
    // forbidden_zero_bit set on a NAL header
    val bad = good.clone(); bad(4) = (bad(4) | 0x80).toByte
    assert(dec.decodeH264Stats(bad).isEmpty)
    // no SPS: slices only
    val noSps = Array[Byte](0, 0, 0, 1, 0x65, 0x88.toByte, 0x80.toByte)
    assert(dec.decodeH264Stats(noSps).isEmpty)
    // start code then nothing
    assert(dec.decodeH264Stats(Array[Byte](0, 0, 1)).isEmpty)
    assert(dec.decode("video", Array[Byte](0, 0, 0, 1), 0, 0, 0).isEmpty)
  }

  test("Ogg/Opus stats walk: duration from granule AND TOC, channels, packet count, pre-skip") {
    val dec = Multimodal.PureJvmDecoder
    // 120 packets × 20 ms CELT = 2.4 s; even seed → mono
    val f = dec.decodeOggOpusStats(Multimodal.syntheticOggOpus(120, seed = 42L)).get
    assert(math.abs(f(0) * 60 - 2.4f) < 1e-4, s"granule duration=${f(0) * 60}")
    assert(f(1) == 1f) // mono (even seed)
    assert(f(2) == 1f) // 48 kHz input
    assert(f(3) == 120 / 10000.0f)
    assert(f(4) == 312 / 48000.0f) // pre-skip
    assert(f(5) == 0f) // mapping family
    assert(math.abs(f(6) * 60 - 2.4f) < 1e-4, s"TOC duration=${f(6) * 60}")
    // odd seed → stereo, and the multi-page path (>50 packets/page split)
    val g = dec.decodeOggOpusStats(Multimodal.syntheticOggOpus(51, seed = 1L)).get
    assert(g(1) == 2f)
    assert(g(3) == 51 / 10000.0f)
    // dispatched through the audio kind
    assert(dec.decode("audio", Multimodal.syntheticOggOpus(10, 0L), 0, 0, 0).isDefined)
  }

  test("Ogg/Opus malformed streams are rejected, never crash") {
    val dec = Multimodal.PureJvmDecoder
    val good = Multimodal.syntheticOggOpus(60, 5L)
    assert(dec.decodeOggOpusStats(good.take(good.length / 2)).isEmpty) // truncated mid-page
    val badVersion = good.clone(); badVersion(4) = 1
    assert(dec.decodeOggOpusStats(badVersion).isEmpty)
    val badMagic = good.clone(); badMagic(28 + 4) = 'X' // corrupt OpusHead magic
    assert(dec.decodeOggOpusStats(badMagic).isEmpty)
    assert(dec.decode("audio", "OggS".getBytes, 0, 0, 0).isEmpty)
  }

  test("compressed-format garbage is rejected, never crashes") {
    val dec = Multimodal.PureJvmDecoder
    val fakeJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ Array.fill[Byte](64)(0x5a)
    assert(dec.decodeImageIo(fakeJpeg).isEmpty)
    val fakePng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++ Array.fill[Byte](64)(0x13)
    assert(dec.decodeImageIo(fakePng).isEmpty)
    assert(dec.decodeImageIo(Array.emptyByteArray).isEmpty)
    assert(dec.decode("image", fakePng, 8, 8, 0).isEmpty)
    assert(dec.decode("video", fakeJpeg, 8, 8, 1000).isEmpty)
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

  test("video phash: BMP-seq vs MJPEG of the same frames within a few bits, corrupt flags") {
    val dec = Multimodal.PureJvmDecoder
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (g <- 0L until 6L) {
      val (w, h, nf) = (24 + (g % 5).toInt, 16 + (g % 3).toInt, 3 + (g % 3).toInt)
      def seq(mk: Long => Array[Byte], base: Long) =
        (0 until nf).map(f => mk(base * 31 + f)).reduce(_ ++ _)
      val hb = dec.videoPhash64s(seq(sd => Multimodal.syntheticSmoothBmp(w, h, sd), g))
      val hj = dec.videoPhash64s(seq(sd => Multimodal.syntheticSmoothJpeg(w, h, sd), g))
      assert(hb.size == 3 && hj.size == 3, s"g=$g sizes ${hb.size}/${hj.size}")
      hb.zip(hj).foreach { case (a, b) => assert(ham(a, b) <= 4, s"g=$g lossy hamming ${ham(a, b)}") }
      val hu = dec.videoPhash64s(seq(sd => Multimodal.syntheticSmoothBmp(w, h, sd), g + 777777L))
      assert(ham(hb.head, hu.head) > 8, s"g=$g unrelated hamming")
    }
    val good = (0 until 3).map(f => Multimodal.syntheticSmoothBmp(24, 16, f.toLong)).reduce(_ ++ _)
    assert(dec.videoPhash64s(good.take(good.length / 2)).isEmpty) // truncated
    assert(dec.videoPhash64s(Array.emptyByteArray).isEmpty)
    assert(dec.videoPhash64s(Multimodal.syntheticH264(2, 1, 3, 1L)).isEmpty) // stats-only format
  }

  test("audio fingerprint: duplicate-exact, dither-tolerant, content-sensitive") {
    val dec = Multimodal.PureJvmDecoder
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (g <- 0L until 8L) {
      val len = 4096 + (g % 7).toInt * 512
      val base = Multimodal.syntheticAmWav(len, 16000, g)
      val h0 = dec.audioFingerprint64(base).get
      assert(dec.audioFingerprint64(Multimodal.syntheticAmWav(len, 16000, g)).get == h0)
      val hn = dec.audioFingerprint64(Multimodal.noisyWav(base)).get
      assert(ham(h0, hn) <= 4, s"dither twin hamming ${ham(h0, hn)} at g=$g")
      val hu = dec.audioFingerprint64(Multimodal.syntheticAmWav(len, 16000, g + 999999L)).get
      assert(ham(h0, hu) > 8, s"unrelated hamming ${ham(h0, hu)} at g=$g")
    }
    // corrupt / short / non-WAV payloads flag, never crash
    assert(dec.audioFingerprint64(Array.emptyByteArray).isEmpty)
    assert(dec.audioFingerprint64(Multimodal.syntheticAmWav(4096, 16000, 1L).take(40)).isEmpty)
    assert(dec.audioFingerprint64(Multimodal.syntheticWav(64, 16000, 1L)).isEmpty) // too short
    assert(dec.audioFingerprint64(Array.fill[Byte](200)(0x22)).isEmpty)
  }

  test("dHash: format-invariant on lossless re-encode, noise-tolerant, content-sensitive") {
    val dec = Multimodal.PureJvmDecoder
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (g <- 0L until 8L) {
      val w = 16 + (g % 9).toInt
      val h = 12 + (g % 5).toInt
      val hb = dec.dHash64(Multimodal.syntheticBmpIo(w, h, g)).get
      val hp = dec.dHash64(Multimodal.syntheticPng(w, h, g)).get
      assert(hb == hp, s"BMP vs PNG of same pixels diverged at g=$g") // lossless re-encode
      val hn = dec.dHash64(Multimodal.noisyBmp(w, h, g)).get
      assert(ham(hb, hn) <= 4, s"noise twin hamming ${ham(hb, hn)} at g=$g")
      val hu = dec.dHash64(Multimodal.syntheticBmpIo(w, h, g + 777777L)).get
      assert(ham(hb, hu) > 8, s"unrelated hamming ${ham(hb, hu)} at g=$g")
    }
    // corrupt / non-image payloads flag, never crash
    assert(dec.dHash64(Array.emptyByteArray).isEmpty)
    assert(dec.dHash64(Multimodal.syntheticBmp(16, 12, 1L).take(20)).isEmpty)
    assert(dec.dHash64(Array.fill[Byte](100)(0x11)).isEmpty)
  }
}
