package graft

import graft.ops.{AudioCodec, MediaCodec}

/** Pins the real-image-codec contract behind q_mm_features / q_mm_resize:
  * a genuine PNG round-trip (encode → ImageIO decode) is bit-exact on the
  * raster, the payload really is PNG (magic number, not a pass-through),
  * and the nearest-neighbor resampler matches an independent index-math
  * replay. The DuckDB oracle proves the same end-to-end on the testdata;
  * this spec covers the adversarial rasters the corpus can't contain
  * (all 256 byte values, 1-byte payloads, non-multiple-of-width lengths).
  */
class MultimodalCodecSpec extends SparkSpec {

  private def roundtrip(bytes: Array[Byte]): Unit = {
    val png = MediaCodec.encodePng(bytes)
    // real PNG container, not a pass-through
    assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47))
    val d = MediaCodec.decodePng(png)
    assert(d.width == MediaCodec.Width)
    assert(d.height == MediaCodec.rows(bytes.length))
    val expected = bytes.padTo(d.width * d.height, 0.toByte)
    assert(d.pixels.toSeq == expected.toSeq, s"n=${bytes.length}")
  }

  test("decode(encode(x)) is bit-exact: all 256 byte values") {
    roundtrip(Array.tabulate(256)(_.toByte))
  }

  test("decode(encode(x)) is bit-exact: 1-byte and exact-row payloads") {
    roundtrip(Array[Byte](0))
    roundtrip(Array[Byte](-1)) // 0xff
    roundtrip(Array.tabulate(16)(i => (i * 17).toByte)) // exactly one row
    roundtrip(Array.tabulate(17)(i => (255 - i).toByte)) // one row + 1
    roundtrip(Array.tabulate(160)(i => ((i * 31) % 256).toByte))
  }

  test("decode(encode(x)) is bit-exact: deterministic pseudo-random bytes") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(3, 33, 100, 1000)) {
      val bytes = new Array[Byte](n)
      rnd.nextBytes(bytes)
      roundtrip(bytes)
    }
  }

  test("nearest-neighbor resize matches independent index-math replay") {
    val bytes = Array.tabulate(200)(i => ((i * 7 + 3) % 256).toByte)
    val d = MediaCodec.decodePng(MediaCodec.encodePng(bytes))
    val out = MediaCodec.resizeNearest(d, MediaCodec.OutW, MediaCodec.OutH)
    for (y <- 0 until MediaCodec.OutH; x <- 0 until MediaCodec.OutW) {
      val src = (y * d.height / 8) * d.width + (x * d.width / 8)
      val want = if (src < bytes.length) bytes(src) else 0.toByte
      assert(out(y * MediaCodec.OutW + x) == want, s"($x,$y)")
    }
  }

  test("resize is identity-compatible: 8x8 input maps pixel i -> 2i stride") {
    // h = 8 exactly when n = 128; then sy = y, sx = 2x — every other column
    val bytes = Array.tabulate(128)(i => (i % 256).toByte)
    val d = MediaCodec.decodePng(MediaCodec.encodePng(bytes))
    assert(d.height == 8)
    val out = MediaCodec.resizeNearest(d, 8, 8)
    for (y <- 0 until 8; x <- 0 until 8)
      assert((out(y * 8 + x) & 0xff) == ((y * 16 + 2 * x) % 256))
  }

  test("phash matches an independent bit-math replay; planted rasters " +
    "hit their hand-computed hashes") {
    // constant raster: every pixel equals the mean (p·64 == sum) — the
    // >= threshold sets ALL bits → 'ffffffffffffffff'
    val const = Array.fill(128)(65.toByte)
    assert(MediaCodec.encodeAndPhash(const) === "ffffffffffffffff")
    // half-bright / half-dark: n = 128 → 8×16 raster, resample takes
    // every other column; rows 0-3 bright (200), rows 4-7 dark (10) →
    // mean between → top 32 bits set, bottom 32 clear
    val half = Array.tabulate(128)(i => if (i < 64) 200.toByte else 10.toByte)
    assert(MediaCodec.encodeAndPhash(half) === "ffffffff00000000")
    // pseudo-random payload: replay the hash from the resample + integer
    // threshold independently
    val bytes = Array.tabulate(200)(i => ((i * 7 + 3) % 256).toByte)
    val d = MediaCodec.decodePng(MediaCodec.encodePng(bytes))
    val px = MediaCodec.resizeNearest(d, 8, 8).map(_ & 0xff)
    val sum = px.map(_.toLong).sum
    val want = (0 until 16).map { j =>
      val nib = (0 until 4).foldLeft(0) { (a, k) =>
        (a << 1) | (if (px(4 * j + k) * 64 >= sum) 1 else 0)
      }
      "0123456789abcdef".charAt(nib)
    }.mkString
    assert(MediaCodec.encodeAndPhash(bytes) === want)
  }

  // --- audio (WAV/PCM via javax.sound.sampled) ---------------------------

  /** Independent replay of the PCM mapping: decode the WAV with
    * AudioSystem and compare every sample against sampleOf(byte).
    */
  private def audioRoundtrip(bytes: Array[Byte]): Unit = {
    import javax.sound.sampled._
    val wav = AudioCodec.encodeWav(bytes)
    // real RIFF/WAVE container, not a pass-through
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    val f = ais.getFormat
    assert(f.getSampleRate == AudioCodec.SampleRate)
    assert(f.getChannels == 1 && f.getSampleSizeInBits == 16 && !f.isBigEndian)
    val data = ais.readAllBytes()
    assert(data.length == bytes.length * 2, s"n=${bytes.length}")
    for (i <- bytes.indices) {
      val got = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
      assert(got == AudioCodec.sampleOf(bytes(i)), s"sample $i of n=${bytes.length}")
    }
  }

  test("audio decode(encode(x)) is sample-exact: all 256 byte values") {
    audioRoundtrip(Array.tabulate(256)(_.toByte)) // incl. the clamped tail >= 208
  }

  test("audio decode(encode(x)) is sample-exact: tiny + pseudo-random streams") {
    audioRoundtrip(Array.empty[Byte])
    audioRoundtrip(Array[Byte](0))
    audioRoundtrip(Array[Byte]('P'.toByte)) // ascii 80 -> the zero sample
    val rnd = new scala.util.Random(42)
    for (n <- Seq(3, 100, 1000)) {
      val bytes = new Array[Byte](n)
      rnd.nextBytes(bytes)
      audioRoundtrip(bytes)
    }
  }

  test("audio features match hand-computed signal stats") {
    // "a a" = 97, 32, 97 -> samples (+17, -48, +17)*256: two strict crossings
    val f = AudioCodec.features(AudioCodec.encodeWav("a a".getBytes("UTF-8")))
    assert(f.n_samples == 3)
    assert(f.sample_rate == 8000)
    assert(f.amp_sum == (17L + 48L + 17L) * 256)
    assert(f.amp_max == 48 * 256)
    assert(f.zero_cross == 2)
    // zero samples end no crossing: "aPb" -> +17, 0, +18: product never < 0
    val z = AudioCodec.features(AudioCodec.encodeWav("aPb".getBytes("UTF-8")))
    assert(z.zero_cross == 0)
    // empty stream is total
    val e = AudioCodec.features(AudioCodec.encodeWav(Array.empty[Byte]))
    assert(e.n_samples == 0 && e.amp_sum == 0 && e.amp_max == 0 && e.zero_cross == 0)
  }

  test("features computes true dims + pixel stats incl. zero padding") {
    val bytes = Array.tabulate(20)(i => (i + 10).toByte) // 20 bytes -> 16x2, 12 pad zeros
    val f = MediaCodec.features(MediaCodec.encodePng(bytes))
    assert(f.width == 16 && f.height == 2)
    assert(f.px_sum == (10 until 30).sum.toLong)
    assert(f.px_min == 0) // padding participates
    assert(f.px_max == 29)
    val exact = MediaCodec.features(MediaCodec.encodePng(Array.tabulate(32)(i => (i + 5).toByte)))
    assert(exact.px_min == 5) // no padding when n % 16 == 0
  }
}
