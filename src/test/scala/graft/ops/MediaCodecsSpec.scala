package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM WAV/BMP codecs: round trips, real-file quirks (chunk
  * walking, row padding), and malformed-input rejection. */
class MediaCodecsSpec extends AnyFunSuite {

  test("WAV round trip: rate, frames, duration, RMS") {
    val samples = Array.tabulate(1000)(i => ((i % 200) - 100).toShort)
    val m = MediaCodecs.decodeWav(
      MediaCodecs.encodeWavPcm16(16000, samples)).get
    assert(m.sampleRate == 16000 && m.channels == 1 && m.bitsPerSample == 16)
    assert(m.nSamples == 1000 && m.durationMs == 62) // 1000*1000/16000
    val expectedRms = math.sqrt(
      samples.map(s => s.toDouble * s).sum / samples.length)
    assert(m.rms == expectedRms)
  }

  test("WAV chunk walk skips foreign chunks between fmt and data") {
    val wav = MediaCodecs.encodeWavPcm16(8000, Array[Short](7, 7, 7, 7))
    // splice a LIST chunk (id + size + 6 payload bytes) before `data`
    val dataAt = 36 // canonical layout: data chunk starts here
    val list = Array[Byte]('L', 'I', 'S', 'T', 6, 0, 0, 0, 1, 2, 3, 4, 5, 6)
    val spliced = wav.take(dataAt) ++ list ++ wav.drop(dataAt)
    // patch the RIFF size field (bytes 4-7, LE) for the extra 14 bytes
    val riffSize = (wav.length - 8) + list.length
    for (i <- 0 until 4) spliced(4 + i) = ((riffSize >> (8 * i)) & 0xff).toByte
    val m = MediaCodecs.decodeWav(spliced).get
    assert(m.nSamples == 4 && m.rms == 7.0)
  }

  test("BMP round trip recovers dimensions and channel means, padding included") {
    // width 3: row = 9 bytes, padded to 12 — exercises the 4-byte pad
    val m = MediaCodecs.decodeBmp(
      MediaCodecs.encodeBmp24(3, 2, (x, y) => (x * 40, y * 100, 200))).get
    assert(m.width == 3 && m.height == 2)
    assert(m.meanR == 40.0 && m.meanG == 50.0 && m.meanB == 200.0)
  }

  test("Y4M round trip: dimensions, fps, frame count, per-frame luma") {
    val frames = (0 until 5).map(k => Array.tabulate(12 * 4)(i =>
      ((k * 50 + i) % 256).toByte))
    val bytes = MediaCodecs.encodeY4mMono(12, 4, 30, 1, frames)
    val m = MediaCodecs.decodeY4mMeta(bytes).get
    assert(m.width == 12 && m.height == 4 && m.fpsNum == 30 && m.fpsDen == 1)
    assert(m.nFrames == 5 && m.durationMs == 166) // 5*1000/30
    for (k <- 0 until 5) {
      val expected = frames(k).map(_ & 0xff).sum.toDouble / (12 * 4)
      assert(MediaCodecs.y4mFrameMeanLuma(bytes, k).contains(expected))
    }
    assert(MediaCodecs.y4mFrameMeanLuma(bytes, 5).isEmpty, "out of range")
  }

  test("malformed payloads decode to None, never throw") {
    val junk = Array.tabulate(100)(_.toByte)
    assert(MediaCodecs.decodeWav(junk).isEmpty)
    assert(MediaCodecs.decodeBmp(junk).isEmpty)
    assert(MediaCodecs.decodeY4mMeta(junk).isEmpty)
    assert(MediaCodecs.decodeWav(Array.empty[Byte]).isEmpty)
    assert(MediaCodecs.decodeBmp(Array.empty[Byte]).isEmpty)
    assert(MediaCodecs.decodeY4mMeta(Array.empty[Byte]).isEmpty)
    // Y4M with a truncated trailing frame: body not a frame multiple
    val y4m = MediaCodecs.encodeY4mMono(4, 4, 25, 1,
      Seq(Array.fill(16)(9.toByte)))
    assert(MediaCodecs.decodeY4mMeta(y4m.dropRight(3)).isEmpty)
    // truncated-but-valid-magic: claims more data than present
    val wav = MediaCodecs.encodeWavPcm16(8000, Array.fill(100)(1.toShort))
    assert(MediaCodecs.decodeWav(wav.take(60)).isEmpty)
    val bmp = MediaCodecs.encodeBmp24(10, 10, (_, _) => (1, 2, 3))
    assert(MediaCodecs.decodeBmp(bmp.take(60)).isEmpty)
  }

  test("malformed headers behind a valid magic decode to None, never throw") {
    def y4m(header: String): Array[Byte] =
      (header + "\n").getBytes("US-ASCII")
    // F tag without a colon (the MatchError path), with two colons,
    // and non-numeric W/H/F values (the NumberFormatException path)
    assert(MediaCodecs.decodeY4mMeta(y4m("YUV4MPEG2 W16 H8 F25")).isEmpty)
    assert(MediaCodecs.decodeY4mMeta(y4m("YUV4MPEG2 W16 H8 F25:1:1 Cmono")).isEmpty)
    assert(MediaCodecs.decodeY4mMeta(y4m("YUV4MPEG2 Wx H8 F25:1 Cmono")).isEmpty)
    assert(MediaCodecs.decodeY4mMeta(y4m("YUV4MPEG2 W16 H8 F2x:1 Cmono")).isEmpty)
    // well-formed mono header with zero frames still decodes
    assert(MediaCodecs.decodeY4mMeta(y4m("YUV4MPEG2 W16 H8 F25:1 Cmono"))
      .exists(_.nFrames == 0))

    // BMP with a corrupt pixel-data offset: negative and before-header
    val bmp = MediaCodecs.encodeBmp24(4, 4, (_, _) => (9, 9, 9))
    def withOffset(off: Int): Array[Byte] = {
      val b = bmp.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(10, off)
      b
    }
    assert(MediaCodecs.decodeBmp(withOffset(-4)).isEmpty)
    assert(MediaCodecs.decodeBmp(withOffset(2)).isEmpty)

    // WAV whose fmt chunk declares fewer than the 16 PCM-fmt bytes
    val wav = MediaCodecs.encodeWavPcm16(8000, Array.fill(4)(1.toShort))
    val shortFmt = wav.clone()
    java.nio.ByteBuffer.wrap(shortFmt).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, 8) // fmt size 16 -> 8
    assert(MediaCodecs.decodeWav(shortFmt).isEmpty)
  }

  test("integer-overflow headers decode to None, never throw") {
    // BMP: width*3 would wrap Int negative and defeat the bounds check
    val bmp = MediaCodecs.encodeBmp24(4, 4, (_, _) => (9, 9, 9))
    val hugeW = bmp.clone()
    java.nio.ByteBuffer.wrap(hugeW).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 715827883) // width: *3 overflows to negative
    assert(MediaCodecs.decodeBmp(hugeW).isEmpty)
    // and the Long-overflow flavor: rowSize * height wraps even a Long
    val hugeWh = bmp.clone()
    java.nio.ByteBuffer.wrap(hugeWh).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, Int.MaxValue).putInt(22, Int.MaxValue)
    assert(MediaCodecs.decodeBmp(hugeWh).isEmpty)

    // Y4M: w*h wrapping to -6 would make frameBytes 0 (divide by zero);
    // with Long arithmetic the empty-body stream parses as zero frames
    val y4m = ("YUV4MPEG2 W45210182 H95 F25:1 Cmono\n").getBytes("US-ASCII")
    assert(MediaCodecs.decodeY4mMeta(y4m).exists(_.nFrames == 0))
    // ...and a non-empty body that can't be a whole frame is rejected
    assert(MediaCodecs.decodeY4mMeta(y4m ++ Array.fill(10)(1.toByte)).isEmpty)

    // WAV: odd-sized trailing chunk ending exactly at EOF — the +1 pad
    // byte does not exist; the walk must end, not throw
    val bb = java.nio.ByteBuffer.allocate(49)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(41)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("LIST".getBytes("US-ASCII")).putInt(5)
      .put(Array.fill(5)(7.toByte))
    assert(MediaCodecs.decodeWav(bb.array()).isEmpty) // no data chunk -> None
  }

  test("resizeBmpNearest picks floor-mapped source pixels, exact round trip") {
    // 4x2 gradient: pixel (x, y) = (10x, 100+10y, 200+x+y) — every pixel
    // unique, so the NN choice is observable. Downsample to 2x1:
    // dst (0,0) -> src (0*4/2, 0*2/1) = (0,0); dst (1,0) -> src (2,0).
    val src = MediaCodecs.encodeBmp24(4, 2,
      (x, y) => (10 * x, 100 + 10 * y, 200 + x + y))
    val out = MediaCodecs.resizeBmpNearest(src, 2, 1).get
    val meta = MediaCodecs.decodeBmp(out).get
    assert(meta.width == 2 && meta.height == 1)
    // chosen pixels: (0,0)=(0,100,200) and (2,0)=(20,100,202)
    assert(meta.meanR == 10.0 && meta.meanG == 100.0 && meta.meanB == 201.0)
    // upsample keeps solid regions exact: 1x1 of the same corner
    val one = MediaCodecs.resizeBmpNearest(src, 1, 1).get
    val m1 = MediaCodecs.decodeBmp(one).get
    assert((m1.meanR, m1.meanG, m1.meanB) == (0.0, 100.0, 200.0))
    // corrupt payloads degrade to None, never throw
    assert(MediaCodecs.resizeBmpNearest(Array[Byte](1, 2, 3), 2, 2).isEmpty)
    assert(MediaCodecs.resizeBmpNearest(src, 0, 2).isEmpty)
  }

  test("PNG ImageIO round trip is lossless: exact gradient channel means") {
    val (w, h) = (13, 7)
    val px = (x: Int, y: Int) => ((7 * x + 11 * y) % 256,
      (5 * x + 3 * y) % 256, (2 * x + 13 * y) % 256)
    val bytes = MediaCodecs.encodeImageIO("png", w, h, px)
    // container magic is real PNG
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P')
    val m = MediaCodecs.decodeImageIO(bytes).get
    assert(m.width == w && m.height == h)
    val pts = for (y <- 0 until h; x <- 0 until w) yield px(x, y)
    val n = (w * h).toDouble
    assert(m.meanR == pts.map(_._1.toLong).sum / n)
    assert(m.meanG == pts.map(_._2.toLong).sum / n)
    assert(m.meanB == pts.map(_._3.toLong).sum / n)
  }

  test("JPEG ImageIO decode: exact dimensions, means within DCT tolerance") {
    val (w, h) = (16, 8)
    val px = (x: Int, y: Int) => (40 + 2 * x, 80 + 3 * y, 120 + x + y)
    val bytes = MediaCodecs.encodeImageIO("jpg", w, h, px)
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
    val m = MediaCodecs.decodeImageIO(bytes).get
    assert(m.width == w && m.height == h) // dimensions survive lossy coding
    val pts = for (y <- 0 until h; x <- 0 until w) yield px(x, y)
    val n = (w * h).toDouble
    // smooth gradient: quantization error on the mean stays within a few
    // levels (per-pixel error can be larger; the mean averages it out)
    assert(math.abs(m.meanR - pts.map(_._1.toLong).sum / n) < 4.0)
    assert(math.abs(m.meanG - pts.map(_._2.toLong).sum / n) < 4.0)
    assert(math.abs(m.meanB - pts.map(_._3.toLong).sum / n) < 4.0)
  }

  test("resizeImageNearest floor-maps pixels; PNG round trip exact") {
    val src = MediaCodecs.encodeImageIO("png", 4, 2,
      (x, y) => (10 * x, 100 + 10 * y, 200 + x + y))
    val out = MediaCodecs.resizeImageNearest(src, 2, 1).get
    val m = MediaCodecs.decodeImageIO(out).get
    assert(m.width == 2 && m.height == 1)
    // chosen pixels: (0,0)=(0,100,200) and (2,0)=(20,100,202) — the
    // exact floor mapping resizeBmpNearest pins
    assert(m.meanR == 10.0 && m.meanG == 100.0 && m.meanB == 201.0)
    // JPEG input decodes and resizes without error (lossy values)
    val jpg = MediaCodecs.encodeImageIO("jpg", 8, 8, (_, _) => (50, 60, 70))
    assert(MediaCodecs.resizeImageNearest(jpg, 2, 2).isDefined)
    // corrupt input and degenerate targets degrade to None
    assert(MediaCodecs.resizeImageNearest(Array[Byte](9, 9), 2, 2).isEmpty)
    assert(MediaCodecs.resizeImageNearest(src, 0, 2).isEmpty)
  }

  test("dhash64: brightness-invariant, orientation-sensitive, corrupt degrades") {
    def img(f: (Int, Int) => Int): Array[Byte] =
      MediaCodecs.encodeBmp24(18, 16, (x, y) => { val v = f(x, y); (v, v, v) })
    val base = MediaCodecs.dhash64(img((x, y) => 10 * x + 3 * y)).get
    assert(base.width == 18 && base.height == 16)
    // x-increasing gradient: every right cell outshines its left → all
    // 64 bits set
    assert(base.dhash == -1L)
    // uniform +40 brightness (no wrap: max 255): differences unchanged
    assert(MediaCodecs.dhash64(img((x, y) => 10 * x + 3 * y + 40)).get
      .dhash == base.dhash)
    // mirrored gradient: different picture, different hash
    assert(MediaCodecs.dhash64(img((x, y) => 10 * (17 - x) + 3 * y)).get
      .dhash != base.dhash)
    // solid fill: every comparison ties → 0 (the degenerate case the
    // gate's gradient synthesis exists to avoid)
    assert(MediaCodecs.dhash64(img((_, _) => 128)).get.dhash == 0L)
    // corrupt/undersized payloads degrade to None, never throw
    assert(MediaCodecs.dhash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodecs.dhash64(
      MediaCodecs.encodeBmp24(4, 4, (_, _) => (1, 1, 1))).isEmpty) // < 9x8
  }

  test("audioHash64: gain-invariant, contour-sensitive, degenerate/corrupt degrade") {
    def wav(samples: Array[Short]): Array[Byte] =
      MediaCodecs.encodeWavPcm16(8000, samples)
    val saw = Array.tabulate(650)(i => ((i * 7) % 4001 - 2000).toShort)
    val h = MediaCodecs.audioHash64(wav(saw)).get
    assert(h != 0L)
    // exact 2x gain (no clip): every window sum doubles → identical hash
    assert(MediaCodecs.audioHash64(
      wav(saw.map(s => (s * 2).toShort))).get == h)
    // reversed recording: different loudness contour, different hash
    assert(MediaCodecs.audioHash64(wav(saw.reverse)).get != h)
    // constant amplitude: every comparison ties → 0
    assert(MediaCodecs.audioHash64(
      wav(Array.fill(650)(500.toShort))).get == 0L)
    // corrupt / too-short payloads degrade to None
    assert(MediaCodecs.audioHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodecs.audioHash64(
      wav(Array.fill(64)(1.toShort))).isEmpty) // < 65 samples
  }

  test("videoHash64: brightness contour key, exposure-invariant, short clips degrade") {
    def y4m(luma: Int => Int): Array[Byte] =
      MediaCodecs.encodeY4mMono(8, 8, 25, 1,
        (0 until 65).map(k => Array.fill(64)(luma(k).toByte)))
    val h = MediaCodecs.videoHash64(y4m(k => 10 + (k * 3) % 100)).get
    assert(h != 0L)
    // uniform exposure lift (no wrap): frame ordering, and the hash, hold
    assert(MediaCodecs.videoHash64(y4m(k => 40 + (k * 3) % 100)).get == h)
    // reversed clip: different contour
    assert(MediaCodecs.videoHash64(
      y4m(k => 10 + ((64 - k) * 3) % 100)).get != h)
    // static clip: all ties → 0
    assert(MediaCodecs.videoHash64(y4m(_ => 77)).get == 0L)
    // < 65 frames or non-Y4M: None
    assert(MediaCodecs.videoHash64(MediaCodecs.encodeY4mMono(8, 8, 25, 1,
      Seq(Array.fill(64)(1.toByte)))).isEmpty)
    assert(MediaCodecs.videoHash64(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("ImageIO decode degrades corrupt payloads to None, never throws") {
    assert(MediaCodecs.decodeImageIO(Array.empty[Byte]).isEmpty)
    assert(MediaCodecs.decodeImageIO(Array[Byte](1, 2, 3, 4)).isEmpty)
    val png = MediaCodecs.encodeImageIO("png", 6, 4, (_, _) => (9, 9, 9))
    assert(MediaCodecs.decodeImageIO(png.take(20)).isEmpty) // truncated
    val jpg = MediaCodecs.encodeImageIO("jpg", 6, 4, (_, _) => (9, 9, 9))
    val garbled = jpg.clone(); garbled(4) = 0x7f // corrupt the header body
    // must not throw regardless of whether the plugin salvages metadata
    MediaCodecs.decodeImageIO(garbled)
    assert(MediaCodecs.decodeImageIO(jpg.take(6)).isEmpty)
  }
}
