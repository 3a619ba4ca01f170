package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Real, dependency-free media codecs: RIFF/WAV (PCM 16-bit), BMP (24bpp
  * bottom-up), and YUV4MPEG2 (uncompressed video) encode + decode in pure
  * JVM byte arithmetic — chunk walking, little-endian fields, BMP's
  * 4-byte row padding, Y4M's plain-text stream header.
  *
  * Decode contract: corrupt or truncated payloads return None — NEVER
  * throw — because one bad object in a 100 TB corpus must degrade to a
  * typed NULL row, not kill the executor task. Every header field is
  * bounds-checked before use; numeric header text parses via toIntOption.
  *
  * Everything is deterministic, so the `mm_decode_real` gate can verify a
  * full encode→decode round trip against a DuckDB oracle that derives the
  * same metadata arithmetically from the synthesis parameters.
  */
object MediaCodecs {

  // ---------------------------------------------------------------- WAV

  final case class WavMeta(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int, durationMs: Long, rms: Double)

  /** Canonical 44-byte-header PCM WAV. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** The RIFF/WAVE chunk walk shared by [[decodeWav]] and
    * [[audioHash64]]: locate `fmt ` + `data`, tolerate extra chunks
    * between them (real files have LIST/INFO there); None on anything
    * that is not a RIFF/WAVE PCM container.
    * @return (sampleRate, channels, bits, dataOffset, dataSize) */
  private def walkPcm(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (bytes.length < 44) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); bb.get(magic)
    if (new String(magic, "US-ASCII") != "RIFF") return None
    bb.getInt() // riff size
    bb.get(magic)
    if (new String(magic, "US-ASCII") != "WAVE") return None
    var sampleRate = 0; var channels = 0; var bits = 0
    var data: Option[(Int, Int)] = None // (offset, size)
    while (bb.remaining() >= 8 && data.isEmpty) {
      bb.get(magic)
      val id = new String(magic, "US-ASCII")
      val size = bb.getInt()
      if (size < 0 || size > bb.remaining()) return None
      id match {
        case "fmt " =>
          // a truncated fmt body (declared size < the 16 bytes read below)
          // could underflow at end-of-buffer; reject before reading
          if (size < 16) return None
          val pos = bb.position()
          val fmt = bb.getShort()
          channels = bb.getShort()
          sampleRate = bb.getInt()
          bits = { bb.getInt(); bb.getShort(); bb.getShort() }
          if (fmt != 1) return None // PCM only
          // odd-sized chunk at EOF: the +1 pad byte may not exist — clamp
          // to limit so the walk ends instead of position() throwing
          bb.position(math.min(pos + size + (size & 1), bb.limit()))
        case "data" =>
          data = Some((bb.position(), size))
        case _ =>
          bb.position(math.min(bb.position() + size + (size & 1), bb.limit()))
      }
    }
    data.map { case (off, size) => (sampleRate, channels, bits, off, size) }
  }

  def decodeWav(bytes: Array[Byte]): Option[WavMeta] = {
    walkPcm(bytes).flatMap { case (sampleRate, channels, bits, off, size) =>
      if (sampleRate <= 0 || channels <= 0 || bits != 16) None
      else {
        val n = size / 2
        var sumSq = 0.0
        val sb = ByteBuffer.wrap(bytes, off, size).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) { val s = sb.getShort().toDouble; sumSq += s * s; i += 1 }
        val frames = n / channels
        Some(WavMeta(sampleRate, channels, bits, frames,
          frames.toLong * 1000L / sampleRate,
          if (n == 0) 0.0 else math.sqrt(sumSq / n)))
      }
    }
  }

  /** Gain-invariant audio envelope hash — the dHash idea on the time
    * axis: 65 windows of summed-|PCM| energy over the mono 16-bit data
    * chunk, bit w set iff window w+1 outshines window w
    * (cross-multiplied integer sums, exact for ragged windows). A
    * uniform gain change scales every window equally, so the
    * comparisons — and the hash — are VOLUME-INVARIANT: re-normalized
    * copies of a recording collide, which an RMS or byte hash cannot
    * do. Hamming-close hashes = same loudness contour. */
  def audioHash64(bytes: Array[Byte]): Option[Long] =
    walkPcm(bytes).flatMap { case (sr, ch, bits, off, size) =>
      val n = size / 2
      if (sr <= 0 || ch != 1 || bits != 16 || n < 65) None
      else {
        val sums = new Array[Long](65)
        val counts = new Array[Long](65)
        val sb = ByteBuffer.wrap(bytes, off, size)
          .order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) {
          val w = (i.toLong * 65 / n).toInt
          sums(w) += math.abs(sb.getShort().toLong)
          counts(w) += 1
          i += 1
        }
        var h = 0L
        var w = 0
        while (w < 64) {
          if (sums(w + 1) * counts(w) > sums(w) * counts(w + 1))
            h |= 1L << w
          w += 1
        }
        Some(h)
      }
    }

  // ---------------------------------------------------------------- BMP

  final case class BmpMeta(
      width: Int, height: Int, meanR: Double, meanG: Double, meanB: Double)

  /** 24bpp bottom-up BMP with the standard 54-byte header and rows padded
    * to 4 bytes — the quirks a real parser must get right. */
  def encodeBmp24(
      width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val imgSize = rowSize * height
    val bb = ByteBuffer.allocate(54 + imgSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
      .putInt(0).putInt(54)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(imgSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- height - 1 to 0 by -1) { // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, row)
        bb.put(b.toByte).put(g.toByte).put(r.toByte) // BGR order
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
    }
    bb.array()
  }

  // ---------------------------------------------------------------- Y4M

  final case class Y4mMeta(
      width: Int, height: Int, fpsNum: Int, fpsDen: Int, nFrames: Int,
      durationMs: Long)

  /** YUV4MPEG2 (Y4M) — the standard uncompressed video interchange format
    * (what ffmpeg pipes to codec developers): a plain-text stream header,
    * then `FRAME\n` + raw planes per frame. `Cmono` = luma plane only. */
  def encodeY4mMono(
      width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.forall(_.length == width * height), "plane size mismatch")
    val header =
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A0:0 Cmono\n"
        .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = ByteBuffer.allocate(
      header.length + frames.map(f => marker.length + f.length).sum)
    out.put(header)
    frames.foreach { f => out.put(marker); out.put(f) }
    out.array()
  }

  def decodeY4mMeta(bytes: Array[Byte]): Option[Y4mMeta] = {
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 9) return None
    val header = new String(bytes, 0, nl, "US-ASCII")
    if (!header.startsWith("YUV4MPEG2")) return None
    var (w, h, fn, fd) = (0, 0, 0, 1)
    var mono = false
    // malformed tags (non-numeric W/H, an F without exactly one ':') must
    // yield None, not MatchError/NumberFormatException — the magic check
    // alone doesn't make the rest of the header trustworthy
    var bad = false
    def num(s: String)(set: Int => Unit): Unit =
      s.toIntOption match { case Some(v) => set(v); case None => bad = true }
    header.split(' ').drop(1).foreach { tag =>
      if (tag.nonEmpty) tag.head match {
        case 'W' => num(tag.tail)(w = _)
        case 'H' => num(tag.tail)(h = _)
        case 'F' => tag.tail.split(':') match {
          case Array(a, b) => num(a)(fn = _); num(b)(fd = _)
          case _ => bad = true
        }
        case 'C' => mono = tag.tail == "mono"
        case _ => ()
      }
    }
    if (bad || w <= 0 || h <= 0 || fn <= 0 || fd <= 0 || !mono) return None
    // Long: a corrupt ~2^16 x 2^16 header would overflow w*h to <= 0 and
    // the modulo below would divide by zero (or accept garbage)
    val frameBytes = 6L + w.toLong * h // "FRAME\n" + luma plane
    val body = (bytes.length - (nl + 1)).toLong
    if (body % frameBytes != 0) return None
    val n = (body / frameBytes).toInt
    Some(Y4mMeta(w, h, fn, fd, n, n.toLong * 1000L * fd / fn))
  }

  /** Mean luma of frame `idx` (0-based) — the real per-frame feature
    * extraction behind frame sampling. None if out of range / not Y4M. */
  def y4mFrameMeanLuma(bytes: Array[Byte], idx: Int): Option[Double] =
    decodeY4mMeta(bytes).flatMap { m =>
      if (idx < 0 || idx >= m.nFrames) None
      else {
        val nl = bytes.indexOf('\n'.toByte)
        val plane = m.width * m.height
        val off = nl + 1 + idx * (6 + plane) + 6
        var sum = 0L
        var i = 0
        while (i < plane) { sum += bytes(off + i) & 0xff; i += 1 }
        Some(sum.toDouble / plane)
      }
    }

  /** Temporal video hash — the third member of the perceptual triad
    * beside [[dhash64]] (space) and [[audioHash64]] (time-domain
    * audio): per-frame luma sums over the first 65 frames, bit k set
    * iff frame k+1 is brighter than frame k. Exposure-invariant the
    * same way (uniform gain preserves frame ordering); Hamming-close
    * hashes = same brightness contour, catching re-encoded or
    * re-graded copies of a clip. Requires ≥ 65 frames; None otherwise
    * (and for any non-Y4M payload). */
  def videoHash64(bytes: Array[Byte]): Option[Long] =
    decodeY4mMeta(bytes).flatMap { m =>
      if (m.nFrames < 65) None
      else {
        val nl = bytes.indexOf('\n'.toByte)
        val plane = m.width * m.height
        val sums = new Array[Long](65)
        var k = 0
        while (k < 65) {
          val off = nl + 1 + k * (6 + plane) + 6
          var s = 0L
          var i = 0
          while (i < plane) { s += bytes(off + i) & 0xff; i += 1 }
          sums(k) = s
          k += 1
        }
        var h = 0L
        var w = 0
        while (w < 64) {
          if (sums(w + 1) > sums(w)) h |= 1L << w
          w += 1
        }
        Some(h)
      }
    }

  /** Nearest-neighbor resize of a 24bpp BMP payload, re-encoded as a
    * fresh BMP (standard NN mapping src = floor(dst·srcDim/dstDim) — the
    * thumbnail/downsample step of an image-preprocessing pipeline).
    * Returns None for anything [[decodeBmp]] would reject; reuses its
    * corrupt-header hardening (Long row arithmetic, offset bounds) by
    * validating through it first. */
  def resizeBmpNearest(
      bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    if (outW <= 0 || outH <= 0) return None
    decodeBmp(bytes).map { meta =>
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val offset = bb.getInt(10)
      val rowSize = ((meta.width.toLong * 3 + 3) / 4) * 4
      encodeBmp24(outW, outH, (x, y) => {
        val sx = (x.toLong * meta.width / outW).toInt
        val sy = (y.toLong * meta.height / outH).toInt
        // stored bottom-up: image row sy lives at stored row height-1-sy
        val base =
          (offset + (meta.height - 1L - sy) * rowSize + sx * 3L).toInt
        (bytes(base + 2) & 0xff, bytes(base + 1) & 0xff, bytes(base) & 0xff)
      })
    }
  }

  def decodeBmp(bytes: Array[Byte]): Option[BmpMeta] = {
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte)
      return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val offset = bb.getInt(10)
    val width = bb.getInt(18)
    val height = bb.getInt(22)
    val bpp = bb.getShort(28)
    if (bpp != 24 || width <= 0 || height <= 0) return None
    // Long arithmetic: width*3 on a corrupt ~2^30 width overflows Int to a
    // negative rowSize that would sail through the bounds check below
    val rowSize = ((width.toLong * 3 + 3) / 4) * 4
    // lower bound too: a corrupt negative/tiny offset would pass the upper
    // check and then index before the pixel array (or before byte 0)
    if (offset < 54) return None
    // divide, don't multiply: rowSize * height can overflow even a Long
    // (width = height = Int.MaxValue), wrapping negative past the check
    if ((bytes.length.toLong - offset) / rowSize < height) return None
    var (sr, sg, sb2) = (0L, 0L, 0L)
    for (row <- 0 until height) {
      // safe: the Long bounds check above caps offset + rowSize*height at
      // bytes.length, so this fits an Int
      var base = (offset + row * rowSize).toInt
      var x = 0
      while (x < width) {
        sb2 += bytes(base) & 0xff
        sg += bytes(base + 1) & 0xff
        sr += bytes(base + 2) & 0xff
        base += 3; x += 1
      }
    }
    val n = width.toLong * height
    Some(BmpMeta(width, height,
      sr.toDouble / n, sg.toDouble / n, sb2.toDouble / n))
  }

  final case class DhashMeta(width: Int, height: Int, dhash: Long)

  /** Perceptual difference-hash (dHash) of a BMP24 payload: grayscale
    * the pixels (integer 299/587/114 weights), pool into a 9×8 grid of
    * block sums, set bit (cy·8 + cx) iff the right cell outshines the
    * left — 64 bits that survive re-encoding, uniform brightness shifts
    * (differences are shift-invariant) and small crops, which byte
    * hashes don't. Ragged grids compare CROSS-MULTIPLIED sums
    * (s_r·a_l > s_l·a_r — exact integers, no division), so any
    * dimensions ≥ 9×8 hash; ties clear the bit.
    *
    * The canonical image near-dup primitive: Hamming-close dhashes =
    * visually-near-duplicate images, and the 64-bit value drops into
    * the same band-bucketed pair machinery as SimHash. */
  def dhash64(bytes: Array[Byte]): Option[DhashMeta] = {
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte)
      return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val offset = bb.getInt(10)
    val width = bb.getInt(18)
    val height = bb.getInt(22)
    val bpp = bb.getShort(28)
    if (bpp != 24 || width < 9 || height < 8) return None
    val rowSize = ((width.toLong * 3 + 3) / 4) * 4
    if (offset < 54) return None
    if ((bytes.length.toLong - offset) / rowSize < height) return None
    val sums = new Array[Long](72)
    val areas = new Array[Long](72)
    var y = 0
    while (y < height) {
      // stored bottom-up; y here is the TOP-DOWN logical row
      val base0 = (offset + (height - 1 - y) * rowSize).toInt
      val cy = y * 8 / height
      var x = 0
      var base = base0
      while (x < width) {
        val b = bytes(base) & 0xff
        val g = bytes(base + 1) & 0xff
        val r = bytes(base + 2) & 0xff
        val gray = (r * 299 + g * 587 + b * 114) / 1000
        val cell = cy * 9 + x * 9 / width
        sums(cell) += gray
        areas(cell) += 1
        base += 3; x += 1
      }
      y += 1
    }
    var h = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val l = cy * 9 + cx
        val r = l + 1
        if (sums(r) * areas(l) > sums(l) * areas(r))
          h |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    Some(DhashMeta(width, height, h))
  }

  // ------------------------------------------ PNG / JPEG (javax.imageio)

  /** Encode via the JDK's bundled ImageIO plugins — pure JVM, zero new
    * dependencies. `format` is an ImageIO writer name ("png", "jpg").
    * PNG is lossless, so a decode of an encodePng payload returns the
    * source pixels bit-exactly; JPEG is lossy by design (DCT +
    * quantization), so only its DIMENSIONS are exactly recoverable. */
  def encodeImageIO(
      format: String, width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in tasks
    // write returns false (without writing a byte) when no writer is
    // registered for `format` — a CALLER misconfiguration, which must
    // fail loudly, not masquerade as a corrupt payload downstream
    require(javax.imageio.ImageIO.write(img, format, baos),
      s"no ImageIO writer registered for format '$format'")
    baos.toByteArray
  }

  /** Decode-size ceiling: a few-KB adversarial payload can DECLARE a
    * 50000×50000 raster whose pixel array would be ~10 GB — an
    * OutOfMemoryError (an Error, uncatchable by the Exception handler)
    * that would kill the task in defiance of the degrade-to-NULL
    * contract. 16.7M pixels (4096²) covers any legitimate corpus image
    * at this tier; larger payloads degrade to None BEFORE allocation. */
  private val MaxDecodePixels = 1L << 24

  /** Decode any ImageIO-supported container (PNG, JPEG, GIF, BMP...) to
    * dimensions + exact per-channel means. Same contract as the
    * hand-rolled codecs: corrupt/truncated/unrecognized payloads return
    * None — ImageIO signals corruption both ways (null return AND
    * IIOException), and one bad object in a 100 TB corpus must degrade
    * to a typed NULL row, not kill the executor task. Channel sums are
    * exact integers; the mean is one final IEEE division, so lossless
    * sources (PNG) gate against an arithmetic oracle bit-exactly. */
  def decodeImageIO(bytes: Array[Byte]): Option[BmpMeta] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0 ||
        img.getWidth.toLong * img.getHeight > MaxDecodePixels) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < px.length) {
          sr += (px(i) >> 16) & 0xff
          sg += (px(i) >> 8) & 0xff
          sb += px(i) & 0xff
          i += 1
        }
        val n = w.toLong * h
        Some(BmpMeta(w, h,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
      }
    } catch { case _: Exception => None }

  /** Nearest-neighbor resize of any ImageIO-decodable payload (PNG,
    * JPEG, ...) re-encoded as PNG — the web-corpus thumbnail step. The
    * pixel mapping is the explicit floor map dst(x,y) ← src(x·w/outW,
    * y·h/outH), the same arithmetic as [[resizeBmpNearest]] — NOT
    * Graphics2D scaling, whose interpolation/antialiasing choices are
    * renderer-dependent and could never gate. PNG output is lossless,
    * so resize(png gradient) replays arithmetically in the oracle.
    * Corrupt/unrecognized input or non-positive target → None. */
  def resizeImageNearest(
      bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] =
    if (outW <= 0 || outH <= 0) None
    else
      try {
        javax.imageio.ImageIO.setUseCache(false)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0 ||
          img.getWidth.toLong * img.getHeight > MaxDecodePixels) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val out = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) {
              out.setRGB(x, y,
                img.getRGB(x * w / outW, y * h / outH) & 0xffffff)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          Some(baos.toByteArray)
        }
      } catch { case _: Exception => None }
}
