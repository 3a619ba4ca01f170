package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in batched partition passes
  * (the Scala equivalent of a pandas-batch UDF — codec state amortizes
  * per partition, not per row).
  *
  * The codecs are REAL and dependency-free ([[MediaCodecs]]): BMP24
  * pixels, PCM-WAV samples, YUV4MPEG2 frames parsed from actual container
  * bytes, with corrupt payloads degrading to typed NULLs instead of
  * failing the job. Formats that genuinely need external libraries (JPEG,
  * H.264, ...) would slot into the same partition-batched shape. */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  val decodedRealSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_r", DoubleType, nullable = true),
    StructField("mean_g", DoubleType, nullable = true),
    StructField("mean_b", DoubleType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_samples", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("rms", DoubleType, nullable = true)))

  /** Media table with REAL payloads, synthesized per-row from (doc_id,
    * text) via [[MediaCodecs]]: image docs carry an actual 24bpp BMP
    * (solid deterministic color, real row padding), audio docs an actual
    * PCM-16 WAV (constant-amplitude signal), video docs an actual
    * YUV4MPEG2 mono stream (constant-luma frames at 25 fps — the standard
    * uncompressed interchange format, so no codec library is needed).
    * Synthesis parameters are arithmetic in doc_id/text so the decode and
    * frame-sample gates' oracles can derive the expected output without
    * parsing a byte. */
  def mediaFromDocumentsReal(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          (id % 3) match {
            case 0 =>
              val (w, h) = (8 + (id % 16).toInt, 4 + (id % 8).toInt)
              val rgb = ((id * 37 % 256).toInt, (id * 59 % 256).toInt,
                (id * 83 % 256).toInt)
              Row(id, "image", MediaCodecs.encodeBmp24(w, h, (_, _) => rgb))
            case 1 =>
              val amp = (1000 + id * 97 % 20000).toShort
              val n = 200 + text.getBytes("UTF-8").length % 800
              Row(id, "audio",
                MediaCodecs.encodeWavPcm16(8000, Array.fill(n)(amp)))
            case _ =>
              val nFrames = 2 + (id % 6).toInt
              val frames = (0 until nFrames).map(k =>
                Array.fill(16 * 8)(((id * 13 + k * 29) % 256).toByte))
              Row(id, "video", MediaCodecs.encodeY4mMono(16, 8, 25, 1, frames))
          }
        }
      }(enc)
  }

  val dhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("dhash", LongType, nullable = true)))

  /** Gradient-image media table: every doc carries an 18×16 24bpp BMP
    * whose GRAY pixel (x, y) = (e·37 + (e div 256)·97 + 5x + 11y)
    * mod 256, where e = doc_id except every 10th doc REUSES its
    * predecessor's pattern — planted visual duplicates ∝ n (the same
    * convention as the text corpus), while the high-bit mix keeps
    * unrelated ids from colliding mod 256. Non-degenerate (a solid fill
    * dHashes to 0) and pure arithmetic in doc_id, so the perceptual
    * gates' oracles derive every bit without parsing a byte (the
    * [[mediaFromDocumentsReal]] principle). */
  def gradientMediaFromDocs(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val e = if (id % 10 == 0 && id > 0) id - 1 else id
          val base = e * 37 + (e / 256) * 97
          Row(id, "image", MediaCodecs.encodeBmp24(18, 16, (x, y) => {
            val v = ((base + 5 * x + 11 * y) % 256).toInt
            (v, v, v)
          }))
        }
      }(enc)
  }

  /** Perceptual hash of every image payload ([[MediaCodecs.dhash64]]):
    * the batched partition pass that turns a binary image column into a
    * 64-bit near-dup key — Hamming-close dhashes are visual near-dups,
    * robust to re-encode/brightness, and the long drops into the same
    * band-bucketed pair machinery as SimHash. Non-image / corrupt
    * payloads degrade to typed NULLs. */
  def imageDhash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(dhashSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          Option(payload).flatMap(MediaCodecs.dhash64) match {
            case Some(m) => Row(id, m.width, m.height, m.dhash)
            case None => Row(id, null, null, null)
          }
        }
      }(enc)
  }

  val audioHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ahash", LongType, nullable = true)))

  /** Sawtooth-audio media table: every doc carries a mono 16-bit WAV of
    * 650 samples with sample(i) = (doc_id·31 + 7i) mod 4001 − 2000 — a
    * non-degenerate loudness contour (the constant-amplitude synthesis
    * hashes to 0) that is pure arithmetic in doc_id, so the envelope-
    * hash gate's oracle derives every window sum and bit without
    * parsing a byte (the gradient-BMP principle on the time axis). */
  def sawMediaFromDocs(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val samples = Array.tabulate(650)(i =>
            ((id * 31 + 7L * i) % 4001 - 2000).toShort)
          Row(id, "audio", MediaCodecs.encodeWavPcm16(8000, samples))
        }
      }(enc)
  }

  /** Gain-invariant envelope hash of every audio payload
    * ([[MediaCodecs.audioHash64]]): the 64-bit near-dup key for
    * recordings — volume-renormalized copies collide; non-audio /
    * corrupt payloads degrade to typed NULLs. The long drops into
    * [[DedupOps.hammingPairs64]] exactly like the image dHash. */
  def audioEnvelopeHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioHashSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          Option(payload).flatMap(MediaCodecs.audioHash64) match {
            case Some(h) => Row(id, h)
            case None => Row(id, null)
          }
        }
      }(enc)
  }

  /** Luma-ramp video media table: every doc carries a 65-frame 8×8 mono
    * Y4M whose frame k is a constant luma (doc_id·13 + 29k) mod 256 — a
    * brightness contour that is pure arithmetic in doc_id, so the
    * temporal-hash gate's oracle derives every bit without parsing a
    * byte. */
  def lumaRampMediaFromDocs(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val frames = (0 until 65).map(k =>
            Array.fill(8 * 8)(((id * 13 + 29L * k) % 256).toByte))
          Row(id, "video", MediaCodecs.encodeY4mMono(8, 8, 25, 1, frames))
        }
      }(enc)
  }

  /** Temporal hash of every video payload ([[MediaCodecs.videoHash64]]):
    * the 64-bit brightness-contour key — re-encoded/re-graded clips
    * collide; non-video / short / corrupt payloads degrade to typed
    * NULLs. Completes the perceptual triad with [[imageDhash]] and
    * [[audioEnvelopeHash]]; all three keys feed
    * [[DedupOps.hammingPairs64]]. */
  val videoHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("vhash", LongType, nullable = true)))

  def videoTemporalHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(videoHashSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          Option(payload).flatMap(MediaCodecs.videoHash64) match {
            case Some(h) => Row(id, h)
            case None => Row(id, null)
          }
        }
      }(enc)
  }

  /** Visual near-duplicate image pairs: [[imageDhash]] composed with
    * the generic banded Hamming join ([[DedupOps.hammingPairs64]]) —
    * the image arm of the dedup tier, finding re-encoded /
    * brightness-shifted copies a byte hash can't. Lossless for
    * maxHamming ≤ 3 (4×16 band pigeonhole); un-hashable payloads drop
    * out before the join. */
  def imageNearDupPairs(
      media: DataFrame, maxHamming: Int = 3): DataFrame =
    DedupOps.hammingPairs64(
      imageDhash(media).filter(col("dhash").isNotNull)
        .select(col("media_id"), col("dhash")),
      "media_id", "dhash", maxHamming)

  /** Real decode: sniff the container magic and parse it for actual
    * metadata — BMP dimensions + channel means (bottom-up rows, BGR,
    * 4-byte padding), WAV sample rate / frames / duration / RMS (chunk
    * walk, PCM). Unparseable payloads (video here) yield typed NULLs, not
    * errors — a corrupt object in a 100 TB corpus must degrade, not kill
    * the job. Same partition-batched shape as [[decode]]. */
  def decodeReal(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedRealSchema)
    media
      .select("media_id", "modality", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload =
            if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          val base = Row(r.getLong(0), r.getString(1), payload.length)
          val meta: Seq[Any] =
            if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
              MediaCodecs.decodeBmp(payload) match {
                case Some(m) => Seq(m.width, m.height, m.meanR, m.meanG,
                  m.meanB, null, null, null, null, null)
                case None => Seq.fill(10)(null)
              }
            else if (payload.length >= 4 && payload(0) == 'R' &&
                payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F')
              MediaCodecs.decodeWav(payload) match {
                case Some(m) => Seq(null, null, null, null, null,
                  m.sampleRate, m.nSamples, null, m.durationMs, m.rms)
                case None => Seq.fill(10)(null)
              }
            else if (payload.length >= 9 &&
                new String(payload, 0, 9, "US-ASCII") == "YUV4MPEG2")
              MediaCodecs.decodeY4mMeta(payload) match {
                case Some(m) => Seq(m.width, m.height, null, null, null,
                  null, null, m.nFrames, m.durationMs, null)
                case None => Seq.fill(10)(null)
              }
            else Seq.fill(10)(null)
          Row.fromSeq(base.toSeq ++ meta)
        }
      }(enc)
  }

  val sampledFrameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** REAL frame sampling: decode every `stride`-th frame of each Y4M
    * video payload and extract its mean luma — one partition-batched scan
    * (the decoder state amortizes per partition), rows fan out per
    * sampled frame. Non-video / unparseable payloads contribute nothing. */
  def sampleFramesReal(media: DataFrame, stride: Int): DataFrame = {
    // fail at the driver: stride 0 would throw "step cannot be 0" inside
    // every executor task, and a negative stride silently samples nothing
    require(stride > 0, s"stride=$stride must be positive")
    val enc = RowEncoder.encoderFor(sampledFrameSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload =
            if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          MediaCodecs.decodeY4mMeta(payload).toSeq.flatMap { m =>
            (0 until m.nFrames by stride).map { idx =>
              Row(r.getLong(0), idx,
                MediaCodecs.y4mFrameMeanLuma(payload, idx).get)
            }
          }
        }
      }(enc)
  }

  val resizedImageSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** REAL image resize: every BMP payload is nearest-neighbor resampled
    * to (outW, outH) ([[MediaCodecs.resizeBmpNearest]]), re-encoded, and
    * the RESIZED payload is decoded again for its dimensions and channel
    * means — the full thumbnail round trip through real bytes, batch-
    * mapped per partition like the other media ops. Non-image or
    * unparseable payloads contribute nothing (degrade, don't kill). */
  def resizeImagesReal(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, s"bad target size ${outW}x$outH")
    val enc = RowEncoder.encoderFor(resizedImageSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload =
            if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          for {
            resized <- MediaCodecs.resizeBmpNearest(payload, outW, outH)
            m <- MediaCodecs.decodeBmp(resized)
          } yield Row(r.getLong(0), m.width, m.height, resized.length,
            m.meanR, m.meanG, m.meanB)
        }
      }(enc)
  }

  val webImageSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  val decodedWebSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_r", DoubleType, nullable = true),
    StructField("mean_g", DoubleType, nullable = true),
    StructField("mean_b", DoubleType, nullable = true)))

  /** Web-format image table: every document carries a REAL PNG (even
    * doc_id) or JPEG (odd doc_id) payload encoded by the JDK's ImageIO —
    * the formats an actual web corpus holds, vs the byte-level teaching
    * codecs above. Pixels are a per-channel linear GRADIENT in (x, y)
    * (mod 256), so a decoder that peeks one pixel instead of traversing
    * the raster cannot fake the means; dimensions and gradient
    * coefficients are arithmetic in doc_id so the decode gate's oracle
    * derives PNG means without parsing a byte. */
  def mediaFromDocumentsWeb(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(webImageSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h) = (8 + (id % 16).toInt, 4 + (id % 8).toInt)
          val fmt = if (id % 2 == 0) "png" else "jpg"
          val px = (x: Int, y: Int) => (
            ((id * 31 + 7 * x + 11 * y) % 256).toInt,
            ((id * 53 + 5 * x + 3 * y) % 256).toInt,
            ((id * 71 + 2 * x + 13 * y) % 256).toInt)
          Row(id, MediaCodecs.encodeImageIO(fmt, w, h, px))
        }
      }(enc)
  }

  /** Decode PNG/JPEG payloads ([[MediaCodecs.decodeImageIO]]): sniff the
    * container magic, parse dimensions + exact per-channel means in one
    * partition-batched pass (decoder state amortizes per partition).
    * Corrupt or unrecognized payloads degrade to typed NULLs. PNG being
    * lossless, its means replay arithmetically from the synthesis
    * gradient (the gate's oracle); JPEG means are real decoded values
    * whose DCT quantization no SQL oracle can replay — the gate nulls
    * them and a unit test bounds them against the source gradient. */
  def decodeWebImages(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedWebSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val p =
            if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val fmt =
            if (p.length >= 4 && (p(0) & 0xff) == 0x89 && p(1) == 'P' &&
              p(2) == 'N' && p(3) == 'G') "png"
            else if (p.length >= 3 && (p(0) & 0xff) == 0xff &&
              (p(1) & 0xff) == 0xd8 && (p(2) & 0xff) == 0xff) "jpeg"
            else null
          (if (fmt == null) None else MediaCodecs.decodeImageIO(p)) match {
            case Some(m) => Row(r.getLong(0), fmt, m.width, m.height,
              m.meanR, m.meanG, m.meanB)
            case None => Row(r.getLong(0), fmt, null, null, null, null, null)
          }
        }
      }(enc)
  }

  /** Web-format thumbnail round trip: each PNG/JPEG payload is
    * nearest-neighbor resized to (outW, outH), re-encoded as PNG
    * ([[MediaCodecs.resizeImageNearest]]), and the RESIZED payload is
    * decoded again for dimensions + exact channel means — the
    * [[resizeImagesReal]] pipeline over the formats a web corpus
    * actually holds. Unparseable payloads contribute nothing (degrade,
    * don't kill). */
  def resizeWebImages(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, s"bad target size ${outW}x$outH")
    val enc = RowEncoder.encoderFor(resizedImageSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val p =
            if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          for {
            resized <- MediaCodecs.resizeImageNearest(p, outW, outH)
            m <- MediaCodecs.decodeImageIO(resized)
          } yield Row(r.getLong(0), m.width, m.height, resized.length,
            m.meanR, m.meanG, m.meanB)
        }
      }(enc)
  }
}
