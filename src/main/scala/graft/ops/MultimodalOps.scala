package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in batched partition passes.
  *
  * Two codec tiers share the same partition-batched plan shape (the Scala
  * equivalent of a pandas-batch UDF — codec state amortizes per
  * partition, not per row):
  *
  *  - [[decode]] / [[decodeStub]]: the original clearly-marked STUB —
  *    metadata as a pure function of payload bytes, standing in for
  *    codecs that genuinely need external libraries (JPEG, H.264, ...).
  *  - [[decodeReal]] / [[sampleFramesReal]]: REAL dependency-free codecs
  *    via [[MediaCodecs]] — BMP24 pixels, PCM-WAV samples, YUV4MPEG2
  *    frames — parsed from actual container bytes, with corrupt payloads
  *    degrading to typed NULLs instead of failing the job.
  */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("first_byte", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", IntegerType, nullable = true)))

  /** Derive a media table from `documents`: payload = UTF-8 bytes of the
    * text (deterministic fake for a real object-store fetch), modality
    * round-robins image/audio/video. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("modality"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder ??? — replace with a real codec. Deterministic pure
    * function of (modality, payload) so tests and oracles can pin it:
    *   width       = 64 + n_bytes % 577         (image only)
    *   height      = 64 + (n_bytes * 31 + first_byte) % 353
    *   duration_ms = 1000 + (n_bytes * 17) % 59000  (audio/video only)
    */
  def decodeStub(modality: String, payload: Array[Byte]): (Int, Int, Option[Int], Option[Int], Option[Int]) = {
    val n = payload.length
    val first = if (n > 0) payload(0) & 0xff else 0
    modality match {
      case "image" =>
        (n, first, Some(64 + n % 577), Some(64 + (n * 31 + first) % 353), None)
      case _ =>
        (n, first, None, None, Some(1000 + (n * 17) % 59000))
    }
  }

  /** Batched decode over partitions: one iterator pass per partition, the
    * same batch shape a real decoder needs (amortized codec init per
    * partition, not per row). */
  def decode(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media
      .select("media_id", "modality", "payload")
      .mapPartitions { rows =>
        // real impl: initialize the codec ONCE here, then stream the batch
        rows.map { r =>
          val payload =
            if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          val (n, first, w, h, d) = decodeStub(r.getString(1), payload)
          Row(r.getLong(0), r.getString(1), n, first,
            w.orNull, h.orNull, d.orNull)
        }
      }(enc)
  }

  // ------------------------------------------------------- real codecs

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

  /** Frame sampling for video payloads: every `stride`-th 64-byte chunk,
    * as (media_id, frame_idx, frame_hash) — the shuffle-free scan shape a
    * real frame extractor would have. */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame = {
    val chunks = floor((length(col("payload")) + 63) / 64).cast(IntegerType)
    media
      .filter(col("modality") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), greatest(chunks - 1, lit(0)), lit(stride)))
          .as("frame_idx"))
      .withColumn("frame_hash",
        xxhash64(col("media_id"), col("frame_idx")))
  }
}
