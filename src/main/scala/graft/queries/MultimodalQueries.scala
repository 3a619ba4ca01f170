package graft.queries

import graft.{Q, T}
import graft.ops.MultimodalOps

/** Multimodal (binary-column) plumbing: opaque payloads + typed metadata,
  * batched partition-wise decode with a deterministic stub codec (the
  * container ships no media libraries — see MultimodalOps scaladoc). */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    Q(
      "mm_decode_meta",
      (s, d) =>
        MultimodalOps
          .decode(MultimodalOps.mediaFromDocuments(T(s, d, "documents")))
          .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
             |  ['image','audio','video'][(doc_id % 3) + 1] AS modality,
             |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             |  CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END AS INTEGER) AS first_byte,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN 64 + octet_length(encode(text)) % 577 END AS INTEGER) AS width,
             |  CAST(CASE WHEN doc_id % 3 = 0
             |       THEN 64 + (octet_length(encode(text)) * 31 +
             |            CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END) % 353
             |       END AS INTEGER) AS height,
             |  CAST(CASE WHEN doc_id % 3 <> 0
             |       THEN 1000 + (octet_length(encode(text)) * 17) % 59000
             |       END AS INTEGER) AS duration_ms
             |FROM documents ORDER BY media_id""".stripMargin),
      "batched binary decode -> typed metadata (stub codec, real plumbing)"),

    Q(
      "mm_frame_sample",
      (s, d) =>
        MultimodalOps
          .sampleFrames(
            MultimodalOps.mediaFromDocuments(T(s, d, "documents")), stride = 4)
          .orderBy("media_id", "frame_idx"),
      None,
      "video frame sampling: every 4th 64-byte chunk with a frame hash"),

    // REAL codec round trip: the engine synthesizes actual BMP/WAV bytes
    // per row (MediaCodecs), then decodeReal parses them back — chunk
    // walk, BGR rows, 4-byte padding, PCM RMS. The oracle never touches a
    // byte: synthesis parameters are arithmetic in (doc_id, text), so it
    // derives every decoded field independently — a disagreement anywhere
    // in encode OR decode breaks the hash. Video stays NULL-metadata (no
    // pure-JVM video container; honest stub, per contract).
    Q(
      "mm_decode_real",
      (s, d) =>
        MultimodalOps
          .decodeReal(
            MultimodalOps.mediaFromDocumentsReal(T(s, d, "documents")))
          .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
             |  ['image','audio','video'][(doc_id % 3) + 1] AS modality,
             |  CAST(CASE doc_id % 3
             |    WHEN 0 THEN 54 + (4 + doc_id % 8) * (((8 + doc_id % 16) * 3 + 3) // 4) * 4
             |    WHEN 1 THEN 44 + (200 + octet_length(encode(text)) % 800) * 2
             |    ELSE octet_length(encode(text)) END AS INTEGER) AS n_bytes,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 16 END AS INTEGER) AS width,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN 4 + doc_id % 8 END AS INTEGER) AS height,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id * 37 % 256 END AS DOUBLE) AS mean_r,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id * 59 % 256 END AS DOUBLE) AS mean_g,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id * 83 % 256 END AS DOUBLE) AS mean_b,
             |  CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 END AS INTEGER) AS sample_rate,
             |  CAST(CASE WHEN doc_id % 3 = 1
             |       THEN 200 + octet_length(encode(text)) % 800 END AS INTEGER) AS n_samples,
             |  CAST(CASE WHEN doc_id % 3 = 1
             |       THEN (200 + octet_length(encode(text)) % 800) * 1000 // 8000
             |       END AS BIGINT) AS duration_ms,
             |  CAST(CASE WHEN doc_id % 3 = 1 THEN 1000 + doc_id * 97 % 20000 END AS DOUBLE) AS rms
             |FROM documents ORDER BY media_id""".stripMargin),
      "real BMP/WAV encode->decode round trip vs an arithmetic oracle")
  )
}
