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
      "video frame sampling: every 4th 64-byte chunk with a frame hash")
  )
}
