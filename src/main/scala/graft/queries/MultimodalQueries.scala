package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.ops.MultimodalOps

/** Multimodal (binary-column) gates: opaque payloads + typed metadata,
  * batched partition-wise decode through REAL pure-JVM codecs — BMP24,
  * PCM-WAV, YUV4MPEG2 — gated end to end as encode→decode round trips
  * against arithmetic oracles. (The round-3 stub-codec tier is retired:
  * the real codecs exercise strictly more — actual container bytes —
  * with strictly stronger gates.) */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    // REAL codec round trip: the engine synthesizes actual BMP/WAV/Y4M
    // bytes per row (MediaCodecs), then decodeReal parses them back —
    // chunk walk, BGR rows, 4-byte padding, PCM RMS, Y4M stream header.
    // The oracle never touches a byte: synthesis parameters are
    // arithmetic in (doc_id, text), so it derives every decoded field
    // independently — a disagreement anywhere in encode OR decode breaks
    // the hash. (Y4M mono: 37-byte header "YUV4MPEG2 W16 H8 F25:1 Ip
    // A0:0 Cmono\n", then per frame "FRAME\n" + 128 luma bytes.)
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
             |    ELSE 37 + (2 + doc_id % 6) * 134 END AS INTEGER) AS n_bytes,
             |  CAST(CASE doc_id % 3 WHEN 0 THEN 8 + doc_id % 16
             |       WHEN 2 THEN 16 END AS INTEGER) AS width,
             |  CAST(CASE doc_id % 3 WHEN 0 THEN 4 + doc_id % 8
             |       WHEN 2 THEN 8 END AS INTEGER) AS height,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id * 37 % 256 END AS DOUBLE) AS mean_r,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id * 59 % 256 END AS DOUBLE) AS mean_g,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id * 83 % 256 END AS DOUBLE) AS mean_b,
             |  CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 END AS INTEGER) AS sample_rate,
             |  CAST(CASE WHEN doc_id % 3 = 1
             |       THEN 200 + octet_length(encode(text)) % 800 END AS INTEGER) AS n_samples,
             |  CAST(CASE WHEN doc_id % 3 = 2 THEN 2 + doc_id % 6 END AS INTEGER) AS n_frames,
             |  CAST(CASE doc_id % 3
             |       WHEN 1 THEN (200 + octet_length(encode(text)) % 800) * 1000 // 8000
             |       WHEN 2 THEN (2 + doc_id % 6) * 40
             |       END AS BIGINT) AS duration_ms,
             |  CAST(CASE WHEN doc_id % 3 = 1 THEN 1000 + doc_id * 97 % 20000 END AS DOUBLE) AS rms
             |FROM documents ORDER BY media_id""".stripMargin),
      "real BMP/WAV/Y4M encode->decode round trip vs an arithmetic oracle"),

    // Real frame sampling: decode every 2nd Y4M frame, extract mean luma.
    // Same oracle principle — frame luma is (doc_id*13 + idx*29) % 256 by
    // construction, so the oracle enumerates frames with generate_series
    // and never parses video bytes.
    Q(
      "mm_frame_sample_real",
      (s, d) =>
        MultimodalOps
          .sampleFramesReal(
            MultimodalOps.mediaFromDocumentsReal(T(s, d, "documents")),
            stride = 2)
          .orderBy("media_id", "frame_idx"),
      Some("""SELECT doc_id AS media_id,
             |  CAST(idx AS INTEGER) AS frame_idx,
             |  CAST((doc_id * 13 + idx * 29) % 256 AS DOUBLE) AS mean_luma
             |FROM (SELECT doc_id,
             |        unnest(generate_series(0, CAST(1 + doc_id % 6 AS BIGINT), 2)) AS idx
             |      FROM documents WHERE doc_id % 3 = 2)
             |ORDER BY media_id, frame_idx""".stripMargin),
      "real Y4M frame sampling: every 2nd frame's mean luma vs an arithmetic oracle"),

    // REAL image resize: BMP payloads nearest-neighbor downsampled to
    // 4×2, re-encoded, and the RESIZED bytes decoded again
    // ([[graft.ops.MultimodalOps.resizeImagesReal]]) — the thumbnail
    // round trip. The corpus images are solid-color, so the resized
    // channel means equal the synthesis color exactly whatever pixels NN
    // picked (the sampling behavior itself is pinned by a gradient unit
    // test); n_bytes is the 4×2 BMP's exact 78 (54 header + 12-byte
    // padded rows × 2).
    Q(
      "mm_resize_real",
      (s, d) =>
        MultimodalOps
          .resizeImagesReal(
            MultimodalOps.mediaFromDocumentsReal(T(s, d, "documents")),
            outW = 4, outH = 2)
          .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
             |  CAST(4 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
             |  CAST(78 AS INTEGER) AS n_bytes,
             |  CAST(doc_id * 37 % 256 AS DOUBLE) AS mean_r,
             |  CAST(doc_id * 59 % 256 AS DOUBLE) AS mean_g,
             |  CAST(doc_id * 83 % 256 AS DOUBLE) AS mean_b
             |FROM documents WHERE doc_id % 3 = 0
             |ORDER BY media_id""".stripMargin),
      "real BMP nearest-neighbor resize round trip: resized bytes re-decoded vs arithmetic oracle"),

    // PNG/JPEG decode through the JDK's ImageIO — the formats a real web
    // corpus holds ([[MultimodalOps.decodeWebImages]]). Payloads are
    // per-channel GRADIENT images (a one-pixel peek can't fake the
    // means). PNG is lossless: dimensions AND exact channel means gate
    // against the synthesis arithmetic (integer channel sums, one final
    // IEEE division, mirrored in SQL). JPEG's DCT quantization is not
    // SQL-replayable, so the gate nulls its means and checks dimensions;
    // the decoded JPEG means are bounded against the source gradient by
    // a unit test (MediaCodecsSpec) instead.
    Q(
      "mm_decode_jpeg",
      (s, d) =>
        MultimodalOps
          .decodeWebImages(
            MultimodalOps.mediaFromDocumentsWeb(T(s, d, "documents")))
          .withColumn("mean_r", when(col("format") === "jpeg",
            lit(null).cast("double")).otherwise(col("mean_r")))
          .withColumn("mean_g", when(col("format") === "jpeg",
            lit(null).cast("double")).otherwise(col("mean_g")))
          .withColumn("mean_b", when(col("format") === "jpeg",
            lit(null).cast("double")).otherwise(col("mean_b")))
          .orderBy("media_id"),
      Some("""WITH dims AS (
             |  SELECT doc_id, CAST(8 + doc_id % 16 AS INTEGER) AS w,
             |    CAST(4 + doc_id % 8 AS INTEGER) AS h
             |  FROM documents),
             |px AS (SELECT doc_id, w, h,
             |    unnest(generate_series(0, w * h - 1)) AS i
             |  FROM dims),
             |m AS (SELECT doc_id,
             |    CAST(sum((doc_id*31 + 7*(i % w) + 11*(i // w)) % 256)
             |         AS DOUBLE) / (w * h) AS mr,
             |    CAST(sum((doc_id*53 + 5*(i % w) + 3*(i // w)) % 256)
             |         AS DOUBLE) / (w * h) AS mg,
             |    CAST(sum((doc_id*71 + 2*(i % w) + 13*(i // w)) % 256)
             |         AS DOUBLE) / (w * h) AS mb
             |  FROM px GROUP BY doc_id, w, h)
             |SELECT d.doc_id AS media_id,
             |  CASE WHEN d.doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
             |  d.w AS width, d.h AS height,
             |  CASE WHEN d.doc_id % 2 = 0 THEN m.mr END AS mean_r,
             |  CASE WHEN d.doc_id % 2 = 0 THEN m.mg END AS mean_g,
             |  CASE WHEN d.doc_id % 2 = 0 THEN m.mb END AS mean_b
             |FROM dims d JOIN m USING (doc_id)
             |ORDER BY media_id""".stripMargin),
      "PNG/JPEG ImageIO decode: exact PNG gradient means + JPEG dimensions vs arithmetic oracle"),

    // Web-format thumbnail round trip ([[MultimodalOps.resizeWebImages]]):
    // PNG gradients nearest-neighbor resized to 4x2 with the explicit
    // floor map (never Graphics2D scaling — renderer-dependent), re-
    // encoded as PNG, re-decoded. Restricted to the PNG half (lossless
    // end to end), so the oracle derives each thumbnail pixel straight
    // from the synthesis gradient; n_bytes is deflate-dependent and
    // projected away.
    Q(
      "mm_resize_web",
      (s, d) =>
        MultimodalOps
          .resizeWebImages(
            MultimodalOps.mediaFromDocumentsWeb(T(s, d, "documents"))
              .filter(col("media_id") % 2 === 0),
            outW = 4, outH = 2)
          .drop("n_bytes")
          .orderBy("media_id"),
      Some("""WITH dims AS (
             |  SELECT doc_id, 8 + doc_id % 16 AS w, 4 + doc_id % 8 AS h
             |  FROM documents WHERE doc_id % 2 = 0),
             |px AS (SELECT doc_id, w, h,
             |    unnest(generate_series(0, 7)) AS i
             |  FROM dims),
             |p AS (SELECT doc_id,
             |    ((i % 4) * w) // 4 AS x, ((i // 4) * h) // 2 AS y
             |  FROM px),
             |m AS (SELECT doc_id,
             |    CAST(sum((doc_id*31 + 7*x + 11*y) % 256) AS DOUBLE) / 8 AS mr,
             |    CAST(sum((doc_id*53 + 5*x + 3*y) % 256) AS DOUBLE) / 8 AS mg,
             |    CAST(sum((doc_id*71 + 2*x + 13*y) % 256) AS DOUBLE) / 8 AS mb
             |  FROM p GROUP BY doc_id)
             |SELECT doc_id AS media_id,
             |  CAST(4 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
             |  mr AS mean_r, mg AS mean_g, mb AS mean_b
             |FROM m ORDER BY media_id""".stripMargin),
      "web-format thumbnails: NN resize + PNG re-encode round trip vs gradient oracle"),

    // Perceptual image hash ([[MultimodalOps.imageDhash]]): dHash-64
    // over real gradient BMPs — the image near-dup key (Hamming-close
    // hashes = visual near-dups; brightness-shift invariance is
    // spec-proven). Pixels are arithmetic in doc_id, so the oracle
    // re-derives every block sum, every bit, and the signed 64-bit
    // assembly (bit 63 exercised) without parsing a byte.
    Q(
      "mm_image_dhash",
      (s, d) =>
        MultimodalOps
          .imageDhash(
            MultimodalOps.gradientMediaFromDocs(T(s, d, "documents")))
          .orderBy("media_id"),
      Some("""WITH eids AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 10 = 0 AND doc_id > 0
             |      THEN doc_id - 1 ELSE doc_id END AS eid
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, u1.cx, u2.cy,
             |    CAST(sum((eid * 37 + (eid // 256) * 97 +
             |              5 * (u1.cx * 2 + u3.dx) +
             |              11 * (u2.cy * 2 + u4.dy)) % 256) AS BIGINT) AS s
             |  FROM eids,
             |    unnest(generate_series(0, 8)) AS u1(cx),
             |    unnest(generate_series(0, 7)) AS u2(cy),
             |    unnest(generate_series(0, 1)) AS u3(dx),
             |    unnest(generate_series(0, 1)) AS u4(dy)
             |  GROUP BY doc_id, u1.cx, u2.cy),
             |bits AS (
             |  SELECT l.doc_id, l.cy * 8 + l.cx AS i,
             |    CASE WHEN r.s > l.s THEN 1 ELSE 0 END AS b
             |  FROM px l JOIN px r ON r.doc_id = l.doc_id
             |    AND r.cy = l.cy AND r.cx = l.cx + 1
             |  WHERE l.cx < 8),
             |h AS (SELECT doc_id,
             |    sum(CAST(b AS HUGEINT) * CAST(power(2, i) AS HUGEINT))
             |      AS uh
             |  FROM bits GROUP BY doc_id)
             |SELECT doc_id AS media_id,
             |  CAST(18 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
             |  CAST(CASE WHEN uh >= CAST(9223372036854775808 AS HUGEINT)
             |    THEN uh - 18446744073709551616
             |    ELSE uh END AS BIGINT) AS dhash
             |FROM h ORDER BY media_id""".stripMargin),
      "perceptual dHash-64 of real BMP payloads vs a bit-exact arithmetic oracle"),

    // Image near-dup pairs ([[MultimodalOps.imageNearDupPairs]]): the
    // banded Hamming join over dHashes — lossless at <= 3 bits, so the
    // oracle can use the quadratic pair scan the engine avoids. The
    // synthesis plants an exact visual duplicate every 10th doc, and
    // the linear-gradient family is additionally Hamming-COMPACT (a
    // monotone gradient sets most difference bits for every image, so
    // unrelated hashes differ only near wrap boundaries) — the gate
    // therefore exercises the banding on a DENSE instance, its
    // worst-case join shape, and hash-compares ~10k pairs against the
    // exact scan.
    Q(
      "mm_image_neardup",
      (s, d) =>
        MultimodalOps
          .imageNearDupPairs(
            MultimodalOps.gradientMediaFromDocs(T(s, d, "documents")),
            maxHamming = 3)
          .orderBy("a", "b"),
      Some("""WITH eids AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 10 = 0 AND doc_id > 0
             |      THEN doc_id - 1 ELSE doc_id END AS eid
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, u1.cx, u2.cy,
             |    CAST(sum((eid * 37 + (eid // 256) * 97 +
             |              5 * (u1.cx * 2 + u3.dx) +
             |              11 * (u2.cy * 2 + u4.dy)) % 256) AS BIGINT) AS s
             |  FROM eids,
             |    unnest(generate_series(0, 8)) AS u1(cx),
             |    unnest(generate_series(0, 7)) AS u2(cy),
             |    unnest(generate_series(0, 1)) AS u3(dx),
             |    unnest(generate_series(0, 1)) AS u4(dy)
             |  GROUP BY doc_id, u1.cx, u2.cy),
             |bits AS (
             |  SELECT l.doc_id, l.cy * 8 + l.cx AS i,
             |    CASE WHEN r.s > l.s THEN 1 ELSE 0 END AS b
             |  FROM px l JOIN px r ON r.doc_id = l.doc_id
             |    AND r.cy = l.cy AND r.cx = l.cx + 1
             |  WHERE l.cx < 8),
             |hh AS (SELECT doc_id,
             |    CAST(CASE WHEN uh >= CAST(9223372036854775808 AS HUGEINT)
             |      THEN uh - 18446744073709551616
             |      ELSE uh END AS BIGINT) AS dhash
             |  FROM (SELECT doc_id,
             |      sum(CAST(b AS HUGEINT) * CAST(power(2, i) AS HUGEINT))
             |        AS uh
             |    FROM bits GROUP BY doc_id))
             |SELECT x.doc_id AS a, y.doc_id AS b,
             |  CAST(bit_count(xor(x.dhash, y.dhash)) AS INTEGER) AS hamming
             |FROM hh x JOIN hh y ON y.doc_id > x.doc_id
             |WHERE bit_count(xor(x.dhash, y.dhash)) <= 3
             |ORDER BY a, b""".stripMargin),
      "image near-dup pairs: banded Hamming over dHashes vs the quadratic oracle scan"),

    // Audio envelope hash ([[MultimodalOps.audioEnvelopeHash]]): the
    // dHash idea on the time axis — 65 |PCM| energy windows, 64
    // difference bits, volume-invariant (spec-proven). Sawtooth
    // synthesis makes every window sum arithmetic in doc_id, so the
    // oracle derives the full signed 64-bit hash without parsing a
    // byte.
    Q(
      "mm_audio_envelope_hash",
      (s, d) =>
        MultimodalOps
          .audioEnvelopeHash(
            MultimodalOps.sawMediaFromDocs(T(s, d, "documents")))
          .orderBy("media_id"),
      Some("""WITH win AS (
             |  SELECT doc_id, i // 10 AS w,
             |    CAST(sum(abs((doc_id * 31 + 7 * i) % 4001 - 2000))
             |      AS BIGINT) AS s
             |  FROM documents, unnest(generate_series(0, 649)) AS u(i)
             |  GROUP BY doc_id, i // 10),
             |bits AS (
             |  SELECT l.doc_id, l.w AS i,
             |    CASE WHEN r.s > l.s THEN 1 ELSE 0 END AS b
             |  FROM win l JOIN win r ON r.doc_id = l.doc_id
             |    AND r.w = l.w + 1
             |  WHERE l.w < 64),
             |h AS (SELECT doc_id,
             |    sum(CAST(b AS HUGEINT) * CAST(power(2, i) AS HUGEINT))
             |      AS uh
             |  FROM bits GROUP BY doc_id)
             |SELECT doc_id AS media_id,
             |  CAST(CASE WHEN uh >= CAST(9223372036854775808 AS HUGEINT)
             |    THEN uh - 18446744073709551616
             |    ELSE uh END AS BIGINT) AS ahash
             |FROM h ORDER BY media_id""".stripMargin),
      "gain-invariant audio envelope hash vs a bit-exact arithmetic oracle"),

    // Video temporal hash ([[MultimodalOps.videoTemporalHash]]): the
    // brightness-contour key over 65 real Y4M frames — the third
    // member of the perceptual triad. Constant-luma ramp frames make
    // every frame sum (64·luma) arithmetic in doc_id, so the oracle
    // derives the full signed hash without parsing a byte.
    Q(
      "mm_video_temporal_hash",
      (s, d) =>
        MultimodalOps
          .videoTemporalHash(
            MultimodalOps.lumaRampMediaFromDocs(T(s, d, "documents")))
          .orderBy("media_id"),
      Some("""WITH fr AS (
             |  SELECT doc_id, k, (doc_id * 13 + 29 * k) % 256 AS luma
             |  FROM documents, unnest(generate_series(0, 64)) AS u(k)),
             |bits AS (
             |  SELECT l.doc_id, l.k AS i,
             |    CASE WHEN r.luma > l.luma THEN 1 ELSE 0 END AS b
             |  FROM fr l JOIN fr r ON r.doc_id = l.doc_id
             |    AND r.k = l.k + 1
             |  WHERE l.k < 64),
             |h AS (SELECT doc_id,
             |    sum(CAST(b AS HUGEINT) * CAST(power(2, i) AS HUGEINT))
             |      AS uh
             |  FROM bits GROUP BY doc_id)
             |SELECT doc_id AS media_id,
             |  CAST(CASE WHEN uh >= CAST(9223372036854775808 AS HUGEINT)
             |    THEN uh - 18446744073709551616
             |    ELSE uh END AS BIGINT) AS vhash
             |FROM h ORDER BY media_id""".stripMargin),
      "temporal video hash: 65-frame brightness contour vs a bit-exact arithmetic oracle")
  )
}
