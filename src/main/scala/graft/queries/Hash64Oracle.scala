package graft.queries

/** DuckDB replica of the engine's native 64-bit hash
  * ([[graft.expr.Hash64]]: FNV-1a with a splitmix64 finalizer), emitted as
  * generated SQL so the `dedup_simhash` and `text_fingerprint` gates get
  * real rows+schema+hash oracles instead of rows-only checks — the same
  * emit-the-engine's-constants pattern `dedup_embedding_lsh` proved for
  * its Rademacher sign matrix.
  *
  * Why this is expressible at all: Hash64 is pure 64-bit wraparound
  * arithmetic (xor / shift / multiply mod 2^64) over UTF-8 bytes, and the
  * gate corpus is ASCII (`unicode(char)` == byte). DuckDB has no wrapping
  * multiply, but HUGEINT (int128) makes `(a*b) mod 2^64` exact when the
  * product fits; full 64-bit constants are split into 32-bit halves so no
  * intermediate exceeds 2^97:
  *
  *   (x*c) mod 2^64  =  (x*lo + ((x mod 2^32)*hi mod 2^32)*2^32) mod 2^64
  *
  * Each FNV/mix step lives in its own chained CTE: nesting them as one
  * expression repeats every subexpression per reference (no CSE in the
  * oracle engine) and blows evaluation up exponentially — measured 126 s
  * vs 3 s for the staged form at sf0.01.
  *
  * All decimal constants are derived from the Long values here, never
  * hand-transcribed (a transcribed `0xbf58476d` cost a debugging round).
  */
private[queries] object Hash64Oracle {
  private val M = "18446744073709551616" // 2^64
  private def u(x: Long): String = java.lang.Long.toUnsignedString(x)

  private val Basis = u(0xcbf29ce484222325L)
  /** FNV basis xor seed 1 — the short-document branch of Fingerprint64. */
  private val BasisSeed1 = u(0xcbf29ce484222325L ^ 1L)
  private val Prime = u(0x100000001b3L) // < 2^41: direct HUGEINT multiply fits

  /** One `(x*c) mod 2^64` step via the 32-bit split; `{H}` is the running
    * hash column reference. */
  private def mulmodStep(c: Long): String = {
    val hi = u(c >>> 32)
    val lo = u(c & 0xffffffffL)
    s"CAST((CAST({H} AS HUGEINT) * $lo + " +
      s"(CAST({H} AS HUGEINT) % 4294967296) * $hi % 4294967296 * 4294967296) " +
      s"% $M AS UBIGINT) AS h"
  }

  /** splitmix64 finalizer ([[graft.expr.Hash64.mix]]) as five staged steps. */
  private val mixSteps: Seq[String] = Seq(
    "xor({H}, {H} >> 30) AS h",
    mulmodStep(0xbf58476d1ce4e5b9L),
    "xor({H}, {H} >> 27) AS h",
    mulmodStep(0x94d049bb133111ebL),
    "xor({H}, {H} >> 31) AS h")

  /** Chain `steps` as CTEs `<prefix>0..n`, each selecting `cols` plus the
    * next value of `h` (with `{H}` bound to the previous CTE's column).
    * Returns (cte text, last cte name). */
  private def staged(
      prev0: String, cols: String, steps: Seq[String], prefix: String): (String, String) = {
    var prev = prev0
    val ctes = steps.zipWithIndex.map { case (step, n) =>
      val cur = s"$prefix$n"
      val sql = s"$cur AS (SELECT $cols, ${step.replace("{H}", s"$prev.h")} FROM $prev)"
      prev = cur
      sql
    }
    (ctes.mkString(",\n"), prev)
  }

  /** UBIGINT h -> the signed BIGINT the engine's LongType column holds. */
  private val SignedH =
    "CASE WHEN h >= CAST(9223372036854775808 AS UBIGINT) " +
      s"THEN CAST(CAST(h AS HUGEINT) - $M AS BIGINT) " +
      "ELSE CAST(h AS BIGINT) END"

  /** CTEs `tok .. bits`: FNV+mix each distinct whitespace token (recursive
    * CTE over its chars — vocabulary-sized, not corpus-sized), then the 64
    * per-bit +/-1 sums per document that define the SimHash signature. */
  private def simhashBitsCtes: String = {
    val (tCtes, tLast) = staged("fnvfin", "t", mixSteps, "tm")
    val sums = (0 until 64)
      .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    s"""tok AS (
       |  SELECT DISTINCT unnest(string_split_regex(text, ' +')) AS t FROM documents
       |),
       |fnv AS (
       |  SELECT t, 1 AS i, CAST($Basis AS UBIGINT) AS h FROM tok
       |  UNION ALL
       |  SELECT t, i+1,
       |    CAST(CAST(xor(h, CAST(unicode(substr(t,i,1)) AS UBIGINT)) AS HUGEINT)
       |         * $Prime % $M AS UBIGINT)
       |  FROM fnv WHERE i <= length(t)
       |),
       |fnvfin AS (SELECT t, h FROM fnv WHERE i = length(t)+1),
       |$tCtes,
       |doctok AS (SELECT doc_id, unnest(string_split_regex(text, ' +')) AS t FROM documents),
       |bits AS (SELECT doc_id, $sums FROM doctok JOIN $tLast USING (t) GROUP BY doc_id)""".stripMargin
  }

  /** Reassemble the signature from the bit sums (bit b set iff sum > 0). */
  private val sigExpr = (0 until 64)
    .map(b => s"CASE WHEN s$b > 0 THEN CAST(${u(1L << b)} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END")
    .mkString(" + ")

  /** Oracle for `dedup_simhash`: all pairs with Hamming(sig) <= maxHamming.
    * Equals the engine's banded plan exactly — at maxHamming <= 3 the
    * 4x16-bit banding is lossless by pigeonhole (enforced by the
    * `require` in [[graft.ops.DedupOps.simhashPairs]]), so band-join +
    * filter and all-pairs + filter select the same set. */
  def simhashPairsSql(maxHamming: Int): String =
    s"""WITH RECURSIVE ${simhashBitsCtes},
       |sig AS (SELECT doc_id, ($sigExpr) AS sim FROM bits)
       |SELECT x.doc_id AS a, y.doc_id AS b,
       |  CAST(bit_count(xor(x.sim, y.sim)) AS INTEGER) AS hamming
       |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.sim, y.sim)) <= $maxHamming
       |ORDER BY a, b""".stripMargin

  /** The per-position k-gram hash pipeline shared by the fingerprint and
    * winnowing oracles: `pos` explodes gram start positions for documents
    * longer than k, then k unrolled FNV steps + the mix chain yield one
    * mixed hash per (doc, position). Returns (pos cte, chain ctes, last
    * name). */
  private def gramSection(k: Int): (String, String, String) = {
    require(k == 8, "gram FNV is unrolled for k = 8")
    val fnvSteps = (0 until k).map { j =>
      val byte = s"CAST(unicode(substr(text, i+$j, 1)) AS UBIGINT)"
      val h = if (j == 0) s"CAST($Basis AS UBIGINT)" else "{H}"
      s"CAST(CAST(xor($h, $byte) AS HUGEINT) * $Prime % $M AS UBIGINT) AS h"
    }
    val (gCtes, gLast) = staged("pos", "doc_id, text, i", fnvSteps ++ mixSteps, "g")
    val pos =
      s"""pos AS (
         |  SELECT doc_id, text, unnest(generate_series(1, length(text) - ${k - 1})) AS i
         |  FROM documents WHERE length(text) > $k
         |)""".stripMargin
    (pos, gCtes, gLast)
  }

  /** Short-document (1..k bytes) seed-1 whole-text hash, as CTEs ending in
    * a (doc_id, h) relation named by the returned last name. */
  private def shortDocSection(k: Int): (String, String) = {
    val (sCtes, sLast) = staged("sfnvfin", "doc_id", mixSteps, "sm")
    val ctes =
      s"""sfnv AS (
         |  SELECT doc_id, text AS t, 1 AS i, CAST($BasisSeed1 AS UBIGINT) AS h
         |  FROM documents WHERE length(text) BETWEEN 1 AND $k
         |  UNION ALL
         |  SELECT doc_id, t, i+1,
         |    CAST(CAST(xor(h, CAST(unicode(substr(t,i,1)) AS UBIGINT)) AS HUGEINT)
         |         * $Prime % $M AS UBIGINT)
         |  FROM sfnv WHERE i <= length(t)
         |),
         |sfnvfin AS (SELECT doc_id, h FROM sfnv WHERE i = length(t)+1),
         |$sCtes""".stripMargin
    (ctes, sLast)
  }

  /** Oracle for `text_fingerprint`: per-document signed SimHash signature
    * plus the [[graft.expr.Fingerprint64]] winnowing value — minimum mixed
    * FNV over all k-char gram positions (k = 8 unrolled as 8 staged FNV
    * steps), with the engine's short-document branches (`len == 0 -> 0`,
    * `len <= k -> hash of whole text with seed 1`) replicated via a
    * second, zero-row-on-this-corpus recursive CTE. */
  def fingerprintSql(k: Int = 8): String = {
    val (posCte, gCtes, gLast) = gramSection(k)
    val (sCtes, sLast) = shortDocSection(k)
    s"""WITH RECURSIVE ${simhashBitsCtes},
       |sigs AS (SELECT doc_id, ($sigExpr) AS h FROM bits),
       |sig AS (SELECT doc_id, $SignedH AS simhash FROM sigs),
       |$posCte,
       |$gCtes,
       |fplong AS (SELECT doc_id, MIN($SignedH) AS fingerprint FROM $gLast GROUP BY doc_id),
       |$sCtes,
       |fpshort AS (SELECT doc_id, $SignedH AS fingerprint FROM $sLast),
       |fp AS (
       |  SELECT * FROM fplong UNION ALL SELECT * FROM fpshort
       |  UNION ALL
       |  SELECT doc_id, 0 AS fingerprint FROM documents WHERE length(text) = 0
       |)
       |SELECT d.doc_id, s.simhash, fp.fingerprint
       |FROM documents d
       |LEFT JOIN sig s ON s.doc_id = d.doc_id
       |LEFT JOIN fp ON fp.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
    // LEFT joins: a NULL-text document falls out of every CTE above and
    // must still emit (doc_id, NULL, NULL), exactly as the engine's
    // null-propagating expressions do.
  }

  /** Oracle for `text_winnow_native` ([[graft.expr.WinnowSet]]): the full
    * winnowing fingerprint SET — per-window minimum of the SIGNED mixed
    * gram hashes (the engine compares Longs signed, so the conversion
    * happens BEFORE the window min), windows starting at
    * 1..max(ng-w+1, 1), distinct minima sorted ascending and joined into
    * one comma-separated string (a canonical scalar dodges any
    * array-hashing ambiguity in the compare harness). Short documents
    * yield the single seed-1 hash; empty text the empty string. */
  /** Shared core of the winnowing oracles: CTE text ending in `sel`
    * (DISTINCT (doc_id, m) window minima for long documents) plus the
    * short-document section's last CTE name. */
  private def winnowCoreCtes(k: Int, w: Int): (String, String) = {
    val (posCte, gCtes, gLast) = gramSection(k)
    val (sCtes, sLast) = shortDocSection(k)
    val core =
      s"""$posCte,
         |$gCtes,
         |sg AS (
         |  SELECT doc_id, i,
         |    greatest(length(text) - ${k - 1} - ${w - 1}, 1) AS lastw,
         |    $SignedH AS sh
         |  FROM $gLast),
         |wm AS (
         |  SELECT doc_id, i, lastw,
         |    MIN(sh) OVER (PARTITION BY doc_id ORDER BY i
         |                  ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS m
         |  FROM sg),
         |sel AS (SELECT DISTINCT doc_id, m FROM wm WHERE i <= lastw),
         |$sCtes""".stripMargin
    (core, sLast)
  }

  def winnowSetSql(k: Int = 8, w: Int = 4): String = {
    val (core, sLast) = winnowCoreCtes(k, w)
    s"""WITH RECURSIVE $core,
       |agglong AS (
       |  SELECT doc_id, array_to_string(list(m ORDER BY m), ',') AS fps
       |  FROM sel GROUP BY doc_id),
       |aggshort AS (SELECT doc_id, CAST($SignedH AS VARCHAR) AS fps FROM $sLast),
       |agg AS (
       |  SELECT * FROM agglong UNION ALL SELECT * FROM aggshort
       |  UNION ALL SELECT doc_id, '' AS fps FROM documents WHERE length(text) = 0
       |)
       |SELECT d.doc_id, agg.fps
       |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
    // LEFT join: a NULL-text document matches no branch of `agg` and must
    // still emit (doc_id, NULL), like the engine's null-propagating
    // winnow_set -> array_join chain.
  }

  /** Oracle for `dedup_winnow` ([[graft.ops.DedupOps.winnowPairs]]): the
    * per-document fingerprint sets (long-branch window minima ∪
    * short-branch seed-1 hash; empty/NULL text contributes nothing), a
    * document-frequency cap on hot fingerprints, then pairs sharing at
    * least `minShared` surviving fingerprints — the MOSS candidate set. */
  def winnowPairsSql(
      k: Int = 8, w: Int = 4, minShared: Int, cap: Int): String = {
    val (core, sLast) = winnowCoreCtes(k, w)
    s"""WITH RECURSIVE $core,
       |selshort AS (SELECT doc_id, $SignedH AS m FROM $sLast),
       |fps AS (SELECT * FROM sel UNION ALL SELECT * FROM selshort),
       |keep AS (SELECT m FROM fps GROUP BY m HAVING COUNT(*) <= $cap),
       |fpk AS (SELECT fps.doc_id, fps.m FROM fps JOIN keep USING (m))
       |SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS shared
       |FROM fpk x JOIN fpk y ON x.m = y.m AND x.doc_id < y.doc_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= $minShared
       |ORDER BY a, b""".stripMargin
  }

  /** CTEs `featl .. hb` for the DSIR hashed n-gram features
    * ([[graft.ops.CorpusOps.dsirFeatures]]): per-document word unigrams ∪
    * bigrams, each distinct feature STRING hashed once (vocabulary-sized
    * recursive FNV over its chars — bigrams contain the joining space,
    * hashed like any other byte), then bucketed by the non-negative
    * residue of the SIGNED hash mod `buckets` — DuckDB `%` and Spark
    * `pmod` agree once both sides apply the `((h % B) + B) % B` form. */
  private def dsirFeatureCtes(buckets: Int): String = {
    val (mCtes, mLast) = staged("fnvfin", "f", mixSteps, "dm")
    s"""tks AS (SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents),
       |featl AS (
       |  SELECT doc_id, unnest(t) AS f FROM tks
       |  UNION ALL
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
       |                                       i -> t[i] || ' ' || t[i+1])) AS f
       |  FROM tks WHERE len(t) >= 2),
       |voc AS (SELECT DISTINCT f FROM featl),
       |fnv AS (
       |  SELECT f, 1 AS i, CAST($Basis AS UBIGINT) AS h FROM voc
       |  UNION ALL
       |  SELECT f, i+1,
       |    CAST(CAST(xor(h, CAST(unicode(substr(f,i,1)) AS UBIGINT)) AS HUGEINT)
       |         * $Prime % $M AS UBIGINT)
       |  FROM fnv WHERE i <= length(f)
       |),
       |fnvfin AS (SELECT f, h FROM fnv WHERE i = length(f)+1),
       |$mCtes,
       |hb AS (SELECT f,
       |  CAST(((($SignedH) % $buckets) + $buckets) % $buckets AS INTEGER)
       |    AS bucket FROM $mLast),
       |feat AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
       |         FROM featl JOIN hb USING (f) GROUP BY doc_id, bucket)""".stripMargin
  }

  /** Generic hash64 replay: CTEs that FNV+mix every DISTINCT value of
    * the `f` VARCHAR column of CTE `src`, ending in
    * `hsig(f, hs BIGINT)` — join back to `src` by `f` for per-row
    * hashes. The same vocabulary-sized recursive-CTE shape as the DSIR
    * features (hash the distinct set, never the row stream). */
  def hash64VocabCtes(src: String): String = {
    val (mCtes, mLast) = staged("hfnvfin", "f", mixSteps, "hm")
    s"""hvoc AS (SELECT DISTINCT f FROM $src),
       |hfnv AS (
       |  SELECT f, 1 AS i, CAST($Basis AS UBIGINT) AS h FROM hvoc
       |  UNION ALL
       |  SELECT f, i+1,
       |    CAST(CAST(xor(h, CAST(unicode(substr(f,i,1)) AS UBIGINT)) AS HUGEINT)
       |         * $Prime % $M AS UBIGINT)
       |  FROM hfnv WHERE i <= length(f)),
       |hfnvfin AS (SELECT f, h FROM hfnv WHERE i = length(f)+1),
       |$mCtes,
       |hsig AS (SELECT f, $SignedH AS hs FROM $mLast)""".stripMargin
  }

  /** Oracle for `corpus_dsir_features`: per (doc, bucket) hashed
    * unigram+bigram feature counts. */
  def dsirFeaturesSql(buckets: Int): String =
    s"""WITH RECURSIVE ${dsirFeatureCtes(buckets)}
       |SELECT doc_id, bucket, cnt FROM feat
       |ORDER BY doc_id, bucket""".stripMargin

  /** Oracle for `corpus_dsir_stats` ([[graft.ops.CorpusOps.dsirStats]]):
    * each doc's bucket counts joined with the target and raw bucket
    * histograms plus their totals — the exact-integer sufficient
    * statistics of the DSIR log importance weight (the ln itself stays
    * out of the compare path). `targetWhere` selects the target rows. */
  def dsirStatsSql(buckets: Int, targetWhere: String): String =
    s"""WITH RECURSIVE ${dsirFeatureCtes(buckets)},
       |tgt AS (SELECT doc_id FROM documents WHERE $targetWhere),
       |th AS (SELECT bucket, sum(cnt) AS t_cnt FROM feat
       |       JOIN tgt USING (doc_id) GROUP BY bucket),
       |rh AS (SELECT bucket, sum(cnt) AS r_cnt FROM feat GROUP BY bucket),
       |tot AS (SELECT (SELECT coalesce(sum(t_cnt), 0) FROM th) AS t_tot,
       |               (SELECT sum(r_cnt) FROM rh) AS r_tot)
       |SELECT f.doc_id, f.bucket, f.cnt,
       |  CAST(coalesce(th.t_cnt, 0) AS BIGINT) AS t_cnt,
       |  CAST(rh.r_cnt AS BIGINT) AS r_cnt,
       |  CAST(tot.t_tot AS BIGINT) AS t_tot,
       |  CAST(tot.r_tot AS BIGINT) AS r_tot
       |FROM feat f LEFT JOIN th USING (bucket) JOIN rh USING (bucket)
       |CROSS JOIN tot
       |ORDER BY doc_id, bucket""".stripMargin
}
