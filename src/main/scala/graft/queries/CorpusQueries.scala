package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.{Q, T}
import graft.ops.{CorpusOps, DedupOps, TextOps}

/** Corpus-preparation battery over `documents`: deterministic hash
  * sampling / split assignment, stratified corpus mixing, fixed-window
  * chunking, PII redaction. Every oracle reuses [[CorpusOps.md5Threshold]]
  * so Spark and DuckDB compare hashes against the exact same literals. */
object CorpusQueries {

  private val T80 = CorpusOps.md5Threshold(0.8)
  private val T90 = CorpusOps.md5Threshold(0.9)
  private val T37 = CorpusOps.md5Threshold(0.37)
  private val MixFractions = Map("en" -> 0.25, "de" -> 0.5, "zh" -> 1.0)
  private val MixDefault = 0.75

  val all: Seq[Q] = Seq(
    Q(
      "corpus_sample_bernoulli",
      (s, d) =>
        CorpusOps
          .sampleByHash(T(s, d, "documents"), "doc_id", 0.37, "s1")
          .select("doc_id", "lang")
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM documents
             |WHERE md5('s1:' || CAST(doc_id AS VARCHAR)) < '$T37'
             |ORDER BY doc_id""".stripMargin),
      "deterministic Bernoulli sample: salted md5 threshold, re-run stable"),

    // Horvitz–Thompson total estimation under a TWO-RATE systematic
    // design: even doc_ids sampled at exactly 1/2 (id ≡ 0 mod 4 among
    // evens), odd at exactly 1/5 (id ≡ 5 mod 10 among odds) — inclusion
    // probabilities exact by construction, so the estimator
    // Σ_kept v/π = Σ v·w is pure integer arithmetic and the gate pins
    // the whole unequal-probability-estimation workflow (sample small,
    // estimate the full-corpus total, read the relative error).
    Q(
      "corpus_ht_estimate",
      (s, d) => {
        val doc = T(s, d, "documents")
        val kept = doc
          .filter((col("doc_id") % 2 === 0 && col("doc_id") % 4 === 0) ||
            (col("doc_id") % 2 =!= 0 && col("doc_id") % 5 === 0))
          .select(col("n_chars"),
            when(col("doc_id") % 2 === 0, 2L).otherwise(5L).as("w"))
        val est = kept.agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars") * col("w")).as("ht_estimate"))
        val truth = doc.agg(sum("n_chars").as("true_total"))
        est.crossJoin(broadcast(truth)) // 1×1 scalar cross (declared)
          .withColumn("rel_error",
            (col("ht_estimate") - col("true_total")).cast("double") /
              col("true_total").cast("double"))
      },
      Some("""WITH kept AS (
             |  SELECT n_chars,
             |    CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 5 END AS w
             |  FROM documents
             |  WHERE (doc_id % 2 = 0 AND doc_id % 4 = 0)
             |     OR (doc_id % 2 <> 0 AND doc_id % 5 = 0)),
             |e AS (SELECT CAST(count(*) AS BIGINT) AS n_kept,
             |    CAST(sum(n_chars * w) AS BIGINT) AS ht_estimate FROM kept),
             |t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS true_total
             |      FROM documents)
             |SELECT n_kept, ht_estimate, true_total,
             |  CAST(ht_estimate - true_total AS DOUBLE) /
             |    CAST(true_total AS DOUBLE) AS rel_error
             |FROM e, t""".stripMargin),
      "Horvitz-Thompson total under a two-rate systematic design: exact integer v/pi"),

    // Weighted deterministic sample: weight = 1 + n_chars DIV 100 capped
    // at 8, each doc's priority = min of `weight` salted hashes, global
    // 200 smallest win (CorpusOps.weightedSampleTopK — TakeOrdered, no
    // single-partition sort). Monotone in weight, partitioning- and
    // re-run-stable; the oracle replays the full draw.
    Q(
      "corpus_sample_weighted",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, expr}
        val w = expr("least(greatest(1 + n_chars DIV 100, 1), 64)")
        CorpusOps
          .weightedSampleTopK(T(s, d, "documents"), "doc_id",
            w, k = 200, salt = "ws")
          .select(col("doc_id"), col("lang"), w.cast("int").as("w"),
            col("pri"))
          .orderBy("doc_id")
      },
      Some("""WITH wt AS (
             |  SELECT doc_id, lang,
             |    CAST(least(greatest(1 + n_chars // 100, 1), 64) AS INTEGER) AS w
             |  FROM documents),
             |e AS (SELECT doc_id, unnest(generate_series(1, w)) AS r FROM wt),
             |p AS (SELECT doc_id,
             |        min(md5('ws:' || CAST(doc_id AS VARCHAR) || ':' ||
             |                CAST(r AS VARCHAR))) AS pri
             |      FROM e GROUP BY doc_id),
             |k AS (SELECT doc_id, pri FROM p ORDER BY pri LIMIT 200)
             |SELECT wt.doc_id, wt.lang, wt.w, k.pri
             |FROM k JOIN wt ON k.doc_id = wt.doc_id
             |ORDER BY wt.doc_id""".stripMargin),
      "weight-priority sample: min of w salted hashes per doc, global " +
        "top-k, bit-stable across engines and partitionings"),

    Q(
      "corpus_split_assign",
      (s, d) =>
        CorpusOps
          .assignSplit(T(s, d, "documents"), "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "split")
          .select("doc_id", "lang", "split")
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang,
             |  CASE WHEN md5('split:' || CAST(doc_id AS VARCHAR)) < '$T80' THEN 'train'
             |       WHEN md5('split:' || CAST(doc_id AS VARCHAR)) < '$T90' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin),
      "train/val/test assignment by cumulative hash ranges: disjoint, exhaustive, leak-free across re-runs"),

    // K-fold cross-validation assignment: 5 equal cumulative hash ranges
    // over a fold-specific salt ([[CorpusOps.assignKFolds]]). Pure
    // projection — the fold decision rides the scan, so CV shards come
    // from ONE pass however large the corpus; independent of the
    // train/val/test salt above by construction.
    Q(
      "corpus_kfold_assign",
      (s, d) =>
        CorpusOps
          .assignKFolds(T(s, d, "documents"), "doc_id", k = 5, salt = "cv")
          .select("doc_id", "lang", "fold")
          .orderBy("doc_id"),
      Some {
        val cuts = (1 to 4).map(i => CorpusOps.md5Threshold(i / 5.0))
        val cases = cuts.zipWithIndex.map { case (t, i) =>
          s"WHEN md5('cv:' || CAST(doc_id AS VARCHAR)) < '$t' THEN 'fold$i'"
        }.mkString("\n       ")
        s"""SELECT doc_id, lang,
           |  CASE $cases
           |       ELSE 'fold4' END AS fold
           |FROM documents ORDER BY doc_id""".stripMargin
      },
      "5-fold CV assignment by equal hash ranges: disjoint, exhaustive, shuffle-free"),

    // Bounded per-source contribution ([[CorpusOps.capPerGroup]]): at
    // most 10 docs per source survive, chosen by salted-hash priority —
    // the anti-domination mixing step (a crawl where one domain is 40%
    // of raw volume must not be 40% of training data). Deterministic
    // under re-runs; WindowGroupLimit bounds the shuffle at n per
    // (map partition, group).
    Q(
      "corpus_cap_per_source",
      (s, d) =>
        CorpusOps
          .capPerGroup(T(s, d, "documents"), "doc_id", "source", n = 10,
            salt = "cap")
          .select("doc_id", "source", "lang")
          .orderBy("doc_id"),
      Some("""WITH r AS (
             |  SELECT doc_id, source, lang,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id)
             |      AS rn
             |  FROM documents)
             |SELECT doc_id, source, lang FROM r WHERE rn <= 10
             |ORDER BY doc_id""".stripMargin),
      "per-source contribution cap: hash-priority top-10 per source, anti-domination mixing"),

    Q(
      "corpus_sample_stratified",
      (s, d) =>
        CorpusOps
          .stratifiedSampleByHash(T(s, d, "documents"), "doc_id", "lang",
            MixFractions, MixDefault, salt = "mix")
          .select("doc_id", "lang", "source")
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, source FROM documents
             |WHERE md5('mix:' || CAST(doc_id AS VARCHAR)) <
             |  CASE lang WHEN 'en' THEN '${CorpusOps.md5Threshold(MixFractions("en"))}'
             |            WHEN 'de' THEN '${CorpusOps.md5Threshold(MixFractions("de"))}'
             |            WHEN 'zh' THEN '${CorpusOps.md5Threshold(MixFractions("zh"))}'
             |            ELSE '${CorpusOps.md5Threshold(MixDefault)}' END
             |ORDER BY doc_id""".stripMargin),
      "stratified corpus mixing: per-language keep fractions, hash-deterministic"),

    // Chunking: 32-token windows, 8-token overlap (step 24). The oracle
    // replicates the window arithmetic with generate_series + list
    // slicing (1-based inclusive on both engines' slice semantics).
    Q(
      "corpus_chunk_windows",
      (s, d) =>
        CorpusOps
          .chunkDocs(T(s, d, "documents"), "doc_id", "text",
            chunkSize = 32, overlap = 8)
          .orderBy("doc_id", "chunk_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents),
             |idx AS (
             |  SELECT doc_id, t,
             |    unnest(generate_series(0, greatest((len(t)-1)//24, 0))) AS i
             |  FROM toks)
             |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
             |  CAST(least(32, len(t) - i*24) AS BIGINT) AS n_tokens,
             |  array_to_string(t[i*24+1:i*24+32], ' ') AS chunk_text
             |FROM idx ORDER BY doc_id, chunk_id""".stripMargin),
      "fixed 32-token chunks with 8-token overlap: one explode, no shuffle"),

    // Training-export shuffle: shard assignment + within-shard order both
    // derive from one salted hash, so the "random" example order is fully
    // reproducible and stable under re-runs / repartitioning — at scale
    // this is `write.partitionBy(shard)` + `sortWithinPartitions(sort_key)`
    // with zero extra shuffles beyond the write's own.
    Q(
      "corpus_shuffle_shard",
      (s, d) =>
        CorpusOps
          .assignSplit(T(s, d, "documents"), "doc_id",
            (0 until 4).map(i => s"shard$i" -> 0.25), salt = "shard",
            outCol = "shard")
          .select(col("doc_id"), col("shard"),
            CorpusOps.saltedHash(col("doc_id"), "shard").as("sort_key"))
          .orderBy("shard", "sort_key"),
      Some {
        val h = "md5('shard:' || CAST(doc_id AS VARCHAR))"
        s"""SELECT doc_id,
           |  CASE WHEN $h < '${CorpusOps.md5Threshold(0.25)}' THEN 'shard0'
           |       WHEN $h < '${CorpusOps.md5Threshold(0.5)}' THEN 'shard1'
           |       WHEN $h < '${CorpusOps.md5Threshold(0.75)}' THEN 'shard2'
           |       ELSE 'shard3' END AS shard,
           |  $h AS sort_key
           |FROM documents ORDER BY shard, sort_key""".stripMargin
      },
      "deterministic training-export shuffle: hash shards + reproducible within-shard order"),

    // Decontamination: eval-split docs whose 3-gram set is >=60% contained
    // in a train-split doc. Containment (not Jaccard) because quoting a
    // short eval doc inside a long train doc IS contamination. The oracle
    // rebuilds split assignment + both shingle sides in SQL.
    Q(
      "corpus_decontaminate",
      (s, d) =>
        CorpusOps
          .decontaminationPairs(T(s, d, "documents"), "doc_id", "text",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "split",
            trainLabel = "train", k = 3, minContainment = 0.6)
          .orderBy("eval_id", "train_id"),
      Some {
        val h = "md5('split:' || CAST(doc_id AS VARCHAR))"
        def shCte(name: String, cond: String) =
          s"""$name AS (SELECT DISTINCT doc_id, shingle FROM (
             |  SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
             |    ELSE list_transform(generate_series(1, len(t)-2),
             |                        i -> array_to_string(t[i:i+2], ' ')) END) AS shingle
             |  FROM (SELECT doc_id, string_split_regex(text, ' +') AS t
             |        FROM lab WHERE $cond)))""".stripMargin
        s"""WITH lab AS (
           |  SELECT doc_id, text,
           |    CASE WHEN $h < '$T80' THEN 'train'
           |         WHEN $h < '$T90' THEN 'val' ELSE 'test' END AS split
           |  FROM documents),
           |${shCte("tr", "split = 'train'")},
           |${shCte("ev", "split <> 'train'")},
           |sizes AS (SELECT doc_id, count(*) AS n FROM ev GROUP BY 1),
           |common AS (
           |  SELECT ev.doc_id AS eval_id, tr.doc_id AS train_id, count(*) AS c
           |  FROM ev JOIN tr USING (shingle) GROUP BY 1, 2)
           |SELECT eval_id, train_id, c * 1.0 / s.n AS containment
           |FROM common JOIN sizes s ON s.doc_id = eval_id
           |WHERE c * 1.0 / s.n >= 0.6
           |ORDER BY eval_id, train_id""".stripMargin
      },
      "train->eval contamination pairs: cross-split shingle containment >= 0.6"),

    // SPAN-LEVEL decontamination ([[DedupOps.substringSpanPairsBetween]]):
    // the verbatim leaked PASSAGE between a train and an eval document,
    // with exact 1-based offsets on both sides — shingle containment
    // (above) scores set overlap; this is the evidence line a curation
    // pipeline logs before dropping the train doc. Positional 4-gram
    // anchors are equi-joined ACROSS splits only (never train×train),
    // the doc-frequency cap is measured over both sides combined, and
    // diagonal runs merge on one window — the dedup_substring_spans
    // machinery pointed across the split boundary.
    Q(
      "corpus_decontaminate_spans",
      (s, d) => {
        val labeled = CorpusOps.assignSplit(T(s, d, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "split")
        DedupOps.substringSpanPairsBetween(
          labeled.filter(col("split") === "train"),
          labeled.filter(col("split") =!= "train"),
          "doc_id", "text", k = 4, minLen = 8, maxGramFreq = Some(8))
          .orderBy("a", "b", "a_start", "b_start")
      },
      Some {
        val h = "md5('split:' || CAST(doc_id AS VARCHAR))"
        s"""WITH lab AS (
           |  SELECT doc_id, text,
           |    CASE WHEN $h < '$T80' THEN 'train' ELSE 'other' END AS split
           |  FROM documents),
           |toks AS (SELECT doc_id, split,
           |    string_split_regex(trim(text), ' +') AS t FROM lab),
           |g0 AS (SELECT doc_id, split,
           |    unnest(list_transform(generate_series(1, len(t) - 3),
           |      i -> {'pos': i, 'gram': array_to_string(t[i:i+3], ' ')})) AS pg
           |  FROM toks WHERE len(t) >= 4),
           |g AS (SELECT doc_id, split, pg.pos AS pos, pg.gram AS gram FROM g0),
           |kept AS (SELECT gram FROM g GROUP BY gram
           |         HAVING count(DISTINCT doc_id) <= 8),
           |gk AS (SELECT g.* FROM g JOIN kept USING (gram)),
           |m AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa,
           |        x.pos - y.pos AS diag
           |      FROM gk x JOIN gk y ON x.gram = y.gram
           |      WHERE x.split = 'train' AND y.split <> 'train'),
           |i0 AS (SELECT a, b, diag, pa,
           |    CASE WHEN lag(pa) OVER w IS NULL
           |           OR pa - lag(pa) OVER w > 1 THEN 1 ELSE 0 END AS nw
           |  FROM m WINDOW w AS (PARTITION BY a, b, diag ORDER BY pa)),
           |i1 AS (SELECT a, b, diag, pa,
           |    SUM(nw) OVER (PARTITION BY a, b, diag ORDER BY pa
           |                  ROWS UNBOUNDED PRECEDING) AS isl
           |  FROM i0),
           |spans AS (SELECT a, b, min(pa) AS a_start,
           |    min(pa) - diag AS b_start,
           |    CAST(count(*) + 3 AS BIGINT) AS span_len
           |  FROM i1 GROUP BY a, b, diag, isl)
           |SELECT a, b, a_start, b_start, span_len FROM spans
           |WHERE span_len >= 8
           |ORDER BY a, b, a_start, b_start""".stripMargin
      },
      "span-level train->eval decontamination: leaked passages with exact offsets"),

    // Deterministic MLM corruption ([[CorpusOps.maskTokens]]): each token
    // position masked w.p. 0.15 by the salted (doc, position) hash —
    // re-run-stable and SQL-replayable, unlike an RNG draw. The oracle
    // rebuilds the masked text with list_transform over 1-based indices
    // (the engine's positions are 0-based: i-1 in the hash key) and
    // counts masks by the same hash predicate.
    Q(
      "corpus_mask_tokens",
      (s, d) =>
        CorpusOps
          .maskTokens(T(s, d, "documents"), "doc_id", "text",
            fraction = 0.15, salt = "msk")
          .orderBy("doc_id"),
      Some {
        val t15 = CorpusOps.md5Threshold(0.15)
        def hit(idx: String) =
          s"md5('msk:' || CAST(doc_id AS VARCHAR) || ':' || " +
            s"CAST($idx AS VARCHAR)) < '$t15'"
        s"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(t) AS BIGINT) AS n_tokens,
           |  CAST(len(list_filter(generate_series(1, len(t)),
           |           i -> ${hit("i - 1")})) AS BIGINT) AS n_masked,
           |  array_to_string(list_transform(generate_series(1, len(t)),
           |    i -> CASE WHEN ${hit("i - 1")} THEN '[MASK]' ELSE t[i] END),
           |    ' ') AS masked_text
           |FROM toks ORDER BY doc_id""".stripMargin
      },
      "deterministic MLM token masking: salted positional hash, re-run-stable, SQL-replayable"),

    // Banned-phrase blocklist filter ([[CorpusOps.blocklistFilter]]):
    // contiguous-sequence matching via positional k-gram equi-joins
    // against the broadcast list (one explode per distinct phrase
    // length — never a blocklist-sized regex alternation in the scan),
    // with review-queue evidence: hit count + first hit's position and
    // phrase. The oracle replays both gram streams, the IN probes, and
    // the first-hit window.
    Q(
      "corpus_blocklist_filter",
      (s, d) =>
        CorpusOps.blocklistFilter(T(s, d, "documents"), "doc_id", "text",
            Seq("table table", "slow fast", "value table part"))
          .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(lower(text)), ' +') AS t
             |  FROM documents),
             |g2 AS (SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM (
             |    SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
             |      i -> {'pos': i, 'gram': array_to_string(t[i:i+1], ' ')})) AS pg
             |    FROM toks WHERE len(t) >= 2)),
             |g3 AS (SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM (
             |    SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
             |      i -> {'pos': i, 'gram': array_to_string(t[i:i+2], ' ')})) AS pg
             |    FROM toks WHERE len(t) >= 3)),
             |h AS (
             |  SELECT * FROM g2 WHERE gram IN ('table table', 'slow fast')
             |  UNION ALL
             |  SELECT * FROM g3 WHERE gram = 'value table part'),
             |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
             |      FROM h GROUP BY doc_id),
             |f AS (SELECT doc_id, CAST(pos AS INTEGER) AS first_hit_pos,
             |        gram AS first_hit
             |      FROM (SELECT doc_id, pos, gram, ROW_NUMBER() OVER (
             |              PARTITION BY doc_id ORDER BY pos, gram) AS rn
             |            FROM h) q WHERE rn = 1)
             |SELECT d.doc_id, coalesce(c.n_hits, 0) AS n_hits,
             |  f.first_hit_pos, f.first_hit,
             |  coalesce(c.n_hits, 0) = 0 AS keep
             |FROM documents d LEFT JOIN c USING (doc_id)
             |LEFT JOIN f USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin),
      "banned-phrase blocklist: contiguous k-gram matching + first-hit evidence"),

    // T5-style span corruption ([[CorpusOps.spanCorrupt]]): contiguous
    // masked runs collapse to numbered sentinels in the input; the
    // target pairs each sentinel with its dropped tokens — the
    // denoising (input, target) pair. The oracle replays the islands
    // merge (pos − row_number per doc), sentinel numbering, and both
    // ordered reassemblies with string_agg(... ORDER BY).
    Q(
      "corpus_span_corrupt",
      (s, d) =>
        CorpusOps
          .spanCorrupt(T(s, d, "documents"), "doc_id", "text",
            fraction = 0.15, salt = "msk")
          .orderBy("doc_id"),
      Some {
        val t15 = CorpusOps.md5Threshold(0.15)
        def hit(idx: String) =
          s"md5('msk:' || CAST(doc_id AS VARCHAR) || ':' || " +
            s"CAST($idx AS VARCHAR)) < '$t15'"
        s"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t
           |  FROM documents),
           |p AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
           |  FROM toks),
           |q AS (SELECT doc_id, i, t[i] AS tok, ${hit("i - 1")} AS m FROM p),
           |mk AS (SELECT doc_id, i, tok,
           |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS rn
           |  FROM q WHERE m),
           |ks AS (SELECT doc_id, i, tok,
           |    DENSE_RANK() OVER (PARTITION BY doc_id ORDER BY i - rn) - 1 AS k
           |  FROM mk),
           |runs AS (SELECT doc_id, k, min(i) AS start_i,
           |    '<extra_id_' || CAST(k AS VARCHAR) || '>' AS sent,
           |    string_agg(tok, ' ' ORDER BY i) AS run_toks
           |  FROM ks GROUP BY doc_id, k),
           |inp AS (
           |  SELECT doc_id, i, tok FROM q WHERE NOT m
           |  UNION ALL
           |  SELECT doc_id, start_i AS i, sent AS tok FROM runs),
           |agg_in AS (SELECT doc_id,
           |    string_agg(tok, ' ' ORDER BY i) AS corrupted_text
           |  FROM inp GROUP BY doc_id),
           |agg_tg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           |    string_agg(sent || ' ' || run_toks, ' ' ORDER BY k)
           |      AS target_text
           |  FROM runs GROUP BY doc_id)
           |SELECT toks.doc_id,
           |  CAST(len(t) AS BIGINT) AS n_tokens,
           |  CAST(len(list_filter(generate_series(1, len(t)),
           |           i -> ${hit("i - 1")})) AS BIGINT) AS n_masked,
           |  coalesce(n_spans, 0) AS n_spans,
           |  agg_in.corrupted_text,
           |  coalesce(target_text, '') AS target_text
           |FROM toks JOIN agg_in USING (doc_id)
           |LEFT JOIN agg_tg USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },
      "T5 span corruption: islands->sentinels input + sentinel-paired target, hash-deterministic"),

    // TOKENIZE-AND-EXPORT end to end — the round-9 tier composed the way
    // a training-data export actually runs: Gopher rule filter → BPE
    // tokenizer INDUCED ON THE KEPT CORPUS (filter first, then train —
    // the production order) → encode every surviving doc → 4-way hash
    // sharding → 128-token greedy packing in the deterministic
    // per-shard shuffle order. Each stage is separately gated
    // (text_gopher_rules, text_bpe_encode, corpus_split_assign,
    // corpus_pack_sequences); this gates their COMPOSITION, including
    // the subtlety that the merge table differs from the full-corpus
    // one because induction sees only kept docs.
    Q(
      "corpus_tokenize_export",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = T(s, d, "documents")
        val kept = docs.join(
          TextOps.gopherRules(docs, "doc_id", "text")
            .filter(col("keep")).select("doc_id"),
          Seq("doc_id"))
        val merges = TextOps.bpeMergesLog(kept, "text", steps = 5)
          .map { case (_, p, m, _) => (p, m) }
        val enc = TextOps.bpeEncode(kept, "doc_id", "text", merges)
          .select("doc_id", "n_tokens")
        val sharded = CorpusOps.assignSplit(
          enc.withColumn("pri", CorpusOps.saltedHash(col("doc_id"), "exp")),
          "doc_id", (0 until 4).map(i => s"shard$i" -> 0.25),
          salt = "xshard", outCol = "shard")
        val pw = Window.partitionBy("shard").orderBy("pri", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sharded
          .withColumn("pack_id",
            floor((sum(col("n_tokens")).over(pw) - col("n_tokens")) / 128.0)
              .cast("long"))
          .select("doc_id", "shard", "n_tokens", "pack_id")
          .orderBy("doc_id")
      },
      Some {
        val stop = TextOps.Stopwords.map(s => s"'$s'")
          .mkString("(", ",", ")")
        val cuts = (1 to 3).map(i => CorpusOps.md5Threshold(i / 4.0))
        val hh = "md5('xshard:' || CAST(doc_id AS VARCHAR))"
        s"""WITH gk AS (
           |  SELECT doc_id FROM (
           |    SELECT doc_id, count(*) AS n, sum(length(tok)) AS ch,
           |      sum(CASE WHEN regexp_matches(tok, '[a-zA-Z]')
           |          THEN 1 ELSE 0 END) AS al,
           |      count(DISTINCT CASE WHEN tok IN $stop THEN tok END) AS st,
           |      sum(CASE WHEN regexp_matches(tok, '#|\\.\\.\\.')
           |          THEN 1 ELSE 0 END) AS sy
           |    FROM (SELECT doc_id,
           |            unnest(string_split_regex(trim(text), ' +')) AS tok
           |          FROM documents)
           |    GROUP BY doc_id) q
           |  WHERE n BETWEEN 50 AND 100000 AND ch >= 3 * n AND ch <= 10 * n
           |    AND 5 * al >= 4 * n AND st >= 2 AND 10 * sy < n),
           |kept AS (SELECT d.doc_id, d.text
           |         FROM documents d JOIN gk USING (doc_id)),
           |${TextQueries.bpeCascadeCtes(5, src = "kept")},
           |enc AS (SELECT doc_id,
           |    CAST(CASE WHEN trim(t) = '' THEN 0
           |         ELSE len(string_split(trim(t), ' ')) END AS BIGINT)
           |      AS n_tokens
           |  FROM t5),
           |sh AS (SELECT doc_id, n_tokens,
           |    CASE WHEN $hh < '${cuts(0)}' THEN 'shard0'
           |         WHEN $hh < '${cuts(1)}' THEN 'shard1'
           |         WHEN $hh < '${cuts(2)}' THEN 'shard2'
           |         ELSE 'shard3' END AS shard,
           |    md5('exp:' || CAST(doc_id AS VARCHAR)) AS pri
           |  FROM enc)
           |SELECT doc_id, shard, n_tokens,
           |  CAST(floor((SUM(n_tokens) OVER (PARTITION BY shard
           |      ORDER BY pri, doc_id ROWS UNBOUNDED PRECEDING)
           |    - n_tokens) / 128.0) AS BIGINT) AS pack_id
           |FROM sh ORDER BY doc_id""".stripMargin
      },
      "tokenize-and-export e2e: Gopher filter -> BPE trained on kept corpus -> shard -> pack"),

    // Sequence packing: fill 2048-token training sequences per shard, in
    // the deterministic shuffle order. pack_id = floor(exclusive-running-
    // token-total / budget) — contiguous fill with boundary splitting, the
    // standard approximation that needs only ONE window (partitioned by
    // shard → embarrassingly parallel; no sequential bin-packing state).
    Q(
      "corpus_pack_sequences",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = CorpusOps
          .assignSplit(T(s, d, "documents"), "doc_id",
            (0 until 4).map(i => s"shard$i" -> 0.25), salt = "shard",
            outCol = "shard")
          .select(col("doc_id"), col("shard"),
            CorpusOps.saltedHash(col("doc_id"), "shard").as("sort_key"),
            size(split(col("text"), " +")).cast("long").as("n_tokens"))
        val w = Window.partitionBy("shard").orderBy("sort_key")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base
          .withColumn("pack_id",
            floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / 2048.0)
              .cast("long"))
          .select("doc_id", "shard", "pack_id", "n_tokens")
          .orderBy("shard", "pack_id", "doc_id")
      },
      Some {
        val h = "md5('shard:' || CAST(doc_id AS VARCHAR))"
        s"""WITH b AS (
           |  SELECT doc_id,
           |    CASE WHEN $h < '${CorpusOps.md5Threshold(0.25)}' THEN 'shard0'
           |         WHEN $h < '${CorpusOps.md5Threshold(0.5)}' THEN 'shard1'
           |         WHEN $h < '${CorpusOps.md5Threshold(0.75)}' THEN 'shard2'
           |         ELSE 'shard3' END AS shard,
           |    $h AS sort_key,
           |    CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tokens
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, shard, n_tokens,
           |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY sort_key
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM b)
           |SELECT doc_id, shard,
           |  CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
           |  n_tokens
           |FROM c ORDER BY shard, pack_id, doc_id""".stripMargin
      },
      "sequence packing: 2048-token budget fill per shard, one parallel window"),

    // The corpus pipeline composed end to end, one declarative plan:
    // quality filter → exact dedup (min-id survivor) → train split →
    // chunk → shard → pack. Catalyst fuses the scalar stages; the only
    // shuffles are the dedup window, the per-shard pack window, and the
    // final order. This is the query a user actually ships — the battery
    // above gates each stage, this gates their composition.
    Q(
      "corpus_pipeline_e2e",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = split(col("text"), " +")
        val base = T(s, d, "documents").select(
          col("doc_id"), col("text"),
          size(toks).cast("long").as("n_tokens"),
          (length(regexp_replace(col("text"), "[^a-zA-Z0-9]", ""))
            .cast("double") / greatest(length(col("text")), lit(1)))
            .as("alpha_ratio"))
        val filtered = base
          .filter(col("n_tokens") >= 5 && col("alpha_ratio") >= 0.5)
        val dw = Window.partitionBy("text").orderBy("doc_id")
        val deduped = filtered
          .withColumn("_rn", row_number().over(dw)).filter(col("_rn") === 1)
        val train = CorpusOps
          .assignSplit(deduped, "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "split")
          .filter(col("split") === "train")
        val chunks = CorpusOps
          .chunkDocs(train, "doc_id", "text", chunkSize = 32, overlap = 8)
        val sharded = CorpusOps.assignSplit(chunks, "doc_id",
          (0 until 4).map(i => s"shard$i" -> 0.25), salt = "shard",
          outCol = "shard")
        val pw = Window.partitionBy("shard").orderBy("doc_id", "chunk_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sharded
          .withColumn("pack_id",
            floor((sum(col("n_tokens")).over(pw) - col("n_tokens")) / 2048.0)
              .cast("long"))
          .select("doc_id", "chunk_id", "shard", "pack_id", "n_tokens")
          .orderBy("shard", "doc_id", "chunk_id")
      },
      Some {
        val hs = "md5('split:' || CAST(doc_id AS VARCHAR))"
        val hh = "md5('shard:' || CAST(doc_id AS VARCHAR))"
        s"""WITH b AS (
           |  SELECT doc_id, text,
           |    CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tokens,
           |    CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS DOUBLE)
           |      / greatest(length(text), 1) AS alpha_ratio
           |  FROM documents),
           |f AS (SELECT * FROM b WHERE n_tokens >= 5 AND alpha_ratio >= 0.5),
           |d AS (SELECT * FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           |    FROM f) WHERE rn = 1),
           |tr AS (SELECT doc_id, text FROM d
           |       WHERE $hs < '$T80'),
           |c AS (
           |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           |    CAST(least(32, len(t) - i*24) AS BIGINT) AS n_tokens
           |  FROM (SELECT doc_id, string_split_regex(text, ' +') AS t,
           |          unnest(generate_series(0, greatest((len(string_split_regex(text, ' +'))-1)//24, 0))) AS i
           |        FROM tr)),
           |sh AS (
           |  SELECT doc_id, chunk_id, n_tokens,
           |    CASE WHEN $hh < '${CorpusOps.md5Threshold(0.25)}' THEN 'shard0'
           |         WHEN $hh < '${CorpusOps.md5Threshold(0.5)}' THEN 'shard1'
           |         WHEN $hh < '${CorpusOps.md5Threshold(0.75)}' THEN 'shard2'
           |         ELSE 'shard3' END AS shard
           |  FROM c)
           |SELECT doc_id, chunk_id, shard,
           |  CAST(floor((SUM(n_tokens) OVER (PARTITION BY shard
           |    ORDER BY doc_id, chunk_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
           |    / 2048.0) AS BIGINT) AS pack_id,
           |  n_tokens
           |FROM sh ORDER BY shard, doc_id, chunk_id""".stripMargin
      },
      "the full corpus pipeline in one plan: filter->dedup->split->chunk->shard->pack"),

    // PII redaction: the corpus is synthetic, so plant one email / URL /
    // phone per row (derived from doc_id — deterministic), then redact.
    // Both sides build the identical augmented text and apply the same
    // RE2-safe patterns; DuckDB needs the 'g' flag to match Spark's
    // replace-all default.
    Q(
      "corpus_redact_pii",
      (s, d) => {
        val did = col("doc_id").cast(StringType)
        val aug = concat(
          col("text"),
          lit(" contact user"), did,
          lit("@mail.example.com  via https://ex.example/d/"), did,
          lit("?q=1 or +1 (555) 0100-"), did)
        T(s, d, "documents")
          .select(col("doc_id"),
            CorpusOps.normalizeWhitespace(CorpusOps.redactPii(aug))
              .as("clean_text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, trim(regexp_replace(
             |  regexp_replace(
             |    regexp_replace(
             |      regexp_replace(
             |        text || ' contact user' || CAST(doc_id AS VARCHAR)
             |             || '@mail.example.com  via https://ex.example/d/'
             |             || CAST(doc_id AS VARCHAR)
             |             || '?q=1 or +1 (555) 0100-' || CAST(doc_id AS VARCHAR),
             |        'https?://[^\s]+', '<URL>', 'g'),
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g'),
             |  '\s+', ' ', 'g')) AS clean_text
             |FROM documents ORDER BY doc_id""".stripMargin),
      "PII redaction (URL→EMAIL→PHONE) + whitespace canonicalization"),

    // Segment-level exact dedup (the CCNet/RefinedWeb paragraph-dedup
    // stage): drop every 8-token segment occurring more than twice
    // corpus-wide, reassemble documents from the survivors in order.
    // The oracle rebuilds the identical segmentation with the chunk
    // oracle's slicing arithmetic and reassembles with ordered
    // string_agg; fully-boilerplate docs survive as '' on both sides.
    Q(
      "corpus_dedup_segments",
      (s, d) =>
        CorpusOps
          .dedupSegments(T(s, d, "documents"), "doc_id", "text",
            segTokens = 8, maxFreq = 2)
          .orderBy("doc_id"),
      Some("""WITH segs AS (
             |  SELECT doc_id, CAST(i AS BIGINT) AS seg_id,
             |    array_to_string(t[i*8+1:i*8+8], ' ') AS seg
             |  FROM (SELECT doc_id, string_split_regex(text, ' +') AS t,
             |          unnest(generate_series(0,
             |            greatest((len(string_split_regex(text, ' +'))-1)//8, 0))) AS i
             |        FROM documents)),
             |hot AS (SELECT seg FROM segs GROUP BY seg HAVING count(*) > 2),
             |kept AS (SELECT s.* FROM segs s ANTI JOIN hot USING (seg))
             |SELECT d.doc_id,
             |  coalesce(string_agg(k.seg, ' ' ORDER BY k.seg_id), '') AS clean_text
             |FROM documents d LEFT JOIN kept k USING (doc_id)
             |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin),
      "segment-level exact dedup: drop >2x-repeated 8-token segments, reassemble in order"),

    // WITHIN-document segment dedup ([[CorpusOps.dedupSegmentsWithinDoc]]):
    // repeated in-page boilerplate dropped at first occurrence, no
    // corpus-wide state. The gate PLANTS the repetition — each doc
    // becomes (first 16 tokens ++ first 8 tokens), so its third 8-token
    // segment duplicates its first and must drop; short docs produce
    // misaligned tails that survive — both outcomes cross the gate.
    Q(
      "corpus_dedup_within_doc",
      (s, d) => {
        val toks = split(col("text"), " +")
        CorpusOps.dedupSegmentsWithinDoc(
            T(s, d, "documents").select(col("doc_id"),
              array_join(concat(slice(toks, 1, 16), slice(toks, 1, 8)), " ")
                .as("text")),
            "doc_id", "text", segTokens = 8)
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      string_split_regex(text, ' +')[1:16] ||
             |      string_split_regex(text, ' +')[1:8], ' ') AS text
             |  FROM documents),
             |segs AS (
             |  SELECT doc_id, CAST(i AS BIGINT) AS seg_id,
             |    array_to_string(t[i*8+1:i*8+8], ' ') AS seg
             |  FROM (SELECT doc_id, string_split_regex(text, ' +') AS t,
             |          unnest(generate_series(0,
             |            greatest((len(string_split_regex(text, ' +'))-1)//8,
             |              0))) AS i
             |        FROM p)),
             |fst AS (SELECT doc_id, seg, min(seg_id) AS seg_id
             |        FROM segs GROUP BY doc_id, seg),
             |tot AS (SELECT doc_id,
             |    CAST(greatest((len(string_split_regex(text, ' +'))-1)//8, 0)
             |      + 1 AS BIGINT) AS n_segs
             |  FROM p)
             |SELECT t.doc_id,
             |  coalesce(string_agg(f.seg, ' ' ORDER BY f.seg_id), '')
             |    AS clean_text,
             |  any_value(t.n_segs) AS n_segs,
             |  CAST(count(f.seg) AS BIGINT) AS n_segs_kept
             |FROM tot t LEFT JOIN fst f USING (doc_id)
             |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin),
      "within-doc segment dedup: planted repeated segment dropped at first occurrence"),

    // Source-interleaved training order ([[CorpusOps.interleaveBySource]]):
    // hash-shuffle within source, emit round-robin — position is a pure
    // function of (salt, id), reproducible under any partitioning. The
    // oracle replays both ranks with windows; the engine computes them
    // with range-staged global ranks instead.
    Q(
      "corpus_interleave_order",
      (s, d) =>
        CorpusOps.interleaveBySource(T(s, d, "documents"), "doc_id",
            "source", salt = "il")
          .orderBy("doc_id"),
      Some("""WITH r AS (SELECT doc_id, source,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY md5('il:' || CAST(doc_id AS VARCHAR)), doc_id)
             |      AS rank_in_source
             |  FROM documents)
             |SELECT doc_id, source, rank_in_source,
             |  ROW_NUMBER() OVER (ORDER BY rank_in_source, source)
             |    AS position
             |FROM r ORDER BY doc_id""".stripMargin),
      "deterministic source-interleaved training order: round-robin dispersion, window-free"),

    // Shard digest diff ([[CorpusOps.corpusShardDigest]] +
    // [[CorpusOps.digestDiff]]): snapshot v1 = even-id docs, v2 = the
    // full corpus; the 16-row digest exchange flags exactly the shards
    // holding odd docs as changed. The oracle replays hash64 for both
    // the shard assignment and the content digests, and DuckDB's
    // bit_xor folds the same signed longs.
    Q(
      "corpus_digest_diff",
      (s, d) => {
        val docs = T(s, d, "documents")
        CorpusOps.digestDiff(
            CorpusOps.corpusShardDigest(
              docs.filter(pmod(col("doc_id"), lit(2)) === 0),
              "doc_id", "text", nShards = 16),
            CorpusOps.corpusShardDigest(docs, "doc_id", "text",
              nShards = 16))
          .orderBy("shard")
      },
      Some(s"""WITH RECURSIVE cand AS (
              |  SELECT CAST(doc_id AS VARCHAR) AS f FROM documents
              |  UNION
              |  SELECT CAST(doc_id AS VARCHAR) || ':' || text
              |  FROM documents),
              |${Hash64Oracle.hash64VocabCtes("cand")},
              |dd AS (SELECT d.doc_id,
              |    ((hi.hs % 16) + 16) % 16 AS shard, hc.hs AS ch
              |  FROM documents d
              |  JOIN hsig hi ON hi.f = CAST(d.doc_id AS VARCHAR)
              |  JOIN hsig hc
              |    ON hc.f = CAST(d.doc_id AS VARCHAR) || ':' || d.text),
              |da AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs_a,
              |    bit_xor(ch) AS digest_a
              |  FROM dd WHERE doc_id % 2 = 0 GROUP BY shard),
              |db AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs_b,
              |    bit_xor(ch) AS digest_b
              |  FROM dd GROUP BY shard)
              |SELECT b.shard,
              |  coalesce(a.n_docs_a, 0) AS n_docs_a, b.n_docs_b,
              |  a.digest_a, b.digest_b,
              |  (a.digest_a IS DISTINCT FROM b.digest_b OR
              |   coalesce(a.n_docs_a, 0) <> b.n_docs_b) AS changed
              |FROM db b LEFT JOIN da a USING (shard)
              |ORDER BY b.shard""".stripMargin),
      "corpus snapshot diff by 16-row shard digest exchange: XOR-fold Merkle summary"),

    // Content-defined chunking ([[CorpusOps.cdcChunks]]): boundaries
    // after hash64(token) % 8 == 0 tokens — content-addressed, so chunk
    // streams re-align across document versions (the FastCDC property
    // fixed windows lack; realignment is property-tested in the spec).
    // The oracle replays hash64 over the distinct token vocabulary and
    // the same doc-keyed running boundary count.
    Q(
      "corpus_cdc_chunks",
      (s, d) =>
        CorpusOps.cdcChunks(T(s, d, "documents"), "doc_id", "text",
            modulus = 8)
          .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH RECURSIVE tk AS (
              |  SELECT doc_id, i, t[i] AS f
              |  FROM (SELECT doc_id,
              |          string_split_regex(trim(text), ' +') AS t
              |        FROM documents),
              |       unnest(generate_series(1, len(t))) AS u(i)),
              |${Hash64Oracle.hash64VocabCtes("tk")},
              |tb AS (SELECT tk.doc_id, tk.i, tk.f AS tok,
              |    CASE WHEN ((h.hs % 8) + 8) % 8 = 0 THEN 1 ELSE 0 END AS b
              |  FROM tk JOIN hsig h USING (f)),
              |ch AS (SELECT doc_id, i, tok,
              |    coalesce(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |      AS chunk_idx
              |  FROM tb)
              |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
              |  CAST(count(*) AS BIGINT) AS n_tokens,
              |  string_agg(tok, ' ' ORDER BY i) AS chunk_text
              |FROM ch GROUP BY doc_id, chunk_idx
              |ORDER BY doc_id, chunk_idx""".stripMargin),
      "content-defined chunking: hash-boundary chunks that re-align across edits"),

    // Token-budget corpus mixing: cap every source at 800 tokens; the
    // keep fraction is DERIVED from per-source totals in the same plan
    // and enforced with the salted-hash threshold, so membership stays
    // deterministic. The data-dependent threshold is floor(frac * 2^60)
    // as 15 lowercase hex digits — exact IEEE arithmetic both engines
    // reproduce bit-identically.
    Q(
      "corpus_budget_mix",
      (s, d) =>
        CorpusOps
          .sampleToTokenBudget(
            T(s, d, "documents")
              .withColumn("n_tokens",
                size(split(col("text"), " +")).cast("long")),
            "doc_id", "source", col("n_tokens"),
            budgetTokens = 800L, salt = "budget")
          .select("doc_id", "source", "n_tokens")
          .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tokens,
             |    substr(md5('budget:' || CAST(doc_id AS VARCHAR)), 1, 15) AS h
             |  FROM documents),
             |f AS (
             |  SELECT source, SUM(n_tokens) AS total,
             |    lpad(lower(hex(CAST(floor(least(1.0,
             |      CAST(800 AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE))
             |      * 1152921504606846976) AS BIGINT))), 15, '0') AS thresh
             |  FROM b GROUP BY source)
             |SELECT doc_id, source, n_tokens
             |FROM b JOIN f USING (source)
             |WHERE total <= 800 OR h < thresh
             |ORDER BY doc_id""".stripMargin),
      "token-budget mixing: cap each source at 800 tokens, data-derived hash threshold"),

    // Mixture upsampling: de docs get 2.25 epochs (2 copies + a 3rd for a
    // deterministic 25% of rows), zh docs 3.0, everything else 1.0. The
    // oracle replays the floor + fractional-Bernoulli arithmetic and
    // enumerates copies with generate_series.
    Q(
      "corpus_mix_upsample",
      (s, d) =>
        CorpusOps
          .upsampleByWeight(T(s, d, "documents"), "doc_id", "lang",
            Map("de" -> 2.25, "zh" -> 3.0), salt = "up")
          .select("doc_id", "lang", "copy_idx")
          .orderBy("doc_id", "copy_idx"),
      Some(s"""WITH c AS (
              |  SELECT doc_id, lang,
              |    CASE lang WHEN 'de' THEN 2 WHEN 'zh' THEN 3 ELSE 1 END +
              |    CASE WHEN lang = 'de'
              |          AND md5('up:' || CAST(doc_id AS VARCHAR)) <
              |              '${CorpusOps.md5Threshold(0.25)}'
              |         THEN 1 ELSE 0 END AS n
              |  FROM documents)
              |SELECT doc_id, lang,
              |  CAST(unnest(generate_series(0, n - 1)) AS BIGINT) AS copy_idx
              |FROM c
              |ORDER BY doc_id, copy_idx""".stripMargin),
      "mixture upsampling: fractional repeat factors, deterministic extra-epoch rows"),

    // DSIR importance weighting (Xie et al. 2023): hashed unigram+bigram
    // features — one native StringHash64 per feature, replayed by the
    // same vocabulary-sized FNV+mix recursive CTE that oracles SimHash.
    // Two exact-integer gates (features, then the per-doc sufficient
    // statistics vs the target/raw histograms); the log weight itself is
    // consumer-side ln over these integers (libm is not cross-engine
    // bit-reproducible — HLL/tf-idf precedent) and is spec-tested
    // against a planted corpus instead of oracle-gated.
    Q(
      "corpus_dsir_features",
      (s, d) =>
        CorpusOps
          .sharedDsirFeatures(T(s, d, "documents"), "doc_id", "text", buckets = 64)
          .orderBy("doc_id", "bucket"),
      Some(Hash64Oracle.dsirFeaturesSql(buckets = 64)),
      "DSIR hashed n-gram features: unigram+bigram hash64 mod 64 bucket counts"),

    // The histograms are ≤64 rows however large the corpus (broadcast
    // model state); the 1-row totals cross join lands on that tiny
    // frame, never on the corpus — declared in PlanGuardSpec with the
    // other single-row broadcasts.
    Q(
      "corpus_dsir_stats",
      (s, d) =>
        CorpusOps
          .dsirStats(T(s, d, "documents"), "doc_id", "text",
            targetPred = col("source") === "src0", buckets = 64)
          .orderBy("doc_id", "bucket"),
      Some(Hash64Oracle.dsirStatsSql(buckets = 64,
        targetWhere = "source = 'src0'")),
      "DSIR sufficient statistics: doc bucket counts vs target/raw histograms, all integer"),

    // Epoch/token budget water-filling across language sources
    // ([[CorpusOps.epochBudget]]): repeat good sources up to per-source
    // epoch caps (en 4, de 3, rest 2) to fill a 60k-token budget (capping the three low-cap sources at sf0.01) — the
    // data-constrained-LM schedule, solved in closed form (the valid λ
    // segment is picked by INTEGER cross-multiplications; only the
    // final per-source allocations divide). The corpus collapses to one
    // per-source rollup; the segment search runs on the |sources|-row
    // domain.
    Q(
      "corpus_epoch_budget",
      (s, d) => {
        val perSrc = T(s, d, "documents")
          .groupBy(col("lang").as("src"))
          .agg(sum(size(split(col("text"), " +")).cast("long")).as("t"))
          .withColumn("r",
            when(col("src") === "en", 4L)
              .when(col("src") === "de", 3L).otherwise(2L))
        CorpusOps.epochBudget(perSrc, "src", "t", "r", budget = 60000L)
          .orderBy("src")
      },
      Some("""WITH src AS (SELECT lang AS s,
             |    CAST(sum(len(string_split_regex(text, ' +'))) AS BIGINT)
             |      AS t,
             |    CAST(CASE lang WHEN 'en' THEN 4 WHEN 'de' THEN 3
             |      ELSE 2 END AS BIGINT) AS r
             |  FROM documents GROUP BY lang),
             |ord AS (SELECT s, t, r,
             |    CAST(row_number() OVER (ORDER BY r, s) AS BIGINT) AS k,
             |    sum(t * r) OVER (ORDER BY r, s
             |      ROWS UNBOUNDED PRECEDING) AS cumtr,
             |    sum(t) OVER (ORDER BY r, s
             |      ROWS UNBOUNDED PRECEDING) AS cumt,
             |    lead(r) OVER (ORDER BY r, s) AS rnext
             |  FROM src),
             |tot AS (SELECT sum(t) AS tt, sum(t * r) AS ttr,
             |    CAST(count(*) AS BIGINT) AS m FROM src),
             |segs AS (
             |  SELECT k, r, coalesce(rnext,
             |      CAST(NULL AS BIGINT)) AS rnext,
             |    60000 - cumtr AS num, tt - cumt AS den, m
             |  FROM ord, tot
             |  UNION ALL
             |  SELECT CAST(0 AS BIGINT), NULL,
             |    (SELECT min(r) FROM src), 60000, tt, m FROM tot),
             |segs2 AS (SELECT k, r,
             |    coalesce(rnext, CAST(NULL AS BIGINT)) AS rhi,
             |    num, den, m FROM segs),
             |valid AS (SELECT * FROM segs2
             |  WHERE (k = 0 OR r * den <= num)
             |    AND ((k = m AND num >= 0)
             |      OR (k < m AND num <= rhi * den))),
             |ch AS (SELECT k AS kc, num, den FROM valid
             |  ORDER BY k LIMIT 1)
             |SELECT o.s AS src, o.t AS tokens, o.r AS cap,
             |  o.k <= ch.kc AS capped,
             |  CASE WHEN o.k <= ch.kc THEN CAST(o.t * o.r AS DOUBLE)
             |    ELSE CAST(o.t * ch.num AS DOUBLE) / CAST(ch.den AS DOUBLE)
             |  END AS alloc_tokens,
             |  (CASE WHEN o.k <= ch.kc THEN CAST(o.t * o.r AS DOUBLE)
             |    ELSE CAST(o.t * ch.num AS DOUBLE) / CAST(ch.den AS DOUBLE)
             |  END) / CAST(o.t AS DOUBLE) AS epochs
             |FROM ord o, ch ORDER BY src""".stripMargin),
      "epoch-budget water-filling: closed-form segment via integer cross-multiplication"),

    // Differentially-private language histogram
    // ([[CorpusOps.dpNoisyCounts]], ε = ½): deterministic seeded Laplace
    // — inverse-CDF over the salted portable-hash uniform (2r+1)/2⁵³,
    // whose single log is the exact rational pln(m, 2⁵²) — so the
    // release is reproducible AND hash-gateable where rand()-seeded
    // noise never could be. The oracle replays hash, integer uniform,
    // and ln stages end to end.
    Q(
      "corpus_dp_counts",
      (s, d) =>
        CorpusOps.dpNoisyCounts(T(s, d, "documents"), "lang",
            epsilon = 0.5, salt = "dp1")
          .orderBy("lang"),
      Some {
        import graft.expr.PortableLnRatio.sqlStages
        s"""WITH RECURSIVE c AS (
           |  SELECT lang, CAST(count(*) AS BIGINT) AS n
           |  FROM documents GROUP BY 1),
           |ksrc AS (SELECT 'dp1' || lang AS f FROM c),
           |${Hash64Oracle.hash64VocabCtes("ksrc")},
           |rr AS (SELECT c.lang, c.n,
           |    CAST((CASE WHEN hs < 0
           |          THEN CAST(hs AS HUGEINT) + 18446744073709551616
           |          ELSE CAST(hs AS HUGEINT) END) // 4096 AS BIGINT) AS r
           |  FROM c JOIN hsig ON hsig.f = 'dp1' || c.lang),
           |mm AS (SELECT lang, n,
           |    CASE WHEN r >= 2251799813685248 THEN CAST(1.0 AS DOUBLE)
           |         ELSE CAST(-1.0 AS DOUBLE) END AS s,
           |    CAST(CASE WHEN r >= 2251799813685248
           |         THEN 9007199254740992 - (2 * r + 1)
           |         ELSE 2 * r + 1 END AS BIGINT) AS m
           |  FROM rr),
           |${sqlStages("dq", "mm", "m", "4503599627370496",
              Seq("lang", "n", "s"))}
           |SELECT lang, n, (-2.0 * s) * pln AS noise,
           |  CAST(n AS DOUBLE) + (-2.0 * s) * pln AS n_noisy
           |FROM dqln ORDER BY lang""".stripMargin
      },
      "DP language histogram: seeded portable-hash Laplace, fully replayed oracle"),

    // k-anonymity / l-diversity audit ([[CorpusOps.kAnonymity]]) over the
    // customer table: QI = (nation, market segment), sensitive attribute
    // = "account in debt". At sf0.01 the 125 QI groups split ~29
    // k-anonymous (k=15) / 96 not, and a handful of groups are
    // k-anonymous yet NOT l-diverse (every member solvent) — exactly the
    // attribute-disclosure case the l_distinct column exists to catch.
    // One keyed rollup; count is map-side combinable, the distinct count
    // is the standard two-phase expand.
    Q(
      "corpus_k_anonymity",
      (s, d) =>
        CorpusOps.kAnonymity(
            T(s, d, "customer")
              .withColumn("in_debt", col("c_acctbal") < 0),
            Seq("c_nationkey", "c_mktsegment"), "in_debt", k = 15)
          .orderBy("c_nationkey", "c_mktsegment"),
      Some("""SELECT c_nationkey, c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS group_n,
             |  CAST(count(DISTINCT c_acctbal < 0) AS BIGINT) AS l_distinct,
             |  count(*) >= 15 AS k_anonymous
             |FROM customer
             |GROUP BY c_nationkey, c_mktsegment
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin),
      "k-anonymity audit: QI group sizes, l-diversity distinct counts, k flag"),

    // ENTROPY l-diversity ([[CorpusOps.entropyLDiversity]], l = 3) of
    // the market-segment distribution per nation — the stricter audit
    // distinct-l can't do (a 99%-one-value group passes distinct-l on a
    // token outlier; entropy fails it). Portable-ln terms on exact
    // integer rationals, sensitive-value-ordered folds, threshold
    // embedded as the same shortest-round-trip ln(3) literal both sides.
    Q(
      "corpus_entropy_l_diversity",
      (s, d) =>
        CorpusOps.entropyLDiversity(T(s, d, "customer"),
            Seq("c_nationkey"), "c_mktsegment", l = 3)
          .orderBy("c_nationkey"),
      Some {
        import graft.expr.PortableLnRatio.{compute, sqlStages}
        val lnL = compute(3L, 1L)
        s"""WITH cells AS (SELECT c_nationkey,
           |    CAST(c_mktsegment AS VARCHAR) AS sv,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM customer GROUP BY 1, 2),
           |g AS (SELECT c_nationkey, sv, cnt,
           |    CAST(sum(cnt) OVER (PARTITION BY c_nationkey) AS BIGINT)
           |      AS n
           |  FROM cells),
           |${sqlStages("el", "g", "n", "cnt", Seq("c_nationkey", "sv", "cnt", "n"))},
           |t AS (SELECT c_nationkey, sv, n,
           |    CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) * pln AS term
           |  FROM elln),
           |r AS (SELECT c_nationkey, max(n) AS group_n,
           |    CAST(count(*) AS BIGINT) AS n_values,
           |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |        list(term ORDER BY sv NULLS FIRST)), (a, x) -> a + x)
           |      AS entropy
           |  FROM t GROUP BY 1)
           |SELECT c_nationkey, group_n, n_values, entropy,
           |  entropy >= $lnL AS entropy_l_ok
           |FROM r ORDER BY c_nationkey""".stripMargin
      },
      "entropy l-diversity: portable-ln rational terms, value-ordered group folds"),

    // Temperature-scaled mixture weights
    // ([[CorpusOps.temperatureMixWeights]]) at τ = ½: w ∝ √n upsamples
    // small sources relative to natural share — the multilingual
    // sampling rule. √ is the IEEE-correctly-rounded power, and the
    // Σ√n denominator is an ordered fold over sources sorted by name,
    // so DuckDB replays every double bit-identically.
    Q(
      "corpus_temperature_mix",
      (s, d) =>
        CorpusOps
          .temperatureMixWeights(T(s, d, "documents"), "source",
            budgetDocs = 1000L)
          .orderBy("source"),
      Some("""WITH per AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
             |  FROM documents GROUP BY source),
             |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_tot,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source)),
             |      (acc, x) -> acc + x) AS denom
             |  FROM per)
             |SELECT source, n_docs,
             |  CAST(n_docs AS DOUBLE) / CAST(n_tot AS DOUBLE) AS nat_share,
             |  sqrt(CAST(n_docs AS DOUBLE)) / denom AS weight,
             |  sqrt(CAST(n_docs AS DOUBLE)) / denom * 1000.0
             |    AS expected_docs
             |FROM per, tot ORDER BY source""".stripMargin),
      "temperature mixture weights (tau=1/2): sqrt-scaled source shares, ordered-fold denominator"),

    // N-gram novelty vs the reference slice ([[CorpusOps.noveltyScores]]):
    // every doc's share of 3-grams unseen in the doc_id % 10 == 0
    // reference — memorization/off-distribution screening over the
    // SAME staged shingle frame the dedup gates read.
    Q(
      "corpus_novelty_score",
      (s, d) =>
        CorpusOps.noveltyScores(T(s, d, "documents"), "doc_id", "text",
            refPred = col("doc_id") % 10 === 0, k = 3)
          .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(text, ' +') AS t
             |  FROM documents),
             |sh AS (SELECT DISTINCT doc_id, shingle FROM (
             |  SELECT doc_id,
             |    unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
             |      ELSE list_transform(generate_series(1, len(t)-2),
             |        i -> array_to_string(t[i:i+2], ' ')) END) AS shingle
             |  FROM toks)),
             |ref AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0)
             |SELECT sh.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_grams,
             |  CAST(sum(CASE WHEN r.shingle IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_unseen,
             |  CAST(sum(CASE WHEN r.shingle IS NULL THEN 1 ELSE 0 END)
             |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
             |FROM sh LEFT JOIN ref r USING (shingle)
             |GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin),
      "n-gram novelty score: share of grams unseen in the reference slice")
  )
}
