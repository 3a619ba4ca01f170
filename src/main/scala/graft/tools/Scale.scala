package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{CorpusOps, DedupOps, EvalOps, GraphOps, IntervalOps, LayoutOps, LinkageOps, MultimodalOps, SketchOps, StatOps, TextOps}

/** Wall-time scaling curves for the five operators whose LINEARITY is
  * load-bearing in every 100 TB claim: connected components (iterative +
  * star-contraction), decontamination, capped n-gram Jaccard, blocked
  * fuzzy linkage, and MinHash-LSH. Synthetic corpora at three sizes
  * spanning two decades; a superlinear bend here means the asymptotic
  * argument in the scaladoc is wrong in practice.
  *
  * Corpus model (all derived from `spark.range` + deterministic hashes —
  * distributed generation, no driver-side data):
  *
  *  - documents: 40 tokens each, vocabulary ∝ corpus size (a growing
  *    corpus grows by NEW content, so per-shingle document frequency
  *    stays flat — the regime the operators are designed for; a corpus
  *    whose vocabulary saturates instead is exactly what the hot-shingle
  *    cap handles, measured separately by the cap itself). Every 10th
  *    doc is a planted near-dup of its predecessor (3-gram Jaccard ≈ .9).
  *  - names: blocks of 4 sharing a 16-char prefix, differing in a final
  *    ordinal char — every block contributes bounded candidates, like
  *    the deletion-neighborhood keys in the linkage gate.
  *  - edges: chains of 20 nodes (components of constant size, count ∝ n
  *    — the duplicate-cluster shape at corpus scale).
  *
  * Two trials per (operator, size), min reported (first trial at the
  * smallest size also pays codegen/JIT; min-of-2 removes that without
  * hiding steady-state cost). Output: one JSON line per measurement plus
  * a markdown table for PERF.md. */
object Scale {

  private def docs(spark: SparkSession, n: Long): DataFrame = {
    val vocab = n // ∝ n: flat shingle df as the corpus grows
    val src = when(col("id") % 10 === 0 && col("id") > 0, col("id") - 1)
      .otherwise(col("id"))
    val toks = transform(sequence(lit(0L), lit(39L)),
      j => concat(lit("w"),
        pmod(xxhash64(src * 1000L + j), lit(vocab)).cast("string")))
    val base = concat_ws(" ", toks)
    spark.range(n).select(
      col("id").as("doc_id"),
      // near-dup: the source text plus a unique tail token (J ≈ 38/42)
      when(col("id") % 10 === 0 && col("id") > 0,
        concat(base, lit(" zz"), col("id").cast("string")))
        .otherwise(base).as("text"))
  }

  private def names(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("nid"),
      concat(lit("n"),
        // floor division: `/` on longs is DOUBLE division and would leak
        // ".25" fractions into the "shared" prefix (blocks of size 1)
        lpad(floor(col("id") / 4).cast("long").cast("string"), 15, "0"),
        pmod(col("id"), lit(4)).cast("string")).as("name"))

  private def edges(spark: SparkSession, nNodes: Long): DataFrame =
    spark.range(nNodes)
      .filter(col("id") % 20 =!= 19) // break chains every 20 nodes
      .select(col("id").as("a"), (col("id") + 1).as("b"))

  /** Disjoint triangles (3k, 3k+1, 3k+2): triangle count ∝ n, max degree
    * 2 — the constant-degree regime where triangle work must track the
    * edge count. */
  private def triEdges(spark: SparkSession, nNodes: Long): DataFrame = {
    val base = spark.range(nNodes / 3).select((col("id") * 3).as("k"))
    base.select(col("k").as("a"), (col("k") + 1).as("b"))
      .union(base.select((col("k") + 1).as("a"), (col("k") + 2).as("b")))
      .union(base.select(col("k").as("a"), (col("k") + 2).as("b")))
  }

  /** Keyed intervals, 100 per key, starts every 10 ticks with lengths
    * cycling 0/8/16 — mixes merges (16 covers the next start) with gaps,
    * so islands per key stay a nontrivial constant fraction. */
  private def intervals(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("iid"),
      expr("id div 100").as("k"),
      (col("id") % 100 * 10).as("s"),
      (col("id") % 100 * 10 + (col("id") % 3) * 8).as("e"))

  /** Hash-valued measurements in 64 groups (plus a rank-skewed tail so
    * MAD flags ~constant-fraction outliers) and a 2-D point cloud for the
    * skyline sweep. */
  private def measures(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("mid"),
      pmod(col("id"), lit(64)).as("g"),
      (pmod(xxhash64(col("id")), lit(1000)) +
        when(col("id") % 97 === 0, lit(100000L)).otherwise(lit(0L)))
        .cast("double").as("v"),
      pmod(xxhash64(col("id"), lit(1)), lit(100000)).as("x"),
      pmod(xxhash64(col("id"), lit(2)), lit(100000)).as("y"))

  /** 16-dim hash-derived embeddings (values in [0, 10)) — enough
    * structure for IVF-PQ's coarse lists to be non-degenerate. */
  private def vecs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0L), lit(15L)),
        j => (pmod(xxhash64(col("id") * 16L + j), lit(1000))
          .cast("double") / lit(100.0))).as("embedding"))

  private def time(f: => Long): Double = {
    val t0 = System.nanoTime()
    val n = f
    val secs = (System.nanoTime() - t0) / 1e9
    require(n > 0, "operator produced no rows — the measurement is vacuous")
    secs
  }

  def main(args: Array[String]): Unit = {
    val sizes: Seq[Long] =
      if (args.nonEmpty) args(0).split(",").map(_.trim.toLong).toSeq
      else Seq(5000L, 50000L, 500000L)
    // min-of-3 default: host noise at small n is several seconds.
    // SPARK_GRAFT_TRIALS / SPARK_GRAFT_SHUFFLE override for diagnostic
    // A/Bs (e.g. does the top tier's over-linear bend disappear when
    // partitions scale with the data, as they would on a real cluster?).
    val trials = sys.env.get("SPARK_GRAFT_TRIALS").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Double)]

    // optional args(1): comma-separated op names — run only those
    // (refresh individual curves without paying the full sweep)
    val opFilter: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").map(_.trim).toSet)
      else None

    for (n <- sizes) {
      val d = docs(spark, n).persist()
      val nm = names(spark, n).persist()
      val e = edges(spark, 2 * n).persist()
      val te = triEdges(spark, 2 * n).persist()
      val iv = intervals(spark, n).persist()
      val ms = measures(spark, n).persist()
      val vc = vecs(spark, n).persist()
      val baseE = e.filter(col("a") % 20 =!= 9).persist()
      val deltaE = e.filter(col("a") % 20 === 9).persist()
      // materialize outside the clock; incremental CC's scenario state
      // (base labels, BPE merge table) is likewise pre-built — the timed
      // pass is the per-ingest operator, as in production. Under an op
      // filter the eager force is skipped: persist() is lazy, so frames
      // no selected op touches are never computed (a 5M graph-only
      // sweep must not pay 5M docs of BPE induction), and min-of-N
      // trials absorbs the first trial's materialization instead —
      // which requires trials >= 2: a filtered SINGLE-trial run would
      // time input generation plus the operator and corrupt the curve,
      // so that combination fails fast rather than publishing a lie.
      require(opFilter.isEmpty || trials >= 2,
        "Scale: an op filter with SPARK_GRAFT_TRIALS=1 would fold input " +
          "materialization into the only timed trial — set trials >= 2 " +
          "or drop the filter")
      if (opFilter.isEmpty)
        (d.count(), nm.count(), e.count(), te.count(), iv.count(),
          ms.count(), vc.count(), baseE.count(), deltaE.count())
      val baseLabels =
        if (opFilter.forall(_.contains("incremental_cc")))
          GraphOps.connectedComponents(baseE, "a", "b")
        else spark.emptyDataFrame
      val bpeTable =
        if (opFilter.forall(_.contains("bpe_encode")))
          TextOps.bpeMergesLog(d, "text", steps = 5)
            .map(m => (m._2, m._3))
        else Seq.empty[(String, String)]

      val ops: Seq[(String, () => Long)] = Seq(
        "ngram_jaccard_capped" -> (() =>
          DedupOps.ngramJaccardPairs(d, "doc_id", "text",
            k = 3, threshold = 0.8, maxShingleFreq = Some(8)).count()),
        "minhash_lsh" -> (() =>
          DedupOps.minhashLshPairs(d, "doc_id", "text",
            k = 3, threshold = 0.8).count()),
        // prefix filter: candidates come from the n-ceil(t*n)+1 rarest
        // shingles per doc; with vocabulary ∝ n the prefix join should
        // track n while returning the EXACT join's pairs
        "prefix_filter_jaccard" -> (() =>
          DedupOps.prefixFilterJaccardPairs(d, "doc_id", "text",
            k = 3, threshold = 0.8).count()),
        "winnow_pairs" -> (() =>
          DedupOps.winnowPairs(d, "doc_id", "text",
            k = 8, w = 4, minShared = 3, maxFpFreq = Some(8)).count()),
        "decontaminate" -> (() =>
          CorpusOps.decontaminationPairs(d, "doc_id", "text",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
            salt = "split", trainLabel = "train",
            k = 3, minContainment = 0.6).count()),
        "linkage_blocked" -> (() =>
          LinkageOps.blockedFuzzyPairs(nm, "nid", "name",
            Seq(substring(col("name"), 1, 16)), maxDistance = 1).count()),
        "connected_components" -> (() => {
          val cc = GraphOps.connectedComponents(e, "a", "b")
          val rows = cc.count()
          cc.unpersist()
          rows
        }),
        "star_contraction" -> (() => {
          val sc = GraphOps.starContraction(e, "a", "b")
          val rows = sc.count()
          sc.unpersist()
          rows
        }),
        // tf/df ranking: vocabulary ∝ n (the docs() model), so the df
        // rollup and the token join both grow linearly with the corpus —
        // the case where a superlinear bend would appear if the rank
        // window or the join misbehaved
        "tfidf_topk" -> (() =>
          TextOps.tfidfTopK(d, "doc_id", "text", k = 5).count()),
        // Bloom prune: dim = every 50th doc id (2% selectivity), filter
        // sized at ~20 bits/item for the dim side; fact scan + scalar
        // subquery + pruned semi join should track n
        "bloom_semi_join" -> (() =>
          SketchOps.bloomSemiJoin(
            d.select(col("doc_id")),
            d.select(col("doc_id")).filter(col("doc_id") % 50 === 0),
            "doc_id", "doc_id",
            expectedItems = math.max(n / 50, 16L),
            numBits = math.max(n / 50, 16L) * 20).count()),
        // co-occurrence: the vocabulary cap (50) fixes per-doc pair
        // fan-out, so the doc-keyed self-join should track n even though
        // vocabulary ∝ n makes the cap maximally selective — a
        // superlinear bend here means the pair join escaped the cap
        "cooccurrence" -> (() =>
          TextOps.cooccurrencePairs(d, "doc_id", "text",
            vocabK = 50).count()),
        // bigram coverage: distinct bigrams grow ∝ n (vocabulary ∝ n),
        // the top-200 list is TakeOrdered (per-partition heaps), the
        // probe is a broadcast join — end-to-end should track n
        "bigram_coverage" -> (() =>
          TextOps.bigramCoverage(d, "doc_id", "text",
            topK = 200).count()),
        // substring spans: every 10th doc shares its predecessor's full
        // 40-token body (one long diagonal run each) and vocabulary ∝ n
        // keeps grams rare — match volume ∝ n, islands linear
        "substring_spans" -> (() =>
          DedupOps.substringSpanPairs(d, "doc_id", "text",
            k = 4, minLen = 8, maxGramFreq = Some(8)).count()),
        // PageRank: chains of 20, 3 rounds — per-round work is one rank
        // shuffle over a fixed edge layout, so wall time must track E
        "pagerank_3iter" -> (() =>
          GraphOps.pageRankUnits(e, "a", "b", iters = 3).count()),
        // weighted PageRank over the same chains with a deterministic
        // 1-9 weight per edge — same per-round shape as pagerank_3iter
        // plus the one-time out-weight join, so the curve must coincide
        "pagerank_weighted_3iter" -> (() =>
          GraphOps.pageRankWeightedUnits(
            e.withColumn("w", pmod(xxhash64(col("a")), lit(9)) + 1),
            "a", "b", "w", iters = 3).count()),
        // SSSP from one seed per 20-chain (every 400th node): weights
        // 1-9, so frontier Bellman-Ford settles each chain in ~19
        // rounds whatever n — per-round relaxation work must track E
        "sssp_bf" -> (() =>
          GraphOps.ssspUnits(
            e.withColumn("w", pmod(xxhash64(col("a")), lit(9)) + 1),
            "a", "b", "w",
            e.select(col("a").as("seed")).filter(col("seed") % 400 === 0),
            "seed", maxRounds = 25).count()),
        // BFS from the same seed set: hop rounds are fixed by the chain
        // length (~19), so the curve isolates per-round frontier joins
        "bfs_hops" -> (() =>
          GraphOps.bfsHops(e, "a", "b",
            e.select(col("a").as("seed")).filter(col("seed") % 400 === 0),
            "seed", maxHops = 20).count()),
        // personalized PageRank from the same seeds, 3 rounds — the
        // seed-restricted teleport must not change the per-round slope
        "ppr_3iter" -> (() =>
          GraphOps.pprUnits(e, "a", "b",
            e.select(col("a").as("seed")).filter(col("seed") % 400 === 0),
            "seed", iters = 3).count()),
        // landmark Brandes (node + edge betweenness): forward σ waves +
        // backward δ from one landmark per 20-chain — per-round state is
        // one (lm, node) row per chain member, so both sweeps and both
        // final rollups must track E at the chain-fixed round count
        "brandes_landmarks" -> (() => {
          val (bw, eb) = GraphOps.landmarkBrandesUnits(e, "a", "b",
            e.select(col("a").as("seed")).filter(col("seed") % 400 === 0),
            "seed", maxHops = 20)
          bw.count() + eb.count()
        }),
        // Pettitt changepoint: three within-key windows (value rank, tie
        // count, time-cumulative U) — the window-sort regime, same as
        // acf_by_key; must track n log(n/keys)
        "pettitt" -> (() =>
          StatOps.pettittChangepoint(ms, "g", "mid", "mid", "v",
            scale = 1.0).count()),
        // Cramér–von Mises: one range-staged running-sums pass + a
        // per-value tie rollup + a scalar fold — must track the
        // global-rank regime (no unpartitioned corpus window)
        "cramer_vonmises" -> (() =>
          StatOps.cramerVonMises(
            ms.select(col("v").cast("long").as("vq"), col("mid"),
              (col("mid") % 2).as("fa")),
            "fa", "vq", "mid").count()),
        // two parity-alternating Louvain rounds from singleton seeds:
        // loop-invariant frames build once, each round one
        // neighbor-label join + argmax rollup — must track E at the
        // fixed round count
        "louvain_2rounds" -> (() =>
          GraphOps.louvainCommunitiesRounds(e, "a", "b",
            e.select(col("a").as("id")).distinct()
              .withColumn("c", col("id")),
            "id", "c", rounds = 2).count()),
        // per-source token JS matrix: one token rollup (vocab ∝ n) +
        // a C(G,2)-pair join over shared tokens with G fixed at 16
        // (120 pairs × shared vocab) — the corpus-sized stage is the
        // rollup, so the curve must track n at fixed G
        "token_divergence" -> (() =>
          TextOps.tokenDivergenceMatrix(
            d.withColumn("src", pmod(col("doc_id"), lit(16))),
            "src", "text").count()),
        // the GROUP axis of the same matrix: C(64,2) = 2016 pairs vs
        // C(16,2) = 120 — 16.8x the pair fan-out at the same corpus, so
        // comparing this curve against token_divergence at fixed n pins
        // how much of the cost is the domain-sized pair join vs the
        // corpus-sized token rollup
        "token_divergence_g64" -> (() =>
          TextOps.tokenDivergenceMatrix(
            d.withColumn("src", pmod(col("doc_id"), lit(64))),
            "src", "text").count()),
        // triangles: disjoint 3-cliques, degree <= 2 — wedge work per
        // node is O(1), so the two joins must track the edge count
        "triangle_counts" -> (() =>
          GraphOps.triangleCounts(te, "a", "b").count()),
        // interval islands: one sort per key partition — n log n at worst
        "interval_merge" -> (() =>
          IntervalOps.mergeIntervals(iv, "k", "s", "e",
            tieCols = Seq("iid")).count()),
        // MAD outliers: two element-selection medians = two sorts
        "mad_outliers" -> (() =>
          StatOps.madOutliers(ms, "g", "v", "mid", k = 3.0).count()),
        // skyline: distinct rollup + bucketed sweep; candidate set is
        // frontier-sized, so the global stage must not grow with n
        "skyline_2d" -> (() =>
          StatOps.skyline2D(ms, "x", "y").count()),
        // global ranking: range partition + per-partition rank + offsets
        // — THE claim is that no single-partition sort appears, so wall
        // time must track n through the two shuffles
        "global_rank" -> (() =>
          StatOps.globalRowNumber(ms,
            Seq(org.apache.spark.sql.functions.col("v"),
              org.apache.spark.sql.functions.col("mid")), "r").count()),
        // BPE encode: the merge table (induced outside the clock, driver
        // state) rides the expression; one scan with a fixed per-row
        // loop over it — the curve must track the corpus alone
        "bpe_encode" -> (() => {
          TextOps.bpeEncode(d, "doc_id", "text", bpeTable)
            .select(sum(length(col("enc")))).head().getLong(0)
        }),
        // incremental CC: base labels persisted outside the clock; the
        // timed pass is the delta merge only (delta = the n/10 chain
        // reconnection edges) — the service-loop cost, delta-linear
        "incremental_cc" -> (() => {
          val labels = GraphOps.incrementalComponents(
            baseLabels, deltaE, "a", "b")
          val rows = labels.count()
          labels.unpersist()
          rows
        }),
        // IVF-PQ: assignment is n x nlist broadcast, encoding n x m x
        // ksub — both linear in the corpus; the query side is O(1)
        "ivfpq_topk" -> (() =>
          graft.ops.SimilarityOps.ivfPqTopK(
            vc.filter(col("vec_id") < 5), vc, "vec_id", "embedding",
            k = 10, nlist = 16, nprobe = 4, m = 4, ksub = 16).count()),
        // span corruption: explode + islands windows keyed by doc — the
        // windows partition on doc_id so work must track token count
        "span_corrupt" -> (() =>
          CorpusOps.spanCorrupt(d, "doc_id", "text",
            fraction = 0.15, salt = "sc").count()),
        // k-truss over disjoint triangles (constant degree, k=3 keeps
        // every edge): one support-peel round + the convergence check —
        // the per-round triangle-support machinery must track E
        "ktruss_k3" -> (() =>
          GraphOps.kTrussEdges(te, "a", "b", k = 3).count()),
        // blocklist: two positional-gram streams probed against a
        // broadcast list — scan-linear whatever the blocklist size
        "blocklist_filter" -> (() =>
          CorpusOps.blocklistFilter(d, "doc_id", "text",
            Seq("w1 w2", "w2 w3 w4")).count()),
        // cross-split span decontamination: anchors join ACROSS the
        // 80/20 split only; with vocabulary ∝ n the match volume stays
        // ∝ n (the planted near-dup pairs straddling the split)
        "decontaminate_spans" -> (() => {
          val lab = CorpusOps.assignSplit(d, "doc_id",
            Seq("train" -> 0.8, "eval" -> 0.2), salt = "ds")
          DedupOps.substringSpanPairsBetween(
            lab.filter(col("split") === "train"),
            lab.filter(col("split") =!= "train"),
            "doc_id", "text", k = 4, minLen = 8,
            maxGramFreq = Some(8)).count()
        }),
        // CDC chunking: positional explode + codegen'd boundary flag +
        // doc-keyed running count + ordered reassembly — every stage
        // keys on the doc id, so wall time must track total tokens
        // perceptual triad: synthesize real container bytes and hash
        // them in the same pass — times the partition-batched codec
        // loops (the repo's only heavy JVM-loop path); must be
        // scan-linear with a per-row constant
        "image_dhash" -> (() =>
          MultimodalOps.imageDhash(
            MultimodalOps.gradientMediaFromDocs(d))
            .filter(col("dhash").isNotNull).count()),
        "audio_envelope_hash" -> (() =>
          MultimodalOps.audioEnvelopeHash(
            MultimodalOps.sawMediaFromDocs(d))
            .filter(col("ahash").isNotNull).count()),
        "video_temporal_hash" -> (() =>
          MultimodalOps.videoTemporalHash(
            MultimodalOps.lumaRampMediaFromDocs(d))
            .filter(col("vhash").isNotNull).count()),
        "cdc_chunks" -> (() =>
          CorpusOps.cdcChunks(d, "doc_id", "text", modulus = 8).count()),
        // source interleave: two range-staged global ranks over n rows
        // (20 sources) — the global-rank primitive is the known-flat
        // part, so this times the two extra keyed joins
        "interleave_order" -> (() =>
          CorpusOps.interleaveBySource(
            d.withColumn("src", pmod(col("doc_id"), lit(20)).cast("string")),
            "doc_id", "src", salt = "il").count()),
        // per-group percent rank: global rank + two keyed rollups + two
        // keyed joins — the window-free grouped-rank shape shared by
        // aucExactByGroup
        "group_percent_rank" -> (() =>
          EvalOps.groupPercentRank(
            d.select(col("doc_id"),
              pmod(col("doc_id"), lit(20)).cast("string").as("g"),
              length(col("text")).as("v")),
            "g", "v", "doc_id").count()),
        // shard digest: one projection (two native hashes/row) + one
        // 64-ary rollup — must be scan-linear with a flat constant
        "shard_digest" -> (() =>
          CorpusOps.corpusShardDigest(d, "doc_id", "text", 64).count()),
        // DSIR sufficient stats: feature explode + two <=B-row histogram
        // rollups + a broadcast join back — the histogram model state is
        // size-B however big the corpus, so wall time must track the
        // token count alone (target = every 10th doc, production-width
        // bucket space)
        "dsir_stats" -> (() => {
          // dsirStats memoizes its feature frame per (df, params) —
          // clear it so every trial times the real feature extraction,
          // not trial 1's persisted blocks (and so earlier sizes' frames
          // don't squat in executor memory during later ops)
          CorpusOps.clearDsirFeatureCache()
          CorpusOps.dsirStats(d, "doc_id", "text",
            targetPred = col("doc_id") % 10 === 0,
            buckets = 4096).count()
        }),
        // Spearman: two distinct-value rollups + prefix sums over the
        // value DOMAINS (v ~1k+tail, x 100k) + two value joins back +
        // one decimal-moment rollup — every stage keyed, must track n
        "spearman_rho" -> (() =>
          StatOps.spearmanRho(ms, "x", "v").count()),
        // EWMA level: one keyed rollup collecting each of the 64
        // groups' series — times the collect+sorted-fold shape (per-key
        // state bounded by group size, which here grows ∝ n: the op's
        // documented worst case)
        "ewma_level" -> (() =>
          StatOps.ewmaLevel(ms, "g", "mid", "mid", "v",
            alpha = 0.25).count()),
        // ranking battery: global rank over the slate + offsets + two
        // keyed joins + per-user rollup — the window-free rank shape
        // under a 64-user, n-candidate slate
        "ranking_metrics" -> (() =>
          EvalOps.rankingMetrics(
            ms.select(col("g"), col("mid"), col("v")),
            "g", "mid", "v",
            ms.filter(col("mid") % 3 === 0).select(col("g"), col("mid")),
            k = 5).count()),
        // blocked Damerau pairs: equi-join on the 4-row name blocks +
        // the O(|a|·|b|) scorer per in-block pair — pair volume ∝ n by
        // construction, so wall time must track n
        "damerau_blocked" -> (() =>
          LinkageOps.blockedDamerauPairs(nm, "nid", "name",
            substring(col("name"), 1, 16), maxDist = 4).count()),
        // Jaro-Winkler pairs: same blocks, the window-scan scorer
        "jaro_winkler_blocked" -> (() =>
          LinkageOps.blockedJaroWinklerPairs(nm, "nid", "name",
            substring(col("name"), 1, 16), minSim = 0.8).count()),
        // Hilbert prune: one codegen'd projection + a 256-tile rollup —
        // must be scan-linear like its Z-order twin
        "hilbert_prune" -> (() =>
          LayoutOps.hilbertPruneStats(ms,
            pmod(col("x"), lit(256)), pmod(col("y"), lit(256)),
            bits = 8, tileBits = 8,
            xLo = 32, xHi = 47, yLo = 64, yHi = 95).count()),
        // Zipf slope: token rollup (vocab ∝ n) + TakeOrdered top-1000 +
        // a 1000-element fold — the tail stages are constant-size, so
        // the curve must track the token scan
        "zipf_slope" -> (() =>
          TextOps.zipfSlope(d, "text", k = 1000).count()),
        // Gini stump: one keyed rollup per feature + ordered folds over
        // group domains (20 and 7 groups) — scan-linear per feature
        "gini_stump" -> (() =>
          EvalOps.giniSplit(
            d.withColumn("y", col("doc_id") % 3 === 0),
            "y",
            Seq("mod20" -> pmod(col("doc_id"), lit(20)),
              "mod7" -> pmod(col("doc_id"), lit(7)))).count()),
        // ACF: one per-key window pass (3 leads) + one moment rollup —
        // key partitions grow ∝ n/64, so the sort inside each window
        // partition is the only super-linear term
        "acf_by_key" -> (() =>
          StatOps.acfByKey(ms, "g", "mid", "mid", "v",
            maxLag = 3).count()),
        // CUSUM: ordered + unordered windows over the same key
        // partitions, then a per-key top-1 — same window-sort regime
        "cusum_changepoint" -> (() =>
          StatOps.cusumChangepoint(ms, "g", "mid", "mid", "v").count()),
        // Holt: the collect+sorted-fold shape of ewma_level with a
        // struct accumulator — per-key state again ∝ n/64
        "holt_linear" -> (() =>
          StatOps.holtLinear(ms, "g", "mid", "mid", "v",
            alpha = 0.25, beta = 0.5).count()),
        // label propagation over disjoint triangles: 3 rounds of one
        // edges x labels join + a per-node top-1 (max partition =
        // max degree = 2) — per-round work must track E
        "label_prop" -> (() =>
          GraphOps.labelPropagationCommunities(te, "a", "b",
            rounds = 3).count()),
        // containment: the Jaccard inverted-index join with directional
        // unfold; vocabulary ∝ n keeps shingles rare, planted near-dups
        // make match volume ∝ n. Trial 1 pays the shared-shingle
        // staging, trials 2-3 time the staged-consumer cost (min-of-3 →
        // the production service shape)
        "containment_pairs" -> (() =>
          DedupOps.containmentPairs(d, "doc_id", "text",
            k = 3, minContainment = 0.6).count()),
        // inter-arrival: one window pass + one keyed rollup over the
        // same 64-key partitions as the other per-key state ops
        "interarrival" -> (() =>
          StatOps.interarrivalStats(
            ms.select(col("g"), timestamp_micros(col("mid")).as("ts"),
              col("mid")),
            "g", "ts", "mid").count()),
        // HITS: two keyed joins + two rollups + two 1-row normalization
        // broadcasts per round over the chain edges — must track E like
        // pagerank_3iter
        "hits_2iter" -> (() =>
          GraphOps.hitsUnits(e, "a", "b", iters = 2).count()),
        // coreness fixpoint: chains converge in a handful of h-index
        // rounds (all coreness 1), so the curve isolates the per-round
        // adjacency join + fold at fixed round count — must track E
        "coreness" -> (() =>
          GraphOps.corenessDecomposition(e, "a", "b").count()),
        // k-core at k=2 over disjoint triangles: nothing peels, so the
        // loop runs exactly one support round + the convergence check —
        // per-round degree machinery must track E
        "kcore_k2" -> (() =>
          GraphOps.kCoreNodes(te, "a", "b", k = 2).count()),
        // SCC over the chains with a 2-cycle at every 5th link: fixed
        // peel-pass and trim-round counts per chain shape, so the curve
        // isolates the per-round edge join + rollup — must track E
        "scc" -> (() =>
          GraphOps.stronglyConnectedComponents(
            e.union(e.filter(col("a") % 5 === 0)
              .select(col("b").as("a"), col("a").as("b"))),
            "a", "b").count()),
        // Kendall tau-b: ONE corpus rollup to the (50 x 100)-cell joint
        // histogram; the quadratic stage runs on the fixed cell domain,
        // so the curve must track the rollup scan alone
        "kendall_tau" -> (() =>
          StatOps.kendallTauB(
            ms.select(pmod(col("x"), lit(50)).as("x"),
              pmod(col("v").cast("long"), lit(100)).as("y")),
            "x", "y").count()),
        // TF-IDF cosine: df-capped inverted index + token-sorted folds;
        // with vocabulary ∝ n the per-token df is ~Poisson(40) whatever
        // the corpus size, so the cap (100) bounds posting lists at a
        // constant and join volume stays ∝ n; only the planted
        // near-dups clear the 0.5 floor
        "tfidf_cosine" -> (() =>
          TextOps.tfidfCosinePairs(d, "doc_id", "text",
            maxDf = 100, minCosine = 0.5).count()),
        // same query through the Bayardo prefix filter: candidate join
        // volume drops from sum(df^2) to sum(prefixCount*df) — the
        // curve this exists to bend back to linear
        "tfidf_cosine_prefix" -> (() =>
          TextOps.tfidfCosinePairsPrefix(d, "doc_id", "text",
            maxDf = 100, minCosine = 0.5).count()))

      for ((name, op) <- ops if opFilter.forall(_.contains(name))) {
        System.gc() // don't let one op's garbage land in the next's clock
        val secs = (1 to trials).map(_ => time(op())).min
        results += ((name, n, secs))
        println(f"""{"op":"$name","n":$n,"secs":$secs%.2f}""")
      }
      d.unpersist(); nm.unpersist(); e.unpersist()
      te.unpersist(); iv.unpersist(); ms.unpersist()
      vc.unpersist(); baseE.unpersist(); deltaE.unpersist()
      baseLabels.unpersist()
    }

    // markdown table: rows = ops, one column per size, plus the growth
    // exponent alpha over the full range (t ~ n^alpha; alpha <= ~1.15
    // reads as linear-with-overhead, >1.3 is a superlinear bend)
    println("\n| operator | " + sizes.map(s => s"n=$s").mkString(" | ") +
      " | alpha |")
    println("|---|" + sizes.map(_ => "---|").mkString + "---|")
    for (op <- results.map(_._1).distinct) {
      val times = sizes.map(s =>
        results.find(r => r._1 == op && r._2 == s).get._3)
      val alpha = math.log(times.last / times.head) /
        math.log(sizes.last.toDouble / sizes.head)
      println(s"| $op | " + times.map(t => f"$t%.2f s").mkString(" | ") +
        f" | $alpha%.2f |")
    }
    spark.stop()
  }
}
