package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Corpus-preparation operators: deterministic sampling / splits,
  * stratified mixing, chunking, redaction. */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = (0L until 400L)
    .map(i => (i, (0 until (i % 90 + 1).toInt).map(j => s"t$j").mkString(" "),
      if (i % 3 == 0) "en" else "de"))
    .toDF("doc_id", "text", "lang")

  test("md5Threshold covers the space monotonically") {
    assert(CorpusOps.md5Threshold(0.0) == "0" * 32)
    assert(CorpusOps.md5Threshold(1.0) == "f" * 32)
    assert(CorpusOps.md5Threshold(0.5) == "8" + "0" * 31)
    val ts = Seq(0.1, 0.25, 0.5, 0.8, 0.99).map(CorpusOps.md5Threshold)
    assert(ts == ts.sorted && ts.distinct == ts)
  }

  test("sampleByHash is deterministic, salt-sensitive, ~proportional") {
    val s1 = CorpusOps.sampleByHash(docs, "doc_id", 0.5, "a")
      .select("doc_id").as[Long].collect().toSet
    val s2 = CorpusOps.sampleByHash(docs, "doc_id", 0.5, "a")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same salt+fraction must reproduce exactly")
    val sOther = CorpusOps.sampleByHash(docs, "doc_id", 0.5, "b")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 != sOther, "different salt must decorrelate")
    assert(math.abs(s1.size - 200) < 60, s"got ${s1.size} of 400 at f=0.5")
    // nesting: a 0.2 sample is a strict subset of the 0.5 sample (same salt)
    val s02 = CorpusOps.sampleByHash(docs, "doc_id", 0.2, "a")
      .select("doc_id").as[Long].collect().toSet
    assert(s02.subsetOf(s1), "thresholds nest: f=0.2 ⊂ f=0.5 under one salt")
  }

  test("assignSplit is exhaustive, disjoint, and re-run stable") {
    val split = CorpusOps.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s")
    val byLabel = split.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel.values.sum == 400L, "every row labeled exactly once")
    assert(byLabel("train") > byLabel("val") && byLabel("train") > byLabel("test"))
    val again = CorpusOps.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s")
    assert(split.collect().toSeq == again.collect().toSeq)
  }

  test("assignKFolds: exhaustive, roughly balanced, independent of split salt") {
    val folds = CorpusOps.assignKFolds(docs, "doc_id", k = 5, salt = "cv")
    val byFold = folds.groupBy("fold").count().as[(String, Long)].collect().toMap
    assert(byFold.keySet == (0 until 5).map(i => s"fold$i").toSet)
    assert(byFold.values.sum == 400L, "every row in exactly one fold")
    assert(byFold.values.forall(n => n > 40 && n < 120),
      s"uniform hash should roughly balance 5 folds of 400: $byFold")
    // Different salt ⇒ different (independent) assignment for some rows.
    val other = CorpusOps.assignKFolds(docs, "doc_id", k = 5, salt = "cv2")
    val joined = folds.select(col("doc_id"), col("fold").as("f1"))
      .join(other.select(col("doc_id"), col("fold").as("f2")), "doc_id")
    assert(joined.filter(col("f1") =!= col("f2")).count() > 100)
  }

  test("capPerGroup bounds every group, keeps small groups whole, re-runs stable") {
    val capped = CorpusOps.capPerGroup(docs, "doc_id", "lang", n = 50, salt = "c")
    val byLang = capped.groupBy("lang").count().as[(String, Long)].collect().toMap
    // docs: ~134 'en' (i%3==0), ~266 'de' — both above the cap
    assert(byLang.values.forall(_ == 50L), s"every group capped at 50: $byLang")
    val loose = CorpusOps.capPerGroup(docs, "doc_id", "lang", n = 1000, salt = "c")
    assert(loose.count() == 400L, "cap above group size keeps everything")
    val again = CorpusOps.capPerGroup(docs, "doc_id", "lang", n = 50, salt = "c")
    assert(capped.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
    // different salt → different survivors (independent priority draw)
    val other = CorpusOps.capPerGroup(docs, "doc_id", "lang", n = 50, salt = "c2")
    assert(other.select("doc_id").as[Long].collect().toSet !=
      capped.select("doc_id").as[Long].collect().toSet)
  }

  test("stratifiedSampleByHash applies per-stratum fractions") {
    val out = CorpusOps.stratifiedSampleByHash(
      docs, "doc_id", "lang", Map("en" -> 1.0), defaultFraction = 0.0, "m")
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"), "f=1 keeps all 'en'; default f=0 drops the rest")
    assert(out.count() == docs.filter($"lang" === "en").count())
  }

  test("maskTokens: mask count matches, unmasked tokens ride through in order") {
    val out = CorpusOps.maskTokens(docs, "doc_id", "text", 0.25, "mt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    orig.foreach { case (id, text) =>
      val toks = text.trim.split(" +").toSeq
      val (n, nm, masked) = out(id)
      val mtoks = masked.split(" ", -1).toSeq
      assert(n == toks.size && mtoks.size == toks.size)
      assert(nm == mtoks.count(_ == "[MASK]"))
      // every unmasked position is the original token
      toks.zip(mtoks).foreach { case (o, m) =>
        assert(m == "[MASK]" || m == o)
      }
    }
    assert(out.values.map(_._2).sum > 0, "vacuous: nothing masked")
  }

  test("spanCorrupt: sentinel round trip restores the original text") {
    val out = CorpusOps.spanCorrupt(docs, "doc_id", "text", 0.3, "sc").collect()
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sentRe = "<extra_id_(\\d+)>".r
    var sawSpan = false
    out.foreach { r =>
      val (id, nTok, nMask, nSpans) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (corr, targ) = (r.getString(4), r.getString(5))
      val toks = orig(id).trim.split(" +").toSeq
      assert(nTok == toks.size)
      // parse the target into k -> dropped tokens
      val marks = sentRe.findAllMatchIn(targ).toSeq
      assert(marks.size == nSpans)
      val spans = marks.zipWithIndex.map { case (m, i) =>
        val end = if (i + 1 < marks.size) marks(i + 1).start else targ.length
        m.group(1).toInt ->
          targ.substring(m.end, end).trim.split(" +").filter(_.nonEmpty).toSeq
      }.toMap
      assert(spans.values.map(_.size).sum == nMask)
      if (nSpans > 0) sawSpan = true
      // substitute each sentinel with its span: must restore the original
      val restored = corr.split(" ", -1).toSeq.flatMap {
        case sentRe(k) => spans(k.toInt)
        case tok => Seq(tok)
      }
      assert(restored == toks, s"doc $id round trip")
    }
    assert(sawSpan, "vacuous: no spans produced")
  }

  test("chunkDocs windows reassemble the token stream") {
    val chunked = CorpusOps.chunkDocs(docs, "doc_id", "text", 32, 8)
    val byDoc = chunked.orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect().groupBy(_._1)
    assert(byDoc.size == 400)
    val origTokens = docs.select($"doc_id", split($"text", " +").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    byDoc.foreach { case (id, chunks) =>
      val toks = origTokens(id)
      assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong), "dense ids")
      chunks.foreach { case (_, cid, n, txt) =>
        val expect = toks.slice((cid * 24).toInt, (cid * 24).toInt + 32)
        assert(txt == expect.mkString(" "), s"doc $id chunk $cid window")
        assert(n == expect.size)
      }
      // overlap: consecutive chunks share the 8-token boundary (when full)
      chunks.sliding(2).foreach {
        case Array((_, _, n0, t0), (_, _, _, t1)) if n0 == 32 =>
          assert(t1.startsWith(t0.split(" ").takeRight(8).mkString(" ")))
        case _ =>
      }
    }
  }

  test("chunkDocs: short doc yields one undersized chunk") {
    val one = Seq((1L, "a b c")).toDF("doc_id", "text")
    val rows = CorpusOps.chunkDocs(one, "doc_id", "text", 32, 8)
      .as[(Long, Long, Long, String)].collect()
    assert(rows.toSeq == Seq((1L, 0L, 3L, "a b c")))
  }

  test("redactPii replaces email, URL and phone; URLs win over emails") {
    val raw = Seq(
      (1L, "mail me at a.b+c@ex-ample.org today"),
      (2L, "see https://u:p@host.example/path?a=1#f then stop"),
      (3L, "call +1 (555) 010-7788 now"),
      (4L, "plain text stays untouched")
    ).toDF("id", "t")
    val got = raw.select($"id", CorpusOps.redactPii($"t").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "mail me at <EMAIL> today")
    assert(got(2L) == "see <URL> then stop", "userinfo URL must not leak an <EMAIL>")
    assert(got(3L) == "call <PHONE> now")
    assert(got(4L) == "plain text stays untouched")
  }

  test("normalizeWhitespace collapses runs and trims") {
    val df = Seq((1L, "  a\t\tb \n c  ")).toDF("id", "t")
    assert(df.select(CorpusOps.normalizeWhitespace($"t")).as[String].head() == "a b c")
  }

  test("decontaminationPairs flags planted cross-split duplicates only") {
    // force a known split by using the label column itself: hand-roll via
    // assignSplit determinism — find one train doc and copy its text into
    // a doc that lands in eval, then expect exactly that pair.
    val base = (0L until 100L)
      .map(i => (i, (0 until 30).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val labeled = CorpusOps.assignSplit(base, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "split")
      .as[(Long, String, String)].collect()
    val trainDoc = labeled.find(_._3 == "train").get
    val evalDoc = labeled.find(_._3 != "train").get
    val planted = base
      .withColumn("text",
        when($"doc_id" === evalDoc._1, lit(trainDoc._2)).otherwise($"text"))
    val pairs = CorpusOps.decontaminationPairs(planted, "doc_id", "text",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "split", "train",
      k = 3, minContainment = 0.6)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((evalDoc._1, trainDoc._1, 1.0)),
      s"expected exactly the planted pair, got ${pairs.toSeq}")
  }

  test("repetitionStats: degenerate repetition scores 1 gram, clean text 0") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),   // one distinct 3-gram, 4 occurrences
      (2L, "a b c d e f")                       // all 4 grams distinct
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(df, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    val (_, ng1, nd1, dup1, top1) = got(0)
    assert(ng1 == 4 && nd1 == 1 && dup1 == 0.75 && top1 == 1.0)
    val (_, ng2, nd2, dup2, top2) = got(1)
    assert(ng2 == 4 && nd2 == 4 && dup2 == 0.0 && top2 == 0.25)
  }

  test("shared shingle frame is reused and clearable") {
    val a = DedupOps.sharedShingles(docs, "doc_id", "text", 3)
    val b = DedupOps.sharedShingles(docs, "doc_id", "text", 3)
    assert(a eq b, "same (df, params) must return the memoized instance")
    assert(a.storageLevel.useMemory, "shared frame must be persisted")
    val direct = DedupOps.shingles(docs, "doc_id", "text", 3)
    assert(a.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
    DedupOps.clearShingleCache()
    val c = DedupOps.sharedShingles(docs, "doc_id", "text", 3)
    assert(!(a eq c), "clear must drop the memo")
    DedupOps.clearShingleCache()
  }

  test("dedupSegments drops repeated segments, keeps order, preserves rows") {
    val boiler = (0 until 8).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (0L, s"$boiler u0a u0b u0c u0d u0e u0f u0g u0h"),
      (1L, s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h"),
      (2L, s"$boiler u2a u2b u2c u2d u2e u2f u2g u2h"),
      (3L, boiler), // all-boilerplate doc must survive as empty text
      (4L, "solo a b c d e f g")
    ).toDF("doc_id", "text")
    val out = CorpusOps.dedupSegments(corpus, "doc_id", "text", 8, maxFreq = 2)
      .as[(Long, String)].collect().toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L), "row count stable")
    assert(out(0L) == "u0a u0b u0c u0d u0e u0f u0g u0h",
      "4x boilerplate segment dropped, unique tail kept")
    assert(out(3L) == "", "fully-boilerplate doc becomes empty, not missing")
    assert(out(4L) == "solo a b c d e f g", "unique doc untouched")
    // identity when nothing exceeds the cap
    val id = CorpusOps.dedupSegments(corpus, "doc_id", "text", 8, maxFreq = 100)
      .as[(Long, String)].collect().toMap
    assert(id == corpus.as[(Long, String)].collect().toMap,
      "maxFreq above every frequency must reassemble the original text")
  }

  test("dedupSegments reassembles multi-segment docs in segment order") {
    val long = (0 until 40).map(i => s"w$i").mkString(" ")
    val out = CorpusOps.dedupSegments(
        Seq((7L, long)).toDF("doc_id", "text"), "doc_id", "text", 8, 5)
      .as[(Long, String)].collect().head._2
    assert(out == long, "5 segments must glue back in original order")
  }

  test("sampleToTokenBudget keeps under-budget strata whole, caps the rest") {
    val df = docs.withColumn("n_tokens",
      size(split(col("text"), " +")).cast("long"))
    val totals = df.groupBy("lang").agg(sum("n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    val budget = (totals.values.min + totals.values.max) / 2
    val kept = CorpusOps.sampleToTokenBudget(
      df, "doc_id", "lang", col("n_tokens"), budget, "s")
    val keptTotals = kept.groupBy("lang").agg(sum("n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    for ((lang, t) <- totals if t <= budget)
      assert(keptTotals(lang) == t, s"under-budget stratum $lang must keep all")
    for ((lang, t) <- totals if t > budget) {
      assert(keptTotals(lang) < t, s"over-budget stratum $lang must shrink")
      assert(math.abs(keptTotals(lang) - budget).toDouble / budget < 0.35,
        s"$lang: kept ${keptTotals(lang)} vs budget $budget — hash sampling " +
          "should land near the target")
    }
    // determinism: the same call keeps exactly the same rows
    val again = CorpusOps.sampleToTokenBudget(
        df, "doc_id", "lang", col("n_tokens"), budget, "s")
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
  }

  test("upsampleByWeight: whole copies + deterministic fractional epoch") {
    val out = CorpusOps.upsampleByWeight(docs, "doc_id", "lang",
      Map("en" -> 2.5, "de" -> 0.0), salt = "u")
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val nEn = docs.filter(col("lang") === "en").count()
    assert(!byLang.contains("de"), "weight 0 must drop the stratum entirely")
    assert(byLang("en") >= 2 * nEn && byLang("en") <= 3 * nEn)
    val frac = (byLang("en") - 2.0 * nEn) / nEn
    assert(math.abs(frac - 0.5) < 0.25,
      s"fractional epoch should cover ~50% of rows, got $frac")
    // every row's copies are contiguous 0..n-1 and re-runs are identical
    val copies = out.filter(col("lang") === "en").groupBy("doc_id")
      .agg(collect_list("copy_idx").as("c"))
      .as[(Long, Seq[Long])].collect()
    copies.foreach { case (id, c) =>
      assert(c.sorted == (0L until c.length), s"doc $id copies $c") }
    val again = CorpusOps.upsampleByWeight(docs, "doc_id", "lang",
        Map("en" -> 2.5, "de" -> 0.0), salt = "u")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again == byLang, "re-run must emit the identical multiset")
  }

  test("edge inputs: empty corpus flows through segment dedup and budget mix") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING"))
    assert(CorpusOps.dedupSegments(empty, "doc_id", "text", 8, 2).count() == 0)
    assert(CorpusOps.sampleToTokenBudget(
      empty.withColumn("n_tokens", lit(1L)),
      "doc_id", "lang", col("n_tokens"), 100L, "s").count() == 0)
  }

  // ── DSIR importance weighting ──

  /** Local replica of the feature extraction: unigrams ∪ bigrams hashed
    * by the same Hash64 the engine expression uses, pmod-bucketed. */
  private def dsirRef(text: String, buckets: Int): Map[Int, Long] = {
    val t = text.split(" +").toSeq
    val feats = t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    feats.groupBy { f =>
      val h = graft.expr.Hash64.hashBytes(f.getBytes("UTF-8"), 0L)
      (((h % buckets) + buckets) % buckets).toInt
    }.map { case (b, fs) => b -> fs.size.toLong }
  }

  test("dsirFeatures matches the local Hash64 replica, one-token docs included") {
    val crafted = Seq(
      (0L, "alpha beta gamma alpha"),
      (1L, "solo"),
      (2L, "beta beta beta")).toDF("doc_id", "text")
    val got = CorpusOps.dsirFeatures(crafted, "doc_id", "text", buckets = 64)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val want = Seq(
      0L -> "alpha beta gamma alpha",
      1L -> "solo",
      2L -> "beta beta beta").flatMap { case (id, tx) =>
      dsirRef(tx, 64).map { case (b, n) => (id, b) -> n }
    }.toMap
    assert(got == want, s"feature mismatch: got $got want $want")
    // total feature mass: n unigrams + (n-1) bigrams per doc
    assert(got.filter(_._1._1 == 0L).values.sum == 4 + 3)
    assert(got.filter(_._1._1 == 1L).values.sum == 1) // no bigrams
  }

  test("dsirStats carries exact integer histograms; log weights rank " +
      "target-like docs first") {
    // planted: target docs (ids 0-3) speak vocab A, background (4-9)
    // vocab B; probes 100 (pure A) and 101 (pure B) are OUT of the
    // target set, so selection must find 100 by distribution alone
    val mk = (v: String, n: Int) => (0 until n).map(i => s"$v${i % 4}").mkString(" ")
    val corpus = ((0L to 3L).map(i => (i, mk("apple", 12), "tgt")) ++
      (4L to 9L).map(i => (i, mk("rock", 12), "bg")) ++
      Seq((100L, mk("apple", 12), "probe"), (101L, mk("rock", 12), "probe")))
      .toDF("doc_id", "text", "src")
    val B = 64
    val st = CorpusOps.dsirStats(corpus, "doc_id", "text",
      targetPred = col("src") === "tgt", buckets = B).collect()
    // exact-integer invariants: every row shares one (t_tot, r_tot);
    // raw histogram dominates the target one bucket-wise
    val tots = st.map(r => (r.getLong(5), r.getLong(6))).distinct
    assert(tots.length == 1, s"totals must be global constants: ${tots.toSeq}")
    val (tTot, rTot) = tots.head
    assert(tTot == 4 * 23 && rTot == 12 * 23,
      s"12 tokens -> 23 features/doc; got ($tTot, $rTot)")
    st.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4),
        s"target count exceeds raw count in bucket ${r.getInt(1)}")
    }
    // the log weight recomputed locally from the gate integers matches
    // the operator (same JVM libm -> exact)
    val wGot = CorpusOps.dsirLogWeights(corpus, "doc_id", "text",
        col("src") === "tgt", B).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wRef = st.groupBy(_.getLong(0)).map { case (id, rows) =>
      id -> rows.map { r =>
        r.getLong(2) * (math.log((r.getLong(3) + 1.0) / (tTot + B)) -
          math.log((r.getLong(4) + 1.0) / (rTot + B)))
      }.sum
    }
    wRef.foreach { case (id, w) =>
      assert(math.abs(wGot(id) - w) < 1e-9, s"doc $id: ${wGot(id)} vs $w")
    }
    // ranking: the pure-A probe outscores every vocab-B doc; selection
    // of k=5 is exactly the A-speakers
    assert(wGot(100L) > wGot(101L))
    val picked = CorpusOps.dsirSelect(corpus, "doc_id", "text",
        col("src") === "tgt", B, k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(picked == Set(0L, 1L, 2L, 3L, 100L),
      s"top-5 must be the target-vocab speakers, got $picked")
    CorpusOps.clearDsirFeatureCache()
  }

  test("shared DSIR feature frame is reused across stats calls and clearable") {
    val corpus = Seq((0L, "a b c"), (1L, "b c d")).toDF("doc_id", "text")
    val a = CorpusOps.sharedDsirFeatures(corpus, "doc_id", "text", 64)
    val b = CorpusOps.sharedDsirFeatures(corpus, "doc_id", "text", 64)
    assert(a eq b, "same (df, params) must return the memoized instance")
    assert(a.storageLevel.useMemory, "shared frame must be persisted")
    val direct = CorpusOps.dsirFeatures(corpus, "doc_id", "text", 64)
    assert(a.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
    CorpusOps.clearDsirFeatureCache()
    val c = CorpusOps.sharedDsirFeatures(corpus, "doc_id", "text", 64)
    assert(!(a eq c), "clear must drop the memo")
    CorpusOps.clearDsirFeatureCache()
  }

  test("kAnonymity: group sizes, l-diversity, and the k flag on a hand case") {
    // QI (city, age band); sensitive = diagnosis.
    // (nyc, 30): 3 rows, 2 diagnoses → k_anonymous at k=3, l-diverse
    // (nyc, 40): 2 rows, 1 diagnosis → NOT k_anonymous, NOT l-diverse
    // (sfo, 30): 4 rows, 1 diagnosis → k_anonymous but attribute leaks
    val rows = Seq(
      ("nyc", 30, "flu"), ("nyc", 30, "flu"), ("nyc", 30, "cold"),
      ("nyc", 40, "flu"), ("nyc", 40, "flu"),
      ("sfo", 30, "cold"), ("sfo", 30, "cold"), ("sfo", 30, "cold"),
      ("sfo", 30, "cold")).toDF("city", "age_band", "dx")
    val got = CorpusOps.kAnonymity(rows, Seq("city", "age_band"), "dx", k = 3)
      .as[(String, Int, Long, Long, Boolean)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("nyc", 30, 3L, 2L, true),
      ("nyc", 40, 2L, 1L, false),
      ("sfo", 30, 4L, 1L, true)))
  }

  test("interleaveBySource: model-exact, perfect round-robin on equal sources") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = (for (s <- Seq("a", "b", "c"); i <- 0 until 5)
      yield (s.head.toLong * 100 + i, s)).toDF("doc_id", "source")
    val got = CorpusOps
      .interleaveBySource(docs, "doc_id", "source", salt = "t")
      .as[(String, Long, Long, Long)].collect() // (source, id, rank, pos)
    // scalar model: within-source order by (md5("t:"+id), id), then
    // round-robin by (rank, source)
    val model = (for (s <- Seq("a", "b", "c")) yield {
      val ids = (0 until 5).map(i => s.head.toLong * 100 + i)
        .sortBy(id => (md5hex(s"t:$id"), id))
      ids.zipWithIndex.map { case (id, r) => (id, s, r + 1L) }
    }).flatten.sortBy { case (_, s, r) => (r, s) }
      .zipWithIndex.map { case ((id, s, r), p) => (s, id, r, p + 1L) }
    assert(got.sortBy(_._4).toSeq == model)
    // equal sources → every block of 3 positions holds each source once
    val bySrc = got.sortBy(_._4).map(_._1).grouped(3).toSeq
    assert(bySrc.forall(_.toSet == Set("a", "b", "c")))
  }

  test("binDriftCounts: paired histogram, empty sides zero-filled, negative floor") {
    val a = Seq(-5L, 3L, 7L, 12L).toDF("v")
    val b = Seq(3L, 4L, 25L).toDF("v")
    val got = CorpusOps.binDriftCounts(a, b, "v", binWidth = 10L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // bins: -5→-1, {3,7}→0 vs {3,4}→0, 12→1, 25→2
    assert(got.toSeq == Seq(
      (-1L, 1L, 0L), (0L, 2L, 2L), (1L, 1L, 0L), (2L, 0L, 1L)))
    // NULL values pair into ONE null bin, never two unpaired rows
    val an = Seq(Some(3L), None).toDF("v")
    val bn = Seq(Option.empty[Long], None).toDF("v")
    val gn = CorpusOps.binDriftCounts(an, bn, "v", 10L)
      .collect().map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2)))
    assert(gn.count(_._1.isEmpty) == 1)
    assert(gn.find(_._1.isEmpty).get == (None, 1L, 2L))
  }

  test("psiDrift: zero on identical dists, symmetric, matches scalar model") {
    val a = Seq(1L, 2L, 11L, 12L, 13L, 25L).toDF("v")
    // identical distribution → every (p_a − p_b) is an exact IEEE zero
    val same = CorpusOps.psiDrift(a, a, "v", 10L)
      .as[(Long, Long, Long, Double)].head()
    assert(same == ((6L, 6L, 3L, 0.0)))
    // shifted snapshot: scalar replay of the smoothed fold
    val b = Seq(1L, 11L, 12L, 25L, 26L, 27L, 35L).toDF("v")
    val got = CorpusOps.psiDrift(a, b, "v", 10L)
      .as[(Long, Long, Long, Double)].head()
    assert(got._1 == 6L && got._2 == 7L && got._3 == 4L)
    val na = Map(0L -> 2L, 1L -> 3L, 2L -> 1L, 3L -> 0L)
    val nb = Map(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 1L)
    val (ta, tb, nbins) = (6L, 7L, 4L)
    val expect = Seq(0L, 1L, 2L, 3L).map { bin =>
      val (x, y) = (na(bin), nb(bin))
      ((x + 1).toDouble / (ta + nbins) - (y + 1).toDouble / (tb + nbins)) *
        graft.expr.PortableLnRatio.compute(
          (x + 1) * (tb + nbins), (y + 1) * (ta + nbins))
    }.foldLeft(0.0)(_ + _)
    assert(got._4 == expect)
    // PSI is symmetric: swapping sides flips BOTH factors of each term
    // (sign of p_a − p_b and of the ln), so the products are unchanged —
    // up to ulps, because the portable ln is not bit-exactly odd
    val swapped = CorpusOps.psiDrift(b, a, "v", 10L)
      .as[(Long, Long, Long, Double)].head()
    assert(math.abs(swapped._4 - got._4) < 1e-12)
    assert(got._4 > 0.0)
  }

  test("corpus digests: XOR updates incrementally; diff flags exactly the touched shards") {
    def h(s: String): Long =
      graft.expr.Hash64.hashBytes(s.getBytes("UTF-8"), 0L)
    def shard(id: Long, n: Int): Long = (((h(id.toString) % n) + n) % n)
    val v1 = (1L to 20L).map(i => (i, s"text $i"))
    val v2 = v1.map { case (7L, _) => (7L, "edited") case r => r } :+
      ((21L, "text 21"))
    val d1 = CorpusOps
      .corpusShardDigest(v1.toDF("doc_id", "text"), "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val d2 = CorpusOps
      .corpusShardDigest(v2.toDF("doc_id", "text"), "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // scalar replay: v2 digest = v1 digest xor out old rows xor in new
    val touched = Seq(
      shard(7L, 4) -> (h("7:text 7") ^ h("7:edited")),
      shard(21L, 4) -> h("21:text 21"))
      .groupMapReduce(_._1)(_._2)(_ ^ _) // xor-combine on shard collision
    for (s <- 0L until 4L) {
      val expect = d1.get(s).map(_._2).getOrElse(0L) ^ touched.getOrElse(s, 0L)
      assert(d2(s)._2 == expect, s"shard $s digest")
    }
    val diff = CorpusOps.digestDiff(
        CorpusOps.corpusShardDigest(v1.toDF("doc_id", "text"), "doc_id", "text", 4),
        CorpusOps.corpusShardDigest(v2.toDF("doc_id", "text"), "doc_id", "text", 4))
      .select("shard", "changed").as[(Long, Boolean)].collect().toMap
    assert(diff.filter(_._2).keySet == touched.keySet.toSet,
      s"changed shards ${diff.filter(_._2).keySet}")
  }

  test("cdcChunks: matches the scalar model; chunks re-align after insertion") {
    def hmod(t: String, m: Int): Int = {
      val h = graft.expr.Hash64.hashBytes(t.getBytes("UTF-8"), 0L)
      (((h % m) + m) % m).toInt
    }
    def model(toks: Seq[String], m: Int): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]
      for (t <- toks) {
        cur = cur :+ t
        if (hmod(t, m) == 0) { out += cur; cur = Nil }
      }
      if (cur.nonEmpty) out += cur
      out.map(_.mkString(" ")).toSeq
    }
    val toks = (0 until 40).map(i => s"tk$i")
    val v1 = toks.mkString(" ")
    // insert a NON-boundary token near the top: every later chunk must
    // re-align (fixed windows would shift all of them)
    val ins = (0 until 100).map(i => s"ins$i").find(hmod(_, 4) != 0).get
    val v2 = (toks.take(3) ++ Seq(ins) ++ toks.drop(3)).mkString(" ")
    val got = CorpusOps
      .cdcChunks(Seq((1L, v1), (2L, v2)).toDF("doc_id", "text"),
        "doc_id", "text", modulus = 4)
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Long, String)].collect()
    val g1 = got.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    val g2 = got.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq
    assert(g1 == model(toks, 4))
    assert(g2 == model(toks.take(3) ++ Seq(ins) ++ toks.drop(3), 4))
    // CDC property: a non-boundary insert changes EXACTLY the one chunk
    // containing it — every other chunk re-aligns byte-identically
    // (fixed windows would shift every downstream chunk instead)
    assert(g1.length == g2.length && g1.length >= 5)
    val diffs = g1.zip(g2).count(p => p._1 != p._2)
    assert(diffs == 1, s"re-align failed: $diffs of ${g1.length} chunks differ")
  }

  test("kAnonymity: NULL sensitive values count as one distinct value") {
    val rows = Seq(
      ("nyc", Some("flu")), ("nyc", None), ("nyc", None), // {flu, NULL} → 2
      ("sfo", None), ("sfo", None) //                        {NULL} → 1
    ).toDF("city", "dx")
    val got = CorpusOps.kAnonymity(rows, Seq("city"), "dx", k = 2)
      .select("city", "l_distinct").as[(String, Long)].collect().toMap
    assert(got == Map("nyc" -> 2L, "sfo" -> 1L))
  }

  test("dedupSegmentsWithinDoc: first occurrence kept, order preserved") {
    val docs = Seq(
      (1L, "x y z w x y"), // segs [x y][z w][x y] → third drops
      (2L, "p q r"), //        segs [p q][r] → nothing drops
      (3L, "a b a b a b") //   segs [a b][a b][a b] → two drop
    ).toDF("doc_id", "text")
    val got = CorpusOps
      .dedupSegmentsWithinDoc(docs, "doc_id", "text", segTokens = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "x y z w", 3L, 2L),
      (2L, "p q r", 2L, 2L),
      (3L, "a b", 3L, 1L)))
  }

  test("hash64 SQL surface matches the expression and the Hash64 core") {
    val r = spark.sql("SELECT hash64('alpha') AS h1, hash64('') AS h2")
      .collect().head
    assert(r.getLong(0) ==
      graft.expr.Hash64.hashBytes("alpha".getBytes("UTF-8"), 0L))
    assert(r.getLong(1) ==
      graft.expr.Hash64.hashBytes(Array.emptyByteArray, 0L))
  }

  test("temperatureMixWeights: tau=1/2 upsamples the small source, weights sum to 1") {
    // sources: a×16, b×4 → sqrt 4 and 2, weights 2/3 and 1/3
    val df = (Seq.fill(16)("a") ++ Seq.fill(4)("b")).toDF("source")
    val got = CorpusOps.temperatureMixWeights(df, "source", budgetDocs = 300L)
      .orderBy("source")
      .select("source", "n_docs", "nat_share", "weight", "expected_docs")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 16L, 0.8, 2.0 / 3.0, 200.0),
      ("b", 4L, 0.2, (1.0 / 3.0) * 1.0, 100.0)))
    // tau < 1 moved b's share 0.2 → 1/3 (upsampled), a's 0.8 → 2/3
  }

  test("temperatureMixWeights: tau=1 reduces to natural proportions") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b")).toDF("source")
    val got = CorpusOps
      .temperatureMixWeights(df, "source", budgetDocs = 8L, tau = 1.0)
      .orderBy("source").select("weight").as[Double].collect().toSeq
    assert(got == Seq(0.75, 0.25))
  }

  test("epochBudget: water-filling segments — middle, underflow, overflow") {
    import spark.implicits._
    val df = Seq(("a", 100L, 1L), ("b", 100L, 3L)).toDF("src", "t", "r")
    def run(budget: Long) = CorpusOps
      .epochBudget(df, "src", "t", "r", budget)
      .orderBy("src")
      .as[(String, Long, Long, Boolean, Double, Double)].collect().toSeq
    // budget 300: a capped at 1 epoch, b fills λ = 2 epochs
    assert(run(300L) == Seq(
      ("a", 100L, 1L, true, 100.0, 1.0),
      ("b", 100L, 3L, false, 200.0, 2.0)))
    // budget 150: nothing capped, λ = 3/4 epoch each
    assert(run(150L) == Seq(
      ("a", 100L, 1L, false, 75.0, 0.75),
      ("b", 100L, 3L, false, 75.0, 0.75)))
    // budget 600 ≥ Σ t·r = 400: everything capped, remainder unused
    assert(run(600L) == Seq(
      ("a", 100L, 1L, true, 100.0, 1.0),
      ("b", 100L, 3L, true, 300.0, 3.0)))
    // boundary budget 200 = r1·T: both adjacent segments agree (λ = 1)
    assert(run(200L).map(x => (x._1, x._5)) ==
      Seq(("a", 100.0), ("b", 100.0)))
  }

  test("dpNoisyCounts: scalar replica of the seeded inverse-CDF draw") {
    import spark.implicits._
    val df = Seq.fill(5)("en").map(Tuple1(_)).toDF("k")
      .unionAll(Seq.fill(3)("fr").map(Tuple1(_)).toDF("k"))
    val got = CorpusOps.dpNoisyCounts(df, "k", epsilon = 0.5, salt = "s1")
      .orderBy("k")
      .as[(String, Long, Double, Double)].collect().toSeq
    def draw(key: String): Double = {
      val h = graft.expr.StringHash64.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("s1" + key))
      val r = h >>> 12
      val s = if (r >= (1L << 51)) 1.0 else -1.0
      val m = if (r >= (1L << 51)) (1L << 53) - (2 * r + 1) else 2 * r + 1
      -2.0 * s * graft.expr.PortableLnRatio.compute(m, 1L << 52)
    }
    assert(got == Seq(
      ("en", 5L, draw("en"), 5.0 + draw("en")),
      ("fr", 3L, draw("fr"), 3.0 + draw("fr"))))
    // the draw is a pure function of (salt, key): re-running is identical,
    // rotating the salt redraws
    val again = CorpusOps.dpNoisyCounts(df, "k", epsilon = 0.5, salt = "s1")
      .orderBy("k").as[(String, Long, Double, Double)].collect().toSeq
    assert(again == got)
    val rotated = CorpusOps.dpNoisyCounts(df, "k", epsilon = 0.5, salt = "s2")
      .orderBy("k").as[(String, Long, Double, Double)].collect().toSeq
    assert(rotated.map(_._3) != got.map(_._3))
  }

  test("entropyLDiversity: skewed group fails where distinct-l passes") {
    import spark.implicits._
    import graft.expr.PortableLnRatio.compute
    // group a: 99 of 'x' + 1 of 'y' -> distinct-l 2 but entropy ~0.056
    // (< ln 2); group b: 2/2 split -> entropy exactly computed ln(2)
    val rows = Seq.fill(99)(("a", "x")) ++ Seq(("a", "y")) ++
      Seq(("b", "x"), ("b", "x"), ("b", "y"), ("b", "y"))
    val got = CorpusOps.entropyLDiversity(
        rows.toDF("g", "s"), Seq("g"), "s", l = 2)
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // exact fold replication: terms in sensitive-value order (x, y)
    val foldA = (0.0 + 99.0 / 100.0 * compute(100L, 99L)) +
      1.0 / 100.0 * compute(100L, 1L)
    val foldB = (0.0 + 2.0 / 4.0 * compute(4L, 2L)) +
      2.0 / 4.0 * compute(4L, 2L)
    assert(got("a") == (("a", 100L, 2L, foldA, foldA >= compute(2L, 1L))))
    assert(got("b") == (("b", 4L, 2L, foldB, foldB >= compute(2L, 1L))))
    assert(!got("a")._5 && got("b")._5)
  }
}
