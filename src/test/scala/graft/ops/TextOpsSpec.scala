package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TextOpsSpec extends AnyFunSuite {

  test("vocabGrowth: new types at first occurrence, cumulative curve exact") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, "b c"), (2L, "a d"), (3L, "e e"))
      .toDF("doc_id", "text")
    val got = TextOps.vocabGrowth(docs, "doc_id", "text", bucketWidth = 2L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 3L, 4L, 3L, 4L), // {a,b,c} new over 4 tokens
      (1L, 2L, 4L, 5L, 8L))) // {d,e} new; 'a' and the repeated 'e' don't count
  }

  private lazy val spark = SparkTestSession.spark

  test("langId votes pick the right language on crafted sentences") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat and it was happy", "en"),
      (2L, "der hund ist nicht mit der katze und das ist gut", "de"),
      (3L, "el perro es un animal que vive en la casa", "es"),
      (4L, "le chien est un animal que nous avons pour la vie", "fr"))
      .toDF("id", "text", "expected")
    val out = df.select(col("id"), col("expected"),
      TextOps.langId(col("text")).as("pred")).collect()
    out.foreach(r =>
      assert(r.getString(1) == r.getString(2),
        s"row ${r.getLong(0)}: expected ${r.getString(1)} got ${r.getString(2)}"))
  }

  test("LexiconVotes counts duplicates and covers all lexicons in one pass") {
    import spark.implicits._
    val df = Seq("the the la xyz").toDF("text")
    val v = df.select(graft.expr.LexiconVotes.votes(
      split(col("text"), " +"),
      Seq(Seq("the"), Seq("la", "xyz"), Seq("missing"))).as("v"))
      .head().getSeq[Int](0)
    assert(v == Seq(2, 2, 0))
  }

  test("winnowing fingerprints survive a prefix insertion (shift tolerance)") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog and runs far away home"
    val df = Seq(
      (1L, text),
      (2L, "XYZ PREFIX " + text), // same content, shifted
      (3L, "completely different words with nothing shared at all here now"))
      .toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val overlapShifted = (fps(1L) intersect fps(2L)).size.toDouble / fps(1L).size
    val overlapUnrelated = (fps(1L) intersect fps(3L)).size.toDouble / fps(1L).size
    assert(overlapShifted > 0.7,
      f"shifted copy should share most fingerprints, got $overlapShifted%.2f")
    assert(overlapUnrelated < 0.2,
      f"unrelated doc should share few fingerprints, got $overlapUnrelated%.2f")
  }

  test("bpe-ish tokens drop empty boundary tokens") {
    import spark.implicits._
    val toks = Seq("Hello, world!! 42").toDF("text")
      .select(TextOps.tokensBpeIsh(col("text")).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("hello", "world", "42"))
  }

  test("bpeMerges: fused token competes in later rounds (true BPE cascade)") {
    import spark.implicits._
    // "a b" dominates round 1 (4 occurrences); after fusing, "a+b c"
    // (3 occurrences) must win round 2 — a frequent-bigram miner that
    // recounts the ORIGINAL corpus would pick "b c" instead.
    val docs = Seq(
      "a b c x a b c y a b c",
      "a b z q r s q r s").toDF("text")
    val log = TextOps.bpeMerges(docs, "text", steps = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(log == Seq(
      (1, "a b", "a+b", 4L),
      (2, "a+b c", "a+b+c", 3L)))
  }

  test("bpeMerges: back-to-back pairs keep the boundary-sharing copies unfused") {
    import spark.implicits._
    // " a a a a " counts 3 adjacent "a a" positions, but every " a a "
    // occurrence after the first shares its leading space with the
    // previous match — leftmost non-overlapping replace fuses ONLY the
    // first, leaving "a+a a a" (the documented greedy-scan property).
    val docs = Seq("a a a a").toDF("text")
    val log1 = TextOps.bpeMerges(docs, "text", steps = 1)
      .as[(Int, String, String, Long)].collect()
    assert(log1.toSeq == Seq((1, "a a", "a+a", 3L))) // COUNT sees all 3
    val log2 = TextOps.bpeMerges(docs, "text", steps = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    // round 2 over [a+a, a, a]: pairs "a+a a" and "a a" tie at 1;
    // lexicographic tiebreak picks "a a"
    assert(log2(1) == (2, "a a", "a+a", 1L))
  }

  test("bpeMerges: degenerate corpus stops early without error") {
    import spark.implicits._
    val docs = Seq("solo", "", "one").toDF("text")
    val log = TextOps.bpeMerges(docs, "text", steps = 3).collect()
    assert(log.isEmpty) // no adjacent pairs anywhere → empty merge log
  }

  test("rarityScore: exact document-frequency integers on a crafted corpus") {
    import spark.implicits._
    // dfs: a→2 docs, b→1, c→2, d→1 (in-doc repeats don't raise df)
    val docs = Seq((0L, "a a b"), (1L, "a c"), (2L, "c d d"))
      .toDF("doc_id", "text")
    val out = TextOps.rarityScore(docs, "doc_id", "text", rareDfMax = 1)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 1L, 5L), // a(2)+a(2)+b(1): one rare occurrence, df_sum 5
      (1L, 2L, 0L, 4L), // a(2)+c(2)
      (2L, 3L, 2L, 4L))) // c(2)+d(1)+d(1): both d occurrences are rare
  }

  test("lmSurprise: exact integer buckets against a hand-built bigram model") {
    import spark.implicits._
    // ref slice = doc 0 only. Model: c("a b")=2, c("b a")=2, c("a c")=1;
    // contexts: c(a·)=3, c(b·)=2. Buckets = floor(log2(cu div cb)):
    //   "a b" -> 3 div 2 = 1 -> 0;  "b a" -> 2 div 2 = 1 -> 0;
    //   "a c" -> 3 div 1 = 3 -> 1.
    val docs = Seq(
      (0L, "a b a b a c"), // 5 bigrams, buckets 0,0,0,0,1
      (1L, "a b z q"),     // "a b" in-model (0); "b z","z q" OOV
      (2L, "solo"))        // one token: no bigrams, dropped
      .toDF("doc_id", "text")
    val out = TextOps.lmSurprise(docs, "doc_id", "text",
        refPred = col("doc_id") === 0)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 5L, 0L, 1L, 1L),
      (1L, 3L, 2L, 0L, 0L)))
  }

  test("NfcNormalize composes decomposed text; ASCII passes through untouched") {
    import spark.implicits._
    val df = Seq(
      (0L, "café"),      // e + combining acute -> é
      (1L, "plain ascii"),
      (2L, "caf\u00E9"))       // already precomposed
      .toDF("id", "s")
    val out = df.select(col("id"),
        graft.expr.NfcNormalize.nfc(col("s")).as("n"),
        length(graft.expr.NfcNormalize.nfc(col("s"))).as("len"))
      .orderBy("id").as[(Long, String, Int)].collect().toSeq
    assert(out(0)._2 == "caf\u00E9" && out(0)._3 == 4,
      "decomposed sequence must compose to the single code point")
    assert(out(1)._2 == "plain ascii")
    assert(out(2)._2 == "caf\u00E9", "NFC must be idempotent")
    // SQL surface: registered beside the other native expressions
    graft.expr.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT nfc_normalize('café')").head.getString(0)
    assert(viaSql == "caf\u00E9")
  }

  test("unicodeClean: control strip, whitespace collapse, mojibake counters") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a\u0007b\u001Fc"),          // two control chars stripped
      (1L, "  x \t y  "),               // collapse + trim
      (2L, "bad \uFFFD\uFFFD decode"),  // replacement chars counted, kept
      (3L, "naïve"))              // NFC changes, no other edits
      .toDF("doc_id", "text")
    val out = TextOps.unicodeClean(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(out(0) == ((0L, "abc", 3L, 2L, 0L, 0L)))
    assert(out(1) == ((1L, "x y", 3L, 0L, 0L, 0L)))
    assert(out(2) == ((2L, "bad \uFFFD\uFFFD decode", 13L, 0L, 2L, 0L)))
    assert(out(3) == ((3L, "na\u00EFve", 5L, 0L, 0L, 1L)))
  }

  test("lmSurprise: all-OOV doc reports surprise_max = -1") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, "x y z")).toDF("doc_id", "text")
    val out = TextOps.lmSurprise(docs, "doc_id", "text",
        refPred = col("doc_id") === 0)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L, 0L, 0L, 0L), (1L, 2L, 2L, 0L, -1L)))
  }

  test("zipfSlope: matches the scalar-model regression bit-for-bit") {
    import spark.implicits._
    // freqs: a=4, b=2, c=1 → ranks 1, 2, 3 (desc freq, token tiebreak)
    val docs = Seq((0L, "a a a a b b c")).toDF("doc_id", "text")
    val got = TextOps.zipfSlope(docs, "text", k = 10).collect().head
    // scalar replica: same pln, same fold order, same expression trees
    import graft.expr.PortableLnRatio.compute
    val xs = Array(compute(1, 1), compute(2, 1), compute(3, 1))
    val ys = Array(compute(4, 1), compute(2, 1), compute(1, 1))
    def fold(t: Int => Double) = (0 until 3).foldLeft(0.0)((a, i) => a + t(i))
    val (sx, sy) = (fold(xs), fold(ys))
    val (sxy, sxx) = (fold(i => xs(i) * ys(i)), fold(i => xs(i) * xs(i)))
    val slope = (3.0 * sxy - sx * sy) / (3.0 * sxx - sx * sx)
    assert(got.getAs[Long]("k") == 3L)
    assert(got.getAs[Double]("slope") == slope)
    assert(got.getAs[Double]("intercept") == (sy - slope * sx) / 3.0)
    // halving frequencies per rank step sits near the Zipf regime
    assert(slope < -0.9 && slope > -1.5)
  }

  test("pmiTopK: portable-ln collocations, noise floor, total tie order") {
    import spark.implicits._
    import graft.expr.PortableLnRatio.compute
    // df: a=3, b=3, c=2; pairs: (a,b)=2, (a,c)=1, (b,c)=1; N=4
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b c"))
      .toDF("doc_id", "text")
    val got = TextOps.pmiTopK(df, "doc_id", "text",
        vocabK = 10, minPair = 1L, k = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // ln(8/9) > ln(4/6) = ln(4/6): (a,b) leads, equal-PMI tail in tok order
    assert(got == Seq(
      ("a", "b", 2L, 3L, 3L, compute(8, 9)),
      ("a", "c", 1L, 3L, 2L, compute(4, 6)),
      ("b", "c", 1L, 3L, 2L, compute(4, 6))))
    // the noise floor drops the singleton pairs
    val floored = TextOps.pmiTopK(df, "doc_id", "text",
        vocabK = 10, minPair = 2L, k = 10)
      .select("tok_a", "tok_b").as[(String, String)].collect().toSeq
    assert(floored == Seq(("a", "b")))
  }

  test("textrankKeywords: integer weighted-PageRank replay over the pair graph") {
    import spark.implicits._
    // pairs: (a,b) n=2, (b,c) n=1 → undirected weighted graph; scalar
    // replay of three (r*w) div wout rounds must match bit-for-bit
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "b c"))
      .toDF("doc_id", "text")
    val got = TextOps.textrankKeywords(df, "doc_id", "text",
        vocabK = 10, iters = 3)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    // edges: a->b w2, b->a w2, b->c w1, c->b w1; wout a=2, b=3, c=1
    val w = Map(("a", "b") -> 2L, ("b", "a") -> 2L,
      ("b", "c") -> 1L, ("c", "b") -> 1L)
    val wout = Map("a" -> 2L, "b" -> 3L, "c" -> 1L)
    var r = Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L)
    for (_ <- 1 to 3) {
      val contrib = r.keys.map { dst =>
        dst -> w.collect { case ((s, d), ww) if d == dst =>
          (r(s) * ww) / wout(s)
        }.sum
      }.toMap
      r = r.keys.map(k => k -> (150000L + 85L * contrib(k) / 100L)).toMap
    }
    assert(got == Seq("a", "b", "c").map(k => k -> r(k)))
  }

  test("tfidfCosinePairs: exact fold replica, df cap drops stopwords") {
    import spark.implicits._
    import graft.expr.PortableLnRatio.compute
    // 'the' (df=4 > cap 3) must vanish; remaining weights are tf=1 times
    // portable ln(N/df)
    val df = Seq(
      (1L, "the cat dog"), (2L, "the cat dog"),
      (3L, "the cat bird"), (4L, "the fish"))
      .toDF("doc_id", "text")
    val got = TextOps
      .tfidfCosinePairs(df, "doc_id", "text", maxDf = 3, minCosine = 0.05)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val c = compute(4, 3); val d = compute(4, 2); val b = compute(4, 1)
    val n12 = c * c + d * d // token-sorted fold: cat then dog
    val n3 = b * b + c * c // bird then cat
    val cos12 = n12 / (math.sqrt(n12) * math.sqrt(n12))
    val cos13 = (c * c) / (math.sqrt(n12) * math.sqrt(n3))
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got((1L, 2L)) == cos12)
    assert(got((1L, 3L)) == cos13 && got((2L, 3L)) == cos13)
    // doc 4 shares only the capped stopword: no pair row at any floor
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("rakePhrases: hand RAKE arithmetic on the canonical shape") {
    import spark.implicits._
    // doc: "deep learning the deep model a model" with stop {a, the}:
    // phrases: [deep learning], [deep model], [model]
    // freq: deep 2, learning 1, model 2; deg: deep 2+2=4, learning 2,
    // model 2+1=3 -> scores: deep 2, learning 2, model 1.5
    // phrase scores: deep learning 4.0; deep model 3.5; model 1.5
    val df = Seq((1L, "deep learning the deep model a model"))
      .toDF("doc_id", "text")
    val got = TextOps.rakePhrases(df, "doc_id", "text",
        stopwords = Seq("a", "the"), k = 3)
      .as[(Long, Int, String, Double)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      (1L, 1, "deep learning", 4.0),
      (1L, 2, "deep model", 3.5),
      (1L, 3, "model", 1.5)))
    // k caps the emitted phrases
    assert(TextOps.rakePhrases(df, "doc_id", "text", Seq("a", "the"), 1)
      .count() == 1L)
  }

  test("tfidfCosinePairsPrefix: identical output to the unfiltered scan") {
    import spark.implicits._
    def run(rows: Seq[(Long, String)], maxDf: Int, minCos: Double) = {
      val df = rows.toDF("doc_id", "text")
      val base = TextOps
        .tfidfCosinePairs(df, "doc_id", "text", maxDf, minCos)
        .as[(Long, Long, Double)].collect().toSet
      val pre = TextOps
        .tfidfCosinePairsPrefix(df, "doc_id", "text", maxDf, minCos)
        .as[(Long, Long, Double)].collect().toSet
      assert(pre == base,
        s"prefix filter must be lossless (maxDf=$maxDf, t=$minCos)")
      base
    }
    // the hand corpus of the baseline spec, two floors
    val hand = Seq(
      (1L, "the cat dog"), (2L, "the cat dog"),
      (3L, "the cat bird"), (4L, "the fish"))
    assert(run(hand, maxDf = 3, minCos = 0.05).nonEmpty)
    run(hand, maxDf = 3, minCos = 0.8)
    // a randomized Zipf-ish corpus: hub tokens shared by most docs,
    // rare tokens shared by few — the regime the prefix filter targets
    val rnd = new scala.util.Random(41)
    val vocabHub = (0 until 5).map(i => s"hub$i")
    val vocabRare = (0 until 60).map(i => s"r$i")
    val corpus = (1L to 80L).map { id =>
      val hubs = Seq.fill(4)(vocabHub(rnd.nextInt(vocabHub.size)))
      val rares = Seq.fill(3)(vocabRare(rnd.nextInt(vocabRare.size)))
      (id, (hubs ++ rares).mkString(" "))
    }
    // cap keeps hubs (exercises suffix pruning ON them), two floors
    assert(run(corpus, maxDf = 100, minCos = 0.6).nonEmpty)
    run(corpus, maxDf = 100, minCos = 0.9)
  }

  test("tokenDivergenceMatrix == scalar nanat model; identical sources score 0") {
    import spark.implicits._
    import graft.expr.PortableLnRatio.{compute, Ln2}
    val unit = 1000000000.0
    // c is a verbatim clone of a; b diverges and holds an exclusive
    // token q (exercises the exclusive-mass term on both sides: w is
    // a/c-only)
    val docs = Seq(
      ("a", "x y z x"), ("a", " x w "),
      ("b", "x y y q"), ("b", "z z"),
      ("c", "x y z x"), ("c", "x w"))
      .toDF("src", "text")
    val got = TextOps.tokenDivergenceMatrix(docs, "src", "text")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // scalar replay with the SAME ln algorithm and op order
    val cnt = Seq("a" -> Seq("x y z x", " x w "), "b" -> Seq("x y y q", "z z"),
      "c" -> Seq("x y z x", "x w")).toMap.map { case (g, ds) =>
      g -> ds.flatMap(_.trim.split(" +")).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    }
    val model = (for {
      ga <- cnt.keys; gb <- cnt.keys if ga < gb
      shared = cnt(ga).keySet.intersect(cnt(gb).keySet) if shared.nonEmpty
    } yield {
      val (na, nb) = (cnt(ga).values.sum, cnt(gb).values.sum)
      def tp(ca: Long, cb: Long, n1: Long, n2: Long) =
        math.floor(ca.toDouble / n1.toDouble *
          compute(2 * ca * n2, ca * n2 + cb * n1) * unit).toLong
      val jp0 = shared.toSeq.map(t => tp(cnt(ga)(t), cnt(gb)(t), na, nb)).sum
      val jq0 = shared.toSeq.map(t => tp(cnt(gb)(t), cnt(ga)(t), nb, na)).sum
      val sha = shared.toSeq.map(cnt(ga)).sum
      val shb = shared.toSeq.map(cnt(gb)).sum
      def excl(n: Long, sh: Long) =
        math.floor((n - sh).toDouble / n.toDouble * Ln2 * unit).toLong
      val (jp, jq) = (jp0 + excl(na, sha), jq0 + excl(nb, shb))
      (ga, gb) -> ((shared.size.toLong, jp, jq,
        (jp + jq).toDouble / (2.0 * unit)))
    }).toMap
    assert(got == model)
    // the clone pair is exactly zero: every shared term is ln(1) = 0
    // and neither side has exclusive mass
    assert(got(("a", "c")) == ((4L, 0L, 0L, 0.0)))
    // divergent pairs are strictly positive
    assert(got(("a", "b"))._4 > 0.0 && got(("b", "c"))._4 > 0.0)
  }

  test("tokenDivergenceMatrix: the group-total overflow guard is IN the plan") {
    import spark.implicits._
    // a >2.1e9-token group can't be materialized in a spec, so assert
    // the raise_error teeth are present in the analyzed plan (the
    // in-plan-guard discipline of katzUnits/landmarkPathCounts)
    val docs = Seq(("a", "x y"), ("b", "x z")).toDF("src", "text")
    val plan = TextOps.tokenDivergenceMatrix(docs, "src", "text")
      .queryExecution.analyzed.toString
    assert(plan.contains("2^63-safe bound"),
      "group-total overflow guard missing from the plan")
  }

  test("tokenDivergenceMatrix: random corpora match the model and respect JS bounds") {
    import spark.implicits._
    import graft.expr.PortableLnRatio.{compute, Ln2}
    val unit = 1000000000.0
    val rnd = new scala.util.Random(5150)
    val vocab = (0 until 12).map(i => s"w$i")
    val docs = (1 to 60).map { i =>
      val g = s"g${i % 3}"
      val toks = Seq.fill(3 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      (g, toks.mkString(" "))
    }
    val cnt = docs.groupBy(_._1).map { case (g, ds) =>
      g -> ds.flatMap(_._2.split(" +")).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
    }
    val model = (for {
      ga <- cnt.keys; gb <- cnt.keys if ga < gb
      shared = cnt(ga).keySet.intersect(cnt(gb).keySet) if shared.nonEmpty
    } yield {
      val (na, nb) = (cnt(ga).values.sum, cnt(gb).values.sum)
      def tp(ca: Long, cb: Long, n1: Long, n2: Long) =
        math.floor(ca.toDouble / n1.toDouble *
          compute(2 * ca * n2, ca * n2 + cb * n1) * unit).toLong
      val jp0 = shared.toSeq.map(t => tp(cnt(ga)(t), cnt(gb)(t), na, nb)).sum
      val jq0 = shared.toSeq.map(t => tp(cnt(gb)(t), cnt(ga)(t), nb, na)).sum
      def excl(n: Long, sh: Long) =
        math.floor((n - sh).toDouble / n.toDouble * Ln2 * unit).toLong
      val jp = jp0 + excl(na, shared.toSeq.map(cnt(ga)).sum)
      val jq = jq0 + excl(nb, shared.toSeq.map(cnt(gb)).sum)
      (ga, gb) -> ((shared.size.toLong, jp, jq,
        (jp + jq).toDouble / (2.0 * unit)))
    }).toMap
    val got = TextOps.tokenDivergenceMatrix(
        docs.toDF("src", "text"), "src", "text")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got == model)
    // JS bounds on the nanat grid: 0 − quantization slack ≤ jsd ≤ ln 2
    got.values.foreach { case (nShared, _, _, jsd) =>
      assert(jsd >= -(nShared + 2) / unit && jsd <= Ln2 + 1e-9,
        s"jsd out of bounds: $jsd")
    }
  }
}
