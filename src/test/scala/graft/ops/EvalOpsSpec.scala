package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Model-evaluation tier against hand-computed confusion arithmetic:
  * the tie-averaged AUC, the per-threshold PR counts, and the
  * calibration rollup (including floor — not truncate — binning of
  * negative scores). */
class EvalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (id, label, score): n_pos = n_neg = 3, one pos/neg tie at 8 and at 5
  private def scored =
    Seq((1L, true, 10L), (2L, true, 8L), (3L, false, 8L),
      (4L, false, 5L), (5L, true, 5L), (6L, false, 2L))
      .toDF("id", "y", "score")

  test("aucExact: tie-averaged U on a hand case (AUC = 7/9)") {
    // pairwise: pos10 beats all 3; pos8 ties neg8 (+0.5), beats 2;
    // pos5 loses to 8, ties neg5, beats 2 → U = 7.0, u2 = 14
    val Array((nPos, nNeg, u2, auc)) =
      EvalOps.aucExact(scored, "y", "score", "id")
        .as[(Long, Long, Long, Double)].collect()
    assert((nPos, nNeg, u2) == (3L, 3L, 14L))
    assert(math.abs(auc - 7.0 / 9.0) < 1e-15)
  }

  test("aucExact: perfect separation gives AUC exactly 1.0") {
    val df = Seq((1L, true, 9L), (2L, true, 8L), (3L, false, 2L),
      (4L, false, 1L)).toDF("id", "y", "score")
    val r = EvalOps.aucExact(df, "y", "score", "id").collect().head
    assert(r.getAs[Long]("u2_pos") == 8L && r.getAs[Double]("auc") == 1.0)
  }

  test("aucExactByGroup: per-group midranks independent, one-class group is null") {
    val df = Seq(
      // group a = the hand case (AUC 7/9)
      ("a", 1L, true, 10L), ("a", 2L, true, 8L), ("a", 3L, false, 8L),
      ("a", 4L, false, 5L), ("a", 5L, true, 5L), ("a", 6L, false, 2L),
      // group b = perfect separation (AUC 1)
      ("b", 7L, true, 9L), ("b", 8L, true, 8L),
      ("b", 9L, false, 2L), ("b", 10L, false, 1L),
      // group c = positives only → AUC undefined
      ("c", 11L, true, 4L), ("c", 12L, true, 4L)
    ).toDF("g", "id", "y", "score")
    val got = EvalOps.aucExactByGroup(df, "g", "y", "score", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(_._1)
    assert(got(0) == ("a", 3L, 3L, 14L, Some(7.0 / 9.0)))
    assert(got(1) == ("b", 2L, 2L, 8L, Some(1.0)))
    assert(got(2)._1 == "c" && got(2)._5.isEmpty)
  }

  test("prCurve: exact confusion counts at every distinct threshold") {
    val got = EvalOps.prCurve(scored, "y", "score")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (2L, 3L, 3L, 0L, 0.5, 1.0),
      (5L, 3L, 2L, 0L, 3.0 / 5.0, 1.0),
      (8L, 2L, 1L, 1L, 2.0 / 3.0, 2.0 / 3.0),
      (10L, 1L, 0L, 2L, 1.0, 1.0 / 3.0)))
  }

  test("groupPercentRank: SQL PERCENT_RANK semantics per group, singleton is 0") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 20L), ("a", 4L, 30L),
      ("b", 5L, 7L)).toDF("g", "id", "v")
    val got = EvalOps.groupPercentRank(df, "g", "v", "id")
      .select("id", "rank_min", "group_n", "pct_rank")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // group a: ranks 1, 2, 2 (tie-min), 4 over n=4 → pct 0, 1/3, 1/3, 1
    assert(got.toSeq == Seq(
      (1L, 1L, 4L, 0.0), (2L, 2L, 4L, 1.0 / 3.0), (3L, 2L, 4L, 1.0 / 3.0),
      (4L, 4L, 4L, 1.0), (5L, 1L, 1L, 0.0)))
  }

  test("calibrationBins: rollup per fixed-width bin, floor on negatives") {
    val got = EvalOps.calibrationBins(scored, "y", "score", binWidth = 4L)
      .select("bin", "n", "n_pos", "score_sum")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 1L, 0L, 2L), (1L, 2L, 1L, 10L), (2L, 3L, 2L, 26L)))
    // floor, not truncate: -5 / 4 bins to -2, not -1
    val neg = Seq((1L, false, -5L)).toDF("id", "y", "score")
    assert(EvalOps.calibrationBins(neg, "y", "score", 4L)
      .select("bin").as[Long].head() == -2L)
  }

  test("cohensKappa: hand case matches the textbook arithmetic") {
    // n11=20, n10=5, n01=10, n00=15, n=50
    // po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    val df = (Seq.fill(20)((true, true)) ++ Seq.fill(5)((true, false)) ++
        Seq.fill(10)((false, true)) ++ Seq.fill(15)((false, false)))
      .toDF("a", "b")
    val r = EvalOps.cohensKappa(df, "a", "b").collect().head
    assert((r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00")) == (20L, 5L, 10L, 15L))
    assert(r.getAs[Double]("po") == 0.7)
    assert(r.getAs[Double]("pe") == 0.5)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-15)
  }

  test("bootstrapAccuracy: deterministic weights, exact weighted means") {
    val df = (1L to 40L).map(i => (i, i % 4 != 0)).toDF("id", "ok")
    val per = EvalOps.bootstrapAccuracy(df, "ok", "id", b = 8, salt = "t")
      .orderBy("r").collect()
    assert(per.length == 8)
    per.foreach { row =>
      val (w, hit) = (row.getAs[Long]("w_sum"), row.getAs[Long]("n_hit_w"))
      assert(w >= 0 && hit <= w)
      if (w > 0)
        assert(row.getAs[Double]("acc_w") == hit.toDouble / w.toDouble)
    }
    // same salt → identical draw on re-run (no RNG anywhere)
    val again = EvalOps.bootstrapAccuracy(df, "ok", "id", b = 8, salt = "t")
      .orderBy("r").collect()
    assert(per.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // all-correct rows collapse the interval to [1, 1]
    val perfect = (1L to 30L).map(i => (i, true)).toDF("id", "ok")
    val ci = EvalOps.bootstrapCi(
      EvalOps.bootstrapAccuracy(perfect, "ok", "id", b = 8, salt = "t"),
      loIdx = 2, hiIdx = 7).collect().head
    assert(ci.getAs[Double]("lo") == 1.0 && ci.getAs[Double]("hi") == 1.0)
  }

  test("giniSplit: pure split is 0, constant feature is parent impurity") {
    // 4 rows, 2 pos / 2 neg: parent impurity 1 - 0.25 - 0.25 = 0.5
    val df = Seq((true, "a", "c"), (true, "a", "c"), (false, "b", "c"),
      (false, "b", "c")).toDF("y", "pure", "const")
    val got = EvalOps.giniSplit(df, "y",
        Seq("pure" -> org.apache.spark.sql.functions.col("pure"),
          "const" -> org.apache.spark.sql.functions.col("const")))
      .orderBy("feature").collect()
    assert(got(0).getAs[String]("feature") == "const" &&
      got(0).getAs[Long]("n_groups") == 1L &&
      got(0).getAs[Double]("gini") == 0.5)
    assert(got(1).getAs[String]("feature") == "pure" &&
      got(1).getAs[Long]("n_groups") == 2L &&
      got(1).getAs[Double]("gini") == 0.0)
  }

  test("expectedCalibrationError: hand case — exact rational conf per bin") {
    // scores 1..5, positives = top-2 scores; pct = (rank-1)/4
    val df = Seq((1L, false, 1L), (2L, false, 2L), (3L, false, 3L),
      (4L, true, 4L), (5L, true, 5L)).toDF("id", "y", "score")
    val r = EvalOps
      .expectedCalibrationError(df, "y", "score", "id", bins = 2)
      .collect().head
    assert(r.getAs[Long]("n_bins") == 2L && r.getAs[Long]("n") == 5L)
    // bin0 {r1,r2}: acc 0, conf 1/8, term 2/5*1/8 = 0.05
    // bin1 {r3,r4,r5}: acc 2/3, conf 9/12, term 3/5*|2/3-3/4| ≈ 0.05
    assert(math.abs(r.getAs[Double]("ece") - 0.1) < 1e-9)
  }

  test("rankingMetrics: hand case — hits, RR, ordered-fold DCG, prefix IDCG") {
    val d2 = EvalOps.ndcgDiscounts(3)(1)
    val p2 = EvalOps.ndcgIdealPrefix(3)(1)
    val slate = Seq(
      (1L, "a", 5L), (1L, "b", 4L), (1L, "c", 3L), (1L, "d", 2L),
      (2L, "a", 7L), (2L, "b", 7L), (2L, "c", 7L), (2L, "d", 7L),
      (3L, "a", 1L), (3L, "b", 0L), (3L, "c", 0L), (3L, "d", 0L))
      .toDF("u", "item", "score")
    val rel = Seq((1L, "b"), (1L, "d"), (2L, "a")).toDF("u", "item")
    val got = EvalOps.rankingMetrics(slate, "u", "item", "score", rel, k = 3)
      .orderBy("u").collect()
    // user 1: ranks a1 b2 c3 d4; relevant {b, d} → hit b at rank 2
    val r1 = got(0)
    assert((r1.getAs[Long]("n_rel"), r1.getAs[Long]("hits"),
      r1.getAs[Long]("first_hit")) == (2L, 1L, 2L))
    assert(r1.getAs[Double]("rr") == 0.5)
    assert(r1.getAs[Double]("dcg") == 0.0 + d2) // fold order: 0 + d2
    assert(r1.getAs[Double]("idcg") == p2)
    assert(r1.getAs[Double]("ndcg") == (0.0 + d2) / p2)
    assert(r1.getAs[Double]("recall_k") == 0.5)
    // user 2: all-tied scores rank by item name: a first → perfect RR/NDCG
    val r2 = got(1)
    assert(r2.getAs[Double]("rr") == 1.0 && r2.getAs[Double]("ndcg") == 1.0)
    assert(r2.getAs[Double]("precision_k") == 1.0 / 3.0)
    // user 3: nothing relevant → zero hits, null NDCG family
    val r3 = got(2)
    assert((r3.getAs[Long]("n_rel"), r3.getAs[Long]("hits")) == (0L, 0L))
    assert(r3.getAs[Double]("rr") == 0.0 && r3.getAs[Double]("dcg") == 0.0)
    assert(r3.isNullAt(r3.fieldIndex("idcg")) &&
      r3.isNullAt(r3.fieldIndex("ndcg")))
  }

  test("rankingSummary: rolls up qualified users only, ordered-fold means") {
    val d2 = EvalOps.ndcgDiscounts(3)(1)
    val p2 = EvalOps.ndcgIdealPrefix(3)(1)
    val slate = Seq(
      (1L, "a", 5L), (1L, "b", 4L), (1L, "c", 3L), (1L, "d", 2L),
      (2L, "a", 7L), (2L, "b", 7L), (2L, "c", 7L), (2L, "d", 7L),
      (3L, "a", 1L), (3L, "b", 0L), (3L, "c", 0L), (3L, "d", 0L))
      .toDF("u", "item", "score")
    val rel = Seq((1L, "b"), (1L, "d"), (2L, "a")).toDF("u", "item")
    val per = EvalOps.rankingMetrics(slate, "u", "item", "score", rel, k = 3)
    val r = EvalOps.rankingSummary(per, "u").collect().head
    assert(r.getAs[Long]("n_users") == 2L && r.getAs[Long]("n_hit") == 2L)
    assert(r.getAs[Double]("mrr") == (0.0 + 0.5 + 1.0) / 2.0)
    assert(r.getAs[Double]("mean_ndcg") == (0.0 + d2 / p2 + 1.0) / 2.0)
    assert(r.getAs[Double]("hit_rate") == 1.0)
  }

  test("ndcg constants: d1 = 1, d3 = 1/2 exactly; prefix = left-fold sums") {
    val d = EvalOps.ndcgDiscounts(3)
    assert(d(0) == 1.0 && d(2) == 0.5) // log2(4) is exact in doubles
    val p = EvalOps.ndcgIdealPrefix(3)
    assert(p(0) == 1.0 && p(1) == 1.0 + d(1) && p(2) == 1.0 + d(1) + 0.5)
  }

  test("cohensKappa: unanimous single-cell table yields null kappa (pe = 1)") {
    val df = Seq.fill(4)((true, true)).toDF("a", "b")
    val r = EvalOps.cohensKappa(df, "a", "b").collect().head
    assert(r.getAs[Double]("po") == 1.0 && r.getAs[Double]("pe") == 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  test("matthewsCorrelation: hand table, perfect, inverted, degenerate") {
    // TP=2 FP=1 FN=1 TN=2: mcc = (4-1)/sqrt(3*3*3*3) = 3/9
    val df = Seq((true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false)).toDF("p", "y")
    val r = EvalOps.matthewsCorrelation(df, "p", "y").collect().head
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn")) == ((2L, 1L, 1L, 2L)))
    assert(r.getAs[Double]("mcc") == 3.0 / math.sqrt(81.0))
    // perfect agreement → 1, inversion → -1 (exact: den = num²)
    val perfect = Seq((true, true), (false, false)).toDF("p", "y")
    assert(EvalOps.matthewsCorrelation(perfect, "p", "y")
      .collect().head.getAs[Double]("mcc") == 1.0)
    val inv = Seq((true, false), (false, true)).toDF("p", "y")
    assert(EvalOps.matthewsCorrelation(inv, "p", "y")
      .collect().head.getAs[Double]("mcc") == -1.0)
    // all-positive predictions: a margin is empty → null
    val allp = Seq((true, true), (true, false)).toDF("p", "y")
    val r2 = EvalOps.matthewsCorrelation(allp, "p", "y").collect().head
    assert(r2.isNullAt(r2.fieldIndex("mcc")))
  }

  test("brierScore: hand case, perfect ranking, and n=1 null") {
    // ranks 1..4 → p = 0, 1/3, 2/3, 1; y = F,F,T,T → d = 0,1,-1,0
    // Brier = 2 / (4·9) = 1/18
    val df = Seq((1L, 10L, false), (2L, 20L, false),
      (3L, 30L, true), (4L, 40L, true)).toDF("id", "score", "y")
    val r = EvalOps.brierScore(df, "y", "score", "id").collect().head
    assert(r.getAs[Long]("n") == 4L &&
      r.getAs[Double]("brier") == 2.0 / 36.0)
    // perfectly separated AND extreme p: only the interior rows pay
    val single = Seq((1L, 5L, true)).toDF("id", "score", "y")
    val r1 = EvalOps.brierScore(single, "y", "score", "id").collect().head
    assert(r1.getAs[Long]("n") == 1L && r1.isNullAt(r1.fieldIndex("brier")))
  }

  /** Reference PAV: the classic stack sweep, exact mean comparisons via
    * cross-multiplication. Returns one fitted value per input bin. */
  private def pavRef(bins: Seq[(Long, Long)]): Seq[Double] = {
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    for ((n, p) <- bins) {
      var cur = (n, p, 1)
      // pool while the previous block mean >= current mean
      while (st.nonEmpty && st.last._2 * cur._1 >= cur._2 * st.last._1) {
        val l = st.remove(st.size - 1)
        cur = (l._1 + cur._1, l._2 + cur._2, l._3 + cur._3)
      }
      st += cur
    }
    st.toSeq.flatMap { case (n, p, c) =>
      Seq.fill(c)(p.toDouble / n.toDouble) }
  }

  private def isoBins(bins: Seq[(Long, Long)]): Seq[Double] = {
    // bin b holds n rows at score b, n_pos of them labeled true
    val rows = bins.zipWithIndex.flatMap { case ((n, p), b) =>
      Seq.fill(p.toInt)((b.toLong, true)) ++
        Seq.fill((n - p).toInt)((b.toLong, false))
    }
    EvalOps.isotonicCalibration(rows.toDF("score", "y"), "y", "score",
        binWidth = 1L)
      .orderBy("bin")
      .collect().map(_.getAs[Double]("iso")).toSeq
  }

  test("isotonicCalibration: minimax fit equals reference PAV, hand case") {
    // rates 0.5, 0.0, 1.0 → first two pool to 1/4, last stays 1.0
    assert(isoBins(Seq((2L, 1L), (2L, 0L), (2L, 2L))) ==
      Seq(0.25, 0.25, 1.0))
    // already monotone input is untouched
    assert(isoBins(Seq((4L, 1L), (4L, 2L), (4L, 3L))) ==
      Seq(0.25, 0.5, 0.75))
  }

  test("isotonicCalibration: equals stack PAV on random bin tables") {
    for (seed <- Seq(7, 19, 42)) {
      val rnd = new scala.util.Random(seed)
      val bins = Seq.fill(8) {
        val n = 1L + rnd.nextInt(5)
        (n, rnd.nextLong(n + 1))
      }
      val got = isoBins(bins)
      assert(got == pavRef(bins), s"seed $seed bins $bins")
      assert(got.sliding(2).forall(w => w.size < 2 || w(0) <= w(1)),
        "fit must be monotone")
    }
  }

  test("multiclassF1: union class domain, one-division F1, hand case") {
    // truth a,a,a,b,b,c — preds a,a,b,b,b,b: 'c' never predicted,
    // nothing hallucinated; per-class tallies by hand
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "b"), ("c", "b")).toDF("y", "p")
    val per = EvalOps.multiclassF1(df, "y", "p").orderBy("cls")
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Double)]
      .collect().toSeq
    assert(per == Seq(
      ("a", 3L, 2L, 2L, Some(1.0), Some(2.0 / 3.0), 0.8),
      ("b", 2L, 4L, 2L, Some(0.5), Some(1.0), 2.0 / 3.0),
      ("c", 1L, 0L, 0L, None, Some(0.0), 0.0)))
    val sm = EvalOps.multiclassF1Summary(EvalOps.multiclassF1(df, "y", "p"))
      .as[(Long, Long, Double, Double, Double)].collect().head
    // micro = 4/6; macro = (0.8 + 2/3 + 0)/3; weighted = (3·0.8 + 2·2/3)/6
    assert(sm._1 == 6L && sm._2 == 3L)
    assert(sm._3 == 4.0 / 6.0)
    assert(math.abs(sm._4 - (0.8 + 2.0 / 3.0) / 3.0) < 1e-15)
    assert(math.abs(sm._5 - (3.0 * 0.8 + 2.0 * 2.0 / 3.0) / 6.0) < 1e-15)
  }

  test("averagePrecision: hand step sums, null AP when no positives") {
    // scores desc: 3(pos) -> term 1*1/(2*1); 2(neg) -> 0; 1(pos) ->
    // 1*2/(2*3); AP = 1/2 + 1/3 = 5/6 (sklearn agrees on this case)
    val df = Seq((3L, true), (2L, false), (1L, true)).toDF("score", "y")
    val got = EvalOps.averagePrecision(df, "y", "score")
      .as[(Long, Long, Option[Double])].collect().head
    assert(got._1 == 2L && got._2 == 3L)
    assert(math.abs(got._3.get - 5.0 / 6.0) < 1e-15)
    // all-negative corpus: AP undefined -> null, no 0/0
    val neg = Seq((3L, false), (1L, false)).toDF("score", "y")
    val g2 = EvalOps.averagePrecision(neg, "y", "score")
      .as[(Long, Long, Option[Double])].collect().head
    assert(g2 == ((0L, 2L, None)))
  }

  test("logLoss: Laplace-smoothed portable-ln terms, hand fold") {
    import graft.expr.PortableLnRatio.compute
    // scores 2(pos), 1(neg), N=2: p(rank1)=1/3, p(rank2)=2/3 -> both
    // terms are ln(2/3); loss = -(2*ln(2/3))/2 = ln(3/2)
    val df = Seq((2L, true), (1L, false)).toDF("score", "y")
    val got = EvalOps.logLoss(df, "y", "score")
      .as[(Long, Long, Double)].collect().head
    val c = compute(2L, 3L)
    assert(got._1 == 2L && got._2 == 1L)
    assert(got._3 == -(((0.0 + (0.0 * compute(1L, 3L) + 1.0 * c)) +
      (1.0 * c + 0.0 * compute(1L, 3L))) / 2.0))
    assert(math.abs(got._3 - math.log(1.5)) < 1e-12)
  }

  test("multiclassF1: hallucinated label gets a precision-0 row") {
    val df = Seq(("a", "a"), ("a", "x")).toDF("y", "p")
    val per = EvalOps.multiclassF1(df, "y", "p").orderBy("cls")
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Double)]
      .collect().toSeq
    assert(per == Seq(
      ("a", 2L, 1L, 1L, Some(1.0), Some(0.5), 2.0 / 3.0),
      ("x", 0L, 1L, 0L, Some(0.0), None, 0.0)))
  }

  test("optimalThreshold: hand sweep incl. never-alarm; ties to lowest") {
    // scores: 10(pos), 8(neg), 5(pos), 2(neg); costFp=1, costFn=2:
    // t=10: fp0 fn1 -> 2; t=8: fp1 fn1 -> 3; t=5: fp1 fn0 -> 1*;
    // t=2: fp2 fn0 -> 2; never-alarm: fn2 -> 4. argmin = t=5, cost 1
    val df = Seq((1L, true, 10L), (2L, false, 8L), (3L, true, 5L),
      (4L, false, 2L)).toDF("id", "y", "score")
    val got = EvalOps.optimalThreshold(df, "y", "score", 1L, 2L)
      .as[(Option[Long], Long, Long, Long, Long)].collect().head
    assert(got == ((Some(5L), 2L, 1L, 0L, 1L)))
    // never-alarm wins when a NEGATIVE doc tops the score order and FP
    // cost is prohibitive: every threshold admits that FP (cost >= 100)
    // while never-alarm only pays the one missed positive (cost 1)
    val df2 = Seq((1L, false, 10L), (2L, true, 8L)).toDF("id", "y", "score")
    val g2 = EvalOps.optimalThreshold(df2, "y", "score", 100L, 1L)
      .as[(Option[Long], Long, Long, Long, Long)].collect().head
    assert(g2 == ((None, 0L, 0L, 1L, 1L)))
  }

  test("optimalThreshold: fractional scores keep their exact type") {
    // 5.9(pos) above 5.0(neg): t=5.9 has cost 0 and must be reported
    // as 5.9 — a cast-to-long would return 5, which ADMITS the negative
    val df = Seq((1L, true, 5.9), (2L, false, 5.0)).toDF("id", "y", "score")
    val got = EvalOps.optimalThreshold(df, "y", "score", 5L, 1L)
      .as[(Option[Double], Long, Long, Long, Long)].collect().head
    assert(got == ((Some(5.9), 1L, 0L, 0L, 0L)))
  }

  test("multiclassF1: null label and null prediction are ONE missing class") {
    // (null,'a'), ('a',null), (null,null): the null class has n_true 2
    // (rows 1 and 3), n_pred 2 (rows 2 and 3), tp 1 (row 3) — plain
    // equi-joins would split it into two half-rows
    val df = Seq((None: Option[String], Some("a")),
      (Some("a"), None: Option[String]),
      (None: Option[String], None: Option[String])).toDF("y", "p")
    val per = EvalOps.multiclassF1(df, "y", "p")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(per == Seq(
      (None, 2L, 2L, 1L), (Some("a"), 1L, 1L, 0L)))
    val sm = EvalOps.multiclassF1Summary(EvalOps.multiclassF1(df, "y", "p"))
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(sm._1 == 3L && sm._2 == 2L) // null class counted ONCE
  }

  test("krippendorffAlpha: hand case with missing data, perfect agreement, guard") {
    import spark.implicits._
    // u1=[a,a] (d=0), u2=[a,b] (d=2, m−1=1), u3=[b,b,b] (d=0), plus a
    // singleton unit u4=[a] that must DROP OUT. n=7, n_a=3, n_b=4,
    // de = 49−(9+16) = 24, L = lcm(1..11) = 27720, D_oL = 2L →
    // α = 1 − 6·2L/(24L) = 0.5
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"), (4L, "a")).toDF("u", "c")
    val got = EvalOps.krippendorffAlpha(df, "u", "c")
      .as[(Long, Long, Long, java.math.BigDecimal, java.math.BigDecimal,
        Option[Double])].collect().head
    assert(got._1 == 7L && got._2 == 3L && got._3 == 2L)
    assert(got._4.longValueExact == 2L * 27720L)
    assert(got._5.longValueExact == 24L)
    assert(got._6.contains(0.5))
    // perfect agreement → D_o = 0 → α = 1 exactly
    val perfect = Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y"))
      .toDF("u", "c")
    val p = EvalOps.krippendorffAlpha(perfect, "u", "c")
      .as[(Long, Long, Long, java.math.BigDecimal, java.math.BigDecimal,
        Option[Double])].collect().head
    assert(p._4.longValueExact == 0L && p._6.contains(1.0))
    // one label everywhere → D_e = 0 → α undefined (null)
    val flat = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x")).toDF("u", "c")
    val f = EvalOps.krippendorffAlpha(flat, "u", "c")
      .as[(Long, Long, Long, java.math.BigDecimal, java.math.BigDecimal,
        Option[Double])].collect().head
    assert(f._6.isEmpty)
    // a unit with more raters than the lcm bound raises, not mis-weights
    val crowd = (1 to 5).map(i => (1L, s"r$i")).toDF("u", "c")
    val ex = intercept[Exception] {
      EvalOps.krippendorffAlpha(crowd, "u", "c", maxRaters = 4).count()
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("more than 4"))),
      s"wrong failure: ${ex.getMessage}")
  }
}
