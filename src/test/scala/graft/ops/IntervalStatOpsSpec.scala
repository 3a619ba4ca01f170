package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class IntervalStatOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ---- IntervalOps.mergeIntervals ----

  private def islands(rows: Seq[(String, Long, Long, Long)]) = {
    import spark.implicits._
    IntervalOps
      .mergeIntervals(rows.toDF("k", "id", "s", "e"), "k", "s", "e",
        tieCols = Seq("id"))
      .as[(String, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
  }

  test("mergeIntervals: containment chain that defeats the lag-gap test") {
    // [0,100] swallows [10,20] and [30,40]; [150,160] is separate.
    // A lag-based test would see 30 > prev_end=20 and wrongly split.
    val got = islands(Seq(
      ("a", 1L, 0L, 100L), ("a", 2L, 10L, 20L), ("a", 3L, 30L, 40L),
      ("a", 4L, 150L, 160L)))
    assert(got == Seq(
      ("a", 1L, 0L, 100L, 3L),
      ("a", 2L, 150L, 160L, 1L)))
  }

  test("mergeIntervals: touching intervals merge, strict gaps split, keys isolate") {
    val got = islands(Seq(
      ("a", 1L, 0L, 10L), ("a", 2L, 10L, 20L), // touching → merge
      ("a", 3L, 21L, 30L), // gap of 1 → new island
      ("b", 4L, 0L, 5L))) // other key unaffected
    assert(got == Seq(
      ("a", 1L, 0L, 20L, 2L),
      ("a", 2L, 21L, 30L, 1L),
      ("b", 1L, 0L, 5L, 1L)))
  }

  test("mergeIntervals plans exactly one shuffle (windows + rollup share it)") {
    import spark.implicits._
    val df = Seq(("a", 1L, 0L, 10L), ("a", 2L, 5L, 15L)).toDF("k", "id", "s", "e")
    val out = IntervalOps.mergeIntervals(df, "k", "s", "e", Seq("id"))
    val p = out.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"expected 1 exchange, got $shuffles:\n$p")
  }

  // ---- StatOps.madOutliers / winsorize ----

  test("madOutliers flags the planted outlier and survives contamination") {
    import spark.implicits._
    // Group g: values 10..19 (median 14 lower), one wild outlier 1000.
    // MAD stays small, so 1000 is flagged; nothing else is.
    val rows = (1L to 10L).map(i => ("g", i, 9.0 + i)) :+ ("g", 99L, 1000.0)
    val got = StatOps
      .madOutliers(rows.toDF("k", "id", "v"), "k", "v", "id", k = 3.0)
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got.map(_._2) == Seq(99L))
    val (_, _, v, med, mad, dev) = got.head
    assert(v == 1000.0 && med == 15.0) // 11 values → rank 6 of sorted
    assert(mad == 3.0) // devs: 0..5 and 985 → lower median = 3
    assert(dev == 985.0)
  }

  test("madOutliers: even group size takes the lower median") {
    import spark.implicits._
    // 4 values → rank (4+1) div 2 = 2 → lower middle element.
    val rows = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0), ("g", 4L, 100.0))
    val got = StatOps.madOutliers(rows.toDF("k", "id", "v"), "k", "v", "id")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(got.forall(_._4 == 2.0)) // med = 2.0, the rank-2 element
    assert(got.map(_._2).toSeq == Seq(4L)) // dev 98 > 3 * mad(=1)
  }

  test("winsorize clips to explicit ceil-rank bounds and keeps interior rows") {
    import spark.implicits._
    // 20 values 1..20: lo rank = ceil(5*20/100)=1 → 1.0;
    // hi rank = ceil(95*20/100)=19 → 19.0. 20.0 clips to 19.0.
    val rows = (1L to 20L).map(i => ("g", i, i.toDouble))
    val got = StatOps.winsorize(rows.toDF("k", "id", "v"), "k", "v", "id")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._2)
    assert(got.forall(r => r._4 == 1.0 && r._5 == 19.0))
    assert(got.map(_._6).toSeq == (1L to 19L).map(_.toDouble) :+ 19.0)
  }

  test("globalRowNumber equals the total-order rank, any partition count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(23)
    // duplicate values force the tiebreaker; shuffled insertion order
    val rows = rnd.shuffle((1L to 500L).map(i => (i, (i % 37).toDouble)))
    val expected = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    for (p <- Seq(1, 5, 32)) {
      val got = StatOps
        .globalRowNumber(rows.toDF("id", "v"), Seq(col("v"), col("id")),
          "rank", partitions = p)
        .select("id", "rank").as[(Long, Long)].collect().toMap
      assert(got == expected, s"partitions=$p")
    }
  }

  test("globalRowNumber never plans a single-partition data window") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("id", "v")
    val out = StatOps.globalRowNumber(df, Seq(col("v"), col("id")), "rank")
    val p = out.queryExecution.executedPlan.toString
    // the only windows are per-_pid (rank) and over the tiny offsets
    // rollup; no `Window [...] []` over the data without partitioning
    val dataWindows = "Window \\[row_number".r.findAllIn(p).toSeq
    assert(dataWindows.nonEmpty)
    assert(p.contains("_pid"), s"rank window must partition by _pid:\n$p")
  }

  test("globalRunningSum equals the sequential prefix sum, any partition count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(29)
    val rows = rnd.shuffle((1L to 300L).map(i => (i, rnd.nextInt(1000).toLong)))
    val expected = rows.sortBy(r => (-r._2, r._1))
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (id, v)) => (id, v, acc + v) }
      .drop(1).map(r => r._1 -> r._3).toMap
    for (p <- Seq(1, 4, 32)) {
      val got = StatOps.globalRunningSum(
        rows.toDF("id", "v"), Seq(col("v").desc, col("id").asc), "v", "cum",
        partitions = p)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got == expected, s"partitions=$p")
    }
  }

  test("robustScale: known quartiles, outlier-immune, IQR-0 gives NULL") {
    import spark.implicits._
    // 1..20 plus a wild outlier: med = rank 11 lower-median element of
    // 21 values, q1 = rank ceil(25*21/100)=6, q3 = rank ceil(75*21/100)=16.
    val rows = (1L to 20L).map(i => ("g", i, i.toDouble)) :+ ("g", 99L, 1e9)
    val got = StatOps.robustScale(rows.toDF("k", "id", "v"), "k", "v", "id")
      .as[(String, Long, Double, Double, Double, Option[Double])]
      .collect().sortBy(_._2)
    assert(got.forall(r => r._4 == 11.0 && r._5 == 10.0)) // med 11, IQR 16-6
    assert(got.head._6.contains((1.0 - 11.0) / 10.0))
    // constant group → IQR 0 → NULL scaled, no ANSI error
    val const = Seq(("c", 1L, 5.0), ("c", 2L, 5.0))
    val g2 = StatOps.robustScale(const.toDF("k", "id", "v"), "k", "v", "id")
      .as[(String, Long, Double, Double, Double, Option[Double])].collect()
    assert(g2.forall(r => r._5 == 0.0 && r._6.isEmpty))
  }

  test("skyline2D matches the quadratic oracle on random points, any bucketing") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // Small value domain forces duplicates (multiplicity path) and ties.
    val pts = (1 to 400).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    def dominated(p: (Long, Long)) = pts.exists(q =>
      q._1 <= p._1 && q._2 >= p._2 && (q._1 < p._1 || q._2 > p._2))
    val oracle = pts.distinct.filterNot(dominated)
      .map(p => (p._1, p._2, pts.count(_ == p).toLong)).sortBy(_._1)
    for (b <- Seq(1, 7, 64)) {
      val got = StatOps.skyline2D(pts.toDF("x", "y"), "x", "y", buckets = b)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == oracle, s"buckets=$b")
    }
  }

  test("skyline2D: a single all-dominating point collapses the frontier") {
    import spark.implicits._
    val pts = Seq((5L, 5L), (0L, 9L), (3L, 9L), (0L, 2L))
    // (0,9) dominates everything else (min x, max y).
    val got = StatOps.skyline2D(pts.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 9L, 1L)))
  }

  test("winsorize: tiny group degenerates to lo == hi without error") {
    import spark.implicits._
    val rows = Seq(("g", 1L, 7.0))
    val got = StatOps.winsorize(rows.toDF("k", "id", "v"), "k", "v", "id")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(got.head._4 == 7.0 && got.head._5 == 7.0 && got.head._6 == 7.0)
  }

  test("spearmanRho: monotone-with-ties is exactly 1, reversed is -1") {
    import spark.implicits._
    // identical tie patterns → identical midrank vectors → rho = 1
    val up = Seq((1L, 1.0, 10.0), (2L, 2.0, 20.0), (3L, 2.0, 20.0),
      (4L, 3.0, 40.0)).toDF("id", "x", "y")
    val r1 = StatOps.spearmanRho(up, "x", "y").collect().head
    // √d·√d differs from d by one ULP — ±1 is approached, not exact
    assert(r1.getAs[Long]("n") == 4L &&
      math.abs(r1.getAs[Double]("rho") - 1.0) < 1e-15)
    val down = Seq((1L, 1.0, 40.0), (2L, 2.0, 20.0), (3L, 2.0, 20.0),
      (4L, 3.0, 10.0)).toDF("id", "x", "y")
    val r2 = StatOps.spearmanRho(down, "x", "y").collect().head
    assert(math.abs(r2.getAs[Double]("rho") + 1.0) < 1e-15)
  }

  test("spearmanRho: hand case with a tie, and a constant column is null") {
    import spark.implicits._
    // x = 1,2,3,4 (ranks 1..4); y = 10,10,30,20 → midranks 1.5,1.5,4,3
    // doubled: rx2 = 2,4,6,8; ry2 = 3,3,8,6 → Pearson = 35/(2*sqrt(5)*19)?
    // moments: n=4 sx=20 sy=20 sxy=(6+12+48+48)=114 sxx=120 syy=118
    // num = 4*114-400 = 56; denx = 4*120-400 = 80; deny = 4*118-400 = 72
    val df = Seq((1L, 1.0, 10.0), (2L, 2.0, 10.0), (3L, 3.0, 30.0),
      (4L, 4.0, 20.0)).toDF("id", "x", "y")
    val r = StatOps.spearmanRho(df, "x", "y").collect().head
    assert(r.getAs[Double]("rho") ==
      56.0 / (math.sqrt(80.0) * math.sqrt(72.0)))
    val const = Seq((1L, 5.0, 1.0), (2L, 5.0, 2.0)).toDF("id", "x", "y")
    val rc = StatOps.spearmanRho(const, "x", "y").collect().head
    assert(rc.isNullAt(rc.fieldIndex("rho")))
  }

  test("mutualInformation: independent table is exactly 0, h = ln2 exact") {
    import spark.implicits._
    // 2x2 uniform: nxy*n == nx*ny for every cell → every MI term is
    // pln(equal, equal) = 0.0 EXACTLY; marginals are 1/2 → h = ln 2
    val df = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val r = StatOps.mutualInformation(df, "x", "y").collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_cells") == 4L)
    assert(r.getAs[Double]("mi") == 0.0)
    assert(r.getAs[Double]("h_x") == graft.expr.PortableLnRatio.Ln2)
    assert(r.getAs[Double]("h_y") == graft.expr.PortableLnRatio.Ln2)
    assert(r.getAs[Double]("nmi") == 0.0)
  }

  test("mutualInformation: perfectly dependent pair has mi == h, nmi ~ 1") {
    import spark.implicits._
    val df = Seq(("a", "u"), ("a", "u"), ("b", "v"), ("b", "v"))
      .toDF("x", "y")
    val r = StatOps.mutualInformation(df, "x", "y").collect().head
    assert(r.getAs[Long]("n_cells") == 2L)
    assert(r.getAs[Double]("mi") == r.getAs[Double]("h_x"))
    assert(math.abs(r.getAs[Double]("nmi") - 1.0) < 1e-15)
  }

  test("chiSquareIndependence: independence is exactly 0; zero cells carry expected mass") {
    import spark.implicits._
    // 2x2 uniform: o == e in every cell → every term an exact 0.0
    val ind = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val r = StatOps.chiSquareIndependence(ind, "x", "y").collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("cramers_v") == 0.0)
    // perfect dependence on 2x2: chi2 = n, V = 1 — and the two
    // UNOBSERVED cells must contribute their expected mass (1.0 each);
    // scalar replay of the full-grid fold in (x, y) order
    val dep = Seq(("a", "u"), ("a", "u"), ("b", "v"), ("b", "v"))
      .toDF("x", "y")
    val r2 = StatOps.chiSquareIndependence(dep, "x", "y").collect().head
    val e = (2L * 2L).toDouble / 4L.toDouble
    val hit = (2.0 - e) * (2.0 - e) / e
    val miss = (0.0 - e) * (0.0 - e) / e
    val chi2 = ((0.0 + hit) + miss + miss) + hit // (a,u),(a,v),(b,u),(b,v)
    assert(r2.getAs[Double]("chi2") == chi2)
    assert(r2.getAs[Double]("cramers_v") ==
      math.sqrt(chi2 / (4L * 1L).toDouble))
    // single-column degenerate: dof 0 → V null
    val deg = Seq(("a", "u"), ("a", "v")).toDF("x", "y")
    val r3 = StatOps.chiSquareIndependence(deg, "x", "y").collect().head
    assert(r3.getAs[Long]("dof") == 0L)
    assert(r3.isNullAt(r3.fieldIndex("cramers_v")))
  }

  test("acfByKey: hand moments, zero/negative lags, constant is null") {
    import spark.implicits._
    // x = 1,2,3 (scale 1): lag1 num = 0; lag2 r = -9/18 = -0.5
    val df = Seq(("a", 1L, 1L, 1.0), ("a", 2L, 2L, 2.0), ("a", 3L, 3L, 3.0))
      .toDF("k", "t", "id", "v")
    val got = StatOps.acfByKey(df, "k", "t", "id", "v", maxLag = 2, scale = 1.0)
      .orderBy("k", "lag")
      .as[(String, Int, Long, Option[Double])].collect().toSeq
    assert(got == Seq(("a", 1, 3L, Some(0.0)), ("a", 2, 3L, Some(-0.5))))
    // alternating 1,2,1,2: r1 = -0.75 exactly
    val alt = Seq(("a", 1L, 1L, 1.0), ("a", 2L, 2L, 2.0),
      ("a", 3L, 3L, 1.0), ("a", 4L, 4L, 2.0)).toDF("k", "t", "id", "v")
    val g2 = StatOps.acfByKey(alt, "k", "t", "id", "v", maxLag = 1, scale = 1.0)
      .as[(String, Int, Long, Option[Double])].collect().head
    assert(g2 == (("a", 1, 4L, Some(-0.75))))
    // constant series: den = 0 → null; lag beyond n → null
    val const = Seq(("c", 1L, 1L, 5.0), ("c", 2L, 2L, 5.0))
      .toDF("k", "t", "id", "v")
    val g3 = StatOps.acfByKey(const, "k", "t", "id", "v", maxLag = 3, scale = 1.0)
      .orderBy("lag")
      .as[(String, Int, Long, Option[Double])].collect().toSeq
    assert(g3.forall(_._4.isEmpty) && g3.map(_._2) == Seq(1, 2, 3))
  }

  test("cusumChangepoint: level shift located, ties take smallest k") {
    import spark.implicits._
    // 0,0,10,10 → g = 20,40,20,0 → k* = 2 (the last pre-shift index)
    val df = Seq(("a", 1L, 1L, 0.0), ("a", 2L, 2L, 0.0),
      ("a", 3L, 3L, 10.0), ("a", 4L, 4L, 10.0)).toDF("k", "t", "id", "v")
    val got = StatOps.cusumChangepoint(df, "k", "t", "id", "v", scale = 1.0)
      .as[(String, Long, Int, Long, Long)].collect().head
    assert(got == (("a", 4L, 2, 2L, 40L)))
    // constant series: all g = 0 → tie → k* = 1
    val const = Seq(("c", 1L, 1L, 5.0), ("c", 2L, 2L, 5.0))
      .toDF("k", "t", "id", "v")
    val g2 = StatOps.cusumChangepoint(const, "k", "t", "id", "v", scale = 1.0)
      .as[(String, Long, Int, Long, Long)].collect().head
    assert(g2 == (("c", 2L, 1, 1L, 0L)))
  }

  test("kendallTauB: hand cases with and without ties") {
    import spark.implicits._
    // x=1,2,3 / y=1,3,2: C=2, D=1, no ties → tau = 1/3
    val df = Seq((1L, 1L), (2L, 3L), (3L, 2L)).toDF("x", "y")
    val r = StatOps.kendallTauB(df, "x", "y").collect().head
    assert(r.getAs[Long]("concordant") == 2L &&
      r.getAs[Long]("discordant") == 1L)
    // doubled masses: tau = 2(C-D)/sqrt(T0'^... ) = 2/ (sqrt6 * sqrt6)
    assert(r.getAs[Double]("tau_b") ==
      2.0 / (math.sqrt(6.0) * math.sqrt(6.0)))
    // tied cell (1,1)x2: C = 2 (cell (1,1)->(2,2)), D = 0
    // T0' = 6, T1' = T2' = 2 → tau = 4/(sqrt4*sqrt4) = 1.0 exactly
    val tied = Seq((1L, 1L), (1L, 1L), (2L, 2L)).toDF("x", "y")
    val r2 = StatOps.kendallTauB(tied, "x", "y").collect().head
    assert(r2.getAs[Long]("n") == 3L && r2.getAs[Long]("n_cells") == 2L)
    assert(r2.getAs[Double]("tau_b") == 1.0)
    // constant x margin: undefined → null
    val const = Seq((1L, 1L), (1L, 2L)).toDF("x", "y")
    val r3 = StatOps.kendallTauB(const, "x", "y").collect().head
    assert(r3.isNullAt(r3.fieldIndex("tau_b")))
    // reversal: tau ~ -1
    val rev = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    val r4 = StatOps.kendallTauB(rev, "x", "y").collect().head
    assert(r4.getAs[Double]("tau_b") ==
      -6.0 / (math.sqrt(6.0) * math.sqrt(6.0)))
  }

  test("jsDivergence: identical is 0, disjoint is ln2, hand replica") {
    import spark.implicits._
    import graft.expr.PortableLnRatio.{compute, Ln2}
    // identical histograms: every ratio is exactly 1 → jsd == +0.0
    val same = Seq(("x", true), ("x", false), ("y", true), ("y", false))
      .toDF("k", "p")
    val r0 = StatOps.jsDivergence(same, "k", "p").collect().head
    assert(r0.getAs[Double]("jsd") == 0.0 &&
      r0.getAs[Double]("jsd_norm") == 0.0)
    // disjoint supports: jsd == ln 2 exactly, normalized 1.0
    val disj = Seq(("x", true), ("x", true), ("y", false), ("y", false))
      .toDF("k", "p")
    val r1 = StatOps.jsDivergence(disj, "k", "p").collect().head
    assert(r1.getAs[Double]("jsd") == Ln2 &&
      r1.getAs[Double]("jsd_norm") == 1.0)
    // hand replica: a = (3,1), b = (1,3)
    val df = (Seq.fill(3)(("x", true)) ++ Seq(("x", false)) ++
      Seq(("y", true)) ++ Seq.fill(3)(("y", false))).toDF("k", "p")
    val r = StatOps.jsDivergence(df, "k", "p").collect().head
    val sp = 0.0 + (3.0 / 4.0) * compute(24, 16) + (1.0 / 4.0) * compute(8, 16)
    val sq = 0.0 + (1.0 / 4.0) * compute(8, 16) + (3.0 / 4.0) * compute(24, 16)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("jsd") == 0.5 * sp + 0.5 * sq)
    // one empty side: undefined → null
    val solo = Seq(("x", true)).toDF("k", "p")
    val r2 = StatOps.jsDivergence(solo, "k", "p").collect().head
    assert(r2.isNullAt(r2.fieldIndex("jsd")))
  }

  test("interarrivalStats: exact moments, burstiness edge cases") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision
    // gaps (ms->us): 1000000, 3000000 → S=4e6, Σg²=1e12+9e12=1e13
    // V = 2*1e13 - 16e12 = 4e12; √V = 2e6 → B = (2e6-4e6)/(2e6+4e6) = -1/3
    val df = Seq(("a", t(0L), 1L), ("a", t(1000000L), 2L),
      ("a", t(4000000L), 3L), ("b", t(0L), 4L))
      .toDF("k", "ts", "id")
    val got = StatOps.interarrivalStats(df, "k", "ts", "id")
      .orderBy("k")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got(0) == (("a", 3L, 2L, 4000000L, Some(2000000.0),
      Some((2e6 - 4e6) / (2e6 + 4e6)))))
    // single event: no gaps, everything null/zero
    assert(got(1) == (("b", 1L, 0L, 0L, None, None)))
    // all-simultaneous events: S = 0 → burstiness undefined, mean 0
    val sim = Seq(("c", t(5L), 1L), ("c", t(5L), 2L)).toDF("k", "ts", "id")
    val g2 = StatOps.interarrivalStats(sim, "k", "ts", "id")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(g2 == (("c", 2L, 1L, 0L, Some(0.0), None)))
  }

  test("cusumControl: prefix-min identity equals the recurrence") {
    import spark.implicits._
    // drift x = 0,0,15,0 (target 10, slack 0): g = 0,0,15,15; h=12 → i=3
    val df = Seq(("a", 1L, 1L, 10.0), ("a", 2L, 2L, 10.0),
      ("a", 3L, 3L, 25.0), ("a", 4L, 4L, 10.0)).toDF("k", "t", "id", "v")
    val got = StatOps.cusumControl(df, "k", "t", "id", "v",
        targetCents = 10L, slackCents = 0L, thresholdCents = 12L,
        scale = 1.0)
      .as[(String, Long, Long, Long, Option[Int])].collect().head
    assert(got == (("a", 4L, 15L, 15L, Some(3))))
    // reset-through-zero: x = -5, 20 → g = 0, 20 (not 15)
    val df2 = Seq(("b", 1L, 1L, 5.0), ("b", 2L, 2L, 30.0))
      .toDF("k", "t", "id", "v")
    val g2 = StatOps.cusumControl(df2, "k", "t", "id", "v",
        targetCents = 10L, slackCents = 0L, thresholdCents = 100L,
        scale = 1.0)
      .as[(String, Long, Long, Long, Option[Int])].collect().head
    assert(g2 == (("b", 2L, 20L, 20L, None)))
  }

  test("theilSenSlope: median of pairwise slopes, exact order statistics") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d")
    // user a: values 0, 10, 14 at 1s spacing -> slopes 10, 7, 4 per Ms
    // (odd count: median = 7e-6 cents/us = 604800 cents/day);
    // user b: both events at the SAME ts -> no valid pair, absent
    val df = Seq(
      (1L, ts(1), 1L, 0.0), (1L, ts(2), 2L, 10.0), (1L, ts(3), 3L, 14.0),
      (2L, ts(5), 4L, 1.0), (2L, ts(5), 5L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = StatOps.theilSenSlope(df, "user_id", "ts", "event_id",
        "value", scale = 1.0)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 3L, 604800.0)))
    // even pair count: 10, 7, 4, 2 per Ms over 4 points -> check the
    // two-middle average ((4e-6 + 7e-6)/2) * 86400e6 against hand math
    val df2 = Seq(
      (1L, ts(1), 1L, 0.0), (1L, ts(2), 2L, 10.0))
      .toDF("user_id", "ts", "event_id", "value")
    val one = StatOps.theilSenSlope(df2, "user_id", "ts", "event_id",
        "value", scale = 1.0)
      .as[(Long, Long, Long, Double)].collect().head
    // same IEEE tree as the operator: one slope, averaged with itself
    val s = 10.0 / 1000000.0
    assert(one == ((1L, 2L, 1L, (s + s) / 2.0 * 86400000000.0)))
  }

  test("mannKendall: exact S, tie-corrected variance, continuity-corrected Z") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d")
    // user 1: strictly rising 1,2,3,4 -> S = 6 (all 6 pairs concordant),
    //   no ties: var18 = 4*3*13 = 156, Z = (6-1)/sqrt(156/18)
    // user 2: constant 5,5,5 -> S = 0, tie t=3: var18 = 3*2*11 - 3*2*11
    //   = 0 -> Z null
    // user 3: single point -> S = 0, var18 = 0 -> Z null
    val df = Seq(
      (1L, ts(1), 1L, 1.0), (1L, ts(2), 2L, 2.0),
      (1L, ts(3), 3L, 3.0), (1L, ts(4), 4L, 4.0),
      (2L, ts(1), 5L, 5.0), (2L, ts(2), 6L, 5.0), (2L, ts(3), 7L, 5.0),
      (3L, ts(1), 8L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = StatOps.mannKendall(df, "user_id", "ts", "event_id",
        "value", scale = 1.0)
      .as[(Long, Long, Long, Long, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, 4L, 6L, 156L,
      Some(5.0 / math.sqrt(156.0 / 18.0)))))
    assert(got(1) == ((2L, 3L, 0L, 0L, None)))
    assert(got(2) == ((3L, 1L, 0L, 0L, None)))
    // mixed ties: 1,3,3,2 -> pairs: (1,3)+1 (1,3)+1 (1,2)+1 (3,3)0
    //   (3,2)-1 (3,2)-1 -> S = 1; tie t=2 on value 3:
    //   var18 = 4*3*13 - 2*1*9 = 138; Z = (1-1)/sqrt(...) -> 0? No:
    //   S=1 -> Z = (1-1)/sqrt = 0.0 via the formula (not the S=0 branch)
    val df2 = Seq(
      (9L, ts(1), 1L, 1.0), (9L, ts(2), 2L, 3.0),
      (9L, ts(3), 3L, 3.0), (9L, ts(4), 4L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val m = StatOps.mannKendall(df2, "user_id", "ts", "event_id",
        "value", scale = 1.0)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(m == ((9L, 4L, 1L, 138L, Some(0.0))))
  }

  test("ljungBox: hand fold over the exact ACF; short series gives null") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d")
    // alternating series 1,-1,1,-1,1,-1 (scale 1): strong negative ACF
    val rows = (0 until 6).map(i =>
      (1L, ts(i + 1), i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val acf = StatOps.acfByKey(df, "user_id", "ts", "event_id", "value",
        maxLag = 2, scale = 1.0)
      .as[(Long, Int, Long, Option[Double])].collect()
      .map(r => r._2 -> r._4.get).toMap
    val got = StatOps.ljungBox(df, "user_id", "ts", "event_id", "value",
        maxLag = 2, scale = 1.0)
      .as[(Long, Long, Long, Option[Double])].collect().head
    // replay the exact fold: (0 + r1^2/(n-1)) + r2^2/(n-2), x n(n+2)
    val expected = ((6L * 8L).toDouble *
      ((0.0 + acf(1) * acf(1) / 5.0) + acf(2) * acf(2) / 4.0))
    assert(got._1 == 1L && got._2 == 6L && got._3 == 2L)
    assert(got._4 == Some(expected))
    assert(expected > 5.99, "alternating series must look non-white")
    // series shorter than maxLag: an undefined lag nulls Q
    val short = Seq((2L, ts(1), 1L, 1.0), (2L, ts(2), 2L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val g2 = StatOps.ljungBox(short, "user_id", "ts", "event_id", "value",
        maxLag = 3, scale = 1.0)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(g2._4.isEmpty)
  }

  test("anovaF: hand decomposition; identical groups give F null-or-0 path") {
    import spark.implicits._
    // groups a = {1,2,3}, b = {4,5,6}: S_a=6 S_b=15 Q=91 N=6
    // tsum = 36/3 + 225/3 = 87; ssb = 87 - 441/6 = 13.5; ssw = 91-87 = 4
    // F = (13.5/1)/(4/4) = 13.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val got = StatOps.anovaF(df, "g", "v", scale = 1.0)
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(got._1 == 2L && got._2 == 6L)
    assert(got._3 == 13.5 && got._4 == 4.0)
    assert(got._5 == Some(13.5))
    // zero within-variance (constant groups) -> F undefined, null
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val g2 = StatOps.anovaF(const, "g", "v", scale = 1.0)
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(g2._4 == 0.0 && g2._5.isEmpty)
    // single group -> k=1 -> null
    val one = Seq(("a", 1.0), ("a", 5.0)).toDF("g", "v")
    assert(StatOps.anovaF(one, "g", "v", scale = 1.0)
      .as[(Long, Long, Double, Double, Option[Double])]
      .collect().head._5.isEmpty)
  }

  test("correlationMatrix: perfect / anti / constant-column hand cases") {
    import spark.implicits._
    // y = x -> r = 1; z = -x -> r(x,z) = r(y,z) = -1; c constant -> null
    val df = Seq((1.0, 1.0, 9.0, 5.0), (2.0, 2.0, 8.0, 5.0),
      (3.0, 3.0, 7.0, 5.0)).toDF("x", "y", "z", "c")
    val got = StatOps.correlationMatrix(df, Seq("x", "y", "z", "c"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    // sqrt(v)*sqrt(v) is an ulp off v, so |r| lands within 1e-15 of 1
    // — that IS the defined IEEE tree (the oracle replays it verbatim)
    assert(math.abs(got(("x", "y")).get - 1.0) < 1e-15)
    assert(math.abs(got(("x", "z")).get + 1.0) < 1e-15)
    assert(math.abs(got(("y", "z")).get + 1.0) < 1e-15)
    assert(got(("x", "c")) == None && got(("z", "c")) == None)
    assert(got.size == 6)
    // underscored names must not collide in the internal moment names:
    // (x, y_z) and (x_y, z) would both render _q_x_y_z under name keys
    val und = Seq((1.0, 1.0, 1.0, 9.0), (2.0, 2.0, 2.0, 8.0),
      (3.0, 3.0, 3.0, 7.0)).toDF("x", "y_z", "x_y", "z")
    val u = StatOps.correlationMatrix(und, Seq("x", "y_z", "x_y", "z"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(u.size == 6)
    assert(math.abs(u(("x", "y_z")).get - 1.0) < 1e-15)
    assert(math.abs(u(("x_y", "z")).get + 1.0) < 1e-15)
  }

  test("maseSeasonalNaive: hand errors; constant series gives null") {
    import spark.implicits._
    // season 2 over t = 0..5, v = 10, 20, 12, 26, 14, 20:
    // seasonal errors |12-10|,|26-20|,|14-12|,|20-26| -> sae 16, n 4
    // one-step errors |20-10|,|12-20|,|26-12|,|14-26|,|20-14| -> 50, n 5
    // mase = (16/4) / (50/5) = 0.4
    val s = Seq((1L, 0L, 10.0), (1L, 1L, 20.0), (1L, 2L, 12.0),
      (1L, 3L, 26.0), (1L, 4L, 14.0), (1L, 5L, 20.0))
      .toDF("k", "t", "raw")
      .select($"k", $"t", $"raw".cast("decimal(18,2)").as("v"))
    val got = StatOps.maseSeasonalNaive(s, "k", "t", "v", season = 2)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(got == ((1L, 4L, 5L, Some(0.4))))
    // constant series: naive MAE 0 -> null, never a division error
    val const = Seq((2L, 0L, 5.0), (2L, 1L, 5.0), (2L, 2L, 5.0))
      .toDF("k", "t", "raw")
      .select($"k", $"t", $"raw".cast("decimal(18,2)").as("v"))
    val g2 = StatOps.maseSeasonalNaive(const, "k", "t", "v", season = 1)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(g2 == ((2L, 2L, 2L, None)))
    // one-sided error set: t = {0, 12} at season 12 has a forecast pair
    // but zero consecutive diffs — the key must still report (null mase)
    val oneSided = Seq((3L, 0L, 1.0), (3L, 12L, 9.0))
      .toDF("k", "t", "raw")
      .select($"k", $"t", $"raw".cast("decimal(18,2)").as("v"))
    val g3 = StatOps.maseSeasonalNaive(oneSided, "k", "t", "v", season = 12)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(g3 == ((3L, 1L, 0L, None)))
  }

  test("seasonalDecompose: pure periodic signal recovers exact indices") {
    import spark.implicits._
    // daily value 7 on phase-0 days, 0 otherwise, days 0..13: the
    // 7-window sum is one full period everywhere -> trend = 1.0 exact,
    // raw indices 6 / -1, their mean 0 -> seasonal = 6, -1 x6
    val rows = (0 to 13).map { day =>
      val v = if (day % 7 == 0) 7.0 else 0.0
      (1L, java.sql.Timestamp.valueOf(
        f"1970-01-${day + 1}%02d 12:00:00"), v)
    }
    val got = StatOps.seasonalDecompose(rows.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", period = 7, scale = 1.0)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    // interior days 3..10 -> phases 3..10 mod 7: phase 3 seen twice
    assert(got == Seq(
      (1L, 0L, 1L, 6.0), (1L, 1L, 1L, -1.0), (1L, 2L, 1L, -1.0),
      (1L, 3L, 2L, -1.0), (1L, 4L, 1L, -1.0), (1L, 5L, 1L, -1.0),
      (1L, 6L, 1L, -1.0)))
    // a key with no full window (span < period) is absent
    val short = (0 to 3).map(d =>
      (2L, java.sql.Timestamp.valueOf(f"1970-01-${d + 1}%02d 12:00:00"), 1.0))
    assert(StatOps.seasonalDecompose(short.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", period = 7, scale = 1.0).count() == 0L)
  }

  test("holtLinear: hand recurrence in time order; singleton seeds (x, 0)") {
    import spark.implicits._
    // 8,4,2 @ a=1/4 b=1/2: l=(8,7,5.375), b=(0,-0.5,-1.0625)
    val df = Seq(("a", 3L, 3L, 2.0), ("a", 1L, 1L, 8.0), ("a", 2L, 2L, 4.0),
      ("b", 1L, 9L, 6.0)).toDF("k", "t", "id", "v")
    val got = StatOps.holtLinear(df, "k", "t", "id", "v",
        alpha = 0.25, beta = 0.5)
      .orderBy("k")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 3L, 5.375, -1.0625, 4.3125),
      ("b", 1L, 6.0, 0.0, 6.0)))
  }

  test("ewmaLevel: seeded-at-first recurrence in time order, per key") {
    import spark.implicits._
    // series 8, 4, 2 at alpha 1/4: s1=8, s2=.25*4+.75*8=7, s3=.25*2+.75*7=5.75
    // ts order differs from insert order on purpose
    val df = Seq(("a", 3L, 3L, 2.0), ("a", 1L, 1L, 8.0), ("a", 2L, 2L, 4.0),
      ("b", 1L, 9L, 6.0)).toDF("k", "t", "id", "v")
    val got = StatOps.ewmaLevel(df, "k", "t", "id", "v", alpha = 0.25)
      .orderBy("k").as[(String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("a", 3L, 2.0, 5.75), ("b", 1L, 6.0, 6.0)))
  }

  test("pettittChangepoint: level shift lands K at the step; U_n ≡ 0") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d")
    // user 1: 0,0,0,10,10,10 — W(0-rows)=3, W(10-rows)=−3 →
    //   U = 3,6,9,6,3 → K = 9 at t = 3 (the step sits after index 3)
    // user 2: constant — every U_t = 0, cp = first t
    val df = ((1 to 6).map(i =>
        (1L, ts(i), i.toLong, if (i <= 3) 0.0 else 10.0)) ++
      (1 to 3).map(i => (2L, ts(i), (10 + i).toLong, 7.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val got = StatOps.pettittChangepoint(df, "user_id", "ts", "event_id",
        "value", scale = 1.0)
      .orderBy("user_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 6L, 9L, 3L), (2L, 3L, 0L, 1L)))
  }

  test("pettittChangepoint == brute-force double sum on random series") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d")
    val rnd = new scala.util.Random(1234)
    val rows = for (k <- 1L to 4L; i <- 1 to 20) yield
      (k, ts(i), i.toLong, rnd.nextInt(9).toDouble) // ties guaranteed
    val oracle = rows.groupBy(_._1).map { case (k, rs) =>
      val xs = rs.sortBy(_._3).map(_._4).toIndexedSeq
      val n = xs.length
      val us = (1 until n).map(t =>
        (for (i <- 0 until t; j <- t until n)
          yield java.lang.Long.signum((xs(j) - xs(i)).toLong)).sum.toLong)
      val kstat = us.map(math.abs).max
      (k, (n.toLong, kstat, (us.indexWhere(u => math.abs(u) == kstat) + 1).toLong))
    }
    // brute force uses ALL pairs: last U (t = n would be 0) is excluded
    // by construction on both sides
    val got = StatOps.pettittChangepoint(rows.toDF("user_id", "ts",
        "event_id", "value"), "user_id", "ts", "event_id", "value",
        scale = 1.0)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == oracle)
  }

  test("seasonalMannKendall: per-phase monotone rise sums S and variance") {
    import spark.implicits._
    // 14 daily points, value = day: each of the 7 weekly phases holds a
    // strictly rising 2-point series → S_p = 1, var18_p = 2·1·9 = 18
    // → S = 7, var18 = 126, z = (7−1)/√(126/18) = 6/√7
    def dayTs(d: Int) = new java.sql.Timestamp(d.toLong * 86400000L)
    val df = (0 until 14).map(d => (1L, dayTs(d), d.toLong, d.toDouble))
      .toDF("user_id", "ts", "event_id", "value")
    val got = StatOps.seasonalMannKendall(df, "user_id", "ts", "event_id",
        "value", scale = 1.0, period = 7)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(got == ((1L, 14L, 7L, 7L, 126L,
      Some(6.0 / math.sqrt(126.0 / 18.0)))))
    // and a pure weekly CYCLE (value = phase) scores S = 0 per phase:
    // within each phase the value is constant → every var18_p = 0 → null z
    val cyc = (0 until 14).map(d => (2L, dayTs(d), d.toLong, (d % 7).toDouble))
      .toDF("user_id", "ts", "event_id", "value")
    val c = StatOps.seasonalMannKendall(cyc, "user_id", "ts", "event_id",
        "value", scale = 1.0, period = 7)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(c == ((2L, 14L, 7L, 0L, 0L, None)))
  }

  test("brownForsythe: doubled medians (odd and even n) feed the exact F tree") {
    import spark.implicits._
    // g1 = [0,0,10] (odd: med2 = 0, devs 0,0,20), g2 = [5,5,5] (devs 0)
    val df = Seq(("a", 1L, 0.0), ("a", 2L, 0.0), ("a", 3L, 10.0),
      ("b", 4L, 5.0), ("b", 5L, 5.0), ("b", 6L, 5.0))
      .toDF("g", "id", "v")
    val got = StatOps.brownForsythe(df, "g", "v", "id", scale = 1.0)
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    // replay anovaF's IEEE tree on the doubled deviations
    val tsum = 0.0 + (20.0 * 20.0 / 3.0) + 0.0
    val ssb = tsum - 20.0 * 20.0 / 6.0
    val ssw = 400.0 - tsum
    assert(got == ((2L, 6L, ssb, ssw, Some((ssb / 1.0) / (ssw / 4.0)))))
    // even-n group: [1, 3] → med2 = 4, devs |2−4| = 2 and |6−4| = 2
    val even = Seq(("c", 1L, 1.0), ("c", 2L, 3.0), ("d", 3L, 0.0),
      ("d", 4L, 0.0)).toDF("g", "id", "v")
    val e = StatOps.brownForsythe(even, "g", "v", "id", scale = 1.0)
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    // c devs = [2, 2], d devs = [0, 0]: tsum = 16/2 + 0 = 8, q = 8,
    // ssb = 8 − 16/4 = 4, ssw = 0 → F null (zero within-variance)
    assert(e == ((2L, 4L, 4.0, 0.0, None)))
  }

  test("markovStationaryUnits: hand iterates converge toward the stationary mix") {
    import spark.implicits._
    // P: a→b w.p. 1; b→{a,b} w.p. ½ each. Stationary = (⅓, ⅔).
    // π0 = (u, u) → π1 = (u/2, 3u/2) → π2 = (3u/4, 5u/4)
    //   → π3 = (5u/8, 11u/8) — exact integer divs at u = 10⁶
    val tr = Seq(("a", "b", 2L), ("b", "a", 1L), ("b", "b", 1L))
      .toDF("f", "t", "c")
    val got = StatOps.markovStationaryUnits(tr, "f", "t", "c", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 625000L, "b" -> 1375000L))
    // a sink state receives mass but pushes none (dangling — mass
    // truncates away, the pageRankUnits convention)
    val sink = Seq(("a", "c", 1L)).toDF("f", "t", "c")
    val s2 = StatOps.markovStationaryUnits(sink, "f", "t", "c", iters = 2)
      .as[(String, Long)].collect().toMap
    assert(s2 == Map("a" -> 0L, "c" -> 0L)) // round 1: c = u; round 2: gone
  }

  test("markovStationaryUnits: mass*count overflow guard trips instead of wrapping") {
    import spark.implicits._
    // unit near 2^62 with count 4: round 1 forms p·c > 2^63 — the
    // in-plan raise_error must fire before the silent long wrap
    val tr = Seq(("a", "b", 4L), ("b", "a", 4L)).toDF("f", "t", "c")
    val ex = intercept[Exception] {
      StatOps.markovStationaryUnits(tr, "f", "t", "c", iters = 1,
        unit = Long.MaxValue / 2L).count()
    }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(chain.exists(_.contains("mass*count product exceeds")),
      s"wrong failure: ${ex.getMessage}")
  }

  test("cramerVonMises: textbook two-point case and exact doubled-rank model") {
    import spark.implicits._
    // A={1}, B={2}: U = 1·(1−1)² + 1·(2−1)² = 1 → u4 = 4,
    // T = 1/(1·1·2) − (4−1)/(6·2) = 0.25
    val tiny = Seq((1L, 10L, 1L), (2L, 11L, 0L)).toDF("vq", "event_id", "fa")
    val t0 = StatOps.cramerVonMises(tiny, "fa", "vq", "event_id")
      .as[(Long, Long, java.math.BigDecimal, Double)].collect().head
    assert(t0._1 == 1L && t0._2 == 1L && t0._3.longValueExact == 4L &&
      t0._4 == 0.25)
    // random with heavy ties: replay the exact doubled-rank semantics
    val rnd = new scala.util.Random(99)
    val rows = (1 to 60).map(i =>
      (rnd.nextInt(7).toLong, i.toLong, (i % 3 == 0).compare(false).toLong))
    val sorted = rows.sortBy(r => (r._1, r._2))
    val posOf = sorted.zipWithIndex.map { case (r, p) => r._2 -> (p + 1) }.toMap
    val r2ByV = sorted.groupBy(_._1).map { case (v, g) =>
      v -> (g.map(r => posOf(r._2)).min + g.map(r => posOf(r._2)).max) }
    def within(flag: Long) = sorted.filter(_._3 == flag).zipWithIndex
      .map { case (r, p) => r._2 -> (2L * (p + 1)) }.toMap
    val (wa, wb) = (within(1L), within(0L))
    val ds = rows.map { r =>
      val i2 = if (r._3 == 1L) wa(r._2) else wb(r._2)
      (r._3, r2ByV(r._1) - i2) }
    val na = rows.count(_._3 == 1L).toLong
    val nb = rows.length - na
    val u4 = na * ds.filter(_._1 == 1L).map(d => d._2 * d._2).sum +
      nb * ds.filter(_._1 == 0L).map(d => d._2 * d._2).sum
    val got = StatOps.cramerVonMises(rows.toDF("vq", "event_id", "fa"),
        "fa", "vq", "event_id")
      .as[(Long, Long, java.math.BigDecimal, Double)].collect().head
    assert(got._1 == na && got._2 == nb && got._3.longValueExact == u4)
  }
}
