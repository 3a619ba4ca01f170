package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Seeded-random model checks: each distributed operator is replayed by
  * an independent scalar reference implementation on the driver and the
  * results must match EXACTLY — the same discipline as the DuckDB gate,
  * but over adversarially-shaped random inputs the fixed gate corpus
  * cannot cover (multi-component digraphs, pathological interval nests,
  * repeated grams at many diagonals). */
class RandomModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("pageRankUnits == scalar fixed-point simulation on random digraphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = (1 to n * 3)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .distinct
      val iters = 1 + trial // also exercises the checkpointEvery boundary
      val got = GraphOps
        .pageRankUnits(edges.toDF("s", "t"), "s", "t", iters = iters,
          checkpointEvery = 2)
        .as[(Long, Long)].collect().toMap

      val out = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var r = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.Map[Long, Long]()
          .withDefaultValue(0L)
        out.foreach { case (u, vs) =>
          val c = r(u) / vs.size
          vs.foreach(v => contrib(v) += c)
        }
        r = nodes.map(x => x -> (150000L + 85L * contrib(x) / 100L)).toMap
      }
      assert(got == r, s"trial $trial (n=$n, iters=$iters)")
    }
  }

  test("mergeIntervals == scalar island merge on random nested intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      // wildly varying lengths force containment chains and exact-touch
      val rows = (1 to 120).map { i =>
        val k = s"k${rnd.nextInt(4)}"
        val s = rnd.nextInt(200).toLong
        (k, i.toLong, s, s + (if (rnd.nextBoolean()) rnd.nextInt(50) else rnd.nextInt(5)).toLong)
      }
      val got = IntervalOps
        .mergeIntervals(rows.toDF("k", "id", "s", "e"), "k", "s", "e",
          tieCols = Seq("id"))
        .as[(String, Long, Long, Long, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq

      val oracle = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val sorted = rs.sortBy(r => (r._3, r._2))
        val islands = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long)] // start, end, count
        var maxEnd = Long.MinValue
        sorted.foreach { case (_, _, s, e) =>
          if (islands.isEmpty || s > maxEnd)
            islands += ((s, e, 1L))
          else {
            val (is, ie, c) = islands.last
            islands(islands.size - 1) = (is, math.max(ie, e), c + 1)
          }
          maxEnd = math.max(maxEnd, e)
        }
        islands.zipWithIndex.map { case ((s, e, c), i) =>
          (k, (i + 1).toLong, s, e, c)
        }
      }.sortBy(r => (r._1, r._2))
      assert(got == oracle, s"trial $trial")
    }
  }

  test("bpeMerges == scalar BPE simulation on random small-vocab corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 2) {
      val docs = (1 to 12).map(_ =>
        (1 to 8 + rnd.nextInt(10)).map(_ => s"t${rnd.nextInt(4)}").mkString(" "))
      val got = graft.ops.TextOps
        .bpeMerges(docs.toDF("text"), "text", steps = 3)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq

      // scalar model: same normalize → count pairs → argmax(count desc,
      // pair asc) → leftmost non-overlapping literal replace
      var corpus = docs.map(t => " " + t.trim.split(" +").mkString(" ") + " ")
      val log = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var step = 1
      var stop = false
      while (step <= 3 && !stop) {
        val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        corpus.foreach { t =>
          val k = t.trim.split(" ")
          if (k.length >= 2)
            (0 until k.length - 1).foreach(i => counts(s"${k(i)} ${k(i + 1)}") += 1)
        }
        if (counts.isEmpty) stop = true
        else {
          val (pair, cnt) = counts.toSeq.sortBy { case (p, c) => (-c, p) }.head
          val merged = pair.replace(' ', '+')
          log += ((step, pair, merged, cnt))
          corpus = corpus.map(_.replace(s" $pair ", s" $merged "))
          step += 1
        }
      }
      assert(got == log.toSeq, s"trial $trial")

      // encode∘induce ≡ induction's final corpus: applying the learned
      // table reproduces the scalar model's fully-fused state, and the
      // codegen'd expression agrees with a fold of replace columns
      val ids = docs.indices.map(_.toLong)
      val withId = ids.zip(docs).toDF("id", "text")
      val merges = log.toSeq.map { case (_, pair, merged, _) => (pair, merged) }
      val enc = graft.ops.TextOps.bpeEncode(withId, "id", "text", merges)
        .orderBy("id").select("enc").as[String].collect().toSeq
      assert(enc == corpus.map(_.trim), s"trial $trial encode")
    }
  }

  test("madOutliers == scalar median/MAD model on random contaminated groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val rows = (1L to 200L).map { i =>
      val g = s"g${i % 4}"
      val v = if (i % 23 == 0) 1e6 + rnd.nextInt(100) // planted contamination
        else rnd.nextInt(500).toDouble
      (g, i, v)
    }
    val got = StatOps.madOutliers(rows.toDF("k", "id", "v"), "k", "v", "id")
      .select("id").as[Long].collect().toSet

    def lowerMedian(xs: Seq[(Double, Long)]): Double = {
      val s = xs.sortBy(identity)
      s((s.size + 1) / 2 - 1)._1
    }
    val oracle = rows.groupBy(_._1).values.flatMap { g =>
      val med = lowerMedian(g.map(r => (r._3, r._2)))
      val devs = g.map(r => (math.abs(r._3 - med), r._2))
      val mad = lowerMedian(devs)
      g.filter(r => math.abs(r._3 - med) > 3.0 * mad).map(_._2)
    }.toSet
    assert(got == oracle)
    assert(oracle.nonEmpty, "vacuous: no contamination flagged")
  }

  test("ksStatistic == scalar prefix-count model on random two-sample data") {
    import spark.implicits._
    val rnd = new scala.util.Random(101)
    // shifted distributions + deliberate cross-sample ties
    val rows = (1L to 300L).map { i =>
      val a = i % 3 != 0
      val v = (rnd.nextInt(40) + (if (a) 0 else 8)).toDouble
      (v, i, if (a) 1L else 0L)
    }
    val got = StatOps
      .ksStatistic(rows.toDF("v", "id", "fa"), "fa", "v", "id")
      .as[(Long, Long, Long, Double)].head()

    // classical D: the CDF difference is evaluated only at the final row
    // of each distinct-value block (mid-block prefixes are not CDF steps)
    val sorted = rows.sortBy(r => (r._1, r._2))
    val nA = rows.count(_._3 == 1L).toLong
    val nB = rows.size - nA
    var (ca, cb, dnum) = (0L, 0L, 0L)
    sorted.zipWithIndex.foreach { case ((v, _, fa), i) =>
      if (fa == 1L) ca += 1 else cb += 1
      val lastOfBlock = i == sorted.size - 1 || sorted(i + 1)._1 != v
      if (lastOfBlock) dnum = math.max(dnum, math.abs(ca * nB - cb * nA))
    }
    assert(got == ((nA, nB, dnum, dnum.toDouble / (nA * nB))))
    assert(dnum > 0, "vacuous: identical samples")
  }

  test("ksStatistic reports D = 0 for identical tied samples") {
    import spark.implicits._
    // 2 copies of each value in each arm: per-row prefix evaluation
    // would report D ≈ 0.5 here; the classical statistic is exactly 0.
    val rows = (1L to 80L).map { i =>
      ((i % 10).toDouble, i, if (i <= 40) 1L else 0L)
    }
    val got = StatOps
      .ksStatistic(rows.toDF("v", "id", "fa"), "fa", "v", "id")
      .as[(Long, Long, Long, Double)].head()
    assert(got == ((40L, 40L, 0L, 0.0)))
  }

  test("wasserstein1 == scalar CDF-gap model on random two-sample data") {
    import spark.implicits._
    val rnd = new scala.util.Random(211)
    val rows = (1L to 300L).map { i =>
      val a = i % 3 != 0
      val v = (rnd.nextInt(40) + (if (a) 0 else 8)).toLong
      (v, i, if (a) 1L else 0L)
    }
    val got = StatOps
      .wasserstein1(rows.toDF("v", "id", "fa"), "fa", "v", "id")
      .as[(Long, Long, Long, Double)].head()

    val nA = rows.count(_._3 == 1L).toLong
    val nB = rows.size - nA
    val byV = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var (ca, cb, num) = (0L, 0L, 0L)
    byV.zipWithIndex.foreach { case ((v, g), i) =>
      ca += g.count(_._3 == 1L); cb += g.count(_._3 == 0L)
      if (i < byV.size - 1)
        num += math.abs(ca * nB - cb * nA) * (byV(i + 1)._1 - v)
    }
    assert(got == ((nA, nB, num, num.toDouble / (nA * nB))))
    assert(num > 0, "vacuous: identical samples")
  }

  test("wasserstein1: zero on identical samples, exactly |c| under shift") {
    import spark.implicits._
    val idential = (1L to 80L).map { i =>
      ((i % 10) * 3L, i, if (i <= 40) 1L else 0L)
    }
    val z = StatOps
      .wasserstein1(idential.toDF("v", "id", "fa"), "fa", "v", "id")
      .as[(Long, Long, Long, Double)].head()
    assert(z == ((40L, 40L, 0L, 0.0)))

    // equal-size arms, arm B shifted by +7: W1 is exactly the shift —
    // the location-sensitivity KS/PSI lack, and the reason this metric
    // exists in the drift tier
    val shifted = (1L to 80L).map { i =>
      val a = i <= 40
      val base = (i - 1) % 40 % 10 * 3L
      (if (a) base else base + 7L, i, if (a) 1L else 0L)
    }
    val s = StatOps
      .wasserstein1(shifted.toDF("v", "id", "fa"), "fa", "v", "id")
      .as[(Long, Long, Long, Double)].head()
    assert(s._4 == 7.0, s"expected exact shift 7.0, got ${s._4}")
  }

  test("weightedMedian == scalar cumulative-weight model on random groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val rows = (1L to 300L).map { i =>
      (s"g${i % 5}", (rnd.nextInt(50)).toLong, (rnd.nextInt(9)).toLong, i)
    } // (group, value, weight 0..8 — zeros exercise the exclusion, id)
    val got = StatOps
      .weightedMedian(rows.toDF("g", "v", "w", "id"), "g", "v", "w", "id")
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val oracle = rows.filter(_._3 > 0).groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._4))
      val tot = sorted.map(_._3).sum
      var cw = 0L
      val med = sorted.find { r => cw += r._3; 2 * cw >= tot }.get._2
      g -> ((med, tot))
    }
    assert(got == oracle)
  }

  test("goldenRecords == scalar survivorship model on crafted clusters") {
    import spark.implicits._
    // entity 1 = {1,2,3,4}: names ann/ann/bob/bob — a GENUINE 2-2 tie,
    // won by 'ann' only via the (-count, value) smallest-value
    // tie-break; segs b/a/a/b tie too -> 'a'; max bal 9.0.
    // Entity 5 is a singleton pass-through.
    val df = Seq(
      (1L, "ann", "b", 5.0), (2L, "ann", "a", 9.0), (3L, "bob", "a", 1.0),
      (4L, "bob", "b", 3.0), (5L, "eve", "c", 2.0))
      .toDF("id", "name", "seg", "bal")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 5L))
      .toDF("id", "component")
    val got = graft.ops.LinkageOps
      .goldenRecords(df, "id", labels, modeCols = Seq("name", "seg"),
        maxCols = Seq("bal"))
      .select("entity_id", "n_members", "bal", "name", "seg")
      .as[(Long, Long, Double, String, String)].collect().toSet
    assert(got == Set((1L, 4L, 9.0, "ann", "a"), (5L, 1L, 2.0, "eve", "c")))
  }

  test("mannWhitneyU == scalar tie-averaged rank model on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(113)
    val rows = (1L to 240L).map { i =>
      val a = i % 2 == 0
      // small value domain → heavy ties, the case the doubling exists for
      (rnd.nextInt(12).toDouble, i, if (a) 1L else 0L)
    }
    val got = StatOps
      .mannWhitneyU(rows.toDF("v", "id", "fa"), "fa", "v", "id")
      .as[(Long, Long, Long, Double)].head()

    val sorted = rows.sortBy(r => (r._1, r._2)).zipWithIndex
      .map { case ((v, id, fa), i) => (v, id, fa, (i + 1).toLong) }
    val avg2 = sorted.groupBy(_._1).map { case (v, g) =>
      v -> (g.map(_._4).min + g.map(_._4).max)
    }
    val nA = rows.count(_._3 == 1L).toLong
    val nB = rows.size - nA
    val r2a = sorted.filter(_._3 == 1L).map(r => avg2(r._1)).sum
    val uA = (r2a - nA * (nA + 1)).toDouble / 2.0
    assert(got == ((nA, nB, r2a, uA)))
  }

  test("winsorize == scalar ceil-rank clipping model on random groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(131)
    val rows = (1L to 180L).map { i =>
      (s"g${i % 3}", i, rnd.nextInt(50).toDouble) // heavy ties
    }
    val got = StatOps
      .winsorize(rows.toDF("k", "id", "v"), "k", "v", "id",
        loPct = 10, hiPct = 90)
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._2 -> (r._4, r._5, r._6)).toMap

    val oracle = rows.groupBy(_._1).values.flatMap { g =>
      val sorted = g.map(r => (r._3, r._2)).sortBy(identity)
      val n = sorted.size
      val lo = sorted(math.max(1, (10 * n + 99) / 100) - 1)._1
      val hi = sorted((90 * n + 99) / 100 - 1)._1
      g.map(r => r._2 -> (lo, hi, math.min(math.max(r._3, lo), hi)))
    }.toMap
    assert(got == oracle)
  }

  test("capPerGroup == scalar hash-priority selection") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i, s"g${i % 3}"))
    val got = graft.ops.CorpusOps
      .capPerGroup(rows.toDF("id", "g"), "id", "g", n = 7, salt = "s")
      .select("id").as[Long].collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long) = md.digest(s"s:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val oracle = rows.groupBy(_._2).values.flatMap { g =>
      g.map(_._1).sortBy(i => (h(i), i)).take(7)
    }.toSet
    assert(got == oracle)
  }

  test("substringSpanPairs == brute-force diagonal runs on random repetitive text") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val k = 3; val minLen = 5
    // tiny vocabulary → heavy accidental gram collisions at many diagonals
    def doc(n: Int) = (1 to n).map(_ => s"w${rnd.nextInt(6)}")
    val base = doc(30)
    val docs = (1L to 8L).map { i =>
      // even docs embed a random slice of doc 1 at a random offset →
      // guaranteed planted spans on top of the accidental collisions
      val body =
        if (i % 2 == 0) {
          val from = rnd.nextInt(10); val len = 6 + rnd.nextInt(12)
          doc(rnd.nextInt(8)) ++ base.slice(from, from + len) ++ doc(rnd.nextInt(8))
        } else if (i == 1L) base
        else doc(12 + rnd.nextInt(14))
      (i, body.mkString(" "))
    }
    val got = DedupOps
      .substringSpanPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = k, minLen = minLen, maxGramFreq = None)
      .as[(Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2, r._3, r._4)).toSeq

    val toks = docs.map { case (i, t) => i -> t.split(" +") }.toMap
    def grams(id: Long) = {
      val t = toks(id)
      (0 to t.length - k).map(p => (p + 1).toLong -> t.slice(p, p + k).mkString(" "))
    }
    val oracle = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      ga = grams(a); gb = grams(b)
      matches = for ((pa, s1) <- ga; (pb, s2) <- gb if s1 == s2)
        yield (pa, pa - pb)
      (diag, ps) <- matches.groupBy(_._2).toSeq
      run <- {
        val sorted = ps.map(_._1).sorted
        val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[Long]]
        sorted.foreach { p =>
          if (runs.nonEmpty && p == runs.last.last + 1)
            runs(runs.size - 1) = runs.last :+ p
          else runs += Vector(p)
        }
        runs
      }
      spanLen = run.size + k - 1 if spanLen >= minLen
    } yield (a, b, run.head, run.head - diag, spanLen.toLong))
      .sortBy(r => (r._1, r._2, r._3, r._4))
    assert(got == oracle)
    assert(oracle.nonEmpty, "vacuous: random corpus produced no spans")
  }
}
