package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, T}
import graft.expr.{Fingerprint64, SimHash64, WinnowSet}

class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("crossSourceDupMatrix: canonical unordered rollup, duplicate pairs collapse") {
    import spark.implicits._
    val docs = Seq((1L, "s1"), (2L, "s2"), (3L, "s1"), (4L, "s3"))
      .toDF("doc_id", "source")
    val pairs = Seq((1L, 2L), (1L, 2L), (1L, 3L), (4L, 2L))
      .toDF("a", "b")
    val got = DedupOps
      .crossSourceDupMatrix(docs, "doc_id", "source", pairs)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("s1", "s1", 1L), ("s1", "s2", 1L), ("s2", "s3", 1L)))
    // a pair end missing from docs surfaces, never silently shrinks
    val orphan = DedupOps
      .crossSourceDupMatrix(docs, "doc_id", "source",
        Seq((1L, 99L)).toDF("a", "b"))
      .as[(String, String, Long)].collect()
    assert(orphan.toSeq == Seq(("<unmatched>", "s1", 1L)))
  }

  test("exact dedupe collapses crafted duplicates to min id") {
    import spark.implicits._
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = DedupOps.exactDedup(df, "doc_id", Seq(col("text")))
      .select("doc_id", "n_dupes").orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (3L, 1L)))
  }

  test("ngram Jaccard finds a crafted near-dup and skips unrelated") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"), // one token differs -> high jaccard
      (3L, "z y x w v u t s r q"))
      .toDF("doc_id", "text")
    val pairs = DedupOps
      .ngramJaccardPairs(df, "doc_id", "text", k = 3, threshold = 0.5)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
  }

  test("minhash LSH recalls every exact-Jaccard pair on the corpus") {
    val docs = T(spark, sf, "documents")
    val exact = DedupOps
      .ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps
      .minhashLshPairs(docs, "doc_id", "text", 3, 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact, s"LSH missed ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("simhash pairs recall the planted near-dups at hamming<=3") {
    val docs = T(spark, sf, "documents")
    val pairs = DedupOps.simhashPairs(docs, "doc_id", "text", 3).collect()
    // near-identical texts must land at tiny hamming distance
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Int]("hamming") <= 3))
  }

  test("simhash of identical token arrays is identical, near for near") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(s: String*) =
      new GenericArrayData(s.map(UTF8String.fromString).toArray[Any])
    val a = SimHash64.compute(arr("a", "b", "c", "d"))
    val b = SimHash64.compute(arr("a", "b", "c", "d"))
    val c = SimHash64.compute(arr("a", "b", "c", "e"))
    assert(a == b)
    assert(SimHash64.hamming(a, c) > 0 && SimHash64.hamming(a, c) < 32)
  }

  test("fingerprint is deterministic and shift-tolerant") {
    import org.apache.spark.unsafe.types.UTF8String
    val f1 = Fingerprint64.compute(UTF8String.fromString("hello world of data"), 8)
    val f2 = Fingerprint64.compute(UTF8String.fromString("hello world of data"), 8)
    // winnowing min-hash survives a prefix insertion when the minimizing
    // k-gram is untouched
    val f3 = Fingerprint64.compute(UTF8String.fromString("XX hello world of data"), 8)
    assert(f1 == f2)
    assert(f1 == f3 || f1 != 0L)
  }

  test("winnow set: edges, robustness to edits, contains the global min") {
    import org.apache.spark.unsafe.types.UTF8String
    def ws(s: String, k: Int = 8, w: Int = 4): Seq[Long] =
      WinnowSet.compute(UTF8String.fromString(s), k, w).toLongArray().toSeq
    // edges: empty text -> empty set; short text -> single seed-1 hash
    assert(ws("") == Seq.empty)
    assert(ws("tiny") ==
      Seq(graft.expr.Hash64.hashBytes("tiny".getBytes("UTF-8"), 1L)))
    // sorted ascending, distinct, deterministic
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val set = ws(text)
    assert(set == set.sorted && set.distinct == set && set == ws(text))
    // the global minimum gram hash (Fingerprint64) is always selected:
    // every gram position is covered by some window
    assert(set.min == Fingerprint64.compute(UTF8String.fromString(text), 8))
    // robustness: a point edit disturbs only the windows it touches, so
    // most fingerprints survive (the property exact-hash dedup lacks)
    val edited = text.replace("jumps", "leaps")
    val overlap = (set.toSet intersect ws(edited).toSet).size.toDouble / set.size
    assert(overlap > 0.5, s"winnowing should be edit-robust, overlap=$overlap")
  }

  test("incremental delta-vs-corpus pairs == full pairs restricted to cross-side") {
    import spark.implicits._
    // planted near-dups BOTH across the base/delta boundary (1~2, 4~7)
    // and within one side (1~3 base×base, 5~7 delta×delta) — the latter
    // must NOT appear in the incremental result
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"), // ~1 (cross: odd vs even? 1 odd, 2 even)
      (3L, "a b c d e f g h i l"), // ~1 (odd-odd: within delta)
      (4L, "p q r s t u v w x y"),
      (5L, "m n o aa bb cc dd ee ff gg"),
      (7L, "p q r s t u v w x z"), // ~4 (cross), and 5~7 unrelated
      (6L, "zz yy xx ww vv uu tt ss rr qq"))
      .toDF("doc_id", "text")
    val base = docs.filter(col("doc_id") % 2 === 0)
    val delta = docs.filter(col("doc_id") % 2 === 1)

    val full = DedupOps
      .ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = full.collect {
      case (a, b, j) if a % 2 != b % 2 =>
        (if (a % 2 == 0) a else b, if (a % 2 == 0) b else a, j)
    }.toSet
    assert(expected.nonEmpty, "fixture must have cross-side pairs")
    assert(full.exists(p => p._1 % 2 == p._2 % 2),
      "fixture must have within-side pairs the incremental op excludes")

    val between = DedupOps
      .ngramJaccardPairsBetween(base, delta, "doc_id", "text",
        k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(between == expected)
  }

  test("winnow pairs: catches a REORDERED near-dup, caps hot fingerprints") {
    import spark.implicits._
    val s1 = "the quick brown fox jumps over the lazy dog in the park"
    // sentence-reordered variant: token-shingle Jaccard on 3-grams drops
    // (crossings break shingles) but byte-gram winnow fingerprints mostly
    // survive — the MOSS property this operator exists for
    val s2 = "in the park the quick brown fox jumps over the lazy dog"
    val df = Seq((1L, s1), (2L, s2), (3L, "completely unrelated content xyzq"))
      .toDF("doc_id", "text")
    val pairs = DedupOps
      .winnowPairs(df, "doc_id", "text", k = 8, w = 4, minShared = 3)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)

    // df cap: a fingerprint present in EVERY doc (shared boilerplate) is
    // dropped before the join, so boilerplate alone cannot pair documents
    val boiler = "standard header boilerplate text here"
    val bdf = (1L to 6L).map(i => (i, s"$boiler unique tail $i ${i * 7}"))
      .toDF("doc_id", "text")
    val uncapped = DedupOps
      .winnowPairs(bdf, "doc_id", "text", minShared = 3).count()
    val capped = DedupOps
      .winnowPairs(bdf, "doc_id", "text", minShared = 3,
        maxFpFreq = Some(3)).count()
    assert(uncapped > 0, "shared boilerplate pairs everything uncapped")
    assert(capped == 0, "df-capped fingerprints drop the boilerplate pairs")
  }

  test("LSH top-k recall vs brute force is measured and sane") {
    val emb = T(spark, sf, "embeddings")
    val brute = SimilarityOps
      .bruteForceTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps
      .lshTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(f"LSH top-k recall vs brute force: $recall%.2f")
    // random-ish embeddings are the hardest case for LSH; just require the
    // machinery to produce ranked candidates for every query
    assert(lsh.map(_._1) == brute.map(_._1))
  }

  test("hardNegatives: never a same-label pair; recall vs brute-force mine") {
    val emb = T(spark, sf, "embeddings")
    val out = SimilarityOps
      .hardNegatives(emb.filter(col("vec_id") < 8), emb,
        "vec_id", "embedding", "label", k = 5)
    // label contract: join both sides back to labels, assert mismatch
    val lab = emb.select(col("vec_id"), col("label"))
    val sameLabel = out
      .join(lab.withColumnRenamed("vec_id", "qid")
        .withColumnRenamed("label", "ql"), "qid")
      .join(lab.withColumnRenamed("vec_id", "nid")
        .withColumnRenamed("label", "nl"), "nid")
      .filter(col("ql") === col("nl")).count()
    assert(sameLabel == 0L, "a hard negative must carry a different label")
    // recall vs the exact diff-label mine (brute force + label filter)
    val bruteAll = SimilarityOps
      .bruteForceTopK(emb.filter(col("vec_id") < 8), emb,
        "vec_id", "embedding", k = 500) // all pairs, ranked
      .join(lab.withColumnRenamed("vec_id", "qid")
        .withColumnRenamed("label", "ql"), "qid")
      .join(lab.withColumnRenamed("vec_id", "nid")
        .withColumnRenamed("label", "nl"), "nid")
      .filter(col("ql") =!= col("nl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    val brute = bruteAll
      .withColumn("r", row_number().over(w)).filter(col("r") <= 5)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    info(f"hard-negative recall vs brute-force mine: $recall%.2f")
    assert(got.map(_._1) == brute.map(_._1),
      "every query must yield ranked negatives")
  }

  test("contrastiveTriplets: exact winners on planted duplicate clusters") {
    import spark.implicits._
    // two orthogonal directions, four exact copies each, labels split
    // 2/2 within a direction — every anchor has an exact-duplicate
    // same-label positive (cos 1) and exact-duplicate diff-label
    // negative (cos 1); ties break to the smaller nid
    val rows =
      Seq((0L, Array(1.0f, 0f), 0), (1L, Array(1.0f, 0f), 0),
        (2L, Array(1.0f, 0f), 1), (3L, Array(1.0f, 0f), 1),
        (10L, Array(0f, 1.0f), 0), (11L, Array(0f, 1.0f), 0),
        (12L, Array(0f, 1.0f), 1), (13L, Array(0f, 1.0f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val got = SimilarityOps
      .contrastiveTriplets(emb, "vec_id", "embedding", "label")
      .orderBy("qid")
      .as[(Long, Long, Double, Long, Double)].collect().toSeq
    val want = Seq(
      (0L, 1L, 1.0, 2L, 1.0), (1L, 0L, 1.0, 2L, 1.0),
      (2L, 3L, 1.0, 0L, 1.0), (3L, 2L, 1.0, 0L, 1.0),
      (10L, 11L, 1.0, 12L, 1.0), (11L, 10L, 1.0, 12L, 1.0),
      (12L, 13L, 1.0, 10L, 1.0), (13L, 12L, 1.0, 10L, 1.0))
    assert(got == want, s"got $got")
  }

  test("IVF top-k: exact-verified subset of brute force, recall measured") {
    val emb = T(spark, sf, "embeddings")
    val brute = SimilarityOps
      .bruteForceTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps
      .ivfTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 10,
        nlist = 16, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(f"IVF top-k recall vs brute force (nprobe=4/16): $recall%.2f")
    // every query must yield ranked candidates; IVF candidates re-rank
    // exactly, so any overlap with brute force is position-consistent
    assert(ivf.map(_._1) == brute.map(_._1))
  }

  test("IVF-PQ top-k: recall vs exact L2 measured, codes not vectors") {
    val emb = T(spark, sf, "embeddings")
    // exact-L2 baseline computed scalar-side (ivfPqTopK ranks by
    // approximate squared L2, the classical PQ metric — not cosine)
    val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2TopK(qid: Long, k: Int): Set[Long] = {
      val q = vecs(qid)
      vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) =>
          val d = v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, id)
        }
        .sortBy(identity).take(k).map(_._2).toSet
    }
    val brute = (0L until 5L).flatMap(q => l2TopK(q, 10).map(q -> _)).toSet
    val pq = SimilarityOps
      .ivfPqTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
        k = 10, nlist = 16, nprobe = 4, m = 4, ksub = 16)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect pq).size.toDouble / brute.size
    info(f"IVF-PQ top-k recall vs exact L2 (nprobe=4/16, m=4, ksub=16): $recall%.2f")
    assert(pq.map(_._1) == brute.map(_._1)) // every query produced rows
    assert(recall > 0.1, s"degenerate recall $recall")
  }

  test("sq8Encode: reconstruction error bounded by one quantization step") {
    val emb = T(spark, sf, "embeddings")
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dims = vecs.values.head.length
    val mn = (0 until dims).map(d => vecs.values.map(_(d)).min)
    val mx = (0 until dims).map(d => vecs.values.map(_(d)).max)
    val codes = SimilarityOps.sq8Encode(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == vecs.size)
    codes.foreach { case (id, cs) =>
      assert(cs.length == dims)
      cs.zipWithIndex.foreach { case (c, d) =>
        assert(c >= 0 && c <= 255)
        val step = (mx(d) - mn(d)) / 255.0
        val recon = mn(d) + c * step
        assert(math.abs(recon - vecs(id)(d)) <= step + 1e-12,
          s"vec $id dim $d: |${vecs(id)(d)} - $recon| > step $step")
      }
    }
  }

  test("semDedup: perfect recall on planted clusters, sound drops on the corpus") {
    import spark.implicits._
    // PLANTED: two tight direction-clusters seeded by the first-ids
    // centroids (ids 0/1 = the nlist=2 quantizer), members near-parallel
    // to a seed. Near-identical vectors share a cosine-argmax centroid,
    // so every planted pair co-clusters and drop recall is exactly 1.
    val crafted = Seq(
      (0L, Array(10.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 10.0, 0.0, 0.0)),
      (2L, Array(10.0, 0.1, 0.0, 0.0)),
      (3L, Array(10.2, 0.0, 0.1, 0.0)),
      (4L, Array(0.0, 10.1, 0.1, 0.0)),
      (5L, Array(0.1, 9.9, 0.0, 0.0))).toDF("vec_id", "embedding")
    val sem = SimilarityOps
      .semDedup(crafted, "vec_id", "embedding", nlist = 2, threshold = 0.95)
      .collect()
    assert(sem.length == 6, "every vector gets a keep/drop verdict")
    val kept = sem.filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("id")).toSet
    assert(kept == Set(0L, 1L),
      s"cluster minima survive, higher-id members drop; kept = $kept")
    val cids = sem.map(r => r.getAs[Long]("id") -> r.getAs[Long]("cid")).toMap
    assert(Set(2L, 3L).forall(cids(_) == cids(0L)) &&
      Set(4L, 5L).forall(cids(_) == cids(1L)), "members co-cluster with seeds")

    // CORPUS: no near-identical embeddings are planted (max pairwise
    // cosine ~0.48 at this SF), so borderline 0.45-pairs needn't
    // co-cluster — recall is a measured trade here, not an invariant.
    // What IS invariant: within-cluster pairs are a subset of the exact
    // pair set, so every drop must be justified by an exact pair.
    val emb = T(spark, sf, "embeddings")
    val t = 0.45
    val exact = DedupOps
      .embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = t)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain cosine near-dups at 0.45")
    val corpus = SimilarityOps
      .semDedup(emb, "vec_id", "embedding", nlist = 16, threshold = t)
      .collect()
    assert(corpus.length == emb.count())
    val dropped = corpus.filter(!_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("id")).toSet
    dropped.foreach { b =>
      assert(exact.exists(_._2 == b),
        s"dropped id $b has no exact near-dup pair justifying the drop")
    }
    val recall = exact.count { case (_, b) => dropped(b) }.toDouble / exact.size
    info(f"corpus drop recall vs exact 0.45-pairs: $recall%.2f " +
      s"(${dropped.size} dropped of ${corpus.length})")
  }

  test("semDedupBetween == semDedup on the union restricted to cross-side verdicts") {
    import spark.implicits._
    // Fixture where the restriction is EXACT: base ids (0..3) all precede
    // delta ids (100..103), so the union's internal first-ids centroids
    // ARE the explicit base codebook, and delta vectors are mutually far
    // (no delta×delta pair clears the threshold), so every batch drop of
    // a delta row is justified by a BASE neighbor — precisely the pair
    // leg the between operator keeps. Under those two conditions the
    // per-ingest operator must agree verdict-for-verdict with the batch
    // operator run on base ∪ delta.
    val base = Seq(
      (0L, Array(10.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 10.0, 0.0, 0.0)),
      (2L, Array(10.0, 0.1, 0.0, 0.0)),
      (3L, Array(0.1, 9.9, 0.0, 0.0))).toDF("vec_id", "embedding")
    val delta = Seq(
      (100L, Array(10.1, 0.0, 0.05, 0.0)), // near base 0/2 -> dropped
      (101L, Array(0.0, 0.0, 10.0, 0.0)),  // orthogonal -> kept
      (102L, Array(0.0, 10.05, 0.1, 0.0)), // near base 1/3 -> dropped
      (103L, Array(0.0, 0.0, 0.0, 10.0))   // orthogonal -> kept
    ).toDF("vec_id", "embedding")
    val cb = SimilarityOps.firstIdsCodebook(base, "vec_id", "embedding", 2)
    val between = SimilarityOps
      .semDedupBetween(base, delta, "vec_id", "embedding", cb, 0.95)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("cid"), r.getAs[Boolean]("kept")))).toMap
    assert(between.keySet == Set(100L, 101L, 102L, 103L),
      "between reports exactly the delta rows")
    assert(between.filter(_._2._2).keySet == Set(101L, 103L),
      s"planted near-dups drop, orthogonal rows survive: $between")
    val full = SimilarityOps
      .semDedup(base.unionByName(delta), "vec_id", "embedding",
        nlist = 2, threshold = 0.95)
      .filter(col("id") >= 100L)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("cid"), r.getAs[Boolean]("kept")))).toMap
    assert(between == full,
      s"between diverged from the restricted batch run: $between vs $full")

    // Corpus soundness (the semDedup invariant one tier up): cross-side
    // candidate pairs are a subset of the exact cross-side pair set, so
    // every dropped delta id must be justified by an exact base×delta
    // cosine pair — never by a delta×delta one.
    val emb = T(spark, sf, "embeddings")
    val evens = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val odds = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val t = 0.45
    val exactCross = DedupOps
      .embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = t)
      .filter(pmod(col("a"), lit(2)) =!= pmod(col("b"), lit(2)))
      .collect()
      .map(r => Set(r.getAs[Long]("a"), r.getAs[Long]("b"))
        .filter(_ % 2 == 1).head).toSet
    val corpus = SimilarityOps
      .semDedupBetween(evens, odds, "vec_id", "embedding",
        SimilarityOps.firstIdsCodebook(evens, "vec_id", "embedding", 32), t)
      .collect()
    assert(corpus.length == odds.count(),
      "every delta row gets a verdict")
    val dropped = corpus.filter(!_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("id")).toSet
    dropped.foreach { b =>
      assert(exactCross(b),
        s"dropped delta id $b has no exact cross-side pair justifying it")
    }
    info(s"corpus: ${dropped.size} of ${corpus.length} delta rows dropped; " +
      s"${exactCross.size} odd ids have exact cross-side 0.45-pairs")
  }

  test("semDedupBetween accepts a kmeans-trained codebook and stays sound") {
    // the scaladoc's drop-in claim, exercised: kmeansCodebook emits
    // (cid, centv) without centn, semDedupBetween derives the norm.
    // Soundness is codebook-INDEPENDENT (candidate pairs are real
    // cosine pairs >= threshold, a subset of the exact cross-side pair
    // set, whatever the clustering recall), so the same invariant the
    // first-ids corpus leg pins must hold under the trained artifact.
    val emb = T(spark, sf, "embeddings")
    val evens = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val odds = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val t = 0.45
    val cb = SimilarityOps.kmeansCodebook(evens, "vec_id", "embedding",
      nlist = 16, iters = 2)
    val verdicts = SimilarityOps
      .semDedupBetween(evens, odds, "vec_id", "embedding", cb, t)
      .collect()
    assert(verdicts.length == odds.count(),
      "one verdict per delta row under the trained codebook")
    val exactCross = DedupOps
      .embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = t)
      .filter(pmod(col("a"), lit(2)) =!= pmod(col("b"), lit(2)))
      .collect()
      .map(r => Set(r.getAs[Long]("a"), r.getAs[Long]("b"))
        .filter(_ % 2 == 1).head).toSet
    val dropped = verdicts.filter(!_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("id")).toSet
    dropped.foreach { b =>
      assert(exactCross(b),
        s"trained codebook dropped delta id $b without an exact " +
          "cross-side pair justifying it")
    }
    info(s"trained codebook: ${dropped.size} of ${verdicts.length} " +
      s"delta rows dropped (exact cross-side pair ids: ${exactCross.size})")
  }

  test("PQ/SQ8 gate codes parse back: sq8 within one step, pq in range") {
    val sfDir = sf
    val emb = T(spark, sfDir, "embeddings")
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dims = vecs.values.head.length
    val mn = (0 until dims).map(d => vecs.values.map(_(d)).min)
    val mx = (0 until dims).map(d => vecs.values.map(_(d)).max)
    // the STRINGIFIED gate surface (what the external comparator hashes)
    // must decode back to codes that reconstruct within one step
    val sq8 = graft.SparkEntry.queries("sim_sq8_encode")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("codes")).toMap
    assert(sq8.size == vecs.size)
    sq8.foreach { case (id, s) =>
      val cs = s.split(",").map(_.toInt)
      assert(cs.length == dims, s"vec $id: ${cs.length} codes != $dims dims")
      cs.zipWithIndex.foreach { case (c, d) =>
        val step = (mx(d) - mn(d)) / 255.0
        assert(c >= 0 && c <= 255)
        assert(math.abs(mn(d) + c * step - vecs(id)(d)) <= step + 1e-12)
      }
    }
    val pq = graft.SparkEntry.queries("sim_pq_encode")(spark, sfDir)
      .collect()
    assert(pq.length == vecs.size)
    pq.foreach { r =>
      val cs = r.getAs[String]("codes").split(",").map(_.toInt)
      assert(cs.length == 4, "m = 4 subspace codes per vector")
      assert(cs.forall(c => c >= 0 && c < 16), "codes index the ksub=16 codebook")
      val cid = r.getAs[Long]("cid")
      assert(cid >= 0 && cid < 16, "coarse list id indexes the nlist=16 centroids")
    }
  }

  test("IVF-PQ with a k-means-trained coarse codebook is a drop-in") {
    val emb = T(spark, sf, "embeddings")
    val codebook = SimilarityOps
      .kmeansCodebook(emb, "vec_id", "embedding", nlist = 16, iters = 2)
    val pq = SimilarityOps
      .ivfPqTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
        k = 10, nlist = 16, nprobe = 4, m = 4, ksub = 16,
        coarse = Some(codebook))
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // same plan, different centroid table: every query still ranks rows
    assert(pq.map(_._1).toSet == Set(0L, 1L, 2L, 3L, 4L))
    assert(pq.length == pq.distinct.length)
  }

  test("k-means-trained IVF codebook: valid centroids, recall measured") {
    val emb = T(spark, sf, "embeddings")
    val codebook = SimilarityOps
      .kmeansCodebook(emb, "vec_id", "embedding", nlist = 16, iters = 2)
    val cents = codebook.collect()
    assert(cents.length == 16)
    assert(cents.forall(_.getSeq[Double](1).length == 64))
    val brute = SimilarityOps
      .bruteForceTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps
      .ivfTopKWithCodebook(emb.filter(col("vec_id") < 5), emb, codebook,
        "vec_id", "embedding", k = 10, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(f"trained-IVF top-k recall vs brute force (nprobe=4/16): $recall%.2f")
    assert(ivf.map(_._1) == brute.map(_._1))
  }

  test("banded cosine near-dup: exact-verified subset of brute force, recall measured") {
    val emb = T(spark, sf, "embeddings")
    val exact = DedupOps
      .embeddingNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = SimilarityOps
      .bandedCosineNearDup(emb, "vec_id", "embedding", 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact-cosine verify guarantees precision 1.0: every banded pair
    // must also be an exact pair
    assert((banded -- exact).isEmpty, s"false positives: ${banded -- exact}")
    if (exact.nonEmpty) {
      val recall = (banded intersect exact).size.toDouble / exact.size
      info(f"banded near-dup recall vs exhaustive at cos>=0.4: $recall%.2f")
    }
  }

  test("capped ngram Jaccard is exact on low-frequency shingles") {
    import spark.implicits._
    // doc 4/5 share only the hot shingle ("x y z" in every doc) — the cap
    // must drop it, so 4/5 no longer pair while 1/2 (unique overlap) stay
    val df = Seq(
      (1L, "a b c d e x y z"),
      (2L, "a b c d f x y z"),
      (3L, "p q r s t x y z"),
      (4L, "x y z"),
      (5L, "x y z"))
      .toDF("doc_id", "text")
    val capped = DedupOps
      .ngramJaccardPairs(df, "doc_id", "text", 3, 0.2, maxShingleFreq = Some(3))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 2L)))
    assert(!capped.exists(p => p._1 == 4L || p._2 == 4L || p._2 == 5L))
  }

  test("containmentPairs: subset scores 1.0 forward, |A∩B|/|A| backward") {
    import spark.implicits._
    // d1's 3 shingles all sit inside d2 (5 shingles): C(1→2) = 1.0,
    // C(2→1) = 3/5 — the asymmetry Jaccard (3/5 here, sub-threshold
    // at 0.8) cannot express. d3 shares nothing.
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e f g"),
      (3L, "x y z"))
      .toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(df, "doc_id", "text", 3, 0.6)
      .orderBy("src", "dst")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L, 3L, 1.0), (2L, 1L, 3L, 5L, 0.6)))
    // a higher floor keeps only the subset direction
    val strict = DedupOps.containmentPairs(df, "doc_id", "text", 3, 0.9)
      .select("src", "dst")
      .as[(Long, Long)].collect().toSeq
    assert(strict == Seq((1L, 2L)))
    DedupOps.clearShingleCache()
  }

  test("embeddingCovariance: hand moments on the 2-D case") {
    import spark.implicits._
    // vectors (1,2), (3,4) at scale 1: every cov entry is exactly 1.0
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.ops.SimilarityOps
      .embeddingCovariance(df, "vec_id", "embedding", scale = 1.0)
      .orderBy("i", "j")
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(got == Seq((0, 0, 2L, 1.0), (0, 1, 2L, 1.0), (1, 1, 2L, 1.0)))
    // anti-correlated second dim: (1,4), (3,2) → cov01 = -1
    val df2 = Seq((1L, Seq(1.0f, 4.0f)), (2L, Seq(3.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val g2 = graft.ops.SimilarityOps
      .embeddingCovariance(df2, "vec_id", "embedding", scale = 1.0)
      .orderBy("i", "j")
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(g2.map(_._4) == Seq(1.0, -1.0, 1.0))
  }

  test("powerIterationPC: exact scalar replica on the 2-D case") {
    import spark.implicits._
    // covariance of (1,2),(3,4) at scale 1 is [[1,1],[1,1]] (proved in
    // the covariance test); top eigenpair is (1,1)/sqrt2 with lambda 2
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.ops.SimilarityOps
      .powerIterationPC(df, "vec_id", "embedding", iters = 3, scale = 1.0)
      .orderBy("i")
      .as[(Int, Double, Double)].collect().toSeq
    // scalar replica with the SAME pinned fold order
    val c = Array(Array(1.0, 1.0), Array(1.0, 1.0))
    var v = Array(1.0, 1.0)
    def mv(x: Array[Double]) =
      Array(c(0)(0) * x(0) + c(0)(1) * x(1), c(1)(0) * x(0) + c(1)(1) * x(1))
    for (_ <- 1 to 3) {
      val w = mv(v)
      val n2 = w(0) * w(0) + w(1) * w(1)
      v = w.map(_ / math.sqrt(n2))
    }
    val u = mv(v)
    val lam = v(0) * u(0) + v(1) * u(1)
    assert(got == Seq((0, v(0), lam), (1, v(1), lam)))
    assert(math.abs(lam - 2.0) < 1e-12 && got(0)._2 == got(1)._2)
    // drop the staged covariance frame: the LRU-accounting test below
    // baselines on getPersistentRDDs and lingering frames skew it
    graft.ops.SimilarityOps.clearCovCache()
  }

  test("staging caches are LRU-bounded and unpersist evicted frames") {
    import spark.implicits._
    DedupOps.clearShingleCache()
    val base = spark.sparkContext.getPersistentRDDs.size
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
    // 12 distinct (frame, params) combos through an 8-entry cache: the
    // oldest 4 must be evicted AND their persisted blocks released.
    // Leak accounting tracks the SPECIFIC RDD ids this test creates —
    // prior tests' checkpoint RDDs get reclaimed asynchronously by the
    // ContextCleaner mid-test, so raw before/after counts both
    // over-count (stale blocks) and under-count (concurrent reclaim)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    for (k <- 1 to 12)
      DedupOps.sharedShingles(docs, "doc_id", "text", k).count()
    assert(DedupOps.shingleCache.size == 8)
    val mine = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(mine.size <= 8,
      s"evicted frames must unpersist (found ${mine.size} new persisted RDDs)")
    // hot key stays resident across re-access (LRU, not FIFO)
    DedupOps.sharedShingles(docs, "doc_id", "text", 12).count()
    DedupOps.sharedShingles(docs, "doc_id", "text", 5).count() // re-stage
    assert(DedupOps.shingleCache.size == 8)
    // re-snapshot: the re-stage above created a fresh RDD id not in
    // `mine`; leak accounting must cover every id this test created
    val mine2 = spark.sparkContext.getPersistentRDDs.keySet -- before
    DedupOps.clearShingleCache()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet
      .intersect(mine2)
    assert(leaked.isEmpty,
      s"clearShingleCache must release this test's blocks (leaked: $leaked)")
  }

  test("prefix filter is lossless on random high-collision corpora") {
    import spark.implicits._
    // tiny vocabulary + short docs force shared shingles, borderline
    // Jaccard values, and sub-k docs (whole-text shingles) — the corners
    // where a wrong prefix length or positional bound silently drops
    // pairs. Fixed seeds keep the draws reproducible.
    for (seed <- Seq(1, 2, 3); threshold <- Seq(0.5, 0.8)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
      // random high-collision texts, every 5th doc a planted near-dup of
      // its predecessor (previous text + one token) so exact pairs exist
      // at every threshold; the purely random rest supplies borderline
      // and sub-threshold pairs
      val texts = scala.collection.mutable.ArrayBuffer.empty[String]
      for (i <- 0 until 60) {
        val len = 2 + rnd.nextInt(10)
        val t = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        texts += (if (i % 5 == 0 && i > 0) texts(i - 1) + " " + vocab.head
                  else t)
      }
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i + 1L, t) }.toSeq.toDF("doc_id", "text")
      def norm(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val exact = norm(DedupOps.ngramJaccardPairs(
        docs, "doc_id", "text", k = 3, threshold = threshold))
      val pf = norm(DedupOps.prefixFilterJaccardPairs(
        docs, "doc_id", "text", k = 3, threshold = threshold))
      assert(exact.nonEmpty, s"seed=$seed t=$threshold: vacuous draw")
      assert(pf == exact,
        s"seed=$seed t=$threshold: missed ${exact -- pf}, extra ${pf -- exact}")
    }
  }

  test("multimodal decode: real-codec metadata is typed per modality") {
    val media = MultimodalOps.mediaFromDocumentsReal(T(spark, sf, "documents"))
    val out = MultimodalOps.decodeReal(media)
    val img = out.filter(col("modality") === "image")
    val aud = out.filter(col("modality") === "audio")
    val vid = out.filter(col("modality") === "video")
    assert(img.filter(col("width").isNull || col("mean_r").isNull).count() == 0)
    assert(img.filter(col("duration_ms").isNotNull).count() == 0)
    assert(aud.filter(col("sample_rate").isNull || col("rms").isNull).count() == 0)
    assert(vid.filter(col("n_frames").isNull || col("duration_ms").isNull).count() == 0)
  }

  test("imageNearDupPairs: brightness-shifted copy found at hamming 0, distinct image not") {
    import spark.implicits._
    def bmp(shift: Int, flip: Boolean): Array[Byte] =
      MediaCodecs.encodeBmp24(18, 16, (x, y) => {
        val v = (if (flip) 10 * (17 - x) + 3 * y else 10 * x + 3 * y) + shift
        (v, v, v)
      })
    val media = Seq(
      (1L, "image", bmp(0, flip = false)),
      (2L, "image", bmp(40, flip = false)), // re-graded copy of 1
      (3L, "image", bmp(0, flip = true)), //   different picture
      (4L, "image", Array[Byte](9, 9)) //      corrupt → drops out
    ).toDF("media_id", "modality", "payload")
    val pairs = MultimodalOps.imageNearDupPairs(media, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)))
  }

  test("maxMinDiverse follows the farthest-first order on crafted points") {
    import spark.implicits._
    // 1-D embeddings at 0, 1, 10, 100: seed = min id (at 0.0), then the
    // farthest-from-selected chain is 100, 10, 1.
    val vecs = Seq(
      (1L, Array(0.0f)), (2L, Array(1.0f)), (3L, Array(10.0f)),
      (4L, Array(100.0f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.maxMinDiverse(vecs, "vec_id", "embedding", k = 4)
      .as[(Int, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got.map(_._2) == Seq(1L, 4L, 3L, 2L))
    assert(got.head._3.isEmpty) // seed has no distance
    assert(got(1)._3.contains(10000.0)) // 100² from the seed
    // round 3: cand 10 has min(dist²(10,0)=100, dist²(10,100)=8100) = 100,
    // beating cand 1's min(1, 9801) = 1
    assert(got(2)._3.contains(100.0))
    assert(got(3)._3.contains(1.0))
  }

  test("substringSpanPairs finds a planted verbatim paragraph with exact offsets") {
    import spark.implicits._
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val para = words("shared", 12) // a 12-token verbatim paragraph
    val docs = Seq(
      (1L, s"${words("alpha", 5)} $para ${words("tailone", 4)}"),
      (2L, s"${words("beta", 9)} $para"),
      (3L, words("unrelated", 20))).toDF("doc_id", "text")
    val got = DedupOps
      .substringSpanPairs(docs, "doc_id", "text", k = 4, minLen = 8,
        maxGramFreq = None)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // Doc 1: para at tokens 6-17; doc 2: at tokens 10-21. Span = 12.
    assert(got == Seq((1L, 2L, 6L, 10L, 12L)))
  }

  test("substringSpanPairsBetween reports only cross-split spans") {
    import spark.implicits._
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val leak = words("leak", 10)
    val trainDup = words("traindup", 11) // shared train-train: must NOT appear
    val train = Seq(
      (1L, s"${words("a", 4)} $leak"),
      (2L, s"$trainDup ${words("b", 3)}"),
      (3L, s"${words("c", 2)} $trainDup")).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, s"${words("q", 6)} $leak ${words("r", 2)}"),
      (11L, words("clean", 15))).toDF("doc_id", "text")
    val got = DedupOps
      .substringSpanPairsBetween(train, eval_, "doc_id", "text",
        k = 4, minLen = 8, maxGramFreq = None)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // only the train->eval leak, with exact offsets: doc 1 tokens 5-14,
    // doc 10 tokens 7-16; the train-train duplicate never pairs
    assert(got == Seq((1L, 10L, 5L, 7L, 10L)))
  }

  test("substringSpanPairs: a gap splits spans; sub-minLen runs are dropped") {
    import spark.implicits._
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val s1 = words("one", 9) // long enough to survive minLen = 8
    val s2 = words("two", 8) // exactly at the minLen = 8 threshold
    val s3 = words("thr", 7) // 7 < 8 → dropped
    val docs = Seq(
      (1L, s"$s1 ${words("fillA", 3)} $s2 ${words("fillB", 3)} $s3"),
      (2L, s"$s1 ${words("fillC", 3)} $s2 ${words("fillD", 3)} $s3"))
      .toDF("doc_id", "text")
    val got = DedupOps
      .substringSpanPairs(docs, "doc_id", "text", k = 4, minLen = 8,
        maxGramFreq = None)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._3).toSeq
    // Same diagonal (identical layout) but three separated runs: the two
    // fills differ so matching stops at each boundary. s3's span is 7 < 8.
    assert(got == Seq((1L, 2L, 1L, 1L, 9L), (1L, 2L, 13L, 13L, 8L)))
  }

  test("substringSpanPairs: boilerplate cap drops the corpus-wide gram anchors") {
    import spark.implicits._
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val boiler = words("footer", 10)
    // The footer appears in every doc; with cap < corpus df its grams
    // anchor nothing, with no cap it matches every pair.
    val docs = (1L to 5L)
      .map(i => (i, s"${words(s"body$i", 6)} $boiler")).toDF("doc_id", "text")
    val capped = DedupOps.substringSpanPairs(docs, "doc_id", "text",
      k = 4, minLen = 8, maxGramFreq = Some(3))
    assert(capped.isEmpty)
    val uncapped = DedupOps.substringSpanPairs(docs, "doc_id", "text",
      k = 4, minLen = 8, maxGramFreq = None)
    assert(uncapped.count() == 10L) // C(5,2) pairs share the footer
  }

  test("bagJaccardPairs: reordered text scores 1, doubled text scores 1/2") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "d c b a"),           // same bag, fully reordered
      (2L, "a b c d a b c d"),   // doc 0 repeated twice
      (3L, "x y z w"))           // disjoint vocabulary
      .toDF("doc_id", "text")
    val out = DedupOps.bagJaccardPairs(docs, "doc_id", "text",
        threshold = 0.5, maxTokenFreq = 10)
      .orderBy("a", "b")
      .select("a", "b", "inter", "na", "nb", "bag_jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 1L, 4L, 4L, 4L, 1.0),
      (0L, 2L, 4L, 4L, 8L, 0.5),
      (1L, 2L, 4L, 4L, 8L, 0.5)))
    // the reordered pair is invisible to 3-gram shingle Jaccard
    val shingled = DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.5)
      .filter(col("a") === 0 && col("b") === 1)
    assert(shingled.isEmpty)
  }

  test("bagJaccardPairs: token-df cap gates candidate generation") {
    import spark.implicits._
    // every shared token has df 3 — a cap of 2 must yield no candidates
    val docs = Seq((0L, "p q"), (1L, "q p"), (2L, "p q r"))
      .toDF("doc_id", "text")
    val capped = DedupOps.bagJaccardPairs(docs, "doc_id", "text",
      threshold = 0.1, maxTokenFreq = 2)
    assert(capped.isEmpty)
    val open = DedupOps.bagJaccardPairs(docs, "doc_id", "text",
      threshold = 0.1, maxTokenFreq = 3)
    assert(open.count() == 3L)
  }

  test("bytesScaledParts: gate-scale frames keep the session width; " +
    "materialized cache widens past the pre-cache estimate") {
    import spark.implicits._
    val session = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // tiny frame, default advisory (64 MB): always the session floor
    val tiny = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    assert(DedupOps.bytesScaledParts(tiny, 12) == session)

    // wide text rows whose Catalyst ESTIMATE (string default width)
    // is far under actual bytes; shrink the advisory so the widths are
    // measurable at test scale
    val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val saved = spark.conf.get(advisoryKey)
    try {
      spark.conf.set(advisoryKey, "16384")
      val df = spark.range(20000).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(j =>
          concat(lit(s"tok$j"), pmod(col("id") + j, lit(997)))): _*)
          .as("text"))
      val preCache = DedupOps.bytesScaledParts(df, 12)
      df.persist()
      // stats read BEFORE materialization must not poison later calls:
      // the fresh-QueryExecution path re-reads post-build cache stats
      val preMaterialize = DedupOps.bytesScaledParts(df, 12)
      assert(preMaterialize == preCache)
      df.count()
      val postMaterialize = DedupOps.bytesScaledParts(df, 12)
      // ~20k rows × ~320 B actual vs 20-B-string estimate: the cached
      // width must exceed the estimate-derived one, not equal it
      assert(postMaterialize > preCache,
        s"cached width $postMaterialize vs estimate width $preCache")
      assert(postMaterialize <= 16384)
      df.unpersist()
    } finally spark.conf.set(advisoryKey, saved)
  }
}
