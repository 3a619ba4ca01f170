package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Z-order layout: the Morton interleave against a reference bit-twiddle,
  * and the property that makes it useful — every tile bounds BOTH
  * dimensions, so rectangle queries prune. */
class LayoutOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue2 matches the reference interleave on exhaustive 5-bit space") {
    val pts = for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong)
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"),
        LayoutOps.zValue2(col("a"), col("b"), 5).as("z"))
      .as[(Long, Long, Long)].collect()
    for ((a, b, z) <- got)
      assert(z == mortonRef(a, b, 5), s"z($a,$b)")
    // bijective on the 10-bit space
    assert(got.map(_._3).distinct.length == 1024)
  }

  test("every z-tile is an axis-aligned box: tile id pins both dims' high bits") {
    val pts = for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong)
    val stats = LayoutOps
      .zTileStats(pts.toDF("x", "y"), col("x"), col("y"), bits = 6, tileBits = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.length == 16)
    for ((tile, n, mnx, mxx, mny, mxy) <- stats) {
      assert(n == 256, s"tile $tile: uniform 16x16 box expected")
      assert(mxx - mnx == 15 && mxy - mny == 15,
        s"tile $tile spans [$mnx,$mxx]x[$mny,$mxy] — not a 16x16 box")
    }
  }

  test("rectangle query scans only overlapping tiles, never misses a match") {
    val pts = for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong)
    val Array((tiles, cand, rows, scanned, matching)) = LayoutOps
      .zPruneStats(pts.toDF("x", "y"), col("x"), col("y"),
        bits = 6, tileBits = 4, xLo = 16, xHi = 31, yLo = 32, yHi = 47)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(tiles == 16 && rows == 4096)
    assert(matching == 16L * 16L)
    assert(scanned >= matching, "pruning must never drop a match")
    assert(cand == 1 && scanned == 256,
      "an aligned 16x16 rectangle must hit exactly one tile")
  }

  test("compactionBins: exact streaming-pack assignment on a hand case") {
    // sorted by (bytes desc, key asc): f(900) g(500) a(400) b(300) c(300)
    // running starts: 0, 900, 1400, 1800, 2100 → bins at target 1000:
    // 0, 0, 1, 1, 2
    val files = Seq(("a", 400L), ("b", 300L), ("c", 300L),
      ("f", 900L), ("g", 500L)).toDF("key", "bytes")
    val got = LayoutOps.compactionBins(files, "key", "bytes", 1000L)
      .select("key", "bin_start", "bin")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 1400L, 1L), ("b", 1800L, 1L),
      ("c", 2100L, 2L), ("f", 0L, 0L), ("g", 900L, 0L)))
  }

  test("compactionBins: every bin lands within one max-file of target") {
    // 400 files, deterministic ragged sizes, many range partitions
    val files = (0 until 400)
      .map(i => (f"k$i%04d", 200L + (i * 7919) % 1800)).toDF("key", "bytes")
    val target = 10000L
    val maxFile = 200L + 1999L
    val bins = LayoutOps.compactionBins(files, "key", "bytes", target)
      .groupBy("bin").agg(sum("bytes").as("total"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val lastBin = bins.map(_._1).max
    for ((bin, total) <- bins if bin != lastBin)
      assert(total >= target - maxFile && total < target + maxFile,
        s"bin $bin total $total outside [${target - maxFile}, ${target + maxFile})")
    // partition of the input: bin totals sum to the manifest total
    assert(bins.map(_._2).sum ==
      files.agg(sum("bytes")).as[Long].head())
  }

  test("rendezvousShard: matches the scalar argmax; growth moves docs only onto the new shard") {
    def model(k: Long, n: Int): Int =
      (0 until n).maxBy { s =>
        (graft.expr.Hash64.hashBytes(s"t:$s:$k".getBytes("UTF-8"), 0L), s)
      }
    val df = spark.range(2000).select(col("id").as("k"))
    val got = LayoutOps.rendezvousShard(
        LayoutOps.rendezvousShard(df, "k", 8, "t", "s8"),
        "k", 9, "t", "s9")
      .as[(Long, Int, Int)].collect()
    assert(got.length == 2000)
    for ((k, s8, s9) <- got) {
      assert(s8 == model(k, 8), s"doc $k at 8 shards")
      assert(s9 == model(k, 9), s"doc $k at 9 shards")
      if (s8 != s9) assert(s9 == 8, s"doc $k moved to shard $s9, not the new one")
    }
    // movement fraction ~ 1/9 (binomial n=2000: 222 ± 4 sigma ~ 56)
    val moved = got.count { case (_, s8, s9) => s8 != s9 }
    assert(moved > 140 && moved < 310, s"moved $moved of 2000")
  }

  test("rangeBoundaries: exact equal-row buckets on 1..100 into 4") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("k", "id")
    val got = LayoutOps.rangeBoundaries(df, "k", "id", nBuckets = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 25L, 25L), (2L, 50L, 50L), (3L, 75L, 75L)))
  }

  test("rangeBoundaries: non-divisible n spreads remainders like floor(r*N/n)") {
    // n=10, N=4: bucket ends at ranks floor-stepping — 3, 5, 8 → 10
    val df = (1 to 10).map(i => (i.toLong * 7, i.toLong)).toDF("k", "id")
    val got = LayoutOps.rangeBoundaries(df, "k", "id", nBuckets = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // bucket sizes from the boundaries: 3, 2, 3, 2 (floor(r*4/10) steps)
    assert(got.map(_._2).toSeq == Seq(21L, 35L, 56L))
  }

  test("rangeBoundaries: composite boundary cuts inside a duplicate-key run") {
    // every key identical — only the tie value can cut; buckets of 3
    val df = (1 to 12).map(i => (5L, i.toLong)).toDF("k", "id")
    val got = LayoutOps.rangeBoundaries(df, "k", "id", nBuckets = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 5L, 3L), (2L, 5L, 6L), (3L, 5L, 9L)))
    // applying the composite rule yields exactly-equal buckets
    val cuts = got.map(b => (b._2, b._3))
    val sizes = (1 to 12).map(i => (5L, i.toLong))
      .groupBy(r => cuts.count(c =>
        r._1 > c._1 || (r._1 == c._1 && r._2 > c._2)))
      .values.map(_.size)
    assert(sizes.toSeq.sorted == Seq(3, 3, 3, 3))
  }

  test("hilbertIndex: order-1 quadrant walk and the full-grid curve property") {
    import graft.expr.HilbertIndex.compute
    // order 1: the U walk (0,0) -> (0,1) -> (1,1) -> (1,0)
    assert(compute(0, 0, 1) == 0 && compute(0, 1, 1) == 1)
    assert(compute(1, 1, 1) == 2 && compute(1, 0, 1) == 3)
    // order 4: d is a bijection onto 0..255 AND consecutive d are grid
    // neighbors (the no-jump property Z-order lacks)
    val n = 16
    val byD = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = compute(x, y, 4).toInt
      assert(byD(d) == null, s"duplicate d=$d")
      byD(d) = (x, y)
    }
    byD.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps from ($x1,$y1) to ($x2,$y2)")
    }
    // out-of-range coordinates are masked, not garbage
    assert(compute(16 + 3, 32 + 5, 4) == compute(3, 5, 4))
  }

  test("hilbert_index SQL surface and prune stats never miss a match") {
    val r = spark.sql(
      "SELECT hilbert_index(1, 1, 1) AS a, hilbert_index(5, 9, 4) AS b")
      .collect().head
    assert(r.getLong(0) == 2L &&
      r.getLong(1) == graft.expr.HilbertIndex.compute(5, 9, 4))
    import spark.implicits._
    val pts = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val s = LayoutOps.hilbertPruneStats(pts, col("x"), col("y"),
        bits = 5, tileBits = 4, xLo = 3, xHi = 9, yLo = 17, yHi = 23)
      .collect().head
    assert(s.getAs[Long]("n_tiles") == 16L)
    assert(s.getAs[Long]("n_rows_matching") == 7L * 7L)
    // stats-pruned scan reads every matching row (no false negatives)
    assert(s.getAs[Long]("n_rows_scanned") >= s.getAs[Long]("n_rows_matching"))
  }
}
