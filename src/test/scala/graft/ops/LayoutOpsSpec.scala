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
}
