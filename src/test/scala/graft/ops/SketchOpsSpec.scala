package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** KMV sketch properties: exactness below k, ~1/sqrt(k) accuracy above,
  * and the merge law (union of sketches re-sketched == sketch of union)
  * that makes it safe to compute per partition / per day and combine. */
class SketchOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact below k: estimate equals the true distinct count") {
    val df = (0 until 1000).map(i => (i % 50, s"k${i % 120}"))
      .toDF("g", "key")
    val got = SketchOps.kmvDistinct(df, "key", Seq("g"), k = 256)
      .select("g", "est_distinct").as[(Int, Double)].collect()
    val truth = df.groupBy("g").agg(countDistinct("key").as("n"))
      .as[(Int, Long)].collect().toMap
    for ((g, est) <- got)
      assert(est == truth(g).toDouble, s"group $g: below-k must be exact")
  }

  test("estimate above k lands within ~4/sqrt(k) of the truth") {
    val n = 20000
    val df = (0 until n).map(i => ("all", s"key$i")).toDF("g", "key")
    val k = 512
    val Array((_, nSketch, est)) = SketchOps.kmvDistinct(df, "key", Seq("g"), k)
      .as[(String, Long, Double)].collect()
    assert(nSketch == k)
    val relErr = math.abs(est - n) / n
    assert(relErr < 4.0 / math.sqrt(k),
      f"relative error $relErr%.4f exceeds 4/sqrt($k) = ${4.0 / math.sqrt(k)}%.4f")
  }

  test("merge law: k-smallest of unioned sketches == sketch of the union") {
    val left = (0 until 5000).map(i => ("g", s"a$i")).toDF("g", "key")
    val right = (0 until 5000).map(i => ("g", s"${if (i % 3 == 0) "a" else "b"}$i"))
      .toDF("g", "key") // overlapping keys: merge must dedupe minima
    val k = 128
    val whole = SketchOps.kmvMinima(left.union(right), "key", Seq("g"), k)
      .select("h").as[Long].collect().toSet
    val merged = SketchOps.kmvMinima(left, "key", Seq("g"), k)
      .select("g", "h")
      .union(SketchOps.kmvMinima(right, "key", Seq("g"), k).select("g", "h"))
      .distinct()
      .orderBy("h").limit(k)
      .select("h").as[Long].collect().toSet
    assert(merged == whole,
      "merging per-source sketches must reproduce the whole-corpus sketch")
  }

  test("HLL merge law: per-source registers max-merged == whole-corpus registers") {
    val left = (0 until 4000).map(i => ("s1", s"a$i")).toDF("src", "key")
    val right = (0 until 4000).map(i => ("s2", s"${if (i % 3 == 0) "a" else "b"}$i"))
      .toDF("src", "key") // overlapping keys across sources
    val whole = SketchOps
      .hllRegisters(left.union(right), col("key"), Nil)
      .select("bucket", "m_rho").as[(Long, Int)].collect().toMap
    val merged = SketchOps
      .hllMergeRegisters(
        SketchOps.hllRegisters(left.union(right).select("src", "key"),
          col("key"), Seq("src")), Nil)
      .select("bucket", "m_rho").as[(Long, Int)].collect().toMap
    assert(merged == whole,
      "max-merging per-source registers must reproduce the union's registers")
    // and the estimates (same registers -> same arithmetic) agree too
    val eW = SketchOps.hllEstimate(
      SketchOps.hllRegisters(left.union(right), col("key"), Nil), Nil)
      .select("est_distinct").as[Double].head()
    val eM = SketchOps.hllEstimate(
      SketchOps.hllMergeRegisters(
        SketchOps.hllRegisters(left.union(right).select("src", "key"),
          col("key"), Seq("src")), Nil), Nil)
      .select("est_distinct").as[Double].head()
    assert(eW == eM)
  }

  test("bottom-k quantiles: exact below k, near-true above") {
    import org.apache.spark.sql.functions.col
    // group "small": 100 rows (< k) — sample IS the group, quantile exact
    val small = (0 until 100).map(i => ("small", i.toLong, i.toDouble))
    // group "big": 20000 rows uniform on [0, 20000)
    val big = (0 until 20000).map(i => ("big", 1000L + i, i.toDouble))
    val df = (small ++ big).toDF("g", "key", "v")
    val got = SketchOps
      .bottomKQuantiles(df, col("key"), col("v"), Seq("g"), k = 512,
        ps = Seq(0.5))
      .as[(String, Double, Double)].collect()
      .map { case (g, _, q) => g -> q }.toMap
    // small: n=100, rank floor(99*0.5)+1 = 50 → value 49 exactly
    assert(got("small") == 49.0, "below k the rank selection is exact")
    val relErr = math.abs(got("big") - 10000.0) / 20000.0
    assert(relErr < 4.0 / math.sqrt(512),
      f"sampled median ${got("big")}%.0f off true 10000 by $relErr%.4f")
  }

  test("quantiles are monotone in p and bracketed by the group's min/max") {
    import org.apache.spark.sql.functions.col
    val df = (0 until 5000).map(i => ("g", i.toLong, (i * 7 % 997).toDouble))
      .toDF("g", "key", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val qs = SketchOps
      .bottomKQuantiles(df, col("key"), col("v"), Seq("g"), k = 256, ps)
      .orderBy("p").select("q").as[Double].collect().toSeq
    assert(qs.length == ps.length)
    assert(qs == qs.sorted, s"quantiles must be monotone in p: $qs")
    assert(qs.head >= 0.0 && qs.last <= 996.0)
  }

  test("count-min: never underestimates, exact without collisions, merges by addition") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val tokens = (0 until 3000).map(i => s"t${i % 40}").toDF("key")
    val exact = tokens.groupBy("key").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // tight sketch (w=16): collisions certain, estimates must only go UP
    val tight = SketchOps.cmsEstimate(
        SketchOps.cmsCounters(tokens, col("key"), 16, 3),
        tokens.distinct(), col("key"), 16, 3)
      .as[(String, Long)].collect().toMap
    for ((k, n) <- exact)
      assert(tight(k) >= n, s"$k: CMS must never underestimate")
    // wide sketch (w=4096, 40 keys): collisions near-impossible → exact
    val wide = SketchOps.cmsEstimate(
        SketchOps.cmsCounters(tokens, col("key"), 4096, 3),
        tokens.distinct(), col("key"), 4096, 3)
      .as[(String, Long)].collect().toMap
    assert(wide == exact, "wide sketch must be collision-free here")
    // merge law: counters(a ++ b) == counters(a) + counters(b)
    val (a, b) = (tokens.limit(1000), tokens.exceptAll(tokens.limit(1000)))
    val merged = SketchOps.cmsCounters(a, col("key"), 16, 3)
      .unionByName(SketchOps.cmsCounters(b, col("key"), 16, 3))
      .groupBy("seed", "bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = SketchOps.cmsCounters(tokens, col("key"), 16, 3)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole, "counter addition must equal the whole-corpus sketch")
  }

  test("WindowGroupLimit pre-prunes the sketch shuffle map-side") {
    val df = (0 until 10000).map(i => (i % 4, s"key$i")).toDF("g", "key")
    val plan = SketchOps.kmvMinima(df, "key", Seq("g"), 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-filter top-k must pre-prune before the exchange:\n$plan")
  }

  test("binned quantiles land within one bin width of the exact quantile") {
    val width = 50.0
    val ps = Seq(0.5, 0.9, 0.99)
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 2000).map(_ =>
        (s"g${rnd.nextInt(3)}", rnd.nextDouble() * 1000.0))
      val df = rows.toDF("g", "v")
      val got = SketchOps.binnedQuantiles(df, "g", "v", width, ps)
        .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2)))
        .toMap
      val byG = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(_._2).sorted
      }
      for ((g, sorted) <- byG; p <- ps) {
        val exact = sorted(math.ceil(p * sorted.size).toInt - 1)
        val approx = got((g, p))
        assert(approx <= exact && exact < approx + width,
          s"seed=$seed $g p=$p: exact=$exact not in [$approx, ${approx + width})")
      }
    }
  }
}
