package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.GraphOps

/** Landmark-budget evidence for the Brandes betweenness gates — the
  * suite's single most expensive item (~80 landmarks × 3 hops, 16–26 s at
  * sf0.1). The budget was asserted, never evidenced; this tool computes,
  * at a scale where EXACT betweenness is computable (the sf0.01 trade
  * graph: ~1.6k nodes, ~48k directed edges), the Spearman rank
  * correlation of landmark/hop-budgeted scores against the exact
  * all-sources run, sweeping landmarks ∈ {10, 20, 40, 80} × hops ∈
  * {2, 3, 4}. Exactness of the reference is VERIFIED, not assumed: the
  * forward σ waves must exhaust (deepest wave empty) within the
  * reference hop bound.
  *
  * Output: one markdown table row per (landmarks, hops) cell — pasted
  * into PERF.md's round-14 section, where the keep-or-cut decision is
  * recorded next to the gate re-measurement.
  */
object BrandesBudget {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame =
      spark.read.parquet(s"$sfDir/$name.parquet")
    // the gates' trade graph verbatim (GraphQueries.tradeEdges)
    val edges = t("orders")
      .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    println(s"graph: $n nodes, ${edges.count()} directed edges")

    // EXACT reference: every node a landmark, hop budget past the
    // diameter. The overflow knobs move together: the op's δ-sum guard
    // caps node scores at 2^63/maxSigma − unit, and with all n nodes as
    // landmarks the summed score reaches ~2.4e10 at unit=1e6 — so
    // maxSigma must be TIGHT, not generous. Probe the actual max σ from
    // the forward waves and pass the next power of two: σ max here is
    // ~10^4-10^5 (dist ≤ 4 dense bipartite), giving a ceiling ≥ 2^45,
    // orders past the measured score scale.
    val refHops = 8
    val unit = 1000000L
    val waves = GraphOps.landmarkPathCounts(edges, "src", "dst",
      nodes, "id", maxHops = refHops)
    val probe = waves.agg(max("dist").as("d"), max("sigma").as("s")).head()
    val maxDist = probe.getInt(0)
    val sigmaMax = probe.getLong(1)
    require(maxDist < refHops,
      s"reference NOT exact: waves still alive at hop $maxDist of $refHops")
    val maxSigma = java.lang.Long.highestOneBit(sigmaMax) * 2
    val ceiling = Long.MaxValue / maxSigma - unit
    println(s"reference is exact: waves exhaust at dist $maxDist; " +
      s"sigma_max=$sigmaMax -> maxSigma=$maxSigma (score ceiling $ceiling)")
    var t0 = System.nanoTime()
    val exact = GraphOps.landmarkBetweennessUnits(edges, "src", "dst",
        nodes, "id", maxHops = refHops, unit = unit, maxSigma = maxSigma)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(f"exact all-sources run: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"${exact.size} scored nodes")

    // average-rank (tie-aware) Spearman over the node universe; nodes a
    // budget never reaches score 0 — exactly how a gate consumer would
    // read the frame
    val universe = exact.keySet
    def ranks(score: Map[Long, Long]): Map[Long, Double] = {
      val sorted = universe.toSeq.map(v => v -> score.getOrElse(v, 0L))
        .sortBy { case (v, s) => (s, v) }.zipWithIndex
      sorted.groupBy(_._1._2).flatMap { case (_, grp) =>
        val avg = grp.map(_._2).sum.toDouble / grp.size
        grp.map { case ((v, _), _) => v -> avg }
      }
    }
    def spearman(a: Map[Long, Double], b: Map[Long, Double]): Double = {
      val xs = universe.toSeq.map(a)
      val ys = universe.toSeq.map(b)
      val mx = xs.sum / xs.size; val my = ys.sum / ys.size
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sx = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum)
      val sy = math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
      cov / (sx * sy)
    }
    val exactRanks = ranks(exact)

    // budget sweep: first-k suppliers by id (the gate's landmark type —
    // suppliers are the odd ids), deterministic
    val suppliers = nodes.filter(col("id") % 2 === 1)
      .orderBy("id").limit(80).collect().map(_.getLong(0))
    println("| landmarks | hops | spearman vs exact | wall (s) |")
    println("|---|---|---|---|")
    import spark.implicits._
    for (k <- Seq(10, 20, 40, 80); h <- Seq(2, 3, 4)) {
      val lms = suppliers.take(k).toSeq.toDF("id")
      t0 = System.nanoTime()
      val approx = GraphOps.landmarkBetweennessUnits(edges, "src", "dst",
          lms, "id", maxHops = h)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wall = (System.nanoTime() - t0) / 1e9
      val rho = spearman(exactRanks, ranks(approx))
      println(f"| $k | $h | $rho%.4f | $wall%.1f |")
    }
    spark.stop()
  }
}
