package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches. At 100 TB, exact `count(DISTINCT key)`
  * per group shuffles every distinct (group, key) pair; a bounded sketch
  * ships k values per group regardless of cardinality and merges
  * associatively across partitions, days, and reruns.
  *
  * KMV (k-minimum-values, Bar-Yossef et al. 2002) rather than
  * HyperLogLog, deliberately: the sketch state is "the k smallest hash
  * values of the key set" — a deterministic function of the data,
  * reproducible on any engine from the same hash, so the estimator is
  * DuckDB-oracle-able bit for bit (`kmv_distinct` gate). HLL's register
  * layout is implementation-defined; its results can only be
  * tolerance-tested. Same asymptotics (relative error ~ 1/sqrt(k)),
  * exact below k by construction.
  *
  * Estimator: with U(k) = h_k / 2^52 the k-th smallest of n uniform
  * hashes, E[U(k)] = k/(n+1), so n̂ = (k-1)/U(k) (the unbiased form).
  * Below k distinct hashes the sketch holds ALL of them — the count is
  * exact.
  *
  * Plan shape: one distinct on (group, 52-bit hash) with partial
  * aggregation, then one rank window per group. Spark's WindowGroupLimit
  * pre-prunes each map partition to its local top-k before the shuffle —
  * exactly the partial-sketch-then-merge execution a hand-built sketch
  * would do, for free from the declarative plan.
  */
object SketchOps {

  /** 2^52: 13 lowercase hex digits of md5 parsed as an integer — 52 bits
    * so every value (and every IEEE-double fraction of the space) is
    * exact in both a BIGINT and a double mantissa on any engine. */
  val HashSpace: Double = 4503599627370496.0

  /** Uniform 52-bit integer hash of a key: the corpus-wide salted-md5
    * construction ([[CorpusOps.saltedHash]] — ONE definition of
    * "salt:key" hashing across sampling, splits, and sketches) with the
    * 13-hex-digit prefix parsed as an integer. */
  def hash52(keyCol: Column, salt: String): Column =
    conv(substring(CorpusOps.saltedHash(keyCol, salt), 1, 13), 16, 10)
      .cast("long")

  /** The sketch state itself: per group, the k smallest distinct hash
    * values of the key. Merge = union ∘ re-take-k-smallest (asserted
    * associative/idempotent in SketchOpsSpec). */
  def kmvMinima(
      df: DataFrame, keyCol: String, groupCols: Seq[String], k: Int,
      salt: String = "kmv"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("h")
    df.select(groupCols.map(col) :+ hash52(col(keyCol), salt).as("h"): _*)
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Approximate distinct keys per group: exact below k, KMV-estimated
    * above, side by side with the sketch size actually used. */
  def kmvDistinct(
      df: DataFrame, keyCol: String, groupCols: Seq[String], k: Int,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k=$k: the estimator needs at least 2 minima")
    kmvMinima(df, keyCol, groupCols, k, salt)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_sketch"),
        max(when(col("rn") === k, col("h"))).as("hk"))
      .withColumn("est_distinct",
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / col("hk")))
      .drop("hk")
  }

  /** Count-Min sketch counters: `d` rows of `w` counters, counter
    * (i, h_i(key) mod w) accumulates every occurrence of `key`. With the
    * salted-md5 bucket hashes the whole structure is a deterministic
    * function of the data — unlike library CMS implementations whose
    * seeds are instance-random — so estimates reproduce on any engine.
    * State is d*w integers per group-less sketch (mergeable by plain
    * counter addition), vs one counter per distinct key exactly.
    *
    * Plan: one explode-free pass — d projections of the same row unioned
    * (still scan-linear; Catalyst collapses the scans at 100 TB behind a
    * staged frame), then one partial+final sum keyed by (seed, bucket). */
  def cmsCounters(
      df: DataFrame, keyCol: Column, w: Int, d: Int,
      salt: String = "cms"): DataFrame = {
    require(w > 0 && d > 0)
    (0 until d).map { i =>
      df.select(lit(i).as("seed"),
        pmod(hash52(keyCol, s"$salt$i"), lit(w.toLong)).as("bucket"))
    }.reduce(_ unionByName _)
      .groupBy("seed", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each key in `keys`: the CLASSIC
    * count-min read — min over the d counters the key hashes into. Always
    * an overestimate (collisions only add), within eps*N with the usual
    * (w, d) guarantees. `counters` must come from [[cmsCounters]] with
    * the same (w, d, salt). */
  def cmsEstimate(
      counters: DataFrame, keys: DataFrame, keyCol: Column,
      w: Int, d: Int, salt: String = "cms"): DataFrame = {
    val probes = (0 until d).map { i =>
      keys.select(keyCol.as("key"), lit(i).as("seed"),
        pmod(hash52(keyCol, s"$salt$i"), lit(w.toLong)).as("bucket"))
    }.reduce(_ unionByName _)
    probes
      .join(counters, Seq("seed", "bucket"), "left_outer")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Approximate per-group quantiles from a bottom-k-by-hash ROW sample —
    * the same deterministic mergeable state as [[kmvMinima]] (k smallest
    * row-key hashes), but carrying the measured value: a bottom-k hash
    * sample IS a uniform sample of the rows, so sample quantiles estimate
    * population quantiles with the usual sqrt(k) error, and the whole
    * thing reproduces bit-for-bit on any engine — unlike t-digest/KLL,
    * whose compaction schedules are implementation-defined.
    *
    * Quantiles are DISCRETE rank selection (value at
    * `floor((n-1)*p) + 1` in (value, hash) order — the hash breaks value
    * ties deterministically), never interpolation: two engines'
    * interpolation formulas need not match bit-for-bit, but "the element
    * at a rank" does.
    *
    * Exact below k (the sample is the whole group). Plan: the same
    * WindowGroupLimit-pre-pruned rank window as the KMV sketch, one more
    * in-sample rank, one explode for the quantile list. */
  def bottomKQuantiles(
      df: DataFrame, keyCol: Column, valueCol: Column,
      groupCols: Seq[String], k: Int, ps: Seq[Double],
      salt: String = "kq"): DataFrame = {
    require(k >= 1 && ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    // (h, v) order: if keyCol is not row-unique, equal-h rows would rank
    // in partition-arrival order and a row straddling the rn <= k boundary
    // would flap between runs; the v tiebreak makes the SAMPLE (and so
    // the output) deterministic — equal (h, v) rows are interchangeable
    val wH = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("h"), col("v"))
    val sample = df
      .select(groupCols.map(col) :+ hash52(keyCol, salt).as("h") :+
        valueCol.as("v"): _*)
      .withColumn("rn", row_number().over(wH))
      .filter(col("rn") <= k)
    val wV = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("v"), col("h"))
    sample
      .withColumn("vr", row_number().over(wV))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
      .select(groupCols.map(col) ++ Seq(col("v"), col("vr"), col("n"),
        explode(array(ps.map(lit): _*)).as("p")): _*)
      .filter(col("vr") === floor((col("n") - 1) * col("p")) + 1)
      .select(groupCols.map(col) ++ Seq(col("p"), col("v").as("q")): _*)
  }
}
