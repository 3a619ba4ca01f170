package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches. At 100 TB, exact `count(DISTINCT key)`
  * per group shuffles every distinct (group, key) pair; a bounded sketch
  * ships k values per group regardless of cardinality and merges
  * associatively across partitions, days, and reruns.
  *
  * KMV (k-minimum-values, Bar-Yossef et al. 2002) first: the sketch
  * state is "the k smallest hash values of the key set" — a
  * deterministic function of the data, reproducible on any engine from
  * the same hash, so the estimator is DuckDB-oracle-able bit for bit
  * (`kmv_distinct` gate). Relative error ~ 1/sqrt(k), exact below k by
  * construction.
  *
  * HyperLogLog ([[hllDistinct]]) is also provided — LIBRARY HLLs have an
  * implementation-defined register layout and can only be
  * tolerance-tested, but this one PINS the register spec (hash52, low-p
  * bucket bits, rho = leading zeros of the remaining window + 1), so the
  * whole estimator is just as oracle-able. HLL's win over KMV is state
  * size: m 6-bit registers (64 buckets = fixed 48 bytes) vs k 52-bit
  * minima, and register merge is a plain per-bucket MAX.
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

  // ---- HyperLogLog with a PINNED register specification ----------------

  /** Bias-correction constant alpha_m (Flajolet et al., AofA 2007). */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** The exact double constant `alpha_m * m^2 * 2^(windowBits+1)` used by
    * the estimator — public so the DuckDB oracle can embed the IDENTICAL
    * IEEE value (Double.toString round-trips). */
  def hllNumerator(p: Int): Double = {
    val m = 1 << p
    hllAlpha(m) * (m.toLong * m).toDouble * java.lang.Math.pow(2.0, 53 - p)
  }

  /** HLL register table per group: `(groupCols..., bucket, m_rho)`.
    *
    * Register spec — pinned, so any engine reproduces it: with
    * h = [[hash52]](key, salt), bucket = the low p bits (h % 2^p) and the
    * rank observation is rho = (leading zeros of the remaining
    * (52-p)-bit window) + 1, i.e. `53 - p - bitlength(h >> p)` with the
    * all-zero window mapping to 53-p. The register is MAX(rho) per
    * bucket — so merging sketches across partitions, days, or reruns is
    * a plain per-(group, bucket) MAX, and the partial aggregation Spark
    * inserts before the shuffle IS the per-executor sketch: each map
    * task ships at most m rows per group no matter how many rows it
    * scanned. That bounded-state merge is the whole reason to run HLL at
    * 100 TB instead of `count(DISTINCT key)`, whose shuffle carries every
    * distinct (group, key) pair. */
  def hllRegisters(
      df: DataFrame, keyCol: Column, groupCols: Seq[String],
      p: Int = 6, salt: String = "hll"): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p: need 4 <= p <= 16")
    val wBits = 52 - p
    val h = hash52(keyCol, salt)
    val win = shiftrightunsigned(h, p)
    val rho = when(win === 0L, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(win)))
    df.select(groupCols.map(col) :+ pmod(h, lit(1L << p)).as("bucket") :+
        rho.as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("m_rho"))
  }

  /** Approximate distinct keys per group from the HLL registers.
    *
    * The harmonic-mean sum is accumulated in INTEGER space —
    * `S = sum(2^(wBits+1-M_j))` with empty buckets contributing
    * `2^(wBits+1)` — so it is exact (max 2^53 at p=6, inside BIGINT and
    * the double mantissa), and the only floating-point step is ONE
    * division of two exact values by the pinned [[hllNumerator]]
    * constant: bit-identical on any IEEE engine, hence hash-gateable
    * (`sketch_hll_distinct`). The small-range branch (est <= 2.5m with
    * empty buckets) is the standard linear-counting correction
    * `m * ln(m/V)`; ln is the one transcendental in the operator, so
    * accuracy there is spec-tested rather than oracle-gated — gate
    * inputs keep cardinality well above 2.5m. */
  def hllDistinct(
      df: DataFrame, keyCol: Column, groupCols: Seq[String],
      p: Int = 6, salt: String = "hll"): DataFrame =
    hllEstimate(hllRegisters(df, keyCol, groupCols, p, salt), groupCols, p)

  /** The estimator alone, over an existing register table
    * (`groupCols..., bucket, m_rho`) — split out so MERGED registers
    * (per-bucket MAX across sketches: days, sources, partitions) feed
    * the identical arithmetic. Register merge is what makes HLL state
    * durable at 100 TB: per-source sketches persist, and any grouping
    * of sources is one tiny max-rollup away from its estimate
    * (`sketch_hll_union` gate proves merged == direct-over-the-union
    * bit for bit). */
  def hllEstimate(
      registers: DataFrame, groupCols: Seq[String], p: Int = 6): DataFrame = {
    val m = 1L << p
    val wb1 = 53 - p
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(sum(expr(s"shiftleft(1L, $wb1 - m_rho)")).as("sp"),
        count(lit(1)).as("nb"))
      .withColumn("s_total",
        col("sp") + (lit(m) - col("nb")) * lit(1L << wb1))
      .withColumn("n_empty", lit(m) - col("nb"))
      .withColumn("est_raw", lit(hllNumerator(p)) / col("s_total").cast("double"))
      .withColumn("est_distinct",
        when(col("est_raw") <= lit(2.5 * m) && col("n_empty") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_empty").cast("double")))
          .otherwise(col("est_raw")))
      .select(groupCols.map(col) :+ col("est_distinct"): _*)
  }

  /** Merge register tables by per-bucket MAX — the HLL merge law.
    * Dropping group columns from `toGroups` unions those sketches. */
  def hllMergeRegisters(
      registers: DataFrame, toGroups: Seq[String]): DataFrame =
    registers
      .groupBy((toGroups.map(col) :+ col("bucket")): _*)
      .agg(max(col("m_rho")).as("m_rho"))

  // ---- KMV set-operation estimates -------------------------------------

  /** Set-operation estimates from two KMV sketches alone — never the
    * sets (the theta-sketch trick; Beyer et al., SIGMOD 2007). The union
    * sketch is the k smallest of the two sketches' merged minima (the
    * KMV merge law), `jaccard` is the fraction of those union minima
    * present in BOTH input sketches, and `est_intersection = jaccard *
    * est_union`. Everything except two exact double divisions is
    * rank/integer state from the same pinned [[hash52]], so the whole
    * estimator reproduces bit for bit (`sketch_kmv_setops` gate).
    *
    * At 100 TB this is the pattern for "distinct overlap between two
    * 10-billion-key sets": each side reduces to k values (map-side
    * WindowGroupLimit pre-prunes every partition to its local bottom-k
    * before the shuffle), and the set algebra runs on 2k rows. Exact
    * below k on the union by construction. */
  def kmvSetEstimates(
      a: DataFrame, b: DataFrame, keyCol: String, k: Int,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k=$k: the estimator needs at least 2 minima")
    val ma = kmvMinima(a, keyCol, Nil, k, salt).select(col("h"), lit(1).as("ina"))
    val mb = kmvMinima(b, keyCol, Nil, k, salt).select(col("h"), lit(1).as("inb"))
    val u = ma.join(mb, Seq("h"), "full_outer")
      .select(col("h"), coalesce(col("ina"), lit(0)).as("ina"),
        coalesce(col("inb"), lit(0)).as("inb"))
    val topk = u
      .withColumn("rn", row_number().over(Window.orderBy("h")))
      .filter(col("rn") <= k)
    topk
      .agg(count(lit(1)).as("n_u"),
        max(when(col("rn") === k, col("h"))).as("hk"),
        sum(col("ina") * col("inb")).as("n_both"))
      .withColumn("est_union",
        when(col("n_u") < k, col("n_u").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / col("hk")))
      .withColumn("jaccard",
        col("n_both").cast("double") / col("n_u").cast("double"))
      .withColumn("est_intersection", col("jaccard") * col("est_union"))
      .select("est_union", "jaccard", "est_intersection")
  }

  // ---- Bloom-filter semi-join pruning ----------------------------------

  /** One Bloom filter over `keyCol` of `df`, as a single-row DataFrame
    * with one binary column `bloom` — Spark's own
    * `BloomFilterAggregate` (the sketch behind its runtime row-level
    * filtering), reached through the Column bridge because the SQL
    * function is not registered publicly. The aggregate is partial+final
    * like any other: each partition builds a local filter, merge is
    * bitwise OR. */
  def bloomFilterOf(
      df: DataFrame, keyCol: Column,
      expectedItems: Long, numBits: Long): DataFrame = {
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(keyCol)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    df.agg(GraftColumnBridge.column(agg).as("bloom"))
  }

  /** The might-contain probe itself: `might_contain(<scalar subquery
    * over bloomDf>, xxhash64(key))`. `BloomFilterMightContain` requires
    * its filter side to be a constant or a scalar subquery (never a
    * joined attribute), so the single-row aggregate rides in as a
    * [[ScalarSubquery]] — the same shape Spark's own
    * `InjectRuntimeFilter` emits: the subquery executes once, its
    * result is shipped to every probe task as a literal, and the probe
    * is a plain codegen'd filter (no join of any kind on the fact
    * side). */
  def bloomMightContain(bloomDf: DataFrame, keyCol: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      GraftColumnBridge.expression(xxhash64(keyCol))))

  /** Semi join with Bloom pre-pruning: keep `fact` rows whose `factKey`
    * appears in `dim`'s `dimKey` set, but test every fact row against a
    * Bloom filter of the dim keys BEFORE the exact semi join, so only
    * might-contain survivors (true matches + the filter's ~1% false
    * positives) ever reach the shuffle. Results are EXACTLY the plain
    * semi join — the Bloom filter admits false positives, never false
    * negatives, and the exact join removes the former (the
    * `bloom_semi_prune` gate's oracle is the plain semi join for
    * precisely this reason).
    *
    * This is the manual form of the engine-injected runtime filter, for
    * when the dim side is a computed set AQE cannot see through. At
    * 100 TB the pruned fact side is what makes the semi join affordable:
    * the shuffle carries ~selectivity × |fact| rows instead of |fact|;
    * the filter itself is one scalar-subquery aggregate (a few hundred
    * KB computed once, shipped as a literal). */
  def bloomSemiJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long, numBits: Long): DataFrame = {
    val bf = bloomFilterOf(dim, col(dimKey), expectedItems, numBits)
    fact.where(bloomMightContain(bf, col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }

  /** Histogram-binned approximate quantiles — the quantile shape that
    * runs at 100 TB (exact per-group percentiles need a per-group sort
    * or materialization; this needs ONE keyed count rollup whose state
    * is bins = value-range / width per group, independent of row count).
    * Answer = the lower edge of the first bin whose cumulative count
    * reaches rank ceil(p·n); error bounded by `width` by construction
    * (property-tested in SketchOpsSpec, hash-gated as
    * `sketch_quantile_binned`). Every compared value is an exact
    * integer or a single IEEE multiply — cross-engine reproducible. */
  def binnedQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      width: Double, ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = df
      .select(col(groupCol),
        floor(col(valueCol) / width).cast("long").as("bin"))
      .groupBy(groupCol, "bin")
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(groupCol).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins.withColumn("cum", sum(col("c")).over(w))
    val targets = bins.groupBy(groupCol)
      .agg(sum(col("c")).as("n"))
      .select(col(groupCol), col("n"),
        explode(array(ps.map(lit(_)): _*)).as("p"))
      .withColumn("k", ceil(col("p") * col("n")))
    cum.join(targets, groupCol)
      .filter(col("cum") >= col("k"))
      .groupBy(groupCol, "p")
      .agg((min(col("bin")) * width).cast("double").as("approx_q"))
  }
}
