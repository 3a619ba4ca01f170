package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, T}

/** Data-profiling + statistical-QA gates: one-pass column profiles and
  * exact-arithmetic outlier detection. Both are warehouse utilities a
  * pipeline runs over every new snapshot before trusting it.
  */
object ProfilingQueries {

  val all: Seq[Q] = Seq(
    // Column profile in ONE scan: per column, non-null count, exact
    // distinct count, min/max (numeric as double, strings as text). The
    // single agg row melts into per-column rows via one explode — no
    // per-column re-scan, which at 100 TB is the difference between one
    // pass and five. Multiple exact distincts plan via Expand (cost
    // = one scan x #distinct-columns, the documented profiling price).
    Q(
      "profile_table",
      (s, d) => {
        val numeric = Seq("c_custkey", "c_nationkey", "c_acctbal")
        val strings = Seq("c_name", "c_mktsegment")
        val aggs = numeric.flatMap(c => Seq(
          count(col(c)).as(s"cnt_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("double").as(s"mn_$c"),
          max(col(c)).cast("double").as(s"mx_$c"))) ++
          strings.flatMap(c => Seq(
            count(col(c)).as(s"cnt_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            min(col(c)).cast("string").as(s"mn_$c"),
            max(col(c)).cast("string").as(s"mx_$c")))
        val entries = numeric.map(c => struct(
          lit(c).as("col_name"), col(s"cnt_$c").as("n_nonnull"),
          col(s"nd_$c").as("n_distinct"),
          col(s"mn_$c").as("min_num"), col(s"mx_$c").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))) ++
          strings.map(c => struct(
            lit(c).as("col_name"), col(s"cnt_$c").as("n_nonnull"),
            col(s"nd_$c").as("n_distinct"),
            lit(null).cast("double").as("min_num"),
            lit(null).cast("double").as("max_num"),
            col(s"mn_$c").as("min_str"), col(s"mx_$c").as("max_str")))
        T(s, d, "customer")
          .agg(aggs.head, aggs.tail: _*)
          .select(explode(array(entries: _*)).as("p"))
          .select("p.*")
          .orderBy("col_name")
      },
      Some {
        def num(c: String) =
          s"""SELECT '$c' AS col_name, CAST(count($c) AS BIGINT) AS n_nonnull,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
             |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
             |FROM customer""".stripMargin
        def str(c: String) =
          s"""SELECT '$c', CAST(count($c) AS BIGINT),
             |  CAST(count(DISTINCT $c) AS BIGINT),
             |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             |  CAST(min($c) AS VARCHAR), CAST(max($c) AS VARCHAR)
             |FROM customer""".stripMargin
        (Seq("c_custkey", "c_nationkey", "c_acctbal").map(num) ++
          Seq("c_name", "c_mktsegment").map(str))
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      },
      "one-scan column profile: counts, exact distincts, typed min/max, melted to rows"),

    // Per-group z-score outliers with EXACT moment accumulation: count /
    // sum / sum-of-squares in DECIMAL (order-independent), then one fixed
    // double expression — mean, sample variance, sqrt — identical on both
    // engines (IEEE ops + correctly-rounded sqrt), so even the z-scores
    // hash-match. The naive stddev() aggregate would be partition-order-
    // dependent in floating point and could never gate.
    Q(
      "stats_outlier_zscore",
      (s, d) => {
        val bal = col("c_acctbal").cast("decimal(18,2)")
        val moments = T(s, d, "customer")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum(bal).as("s1"),
            sum((bal * bal).cast("decimal(38,4)")).as("s2"))
        val mean = col("s1").cast("double") / col("n")
        val variance = (col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / col("n")) /
          (col("n") - lit(1))
        T(s, d, "customer")
          .join(broadcast(moments), Seq("c_mktsegment"))
          .withColumn("z",
            (col("c_acctbal") - mean) / sqrt(variance))
          .filter(abs(col("z")) > 1.5)
          .select("c_custkey", "c_mktsegment", "c_acctbal", "z")
          .orderBy("c_custkey")
      },
      Some("""WITH m AS (
             |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             |    SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s1,
             |    SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) *
             |             CAST(c_acctbal AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS s2
             |  FROM customer GROUP BY c_mktsegment)
             |SELECT c_custkey, c.c_mktsegment, c_acctbal,
             |  (c_acctbal - CAST(s1 AS DOUBLE) / n) /
             |  sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
             |       / (n - 1)) AS z
             |FROM customer c JOIN m ON m.c_mktsegment = c.c_mktsegment
             |WHERE abs((c_acctbal - CAST(s1 AS DOUBLE) / n) /
             |  sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
             |       / (n - 1))) > 1.5
             |ORDER BY c_custkey""".stripMargin),
      "per-group z-score outliers from exact decimal moments: even the scores hash-match"),

    // Fixed-width value histogram per event type: bin = floor(value /
    // width) — one double division + floor, bit-exact cross-engine — and
    // the bin edge re-derives as bin * width (exact: small-int × literal).
    // One map-side-combinable groupBy; bins the data does not hit simply
    // do not appear (dense display is timeseries_gapfill's spine trick,
    // not the profiler's job). The at-scale histogram primitive: state is
    // (groups × occupied bins), never data-sized.
    Q(
      "profile_histogram",
      (s, d) => {
        val width = 25.0
        T(s, d, "events")
          .groupBy(col("event_type"),
            floor(col("value") / lit(width)).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"))
          .withColumn("bin_lo", col("bin") * lit(width))
          .select("event_type", "bin", "bin_lo", "n")
          .orderBy("event_type", "bin")
      },
      Some("""SELECT event_type,
             |  CAST(floor(value / 25.0) AS BIGINT) AS bin,
             |  CAST(CAST(floor(value / 25.0) AS BIGINT) * 25.0 AS DOUBLE) AS bin_lo,
             |  count(*) AS n
             |FROM events GROUP BY 1, 2
             |ORDER BY event_type, bin""".stripMargin),
      "fixed-width histogram per group: occupied bins only, one rollup"),

    // Robust outliers by median absolute deviation (|v − med| > 3·MAD),
    // the estimator a few giant outliers cannot drag (z-scores move with
    // the very contamination they hunt — breakdown 0% vs MAD's 50%).
    // Medians are stored elements at explicit ranks under a total order
    // ([[graft.ops.StatOps.madOutliers]]), so even the scores hash-match;
    // interpolating quantiles never could. The oracle replicates the
    // rank selection with row_number windows.
    Q(
      "stats_mad_outliers",
      (s, d) =>
        graft.ops.StatOps
          .madOutliers(T(s, d, "events"), "event_type", "value", "event_id",
            k = 3.0)
          .orderBy("event_id"),
      Some("""WITH r AS (
             |  SELECT event_type, event_id, value,
             |    row_number() OVER (PARTITION BY event_type
             |                       ORDER BY value, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events),
             |med AS (SELECT event_type, value AS med FROM r
             |        WHERE rn = (n + 1) // 2),
             |dv AS (
             |  SELECT e.event_type, e.event_id, e.value, m.med,
             |    abs(e.value - m.med) AS dev
             |  FROM events e JOIN med m ON m.event_type = e.event_type),
             |dr AS (
             |  SELECT event_type, dev,
             |    row_number() OVER (PARTITION BY event_type
             |                       ORDER BY dev, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM dv),
             |mad AS (SELECT event_type, dev AS mad FROM dr
             |        WHERE rn = (n + 1) // 2)
             |SELECT d.event_type, d.event_id, d.value, d.med, a.mad, d.dev
             |FROM dv d JOIN mad a ON a.event_type = d.event_type
             |WHERE d.dev > 3.0 * a.mad
             |ORDER BY d.event_id""".stripMargin),
      "median-absolute-deviation outliers: robust flags from exact element-selection medians"),

    // Per-group winsorization to the [p05, p95] band — both bounds are
    // stored elements at ceil(pct·n/100) ranks, no interpolation
    // ([[graft.ops.StatOps.winsorize]]). The standard heavy-tail clamp
    // before feature export; one sort shuffle for both bounds.
    Q(
      "stats_winsorize",
      (s, d) =>
        graft.ops.StatOps
          .winsorize(T(s, d, "events"), "event_type", "value", "event_id",
            loPct = 5, hiPct = 95)
          .orderBy("event_id"),
      Some("""WITH r AS (
             |  SELECT event_type, event_id, value,
             |    row_number() OVER (PARTITION BY event_type
             |                       ORDER BY value, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events),
             |b AS (
             |  SELECT event_type,
             |    min(CASE WHEN rn = greatest(1, (5 * n + 99) // 100)
             |             THEN value END) AS lo,
             |    max(CASE WHEN rn = (95 * n + 99) // 100
             |             THEN value END) AS hi
             |  FROM r GROUP BY event_type)
             |SELECT e.event_type, e.event_id, e.value, b.lo, b.hi,
             |  least(greatest(e.value, b.lo), b.hi) AS clipped
             |FROM events e JOIN b ON b.event_type = e.event_type
             |ORDER BY e.event_id""".stripMargin),
      "per-group p05/p95 winsorization: element-selection bounds, heavy tails clamped"),

    // Functional-dependency audit: does lhs → rhs hold, and how badly is
    // it violated? One countDistinct rollup per candidate FD (the
    // schema-discovery / data-quality primitive: a violated "key" or a
    // drifting dimension shows up as n_violating > 0). Each check is one
    // map-side-combinable aggregate over its table; nothing row-sized
    // leaves the executors.
    Q(
      "profile_fd_violations",
      (s, d) => {
        def check(table: String, lhs: String, rhs: String) =
          T(s, d, table)
            .groupBy(col(lhs))
            .agg(countDistinct(col(rhs)).as("nd"))
            .agg(
              lit(s"$table: $lhs -> $rhs").as("fd"),
              count(lit(1)).as("n_groups"),
              sum((col("nd") > 1).cast("long")).as("n_violating"),
              max(col("nd")).as("max_distinct"))
        check("orders", "o_custkey", "o_orderpriority")
          .unionAll(check("lineitem", "l_partkey", "l_suppkey"))
          .unionAll(check("customer", "c_custkey", "c_name"))
          .orderBy("fd")
      },
      Some {
        def check(table: String, lhs: String, rhs: String) =
          s"""SELECT '$table: $lhs -> $rhs' AS fd,
             |  count(*) AS n_groups,
             |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_violating,
             |  CAST(max(nd) AS BIGINT) AS max_distinct
             |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nd
             |      FROM $table GROUP BY $lhs)""".stripMargin
        Seq(
          check("orders", "o_custkey", "o_orderpriority"),
          check("lineitem", "l_partkey", "l_suppkey"),
          check("customer", "c_custkey", "c_name"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
      },
      "functional-dependency audit: violation counts for candidate lhs→rhs rules"),

    // 2-D skyline / Pareto frontier of URGENT orders: minimize price,
    // maximize recency — "no cheaper-and-newer order exists". The engine
    // runs the distributive local-skyline-then-merge sweep
    // ([[graft.ops.StatOps.skyline2D]]): distinct points, per-bucket
    // sorted sweep, exact merge over the frontier-sized candidate set.
    // The oracle is the quadratic NOT EXISTS the sweep exists to avoid.
    Q(
      "stats_skyline_2d",
      (s, d) =>
        graft.ops.StatOps
          .skyline2D(
            T(s, d, "orders")
              .filter(col("o_orderpriority") === "1-URGENT"),
            "o_totalprice", "o_orderdate")
          .orderBy("o_totalprice"),
      Some("""WITH pts AS (
             |  SELECT o_totalprice, o_orderdate, count(*) AS n_rows
             |  FROM orders WHERE o_orderpriority = '1-URGENT'
             |  GROUP BY 1, 2)
             |SELECT o_totalprice, o_orderdate, n_rows FROM pts p
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM pts q
             |  WHERE q.o_totalprice <= p.o_totalprice
             |    AND q.o_orderdate >= p.o_orderdate
             |    AND (q.o_totalprice < p.o_totalprice
             |         OR q.o_orderdate > p.o_orderdate))
             |ORDER BY o_totalprice""".stripMargin),
      "Pareto frontier (min price, max recency): linear sorted sweep vs the quadratic oracle"),

    // Robust standardization (value − median)/IQR per group — the
    // feature-scaling transform outliers cannot drag, from the same
    // element-selection order statistics as the MAD gate
    // ([[graft.ops.StatOps.robustScale]]); degenerate IQR-0 groups
    // yield NULL instead of an ANSI division error.
    Q(
      "stats_robust_scale",
      (s, d) =>
        graft.ops.StatOps
          .robustScale(T(s, d, "events"), "event_type", "value", "event_id")
          .orderBy("event_id"),
      Some("""WITH r AS (
             |  SELECT event_type, event_id, value,
             |    row_number() OVER (PARTITION BY event_type
             |                       ORDER BY value, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events),
             |b AS (
             |  SELECT event_type,
             |    min(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med,
             |    min(CASE WHEN rn = greatest(1, (25 * n + 99) // 100)
             |             THEN value END) AS q1,
             |    max(CASE WHEN rn = (75 * n + 99) // 100
             |             THEN value END) AS q3
             |  FROM r GROUP BY event_type)
             |SELECT e.event_type, e.event_id, e.value, b.med,
             |  b.q3 - b.q1 AS iqr,
             |  CASE WHEN b.q3 - b.q1 <> 0.0
             |       THEN (e.value - b.med) / (b.q3 - b.q1) END AS scaled
             |FROM events e JOIN b ON b.event_type = e.event_type
             |ORDER BY e.event_id""".stripMargin),
      "median/IQR robust feature scaling: element-selection statistics, NULL-safe degenerate groups"),

    // Equi-depth (equi-height) histogram: 8 buckets per group assigned
    // POSITIONALLY — bucket = (rank−1)·B div n under the total order
    // (value, id) — so bucket populations are exactly balanced and the
    // whole thing is integer arithmetic; value-based edge derivation
    // (NTILE-free interpolation) never hash-gates. The optimizer-stats
    // histogram shape (Spark's own ANALYZE uses equi-height); one sort
    // shuffle, rollup shares it.
    Q(
      "profile_equidepth_hist",
      (s, d) => {
        val b = 8
        val w = Window.partitionBy("event_type").orderBy("value", "event_id")
        T(s, d, "events")
          .select(col("event_type"), col("event_id"), col("value"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy("event_type")))
          .withColumn("bucket", expr(s"(rn - 1) * $b div n"))
          .groupBy("event_type", "bucket")
          .agg(min("value").as("lo"), max("value").as("hi"),
            count(lit(1)).as("n_rows"))
          .orderBy("event_type", "bucket")
      },
      Some("""WITH r AS (
             |  SELECT event_type, event_id, value,
             |    row_number() OVER (PARTITION BY event_type
             |                       ORDER BY value, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events)
             |SELECT event_type, (rn - 1) * 8 // n AS bucket,
             |  min(value) AS lo, max(value) AS hi, count(*) AS n_rows
             |FROM r GROUP BY 1, 2
             |ORDER BY event_type, bucket""".stripMargin),
      "equi-depth histogram: positional buckets, balanced populations, pure integer assignment"),

    // Join-key skew diagnostics — the pre-flight check before any big
    // join: per-key frequency distribution of lineitem.l_partkey
    // (n_keys, max/p50/p99 frequency by element selection, and the
    // max/mean skew ratio as one double division). A skew ratio in the
    // hundreds is the signal to reach for SkewOps salting / AQE skew
    // join. Two rollups on one key.
    Q(
      "profile_skew_stats",
      (s, d) => {
        val freq = T(s, d, "lineitem")
          .groupBy("l_partkey").agg(count(lit(1)).as("f"))
        // scalable global rank (range partition + offsets) — a bare
        // ORDER BY window would single-partition the key universe; n =
        // max rank via a distributed aggregate + 1-row broadcast
        val ranked = graft.ops.StatOps.globalRowNumber(
          freq, Seq(col("f"), col("l_partkey")), "rn")
        ranked
          .join(broadcast(ranked.agg(max("rn").as("n"))))
          .agg(
            max("n").as("n_keys"),
            sum("f").as("n_rows"),
            max("f").as("max_f"),
            max(when(col("rn") === expr("(n + 1) div 2"), col("f")))
              .as("p50_f"),
            max(when(col("rn") === expr("(99 * n + 99) div 100"), col("f")))
              .as("p99_f"))
          .withColumn("skew_ratio",
            col("max_f").cast("double") /
              (col("n_rows").cast("double") / col("n_keys").cast("double")))
      },
      Some("""WITH freq AS (
             |  SELECT l_partkey, count(*) AS f FROM lineitem GROUP BY 1),
             |r AS (SELECT f,
             |    row_number() OVER (ORDER BY f, l_partkey) AS rn,
             |    count(*) OVER () AS n
             |  FROM freq),
             |a AS (SELECT
             |    CAST(max(n) AS BIGINT) AS n_keys,
             |    CAST(SUM(f) AS BIGINT) AS n_rows,
             |    CAST(max(f) AS BIGINT) AS max_f,
             |    CAST(max(CASE WHEN rn = (n + 1) // 2 THEN f END) AS BIGINT)
             |      AS p50_f,
             |    CAST(max(CASE WHEN rn = (99 * n + 99) // 100 THEN f END)
             |         AS BIGINT) AS p99_f
             |  FROM r)
             |SELECT n_keys, n_rows, max_f, p50_f, p99_f,
             |  CAST(max_f AS DOUBLE) /
             |    (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE))
             |    AS skew_ratio
             |FROM a""".stripMargin),
      "join-key skew census: frequency order statistics + max/mean ratio, the salting pre-check"),

    // Benford first-digit audit: the leading-digit distribution of order
    // totals with each digit's observed share — the classic
    // fabricated-data screen (organic multiplicative amounts follow
    // log10(1+1/d); uniform or spiky digits are the red flag). Digit
    // extraction is integer/string only, shares are one double division;
    // the expected Benford share is emitted as a rational-free reference
    // via log10 of SMALL INTEGER ratios? No — log is not cross-engine
    // reproducible, so the gate emits observed counts/shares only and
    // leaves the log10 comparison to the consumer (same policy as the
    // PMI gate's "log left to the consumer").
    Q(
      "profile_benford_digits",
      (s, d) => {
        val total = T(s, d, "orders").agg(count(lit(1)).as("n"))
        T(s, d, "orders")
          .select(substring(floor(col("o_totalprice")).cast("long")
            .cast("string"), 1, 1).as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("cnt"))
          .join(broadcast(total))
          .select(col("digit"), col("cnt"),
            (col("cnt").cast("double") / col("n")).as("share"))
          .orderBy("digit")
      },
      Some("""WITH t AS (SELECT count(*) AS n FROM orders),
             |d AS (SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
             |                         AS VARCHAR), 1, 1) AS digit,
             |        count(*) AS cnt
             |      FROM orders GROUP BY 1)
             |SELECT digit, cnt, CAST(cnt AS DOUBLE) / n AS share
             |FROM d, t ORDER BY digit""".stripMargin),
      "Benford leading-digit audit: observed digit shares, the fabricated-data screen"),

    // Snapshot drift bins ([[graft.ops.CorpusOps.binDriftCounts]]): the
    // doc-length histogram of snapshot v1 (even ids) against v2 (all
    // docs) — the paired integer counts a PSI/chi-square drift monitor
    // consumes (logs stay consumer-side, the DSIR precedent).
    Q(
      "profile_drift_bins",
      (s, d) => {
        val docs = T(s, d, "documents")
          .select(col("doc_id"), length(col("text")).cast("long").as("len"))
        graft.ops.CorpusOps.binDriftCounts(
            docs.filter(pmod(col("doc_id"), lit(2)) === 0), docs,
            "len", binWidth = 50L)
          .orderBy("bin")
      },
      Some("""WITH v AS (SELECT doc_id,
             |    CAST(length(text) AS BIGINT) AS len FROM documents),
             |a AS (SELECT CAST(floor(len / 50.0) AS BIGINT) AS bin,
             |    CAST(count(*) AS BIGINT) AS n_a
             |  FROM v WHERE doc_id % 2 = 0 GROUP BY 1),
             |b AS (SELECT CAST(floor(len / 50.0) AS BIGINT) AS bin,
             |    CAST(count(*) AS BIGINT) AS n_b
             |  FROM v GROUP BY 1)
             |SELECT b.bin, coalesce(a.n_a, 0) AS n_a, b.n_b
             |FROM b LEFT JOIN a USING (bin)
             |ORDER BY b.bin""".stripMargin),
      "snapshot drift bins: paired doc-length histograms, PSI-ready integer counts"),

    // The PSI statistic itself ([[graft.ops.CorpusOps.psiDrift]]) over
    // the same snapshot pair: add-one-smoothed bin probabilities keep
    // every log argument an exact integer rational, one portable ln per
    // bin, bin-ordered fold — the gate the drift-bins one deferred
    // ("logs stay consumer-side") until PortableLn made them gateable.
    Q(
      "profile_psi",
      (s, d) => {
        val docs = T(s, d, "documents")
          .select(col("doc_id"), length(col("text")).cast("long").as("len"))
        graft.ops.CorpusOps.psiDrift(
            docs.filter(pmod(col("doc_id"), lit(2)) === 0), docs,
            "len", binWidth = 50L)
          .orderBy("n_bins")
      },
      Some {
        import graft.expr.PortableLnRatio.sqlStages
        s"""WITH v AS (SELECT doc_id,
           |    CAST(length(text) AS BIGINT) AS len FROM documents),
           |a AS (SELECT CAST(floor(len / 50.0) AS BIGINT) AS bin,
           |    CAST(count(*) AS BIGINT) AS n_a
           |  FROM v WHERE doc_id % 2 = 0 GROUP BY 1),
           |b AS (SELECT CAST(floor(len / 50.0) AS BIGINT) AS bin,
           |    CAST(count(*) AS BIGINT) AS n_b
           |  FROM v GROUP BY 1),
           |bins AS (SELECT b.bin, coalesce(a.n_a, 0) AS n_a, b.n_b
           |  FROM b LEFT JOIN a USING (bin)),
           |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
           |    CAST(sum(n_b) AS BIGINT) AS tb,
           |    CAST(count(*) AS BIGINT) AS nb FROM bins),
           |bt AS (SELECT bin, n_a, n_b, ta, tb, nb,
           |    (n_a + 1) * (tb + nb) AS num,
           |    (n_b + 1) * (ta + nb) AS den
           |  FROM bins, tot),
           |${sqlStages("ps", "bt", "num", "den",
              Seq("bin", "n_a", "n_b", "ta", "tb", "nb"))}
           |SELECT max(ta) AS n_a, max(tb) AS n_b,
           |  CAST(count(*) AS BIGINT) AS n_bins,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list((CAST(n_a + 1 AS DOUBLE) / CAST(ta + nb AS DOUBLE) -
           |            CAST(n_b + 1 AS DOUBLE) / CAST(tb + nb AS DOUBLE)) *
           |           pln
           |           ORDER BY coalesce(bin, -9223372036854775808))),
           |    (acc, t) -> acc + t) AS psi
           |FROM psln ORDER BY n_bins""".stripMargin
      },
      "population stability index: smoothed exact-rational bins, one portable ln per term"),

    // Mutual information of (lang, source)
    // ([[graft.ops.StatOps.mutualInformation]]): does the ingestion
    // source leak the language? Exact integer ratios into one ln per
    // term, folded in category order; normalized MI for the [0,1]
    // reading. The oracle replays cells, marginals and folds.
    Q(
      "profile_mutual_info",
      (s, d) =>
        graft.ops.StatOps
          .mutualInformation(T(s, d, "documents"), "lang", "source")
          .orderBy("n"),
      Some {
        import graft.expr.PortableLnRatio.sqlStages
        s"""WITH cxy AS (
           |  SELECT lang AS x, source AS y,
           |    CAST(count(*) AS BIGINT) AS nxy
           |  FROM documents GROUP BY 1, 2),
           |cx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx
           |       FROM cxy GROUP BY x),
           |cy AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny
           |       FROM cxy GROUP BY y),
           |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cxy),
           |cells AS (SELECT x, y, nxy, nx, ny, n
           |  FROM cxy JOIN cx USING (x) JOIN cy USING (y), tot),
           |cxn AS (SELECT x, nx, n FROM cx, tot),
           |cyn AS (SELECT y, ny, n FROM cy, tot),
           |${sqlStages("pm", "cells", "nxy * n", "nx * ny",
              Seq("x", "y", "nxy", "n"))},
           |${sqlStages("ph", "cxn", "nx", "n", Seq("x", "nx", "n"))},
           |${sqlStages("pg", "cyn", "ny", "n", Seq("y", "ny", "n"))},
           |mi AS (SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS n_cells,
           |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |        list(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE) * pln
           |             ORDER BY x, y)),
           |      (acc, t) -> acc + t) AS mi
           |  FROM pmln),
           |hx AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list(-(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)) * pln
           |           ORDER BY x)),
           |    (acc, t) -> acc + t) AS h_x FROM phln),
           |hy AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list(-(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)) * pln
           |           ORDER BY y)),
           |    (acc, t) -> acc + t) AS h_y FROM pgln)
           |SELECT n, n_cells, mi, h_x, h_y,
           |  CASE WHEN h_x > 0 AND h_y > 0
           |    THEN mi / (sqrt(h_x) * sqrt(h_y)) END AS nmi
           |FROM mi, hx, hy ORDER BY n""".stripMargin
      },
      "mutual information lang vs source: one-ln-per-term exact rationals, ordered folds"),

    // Chi-square independence + Cramér's V of (lang, source)
    // ([[graft.ops.StatOps.chiSquareIndependence]]): the frequentist
    // sibling of the MI gate — test statistic and [0,1] effect size over
    // the FULL R×C grid (unobserved cells contribute their expected
    // mass). Exact integer marginals, one double division per cell,
    // (x,y)-ordered fold, IEEE sqrt — portable with no ln at all.
    Q(
      "profile_chi2",
      (s, d) =>
        graft.ops.StatOps
          .chiSquareIndependence(T(s, d, "documents"), "lang", "source")
          .orderBy("n"),
      Some("""WITH cxy AS (SELECT lang AS x, source AS y,
             |    CAST(count(*) AS BIGINT) AS nxy
             |  FROM documents GROUP BY 1, 2),
             |cx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx
             |       FROM cxy GROUP BY x),
             |cy AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny
             |       FROM cxy GROUP BY y),
             |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cxy),
             |grid AS (SELECT cx.x, cy.y, cx.nx, cy.ny, tot.n,
             |    coalesce(c.nxy, 0) AS o
             |  FROM cx CROSS JOIN cy
             |  LEFT JOIN cxy c ON c.x = cx.x AND c.y = cy.y, tot),
             |t AS (SELECT x, y, n,
             |    (CAST(o AS DOUBLE) -
             |       CAST(nx * ny AS DOUBLE) / CAST(n AS DOUBLE)) *
             |    (CAST(o AS DOUBLE) -
             |       CAST(nx * ny AS DOUBLE) / CAST(n AS DOUBLE)) /
             |    (CAST(nx * ny AS DOUBLE) / CAST(n AS DOUBLE)) AS t
             |  FROM grid),
             |agg AS (SELECT max(n) AS n,
             |    CAST(count(DISTINCT x) AS BIGINT) AS n_rows,
             |    CAST(count(DISTINCT y) AS BIGINT) AS n_cols,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list(t ORDER BY x, y)),
             |      (acc, v) -> acc + v) AS chi2
             |  FROM t)
             |SELECT n, n_rows, n_cols,
             |  (n_rows - 1) * (n_cols - 1) AS dof, chi2,
             |  CASE WHEN (n_rows - 1) * (n_cols - 1) > 0 AND n > 0
             |    THEN sqrt(chi2 / CAST(n * least(n_rows - 1, n_cols - 1)
             |                          AS DOUBLE)) END AS cramers_v
             |FROM agg ORDER BY n""".stripMargin),
      "chi-square independence + Cramer's V: full-grid expected mass, ln-free portable fold"),

    // Jensen–Shannon divergence of src0's language mix vs the rest
    // ([[graft.ops.StatOps.jsDivergence]]): the symmetric, always-finite
    // drift number beside the drift-bin counts (KL explodes on any
    // category one side lacks; JSD caps at ln 2). Every log is the exact
    // count rational 2·a·B/(a·B + b·A) via the portable ln; category-
    // ordered folds; zero-count categories add an exact +0.0 both sides.
    Q(
      "profile_js_divergence",
      (s, d) =>
        graft.ops.StatOps.jsDivergence(
            T(s, d, "documents")
              .select(col("lang"), (col("source") === "src0").as("is_src0")),
            "lang", "is_src0")
          .orderBy("n_cats"),
      Some {
        import graft.expr.PortableLnRatio.sqlStages
        s"""WITH c AS (SELECT lang AS k,
           |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS a,
           |    CAST(sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END)
           |      AS BIGINT) AS b
           |  FROM documents GROUP BY 1),
           |tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
           |               CAST(sum(b) AS BIGINT) AS tb FROM c),
           |ct AS (SELECT k, a, b, ta, tb FROM c, tot),
           |pp AS (SELECT k, a, ta, 2 * a * tb AS num,
           |    a * tb + b * ta AS den
           |  FROM ct WHERE a > 0 AND tb > 0),
           |${sqlStages("jp", "pp", "num", "den", Seq("k", "a", "ta"))},
           |qq AS (SELECT k, b, tb, 2 * b * ta AS num,
           |    b * ta + a * tb AS den
           |  FROM ct WHERE b > 0 AND ta > 0),
           |${sqlStages("jq", "qq", "num", "den", Seq("k", "b", "tb"))},
           |sp AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list(CAST(a AS DOUBLE) / CAST(ta AS DOUBLE) * pln
           |           ORDER BY k)),
           |    (x, y) -> x + y) AS sp FROM jpln),
           |sq AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list(CAST(b AS DOUBLE) / CAST(tb AS DOUBLE) * pln
           |           ORDER BY k)),
           |    (x, y) -> x + y) AS sq FROM jqln)
           |SELECT tot.ta AS n_a, tot.tb AS n_b,
           |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_cats,
           |  CASE WHEN tot.ta > 0 AND tot.tb > 0
           |    THEN CAST(0.5 AS DOUBLE) * sp.sp +
           |         CAST(0.5 AS DOUBLE) * sq.sq END AS jsd,
           |  CASE WHEN tot.ta > 0 AND tot.tb > 0
           |    THEN (CAST(0.5 AS DOUBLE) * sp.sp +
           |          CAST(0.5 AS DOUBLE) * sq.sq) /
           |      CAST(${graft.expr.PortableLnRatio.Ln2} AS DOUBLE)
           |  END AS jsd_norm
           |FROM tot, sp, sq ORDER BY n_cats""".stripMargin
      },
      "JS divergence of src0 vs rest language mixes: exact count rationals, portable ln"),

    // Pairwise Pearson matrix over lineitem's four measures
    // ([[graft.ops.StatOps.correlationMatrix]]): the profiling pass
    // behind feature-redundancy screens. One corpus scan for every
    // moment, C(4,2) fixed IEEE trees after; the oracle generates the
    // same six CASE rows from the same HUGEINT moment names.
    Q(
      "profile_correlation_matrix",
      (s, d) =>
        graft.ops.StatOps.correlationMatrix(T(s, d, "lineitem"),
            Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .orderBy("col_a", "col_b"),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val short = cols.zipWithIndex.map { case (c, i) => c -> s"c$i" }.toMap
        val pairs = for {
          i <- cols.indices; j <- cols.indices if i < j
        } yield (cols(i), cols(j))
        val sums =
          cols.map(c => s"sum(CAST(${short(c)} AS HUGEINT)) AS s_${short(c)}") ++
            cols.map(c =>
              s"sum(CAST(${short(c)} AS HUGEINT) * ${short(c)}) AS q_${short(c)}_${short(c)}") ++
            pairs.map { case (a, b) =>
              s"sum(CAST(${short(a)} AS HUGEINT) * ${short(b)}) AS q_${short(a)}_${short(b)}"
            }
        val rows = pairs.map { case (a, b) =>
          val (x, y) = (short(a), short(b))
          s"""SELECT '$a' AS col_a, '$b' AS col_b,
             |  CAST(n AS BIGINT) AS n,
             |  CASE WHEN n * q_${x}_$x - s_$x * s_$x > 0
             |        AND n * q_${y}_$y - s_$y * s_$y > 0 THEN
             |    CAST(n * q_${x}_$y - s_$x * s_$y AS DOUBLE) /
             |    (sqrt(CAST(n * q_${x}_$x - s_$x * s_$x AS DOUBLE)) *
             |     sqrt(CAST(n * q_${y}_$y - s_$y * s_$y AS DOUBLE)))
             |  END AS r
             |FROM m""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH q AS (SELECT
           |    ${cols.map(c => s"CAST(floor($c * 100) AS BIGINT) AS ${short(c)}").mkString(",\n    ")}
           |  FROM lineitem),
           |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |    ${sums.mkString(",\n    ")}
           |  FROM q)
           |$rows
           |ORDER BY col_a, col_b""".stripMargin
      },
      "Pearson matrix in one scan: cent-quantized DECIMAL moments, C(k,2) IEEE trees")
  )
}
