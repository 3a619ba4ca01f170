package graft.queries

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
             |  CAST(floor(value / 25.0) AS BIGINT) * 25.0 AS bin_lo,
             |  count(*) AS n
             |FROM events GROUP BY 1, 2
             |ORDER BY event_type, bin""".stripMargin),
      "fixed-width histogram per group: occupied bins only, one rollup")
  )
}
