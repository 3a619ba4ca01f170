package graft.queries

import graft.{Q, T}
import graft.ops.SketchOps

/** Cardinality-sketch gate: KMV approximate distinct. The sketch is a
  * deterministic function of the data (k smallest salted-hash values), so
  * unlike HLL the ESTIMATOR itself is hash-gated against DuckDB — the
  * oracle rebuilds the same 52-bit hashes, ranks them, and applies the
  * same unbiased (k-1)/U(k) arithmetic in exact IEEE doubles. Accuracy
  * (~1/sqrt(k) relative error) and merge associativity are asserted in
  * SketchOpsSpec; this gate proves the distributed plan computes the
  * sketch the specification says.
  */
object SketchQueries {

  private val K = 256

  val all: Seq[Q] = Seq(
    // Bottom-k row sample → discrete rank quantiles. Same deterministic
    // bottom-k-by-hash state as the KMV gate, carrying l_extendedprice;
    // the oracle rebuilds the identical sample and rank selection.
    Q(
      "sketch_quantile_bottomk",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, concat_ws}
        SketchOps
          .bottomKQuantiles(T(s, d, "lineitem"),
            concat_ws("-", col("l_orderkey"), col("l_linenumber")),
            col("l_extendedprice"), Seq("l_returnflag"), K,
            ps = Seq(0.1, 0.5, 0.9))
          .orderBy("l_returnflag", "p")
      },
      Some(s"""WITH s AS (
              |  SELECT l_returnflag,
              |    CAST(('0x' || substr(md5('kq:' || CAST(l_orderkey AS VARCHAR)
              |      || '-' || CAST(l_linenumber AS VARCHAR)), 1, 13)) AS BIGINT) AS h,
              |    l_extendedprice AS v
              |  FROM lineitem),
              |r AS (SELECT l_returnflag, h, v,
              |        row_number() OVER (PARTITION BY l_returnflag ORDER BY h, v) AS rn
              |      FROM s),
              |smp AS (SELECT * FROM r WHERE rn <= $K),
              |rv AS (SELECT l_returnflag, v,
              |         row_number() OVER (PARTITION BY l_returnflag ORDER BY v, h) AS vr,
              |         count(*) OVER (PARTITION BY l_returnflag) AS n
              |       FROM smp)
              |SELECT l_returnflag, p, v AS q
              |FROM rv, (VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
              |                 (CAST(0.9 AS DOUBLE))) ps(p)
              |WHERE vr = CAST(floor((n - 1) * p) AS BIGINT) + 1
              |ORDER BY l_returnflag, p""".stripMargin),
      "bottom-k sample quantiles: deterministic uniform row sample, rank-selected"),

    // Count-Min frequency sketch, completing the sketch trio (distinct /
    // quantiles / frequencies): token counts estimated from 3x64 bounded
    // counters instead of one counter per distinct key. Deterministic
    // salted bucket hashes → the oracle rebuilds the identical counter
    // table and min-read; estimates are exact-or-over by construction
    // (asserted in SketchOpsSpec), and the gate emits exact counts next
    // to the estimates so the error is visible data.
    Q(
      "sketch_cms_freq",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, count, explode, lit, split}
        val tok = T(s, d, "documents")
          .select(explode(split(col("text"), " +")).as("key"))
        val counters = SketchOps.cmsCounters(tok, col("key"), w = 64, d = 3)
        val est = SketchOps.cmsEstimate(counters, tok.distinct(), col("key"),
          w = 64, d = 3)
        tok.groupBy("key").agg(count(lit(1)).as("n_exact"))
          .join(est, "key")
          .select(col("key").as("token"), col("n_exact"), col("est_count"))
          .orderBy("token")
      },
      Some {
        def bucket(i: Int) =
          s"CAST(('0x' || substr(md5('cms$i:' || key), 1, 13)) AS BIGINT) % 64"
        val probes = (0 until 3).map(i =>
          s"SELECT key, $i AS seed, ${bucket(i)} AS bucket FROM tok")
          .mkString("\n  UNION ALL\n  ")
        val kprobes = (0 until 3).map(i =>
          s"SELECT key, $i AS seed, ${bucket(i)} AS bucket FROM keys")
          .mkString("\n  UNION ALL\n  ")
        s"""WITH tok AS (
           |  SELECT unnest(string_split_regex(text, ' +')) AS key FROM documents),
           |probes AS (
           |  $probes),
           |counters AS (
           |  SELECT seed, bucket, count(*) AS cnt FROM probes GROUP BY 1, 2),
           |keys AS (SELECT DISTINCT key FROM tok),
           |kp AS (
           |  $kprobes),
           |est AS (
           |  SELECT key, min(coalesce(cnt, 0)) AS est_count
           |  FROM kp LEFT JOIN counters USING (seed, bucket) GROUP BY key),
           |exact AS (SELECT key, count(*) AS n_exact FROM tok GROUP BY key)
           |SELECT key AS token, n_exact, est_count
           |FROM exact JOIN est USING (key)
           |ORDER BY token""".stripMargin
      },
      "count-min frequency sketch: bounded counters, min-read estimates vs exact"),

    Q(
      "sketch_kmv_distinct",
      (s, d) =>
        SketchOps
          .kmvDistinct(T(s, d, "orders"), "o_custkey",
            Seq("o_orderpriority"), K)
          .orderBy("o_orderpriority"),
      Some(s"""WITH h AS (
              |  SELECT DISTINCT o_orderpriority,
              |    CAST(('0x' || substr(md5('kmv:' || CAST(o_custkey AS VARCHAR)), 1, 13))
              |      AS BIGINT) AS h
              |  FROM orders),
              |r AS (SELECT o_orderpriority, h,
              |        row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
              |      FROM h)
              |SELECT o_orderpriority, count(*) AS n_sketch,
              |  CASE WHEN count(*) < $K THEN CAST(count(*) AS DOUBLE)
              |       ELSE ${K - 1}e0 * 4503599627370496e0 /
              |            max(CASE WHEN rn = $K THEN h END)
              |  END AS est_distinct
              |FROM r WHERE rn <= $K
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "KMV distinct-count sketch per group: deterministic, mergeable, oracle-exact"),

    // HyperLogLog with a PINNED register spec (hash52, low-6-bit bucket,
    // rho = leading zeros of the 46-bit window + 1): unlike library HLLs
    // the whole estimator is reproducible on any engine, so the oracle
    // rebuilds the registers and the harmonic mean bit for bit. The sum
    // is integer-space (exact), the single double division uses the
    // identical IEEE constant on both sides, and the exact distinct count
    // rides along so the ~1.04/sqrt(64) error is visible data.
    Q(
      "sketch_hll_distinct",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, countDistinct}
        val li = T(s, d, "lineitem")
        val est = SketchOps.hllDistinct(li, col("l_orderkey"),
          Seq("l_returnflag"), p = 6)
        li.groupBy("l_returnflag")
          .agg(countDistinct(col("l_orderkey")).as("n_exact"))
          .join(est, "l_returnflag")
          .select("l_returnflag", "n_exact", "est_distinct")
          .orderBy("l_returnflag")
      },
      Some(s"""WITH h AS (
              |  SELECT l_returnflag AS g,
              |    CAST(('0x' || substr(md5('hll:' || CAST(l_orderkey AS VARCHAR)), 1, 13))
              |      AS BIGINT) AS h
              |  FROM lineitem),
              |d AS (SELECT DISTINCT g, h FROM h),
              |r AS (SELECT g, h % 64 AS bucket,
              |        CASE WHEN h // 64 = 0 THEN 47
              |             ELSE 47 - length(format('{:b}', h // 64)) END AS rho
              |      FROM d),
              |reg AS (SELECT g, bucket, max(rho) AS m_rho FROM r GROUP BY g, bucket),
              |s AS (SELECT g, sum(CAST(1 AS BIGINT) << (47 - m_rho)) AS sp,
              |        count(*) AS nb
              |      FROM reg GROUP BY g),
              |est AS (SELECT g,
              |    CASE WHEN ${SketchOps.hllNumerator(6)} /
              |              CAST(sp + (64 - nb) * (CAST(1 AS BIGINT) << 47) AS DOUBLE) <= 160.0
              |              AND (64 - nb) > 0
              |         THEN 64e0 * ln(64e0 / CAST(64 - nb AS DOUBLE))
              |         ELSE ${SketchOps.hllNumerator(6)} /
              |              CAST(sp + (64 - nb) * (CAST(1 AS BIGINT) << 47) AS DOUBLE)
              |    END AS est_distinct
              |  FROM s),
              |ex AS (SELECT l_returnflag AS g, count(DISTINCT l_orderkey) AS n_exact
              |       FROM lineitem GROUP BY 1)
              |SELECT ex.g AS l_returnflag, n_exact, est_distinct
              |FROM ex JOIN est ON ex.g = est.g ORDER BY 1""".stripMargin),
      "HyperLogLog distinct per group: pinned register spec, 48-byte state, " +
        "per-bucket-MAX merge, oracle-exact estimator"),

    // The HLL MERGE law as a gate: per-group register tables (the state
    // a 100 TB pipeline persists per source/day) merged by per-bucket
    // MAX into ONE global sketch, estimated with the identical
    // arithmetic (SketchOps.hllEstimate — shared with the per-group
    // gate). The oracle computes the direct global sketch: merge and
    // direct are equal BY THE MERGE LAW (max is associative), so a
    // divergence in the engine's merge path fails the hash. Exact count
    // rides along as visible truth. The 1x1 scalar cross join is
    // declared in PlanGuardSpec.
    Q(
      "sketch_hll_union",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, countDistinct}
        val li = T(s, d, "lineitem")
        val perGroup = SketchOps.hllRegisters(
          li, col("l_orderkey"), Seq("l_returnflag"))
        val est = SketchOps.hllEstimate(
          SketchOps.hllMergeRegisters(perGroup, Nil), Nil)
        est.crossJoin(
          li.agg(countDistinct(col("l_orderkey")).as("n_exact")))
      },
      Some(s"""WITH h AS (
              |  SELECT DISTINCT
              |    CAST(('0x' || substr(md5('hll:' || CAST(l_orderkey AS VARCHAR)), 1, 13))
              |      AS BIGINT) AS h
              |  FROM lineitem),
              |r AS (SELECT h % 64 AS bucket,
              |        CASE WHEN h // 64 = 0 THEN 47
              |             ELSE 47 - length(format('{:b}', h // 64)) END AS rho
              |      FROM h),
              |reg AS (SELECT bucket, max(rho) AS m_rho FROM r GROUP BY bucket),
              |s AS (SELECT sum(CAST(1 AS BIGINT) << (47 - m_rho)) AS sp,
              |        count(*) AS nb
              |      FROM reg)
              |SELECT
              |  CASE WHEN ${SketchOps.hllNumerator(6)} /
              |            CAST(sp + (64 - nb) * (CAST(1 AS BIGINT) << 47) AS DOUBLE) <= 160.0
              |            AND (64 - nb) > 0
              |       THEN 64e0 * ln(64e0 / CAST(64 - nb AS DOUBLE))
              |       ELSE ${SketchOps.hllNumerator(6)} /
              |            CAST(sp + (64 - nb) * (CAST(1 AS BIGINT) << 47) AS DOUBLE)
              |  END AS est_distinct,
              |  (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem)
              |    AS n_exact
              |FROM s""".stripMargin),
      "HLL register merge across groups == direct global sketch (the " +
        "merge law, hash-gated); exact count alongside"),

    // Rolling 7-day WAU from SKETCHES: per-day HLL registers (64 rows a
    // day, whatever the traffic), expanded ×7 to the trailing windows
    // they serve and merged by per-bucket MAX — the production WAU at
    // 100 TB, where re-scanning 7 days of raw events per day
    // (`rolling_distinct_users`, gated exact) stops being an option. The
    // gate emits the merged register state (nb, sp) and the RAW
    // estimator: the linear-counting small-range branch uses ln(), which
    // is not bit-reproducible across engines — state + raw estimator
    // are, and the state is the artifact a warehouse actually stores.
    Q(
      "sketch_hll_rolling_wau",
      (s, d) => {
        import org.apache.spark.sql.functions._
        val ev = T(s, d, "events")
          .select(col("user_id"),
            date_trunc("day", col("ts")).cast("date").as("d"))
        val perDay = SketchOps.hllRegisters(ev, col("user_id"), Seq("d"))
        val days = ev.select(col("d").as("day")).distinct()
        val merged = SketchOps.hllMergeRegisters(
          perDay
            .withColumn("day", explode(sequence(col("d"), date_add(col("d"), 6))))
            .join(days, "day"),
          Seq("day"))
        merged.groupBy("day")
          .agg(count(lit(1)).as("nb"),
            sum(expr("shiftleft(1L, 47 - m_rho)")).as("sp"))
          .withColumn("est_raw",
            lit(SketchOps.hllNumerator(6)) /
              (col("sp") + (lit(64L) - col("nb")) * lit(1L << 47))
                .cast("double"))
          .orderBy("day")
      },
      Some(s"""WITH ud AS (
              |  SELECT DISTINCT user_id,
              |    CAST(date_trunc('day', ts) AS DATE) AS d
              |  FROM events),
              |days AS (SELECT DISTINCT d FROM ud),
              |h AS (SELECT d,
              |    CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 13))
              |      AS BIGINT) AS h
              |  FROM ud),
              |r AS (SELECT d, h % 64 AS bucket,
              |        CASE WHEN h // 64 = 0 THEN 47
              |             ELSE 47 - length(format('{:b}', h // 64)) END AS rho
              |      FROM h),
              |e AS (SELECT
              |        CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
              |                                    INTERVAL 1 DAY)) AS DATE) AS day,
              |        bucket, rho
              |      FROM r),
              |reg AS (SELECT e.day, bucket, max(rho) AS m_rho
              |        FROM e JOIN days ON e.day = days.d GROUP BY 1, 2),
              |st AS (SELECT day, count(*) AS nb,
              |         CAST(sum(CAST(1 AS BIGINT) << (47 - m_rho)) AS BIGINT) AS sp
              |       FROM reg GROUP BY day)
              |SELECT day, nb, sp,
              |  ${SketchOps.hllNumerator(6)} /
              |    CAST(sp + (64 - nb) * (CAST(1 AS BIGINT) << 47) AS DOUBLE)
              |    AS est_raw
              |FROM st ORDER BY day""".stripMargin),
      "rolling WAU from merged per-day HLL sketches: register state + raw estimator, " +
        "64 rows/day however large the traffic"),

    // Bloom-pruned semi join: lineitem rows for urgent orders, with every
    // fact row tested against a broadcast Bloom filter of the order-key
    // set BEFORE the exact semi join (SketchOps.bloomSemiJoin — Spark's
    // own BloomFilterAggregate via the Column bridge). The oracle is the
    // PLAIN semi join: the filter admits false positives, never false
    // negatives, and the exact join removes the former — so the gate
    // proves the pruning path changes nothing. BloomPruneSpec measures
    // that it actually prunes.
    Q(
      "bloom_semi_prune",
      (s, d) => {
        import org.apache.spark.sql.functions.col
        val urgent = T(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        SketchOps
          .bloomSemiJoin(T(s, d, "lineitem"), urgent,
            "l_orderkey", "o_orderkey",
            expectedItems = 40000L, numBits = 400000L)
          .select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
             |                     WHERE o_orderpriority = '1-URGENT')
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      "Bloom-filter pre-pruned semi join: broadcast sketch guards the " +
        "shuffle, exact join keeps it lossless"),

    // KMV set operations: |A ∪ B|, Jaccard, |A ∩ B| estimated from the
    // two k-minima sketches ALONE (theta-sketch trick) — the pattern for
    // "distinct overlap of two 10-billion-key sets" where the exact
    // full-outer join on keys is the thing being avoided. Exact counts
    // ride along as visible truth.
    Q(
      "sketch_kmv_setops",
      (s, d) => {
        import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}
        val o = T(s, d, "orders")
        val a = o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("k"))
        val b = o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("k"))
        val est = SketchOps.kmvSetEstimates(a, b, "k", K)
        val exact = a.distinct().withColumn("ina", lit(1))
          .join(b.distinct().withColumn("inb", lit(1)), Seq("k"), "full_outer")
          .agg(count(lit(1)).as("exact_union"),
            sum(coalesce(col("ina"), lit(0)) * coalesce(col("inb"), lit(0)))
              .as("exact_intersection"))
        // Both sides are single-row aggregates: an explicit 1x1 cross
        // join (declared in PlanGuardSpec) — scalar-by-construction, so
        // the nested-loop plan is O(1) regardless of input scale.
        exact.crossJoin(est)
          .select("exact_union", "exact_intersection", "est_union",
            "jaccard", "est_intersection")
      },
      Some {
        def side(name: String, status: String) =
          s"""${name}_h AS (
             |  SELECT DISTINCT CAST(('0x' || substr(md5('kmv:' || CAST(o_custkey AS VARCHAR)), 1, 13))
             |    AS BIGINT) AS h
             |  FROM orders WHERE o_orderstatus = '$status'),
             |${name}_r AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ${name}_h),
             |${name}_m AS (SELECT h FROM ${name}_r WHERE rn <= $K)""".stripMargin
        s"""WITH ${side("a", "F")},
           |${side("b", "O")},
           |u AS (SELECT coalesce(a_m.h, b_m.h) AS h,
           |        CASE WHEN a_m.h IS NOT NULL THEN 1 ELSE 0 END AS ina,
           |        CASE WHEN b_m.h IS NOT NULL THEN 1 ELSE 0 END AS inb
           |      FROM a_m FULL JOIN b_m ON a_m.h = b_m.h),
           |tk AS (SELECT h, ina, inb, row_number() OVER (ORDER BY h) AS rn FROM u),
           |agg AS (SELECT count(*) AS n_u, max(CASE WHEN rn = $K THEN h END) AS hk,
           |          CAST(sum(ina * inb) AS BIGINT) AS n_both
           |        FROM tk WHERE rn <= $K),
           |est AS (SELECT
           |    CASE WHEN n_u < $K THEN CAST(n_u AS DOUBLE)
           |         ELSE ${K - 1}e0 * 4503599627370496e0 / hk END AS est_union,
           |    CAST(n_both AS DOUBLE) / CAST(n_u AS DOUBLE) AS jaccard
           |  FROM agg),
           |ea AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
           |eb AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
           |ex AS (SELECT count(*) AS exact_union,
           |         CAST(sum(CASE WHEN ea.k IS NOT NULL AND eb.k IS NOT NULL
           |                       THEN 1 ELSE 0 END) AS BIGINT) AS exact_intersection
           |       FROM ea FULL JOIN eb ON ea.k = eb.k)
           |SELECT exact_union, exact_intersection, est_union, jaccard,
           |       jaccard * est_union AS est_intersection FROM est, ex""".stripMargin
      },
      "KMV set-operation estimates: union/Jaccard/intersection from the " +
        "sketches alone, exact counts alongside"),

    // Histogram-binned approximate quantiles — the quantile shape that
    // actually runs at 100 TB (exact percentile_disc needs a full sort
    // or per-group materialization; the binned sketch needs ONE keyed
    // count rollup whose state is bins = value-range / width per group,
    // independent of row count — this is t-digest/KLL's niche filled
    // with a fixed-width histogram). Everything compared is integer or
    // an exact double (bin edges are bin*100 integers; the rank target
    // ceil(p*n) is one IEEE multiply+ceil, identical cross-engine). The
    // answer is the lower edge of the first bin whose cumulative count
    // reaches the target rank — error bounded by bin width by
    // construction.
    Q(
      "sketch_quantile_binned",
      (s, d) =>
        SketchOps
          .binnedQuantiles(T(s, d, "lineitem"), "l_returnflag",
            "l_extendedprice", width = 100.0, ps = Seq(0.5, 0.9, 0.99))
          .orderBy("l_returnflag", "p"),
      Some("""WITH b AS (
             |  SELECT l_returnflag,
             |    CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS bin,
             |    count(*) AS c
             |  FROM lineitem GROUP BY 1, 2),
             |cum AS (
             |  SELECT l_returnflag, bin,
             |    CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM b),
             |t AS (SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS n
             |      FROM b GROUP BY 1),
             |tgt AS (
             |  SELECT l_returnflag, p, CAST(ceil(p * n) AS BIGINT) AS k
             |  FROM t, (SELECT unnest([0.5, 0.9, 0.99]) AS p))
             |SELECT cum.l_returnflag, CAST(tgt.p AS DOUBLE) AS p,
             |  CAST(min(cum.bin) * 100 AS DOUBLE) AS approx_q
             |FROM cum JOIN tgt ON cum.l_returnflag = tgt.l_returnflag
             |WHERE cum.cum >= tgt.k
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin),
      "approximate quantiles from a fixed-width histogram: state is " +
        "bins per group, never rows — the scalable quantile path")
  )
}
