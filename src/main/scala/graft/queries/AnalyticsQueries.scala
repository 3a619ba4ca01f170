package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, T}

/** Event-analytics surface: sessionization, pivoted counts, JSON
  * extraction (the raw layer is JSON — a first-class op), and the
  * string/null scalar battery. */
object AnalyticsQueries {

  private val GapUs = 1800L * 1000000L // 30 min session gap

  val all: Seq[Q] = Seq(
    // Sessionization: gap > 30 min starts a new session; running sum of
    // starts numbers the sessions per user. Two windows over ONE shuffle
    // (same partitioning/ordering), then one aggregate.
    Q(
      "sessionize",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        T(s, d, "events")
          .select("user_id", "ts", "event_id")
          .withColumn("_prev", lag(col("ts"), 1).over(w))
          .withColumn("_new_session",
            when(col("_prev").isNull ||
              unix_micros(col("ts")) - unix_micros(col("_prev")) > GapUs, 1)
              .otherwise(0))
          .withColumn("session_seq",
            sum(col("_new_session")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_seq")
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts")).as("start_ts"),
            (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
              .as("duration_us"))
          .orderBy("user_id", "session_seq")
      },
      Some(s"""WITH m AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR date_diff('microsecond', lag(ts) OVER w, ts) > $GapUs
             |         THEN 1 ELSE 0 END AS ns
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts,
             |    CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_seq
             |  FROM m)
             |SELECT user_id, session_seq, COUNT(*) AS n_events,
             |  min(ts) AS start_ts,
             |  date_diff('microsecond', min(ts), max(ts)) AS duration_us
             |FROM s GROUP BY user_id, session_seq
             |ORDER BY user_id, session_seq""".stripMargin),
      "30-min-gap sessionization: lag + running sum + per-session rollup"),

    // Pivoted per-user activity counts (fixed value list -> static schema)
    Q(
      "pivot_event_counts",
      (s, d) =>
        T(s, d, "events")
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0)
          .orderBy("user_id"),
      Some("""SELECT user_id,
             |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
             |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
             |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      "pivot on a fixed value list == conditional-count aggregation"),

    // JSON extraction from the props payload (raw-layer shape)
    Q(
      "json_extract_props",
      (s, d) =>
        T(s, d, "events")
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin),
      "JSON path extraction + typed cast from a string payload column"),

    // Exact percentiles (sort-based; values here interpolate onto exact
    // grid points, so the DuckDB quantile_cont oracle matches)
    Q(
      "agg_percentiles",
      (s, d) =>
        T(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
            percentile(col("l_quantity"), lit(0.95)).as("p95_qty"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.5) AS median_qty,
             |  quantile_cont(l_quantity, 0.95) AS p95_qty,
             |  min(l_quantity) AS min_qty,
             |  max(l_quantity) AS max_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "exact interpolated percentiles per group"),

    // TPC-H Q3 shape: selective multi-join + revenue rollup + ordered topN
    Q(
      "q3_shipping_priority",
      (s, d) => {
        val cutoff = lit("1995-03-15").cast(TimestampType)
        val price = col("l_extendedprice").cast(DecimalType(12, 4))
        val disc = col("l_discount").cast(DecimalType(8, 6))
        val one = lit(1).cast(DecimalType(8, 6))
        T(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
          .join(T(s, d, "orders").filter(col("o_orderdate") < cutoff),
            col("c_custkey") === col("o_custkey"))
          .join(T(s, d, "lineitem").filter(col("l_shipdate") > cutoff),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum(price * (one - disc)).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(20)
          .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      },
      Some("""SELECT o_orderkey,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
             |       (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE) AS revenue,
             |  o_orderdate, o_orderpriority
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
             |GROUP BY o_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin),
      "shipping-priority shape: selective joins, decimal revenue, ordered topN"),

    // Scalar string/null battery: regexp extract, case, trim/pad-free
    // deterministic funcs, coalesce/nullif/greatest/least
    Q(
      "scalar_battery",
      (s, d) =>
        T(s, d, "customer")
          .select(
            col("c_custkey"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
            upper(col("c_mktsegment")).as("seg_upper"),
            substring(col("c_name"), 1, 8).as("name_prefix"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
              lit("OTHER")).as("seg_or_other"),
            greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
            least(col("c_nationkey"), lit(10)).as("nk_cap"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
             |  upper(c_mktsegment) AS seg_upper,
             |  substring(c_name, 1, 8) AS name_prefix,
             |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
             |  greatest(c_acctbal, 0.0) AS bal_floor,
             |  least(c_nationkey, 10) AS nk_cap
             |FROM customer ORDER BY c_custkey""".stripMargin),
      "string/null scalar battery (regexp, case, coalesce/nullif, clamp)")
  )
}
