package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, T}

/** Relational operator battery: one registered query per operator family in
  * SURVEY.md §2 (projection P*, filters F*, dedupe D*, joins J*, unions U*,
  * expressions E*, aggregations A*, constraint validations §2.7), phrased
  * against the driver testdata so each has a DuckDB oracle.
  *
  * Numeric discipline for hash-stable oracles: never sum raw doubles
  * (accumulation order differs between engines). Money/quantity sums go
  * through exact DECIMAL accumulation and only the final value is cast to
  * DOUBLE — bit-identical in Spark and DuckDB. Raw double columns are only
  * ever passed through untouched (exact) or min/max'd (exact).
  */
object RelationalQueries {

  private val dec18_4 = DecimalType(18, 4)

  private def li(s: SparkSession, d: String) = T(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = T(s, d, "orders")
  private def cust(s: SparkSession, d: String) = T(s, d, "customer")
  private def supp(s: SparkSession, d: String) = T(s, d, "supplier")
  private def ev(s: SparkSession, d: String) = T(s, d, "events")

  /** Exact decimal sum of a double column, surfaced as DOUBLE. */
  private def dsum(c: Column): Column = sum(c.cast(dec18_4)).cast(DoubleType)

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // P2/P3/P4 keep-list projection + pushed filter (transform.py:85-108)
    Q(
      "p2_project_prune",
      (s, d) =>
        li(s, d)
          .filter(col("l_shipdate") < lit("1995-06-01").cast(TimestampType))
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      "keep-list projection with predicate pushed to the parquet scan"),

    // ------------------------------------------------------------------
    // F1 eligibility filter (extract.py:67-69): conjunctive predicates
    Q(
      "f1_filter_eligibility",
      (s, d) =>
        ord(s, d)
          .filter(
            col("o_orderstatus") === "O" && col("o_totalprice") > 50000 &&
              col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
             |FROM orders
             |WHERE o_orderstatus = 'O' AND o_totalprice > 50000
             |  AND o_orderpriority IN ('1-URGENT','2-HIGH')
             |ORDER BY o_orderkey""".stripMargin),
      "multi-predicate eligibility filter ahead of downstream fan-out"),

    // ------------------------------------------------------------------
    // F2-F5 dropna on a nullable column (transform.py:125-131)
    Q(
      "f2_dropna",
      (s, d) =>
        ev(s, d)
          .withColumn("et", nullif(col("event_type"), lit("error")))
          .na.drop(Seq("et"))
          .select("event_id", "user_id", "et")
          .orderBy("event_id"),
      Some("""SELECT event_id, user_id, et FROM (
             |  SELECT event_id, user_id, NULLIF(event_type, 'error') AS et FROM events)
             |WHERE et IS NOT NULL ORDER BY event_id""".stripMargin),
      "na.drop null filtering on required columns"),

    // ------------------------------------------------------------------
    // D1-D3 keep-last dedupe with explicit ordering (transform.py:135-138)
    Q(
      "d1_dedupe_keep_last",
      (s, d) => {
        val w = Window
          .partitionBy("user_id", "event_type")
          .orderBy(col("ts").desc, col("event_id").desc)
        ev(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id", "ts", "value")
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id, ts, value FROM (
             |  SELECT *, ROW_NUMBER() OVER (
             |    PARTITION BY user_id, event_type
             |    ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events) WHERE rn = 1
             |ORDER BY user_id, event_type""".stripMargin),
      "keep-last dedupe: later record wins, explicit (ts, id) order"),

    // D4 keep-first dedupe (transform.py:436-440)
    Q(
      "d4_dedupe_keep_first",
      (s, d) => {
        val w =
          Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        ev(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "ts", "event_type")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, ts, event_type FROM (
             |  SELECT *, ROW_NUMBER() OVER (
             |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
             |  FROM events) WHERE rn = 1
             |ORDER BY user_id""".stripMargin),
      "keep-first dedupe per key with explicit ordering"),

    // ------------------------------------------------------------------
    // J1 left m:1 FK-resolving join, small side broadcast (transform.py:290-295)
    Q(
      "j1_left_join_fk",
      (s, d) =>
        ord(s, d)
          .join(
            broadcast(cust(s, d).select("c_custkey", "c_name", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"),
            "left")
          .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, c_name, c_mktsegment
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin),
      "FK-resolving left join; dimension broadcast, no shuffle of the fact"),

    // J2-flavored star join: fact -> supplier -> nation -> region rollup
    Q(
      "j2_star_join_rollup",
      (s, d) =>
        li(s, d)
          .join(broadcast(supp(s, d).select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(T(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(T(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(
            count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy("r_name"),
      Some("""SELECT r_name, COUNT(*) AS n_items,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin),
      "star-schema rollup through three broadcast dimension joins"),

    // Semi join (EXISTS)
    Q(
      "j3_semi_join",
      (s, d) =>
        cust(s, d)
          .join(ord(s, d).select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      "left-semi join (EXISTS) — customers having at least one order"),

    // F6 orphan audit via anti join (transform.py:301-308)
    Q(
      "f6_orphan_audit",
      (s, d) =>
        ev(s, d)
          .join(broadcast(supp(s, d).select("s_suppkey")),
            col("user_id") === col("s_suppkey"), "left_anti")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_orphan_events"))
          .orderBy("user_id"),
      Some("""SELECT user_id, COUNT(*) AS n_orphan_events FROM events e
             |WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = e.user_id)
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      "FK-orphan audit as a left-anti join + per-key count"),

    // ------------------------------------------------------------------
    // U1 union of two extracts + dedupe (transform.py:431-434)
    Q(
      "u1_union_dedupe",
      (s, d) =>
        cust(s, d)
          .select(col("c_custkey").as("id"))
          .unionByName(supp(s, d).select(col("s_suppkey").as("id")))
          .distinct()
          .orderBy("id"),
      Some("""SELECT DISTINCT id FROM (
             |  SELECT c_custkey AS id FROM customer
             |  UNION ALL SELECT s_suppkey AS id FROM supplier)
             |ORDER BY id""".stripMargin),
      "union of two key extracts + exact dedupe"),

    // U2 union-accumulate dimension upsert (transform.py:442-445):
    // existing dimension wins, new keys from the incoming batch are added.
    Q(
      "u2_union_accumulate",
      (s, d) => {
        val existing = supp(s, d)
          .select(col("s_suppkey").as("id"), col("s_name").as("name"))
          .withColumn("pri", lit(0))
        val incoming = ev(s, d)
          .select(col("user_id").as("id"))
          .distinct()
          .withColumn("name", concat(lit("u"), col("id").cast(StringType)))
          .withColumn("pri", lit(1))
        val w = Window.partitionBy("id").orderBy(col("pri").asc)
        existing
          .unionByName(incoming.select("id", "name", "pri"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("id", "name")
          .orderBy("id")
      },
      Some("""WITH dim AS (SELECT s_suppkey AS id, s_name AS name, 0 AS pri FROM supplier),
             |inc AS (SELECT DISTINCT user_id AS id,
             |               'u' || CAST(user_id AS VARCHAR) AS name, 1 AS pri FROM events),
             |u AS (SELECT * FROM dim UNION ALL SELECT * FROM inc)
             |SELECT id, name FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY pri) AS rn FROM u)
             |WHERE rn = 1 ORDER BY id""".stripMargin),
      "incremental union-accumulate upsert: existing dimension wins"),

    // ------------------------------------------------------------------
    // E2 string-array join (topics -> comma string, transform.py:182-184)
    Q(
      "e2_array_join",
      (s, d) => {
        val toks = split(col("text"), " +")
        T(s, d, "documents")
          .select(
            col("doc_id"),
            array_join(slice(toks, 1, 5), ",").as("first5"),
            size(toks).as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  array_to_string((string_split_regex(text, ' +'))[1:5], ',') AS first5,
             |  CAST(len(string_split_regex(text, ' +')) AS INTEGER) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
      "array_join over a sliced token array (topics-style E2)"),

    // E3 lambda transform + join with empty-guard (labels, transform.py:335-339)
    Q(
      "e3_transform_join",
      (s, d) => {
        val longToks = filter(split(col("text"), " +"), t => length(t) > 4)
        T(s, d, "documents")
          .select(
            col("doc_id"),
            when(size(longToks) > 0,
              array_join(transform(longToks, t => upper(t)), ","))
              .otherwise(lit(null).cast(StringType)).as("long_upper"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN len(list_filter(string_split_regex(text, ' +'), t -> length(t) > 4)) > 0
             |    THEN array_to_string(list_transform(
             |      list_filter(string_split_regex(text, ' +'), t -> length(t) > 4),
             |      t -> upper(t)), ',')
             |  END AS long_upper
             |FROM documents ORDER BY doc_id""".stripMargin),
      "higher-order transform + array_join with null-on-empty (labels-style E3)"),

    // ------------------------------------------------------------------
    // E4 timestamp parse with coercion to null (transform.py:186-192)
    Q(
      "e4_ts_coerce",
      (s, d) =>
        ord(s, d)
          .select(
            col("o_orderkey"),
            try_to_timestamp(
              date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
              lit("yyyy-MM-dd HH:mm:ss")).as("parsed"),
            try_to_timestamp(lit("not-a-timestamp"), lit("yyyy-MM-dd HH:mm:ss"))
              .as("bad"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed,
             |  TRY_CAST('not-a-timestamp' AS TIMESTAMP) AS bad
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      "round-trip timestamp format/parse; invalid input coerces to null"),

    // E5/E6 cast battery (transform.py:165-180)
    Q(
      "e5_casts",
      (s, d) =>
        li(s, d)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            floor(col("l_quantity")).cast(LongType).as("qty_floor"),
            // The DECIMAL(12,2) cast is the operator under test; surface it as
            // VARCHAR because raw DECIMAL bytes normalize differently between
            // Spark-parquet and DuckDB in the driver's hasher (round-1 verdict).
            col("l_extendedprice").cast(DecimalType(12, 2)).cast(StringType).as("price_dec"),
            col("l_linenumber").cast(StringType).as("line_str"),
            (col("l_returnflag") === "R").cast(IntegerType).as("is_return"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
             |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
             |  CAST(l_linenumber AS VARCHAR) AS line_str,
             |  CAST(l_returnflag = 'R' AS INTEGER) AS is_return
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      "type-cast battery incl. bool->int encoding (E6)"),

    // ------------------------------------------------------------------
    // A1 count audit (transform.py:121,140)
    Q(
      "a1_count_audit",
      (s, d) =>
        ev(s, d)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      "row-count audit per entity/step"),

    // A2 null-count aggregate post-join (transform.py:301-304)
    Q(
      "a2_null_count_audit",
      (s, d) =>
        ev(s, d)
          .join(broadcast(supp(s, d).select("s_suppkey")),
            col("user_id") === col("s_suppkey"), "left")
          .agg(
            sum(when(col("s_suppkey").isNull, 1).otherwise(0)).as("n_null"),
            count(lit(1)).as("n_total")),
      Some("""SELECT CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |       COUNT(*) AS n_total
             |FROM events e LEFT JOIN supplier s ON e.user_id = s.s_suppkey""".stripMargin),
      "single-pass null-count FK audit after left join"),

    // ------------------------------------------------------------------
    // §2.7 PK-uniqueness validation (001_core_schema.sql:46)
    Q(
      "v_pk_unique_audit",
      (s, d) =>
        ord(s, d)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, COUNT(*) AS n FROM orders
             |GROUP BY o_orderkey HAVING COUNT(*) > 1 ORDER BY o_orderkey""".stripMargin),
      "PK-uniqueness audit: violations of unique o_orderkey (expected empty)"),

    // §2.7 UNIQUE composite audit — non-unique key so violations are non-empty
    Q(
      "v_unique_composite_audit",
      (s, d) =>
        ev(s, d)
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
          .orderBy("user_id", "event_type"),
      Some("""SELECT user_id, event_type, COUNT(*) AS n FROM events
             |GROUP BY user_id, event_type HAVING COUNT(*) > 1
             |ORDER BY user_id, event_type""".stripMargin),
      "composite-key uniqueness audit (duplicate groups surfaced)"),

    // §2.7 CHECK-constraint battery (enum, non-negative) as one audit row
    Q(
      "v_check_constraints",
      (s, d) =>
        ord(s, d).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("o_totalprice") < 0, 1).otherwise(0)).as("n_neg_price"),
          sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0))
            .as("n_bad_status"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("n_low_priority")),
      Some("""SELECT COUNT(*) AS n_rows,
             |  CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg_price,
             |  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status,
             |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_low_priority
             |FROM orders""".stripMargin),
      "CHECK-constraint audits: enum membership + non-negativity"),

    // §2.7 hex-sha CHECK (001_core_schema.sql:187-190 commit_sha CHAR(40)).
    // Testdata has no sha column, so the passing population is a derived
    // 40-hex value (md5 + its first 8 hex chars — identical bytes in both
    // engines) and the failing one is the non-hex `source` enum; the gate
    // covers Validate.isHexSha end to end.
    Q(
      "v_check_hex_sha",
      (s, d) => {
        val sha40 = concat(md5(col("text")), substring(md5(col("text")), 1, 8))
        T(s, d, "documents").agg(
          count(lit(1)).as("n_rows"),
          sum(when(!graft.pipeline.Validate.isHexSha(sha40), 1).otherwise(0))
            .as("n_bad_sha"),
          sum(when(!graft.pipeline.Validate.isHexSha(col("source")), 1)
            .otherwise(0)).as("n_nonhex_source"))
      },
      Some("""SELECT COUNT(*) AS n_rows,
             |  CAST(SUM(CASE WHEN NOT regexp_matches(md5(text) || substr(md5(text),1,8), '^[0-9a-fA-F]{40}$') THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_sha,
             |  CAST(SUM(CASE WHEN NOT regexp_matches(source, '^[0-9a-fA-F]{40}$') THEN 1 ELSE 0 END) AS BIGINT) AS n_nonhex_source
             |FROM documents""".stripMargin),
      "hex-sha CHECK audit: derived 40-hex passes, non-hex enum fails"),

    // §2.7 timestamp-ordering CHECK across a join (001_core_schema.sql:112-119)
    Q(
      "v_ts_order_audit",
      (s, d) =>
        li(s, d)
          .join(broadcast(ord(s, d).select("o_orderkey", "o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("l_shipdate") < col("o_orderdate"), 1).otherwise(0))
              .as("n_ship_before_order")),
      Some("""SELECT COUNT(*) AS n_rows,
             |  CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS n_ship_before_order
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin),
      "cross-table timestamp-ordering CHECK audit"),

    // ------------------------------------------------------------------
    // Index-implied aggregate #1: per-key counts (001_core_schema.sql:194-283)
    Q(
      "agg_per_key",
      (s, d) =>
        ord(s, d)
          .groupBy("o_custkey")
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("total_price"))
          .orderBy("o_custkey"),
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      "orders-per-customer rollup (index-implied access path)"),

    // Index-implied aggregate #2: time-windowed activity
    Q(
      "agg_time_window",
      (s, d) =>
        li(s, d)
          .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
          .agg(
            count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("month"),
      Some("""SELECT date_trunc('month', l_shipdate) AS month, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
      "monthly activity rollup (time-range index access path)"),

    // Flagship pricing summary (TPC-H Q1 shape): exact decimal accumulation
    Q(
      "q1_pricing_summary",
      (s, d) => {
        val price = col("l_extendedprice").cast(DecimalType(12, 4))
        val disc = col("l_discount").cast(DecimalType(8, 6))
        val one = lit(1).cast(DecimalType(8, 6))
        li(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            sum(price).cast(DoubleType).as("sum_base_price"),
            // Reduce to scale 4 before the DOUBLE cast: DuckDB converts
            // DECIMAL→DOUBLE as int128→double then ÷10^scale (two
            // roundings — off by 1 ULP at scale 10 and 20 significant
            // digits, caught at sf0.1), while at scale 4 the scaled
            // integer fits in 2^53 and both engines round once. The
            // source data has ≤4 decimal digits, so the reduction itself
            // is exact.
            sum(price * (one - disc)).cast(DecimalType(28, 4))
              .cast(DoubleType).as("sum_disc_price"),
            (sum(col("l_quantity").cast(dec18_4)).cast(DoubleType) /
              count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
             |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
             |       (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      "pricing-summary aggregate with exact decimal accumulation"),

    // Hierarchical rollup (region -> nation subtotals + grand total)
    Q(
      "agg_rollup",
      (s, d) => {
        // via spark.sql: sorting a DataFrame-API rollup by its grouping
        // columns trips the ambiguous-self-join detector (the Expand node
        // carries the attribute twice); the SQL path resolves it cleanly.
        ord(s, d)
          .join(broadcast(cust(s, d).select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(T(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(T(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name").as("region"), col("n_name").as("nation"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_rollup_in")
        s.sql("""SELECT region, nation, COUNT(*) AS n_orders,
                |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
                |FROM graft_rollup_in
                |GROUP BY ROLLUP (region, nation)
                |ORDER BY region ASC NULLS FIRST, nation ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT region, nation, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
             |FROM (SELECT r_name AS region, n_name AS nation, o_totalprice
             |      FROM orders
             |      JOIN customer ON o_custkey = c_custkey
             |      JOIN nation ON c_nationkey = n_nationkey
             |      JOIN region ON n_regionkey = r_regionkey)
             |GROUP BY ROLLUP (region, nation)
             |ORDER BY region NULLS FIRST, nation NULLS FIRST""".stripMargin),
      "ROLLUP subtotal hierarchy over the region/nation dimensions"),

    // CUBE: all 2^k grouping combinations in one Expand pass — ROLLUP's
    // sibling, with the cross-dimension subtotal rows ROLLUP omits
    // (nation-only totals here). grouping_id disambiguates aggregation
    // nulls from data nulls, same as the grouping-sets gate.
    Q(
      "agg_cube",
      (s, d) => {
        ord(s, d)
          .join(broadcast(cust(s, d).select("c_custkey", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("segment"),
            col("o_orderpriority").as("priority"), col("o_totalprice"))
          .createOrReplaceTempView("graft_cube_in")
        s.sql("""SELECT segment, priority, grouping_id() AS gid,
                |  COUNT(*) AS n_orders,
                |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
                |FROM graft_cube_in
                |GROUP BY CUBE (segment, priority)
                |ORDER BY gid, segment NULLS FIRST, priority NULLS FIRST""".stripMargin)
      },
      Some("""SELECT segment, priority,
             |  CAST(GROUPING(segment) * 2 + GROUPING(priority) AS BIGINT) AS gid,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
             |FROM (SELECT c_mktsegment AS segment,
             |        o_orderpriority AS priority, o_totalprice
             |      FROM orders JOIN customer ON o_custkey = c_custkey)
             |GROUP BY CUBE (segment, priority)
             |ORDER BY gid, segment NULLS FIRST, priority NULLS FIRST""".stripMargin),
      "CUBE over segment x priority: all grouping combinations in one Expand"),

    // Window top-N per key
    Q(
      "window_topn_per_key",
      (s, d) => {
        val w = Window
          .partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        ord(s, d)
          .withColumn("rn", row_number().over(w).cast(LongType))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice, ROW_NUMBER() OVER (
             |    PARTITION BY o_custkey
             |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders) WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin),
      "top-3 orders per customer via ranking window")
  )
}
