package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.ops.IncrementalOps

/** Incremental-warehouse gates: CDC snapshot diff, Type-2 SCD apply, and
  * delta-driven aggregate-view maintenance. Each derives its "changed"
  * side in-plan from the base tables (updates to %7 keys, deletes of %11
  * keys, inserts at shifted %13 keys, ...) so the gate is read-only and
  * the oracle can state the expected output in SQL.
  */
object IncrementalQueries {

  private val Eff = "2025-06-01 00:00:00"

  val all: Seq[Q] = Seq(
    // CDC between two snapshots: one full-outer join on the key classifies
    // every row as insert / delete / update (null-safe column compares);
    // unchanged rows are dropped — the delta IS the output, which is what
    // an incremental load ships instead of the full snapshot.
    Q(
      "cdc_snapshot_diff",
      (s, d) => {
        val cust = T(s, d, "customer")
        val oldSnap = cust.select("c_custkey", "c_acctbal", "c_mktsegment")
        def newSnap = cust.filter(col("c_custkey") % 11 =!= 0)
          .select(col("c_custkey"),
            when(col("c_custkey") % 7 === 0, col("c_acctbal") + 50.0)
              .otherwise(col("c_acctbal")).as("c_acctbal"),
            col("c_mktsegment"))
          .unionByName(cust.filter(col("c_custkey") % 13 === 0)
            .select((col("c_custkey") + 10000000L).as("c_custkey"),
              col("c_acctbal"), lit("NEW").as("c_mktsegment")))
        IncrementalOps
          .snapshotDiff(oldSnap, newSnap, Seq("c_custkey"),
            Seq("c_acctbal", "c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("""WITH oldc AS (
             |  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
             |newc AS (
             |  SELECT c_custkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 50.0
             |         ELSE c_acctbal END AS c_acctbal,
             |    c_mktsegment
             |  FROM customer WHERE c_custkey % 11 <> 0
             |  UNION ALL
             |  SELECT c_custkey + 10000000, c_acctbal, 'NEW'
             |  FROM customer WHERE c_custkey % 13 = 0)
             |SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
             |  CASE WHEN o.c_custkey IS NULL THEN 'insert'
             |       WHEN n.c_custkey IS NULL THEN 'delete'
             |       ELSE 'update' END AS change_type,
             |  o.c_acctbal AS old_c_acctbal, n.c_acctbal AS new_c_acctbal,
             |  o.c_mktsegment AS old_c_mktsegment,
             |  n.c_mktsegment AS new_c_mktsegment
             |FROM oldc o FULL OUTER JOIN newc n ON n.c_custkey = o.c_custkey
             |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
             |   OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
             |   OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
             |ORDER BY c_custkey""".stripMargin),
      "CDC snapshot diff: insert/update/delete delta from one full-outer key join"),

    // Type-2 SCD: the open generation joins the batch once; changed keys
    // close at the effective timestamp and re-open from the batch, new
    // keys open, equal re-deliveries are no-ops, closed history passes
    // through untouched. The dim ships with pre-existing closed rows
    // (%5 keys) to prove the pass-through.
    Q(
      "scd2_apply",
      (s, d) => {
        val cust = T(s, d, "customer")
        val open = cust.select(
          col("c_custkey"), col("c_name"), col("c_acctbal"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
        val closedHist = cust.filter(col("c_custkey") % 5 === 0).select(
          col("c_custkey"), col("c_name"),
          (col("c_acctbal") - 10.0).as("c_acctbal"),
          lit("2023-01-01 00:00:00").cast("timestamp").as("valid_from"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("valid_to"))
        def upd = cust.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), col("c_name"),
            (col("c_acctbal") + 50.0).as("c_acctbal"))
          .unionByName(cust.filter(col("c_custkey") % 13 === 0)
            .select((col("c_custkey") + 10000000L).as("c_custkey"),
              col("c_name"), col("c_acctbal")))
        IncrementalOps
          .scdType2Apply(open.unionByName(closedHist), upd,
            Seq("c_custkey"), Seq("c_name", "c_acctbal"),
            lit(Eff).cast("timestamp"))
          .orderBy("c_custkey", "valid_from")
      },
      Some(s"""WITH dim AS (
             |  SELECT c_custkey, c_name, c_acctbal,
             |    TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
             |    CAST(NULL AS TIMESTAMP) AS valid_to
             |  FROM customer
             |  UNION ALL
             |  SELECT c_custkey, c_name, c_acctbal - 10.0,
             |    TIMESTAMP '2023-01-01 00:00:00',
             |    TIMESTAMP '2024-01-01 00:00:00'
             |  FROM customer WHERE c_custkey % 5 = 0),
             |upd AS (
             |  SELECT c_custkey, c_name, c_acctbal + 50.0 AS c_acctbal
             |  FROM customer WHERE c_custkey % 7 = 0
             |  UNION ALL
             |  SELECT c_custkey + 10000000, c_name, c_acctbal
             |  FROM customer WHERE c_custkey % 13 = 0),
             |closed AS (SELECT * FROM dim WHERE valid_to IS NOT NULL),
             |op AS (SELECT * FROM dim WHERE valid_to IS NULL),
             |kept_open AS (
             |  SELECT o.c_custkey, o.c_name, o.c_acctbal, o.valid_from,
             |    CAST(NULL AS TIMESTAMP) AS valid_to
             |  FROM op o LEFT JOIN upd u ON u.c_custkey = o.c_custkey
             |  WHERE u.c_custkey IS NULL
             |     OR (o.c_name IS NOT DISTINCT FROM u.c_name
             |         AND o.c_acctbal IS NOT DISTINCT FROM u.c_acctbal)),
             |newly_closed AS (
             |  SELECT o.c_custkey, o.c_name, o.c_acctbal, o.valid_from,
             |    TIMESTAMP '$Eff' AS valid_to
             |  FROM op o JOIN upd u ON u.c_custkey = o.c_custkey
             |  WHERE o.c_name IS DISTINCT FROM u.c_name
             |     OR o.c_acctbal IS DISTINCT FROM u.c_acctbal),
             |new_open AS (
             |  SELECT u.c_custkey, u.c_name, u.c_acctbal,
             |    TIMESTAMP '$Eff' AS valid_from,
             |    CAST(NULL AS TIMESTAMP) AS valid_to
             |  FROM upd u LEFT JOIN op o ON o.c_custkey = u.c_custkey
             |  WHERE o.c_custkey IS NULL
             |     OR o.c_name IS DISTINCT FROM u.c_name
             |     OR o.c_acctbal IS DISTINCT FROM u.c_acctbal)
             |SELECT * FROM closed
             |UNION ALL SELECT * FROM kept_open
             |UNION ALL SELECT * FROM newly_closed
             |UNION ALL SELECT * FROM new_open
             |ORDER BY c_custkey, valid_from""".stripMargin),
      "Type-2 SCD apply: close-and-reopen changed keys, append new, history immutable"),

    // Type-2 dimension COMPACTION ([[graft.ops.IncrementalOps.scd2Compact]]):
    // merge consecutive attribute-identical versions — the maintenance
    // pass that reclaims the no-op rows re-delivered batches and
    // effective-ts churn leave behind, WITHOUT erasing genuine absences
    // (a gap blocks the merge). The fixture plants all three regimes:
    // %3 keys carry a split open row (merges back), %5 keys a closed
    // generation with DIFFERENT attrs (adjacent, must not merge), %11
    // keys an attribute-identical but GAPPED early version (must not
    // merge). The oracle replays the island windows.
    Q(
      "scd2_compact",
      (s, d) => {
        val cust = T(s, d, "customer")
        val openWhole = cust.filter(col("c_custkey") % 3 =!= 0).select(
          col("c_custkey"), col("c_name"), col("c_acctbal"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
        val splitA = cust.filter(col("c_custkey") % 3 === 0).select(
          col("c_custkey"), col("c_name"), col("c_acctbal"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("valid_from"),
          lit("2024-06-01 00:00:00").cast("timestamp").as("valid_to"))
        val splitB = cust.filter(col("c_custkey") % 3 === 0).select(
          col("c_custkey"), col("c_name"), col("c_acctbal"),
          lit("2024-06-01 00:00:00").cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
        val closedHist = cust.filter(col("c_custkey") % 5 === 0).select(
          col("c_custkey"), col("c_name"),
          (col("c_acctbal") - 10.0).as("c_acctbal"),
          lit("2023-01-01 00:00:00").cast("timestamp").as("valid_from"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("valid_to"))
        val gapped = cust.filter(col("c_custkey") % 11 === 0).select(
          col("c_custkey"), col("c_name"), col("c_acctbal"),
          lit("2021-01-01 00:00:00").cast("timestamp").as("valid_from"),
          lit("2021-06-01 00:00:00").cast("timestamp").as("valid_to"))
        IncrementalOps.scd2Compact(
            openWhole.unionByName(splitA).unionByName(splitB)
              .unionByName(closedHist).unionByName(gapped),
            Seq("c_custkey"), Seq("c_name", "c_acctbal"))
          .orderBy("c_custkey", "valid_from")
      },
      Some("""WITH dim AS (
             |  SELECT c_custkey, c_name, c_acctbal,
             |    TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
             |    CAST(NULL AS TIMESTAMP) AS valid_to
             |  FROM customer WHERE c_custkey % 3 <> 0
             |  UNION ALL
             |  SELECT c_custkey, c_name, c_acctbal,
             |    TIMESTAMP '2024-01-01 00:00:00',
             |    TIMESTAMP '2024-06-01 00:00:00'
             |  FROM customer WHERE c_custkey % 3 = 0
             |  UNION ALL
             |  SELECT c_custkey, c_name, c_acctbal,
             |    TIMESTAMP '2024-06-01 00:00:00',
             |    CAST(NULL AS TIMESTAMP)
             |  FROM customer WHERE c_custkey % 3 = 0
             |  UNION ALL
             |  SELECT c_custkey, c_name, c_acctbal - 10.0,
             |    TIMESTAMP '2023-01-01 00:00:00',
             |    TIMESTAMP '2024-01-01 00:00:00'
             |  FROM customer WHERE c_custkey % 5 = 0
             |  UNION ALL
             |  SELECT c_custkey, c_name, c_acctbal,
             |    TIMESTAMP '2021-01-01 00:00:00',
             |    TIMESTAMP '2021-06-01 00:00:00'
             |  FROM customer WHERE c_custkey % 11 = 0),
             |w AS (SELECT *,
             |    row_number() OVER pk AS rn,
             |    lag(valid_to) OVER pk AS pvt,
             |    lag(c_name) OVER pk AS pn,
             |    lag(c_acctbal) OVER pk AS pb
             |  FROM dim
             |  WINDOW pk AS (PARTITION BY c_custkey ORDER BY valid_from)),
             |f AS (SELECT *,
             |    CASE WHEN rn = 1 THEN 1
             |         WHEN pvt IS NULL OR pvt <> valid_from THEN 1
             |         WHEN pn IS DISTINCT FROM c_name
             |           OR pb IS DISTINCT FROM c_acctbal THEN 1
             |         ELSE 0 END AS nw
             |  FROM w),
             |i AS (SELECT *,
             |    SUM(nw) OVER (PARTITION BY c_custkey ORDER BY valid_from
             |      ROWS UNBOUNDED PRECEDING) AS isl
             |  FROM f)
             |SELECT c_custkey, min(c_name) AS c_name,
             |  min(c_acctbal) AS c_acctbal,
             |  min(valid_from) AS valid_from,
             |  CASE WHEN sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) > 0
             |       THEN NULL ELSE max(valid_to) END AS valid_to
             |FROM i GROUP BY c_custkey, isl
             |ORDER BY c_custkey, valid_from""".stripMargin),
      "Type-2 compaction: merge adjacent attribute-identical versions, gaps preserved"),

    // Incremental aggregate-view maintenance: the per-customer order
    // aggregate is refreshed from a snapshot delta — untouched groups keep
    // their previous row verbatim (anti-join), touched groups recompute
    // from the new snapshot only (semi-join) — and must land bit-identical
    // to aggregating the full new snapshot, which is the oracle. The
    // synthetic "previous" snapshot exercises all four dirtying modes:
    // inserts (%7 keys missing), updates (%11 stale price), group moves
    // (%13 parked under the neighboring customer — BOTH groups dirty),
    // and the untouched majority that must flow through unrecomputed.
    Q(
      "agg_incremental_update",
      (s, d) => {
        import org.apache.spark.sql.types.{DecimalType, DoubleType}
        val orders = T(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val prev = orders.filter(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 13 === 0, col("o_custkey") + 1L)
              .otherwise(col("o_custkey")).as("o_custkey"),
            when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 100.0)
              .otherwise(col("o_totalprice")).as("o_totalprice"))
        def aggs = Seq(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("total_price"))
        val prevAgg = prev.groupBy("o_custkey").agg(aggs.head, aggs.tail: _*)
        val diff = IncrementalOps.snapshotDiff(prev, orders,
          Seq("o_orderkey"), Seq("o_custkey", "o_totalprice"))
        val touched = IncrementalOps.touchedGroups(diff, "o_custkey")
        IncrementalOps
          .incrementalAggUpdate(prevAgg, orders, touched,
            Seq("o_custkey"), aggs)
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      "incremental aggregate maintenance: delta-driven refresh == full recompute"),

    // Right-to-be-forgotten cascade: a deterministic ~10% customer
    // deletion set propagates through the FK graph (customer → orders →
    // lineitem), reporting per-table deleted/remaining counts — the
    // audit record a GDPR deletion job must produce. Each hop is ONE
    // semi join on the parent's deleted keys; at 100 TB the deletion-set
    // side is the small one and broadcasts.
    Q(
      "gdpr_cascade_delete",
      (s, d) => {
        val t10 = graft.ops.CorpusOps.md5Threshold(0.1)
        val victims = T(s, d, "customer")
          .filter(graft.ops.CorpusOps.saltedHash(col("c_custkey"), "gdpr")
            < lit(t10))
          .select(col("c_custkey"))
        val delOrders = T(s, d, "orders")
          .join(victims, col("o_custkey") === col("c_custkey"), "left_semi")
        val delLineitem = T(s, d, "lineitem")
          .join(delOrders.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
        def row(table: String, deleted: org.apache.spark.sql.DataFrame,
            total: org.apache.spark.sql.DataFrame) =
          deleted.agg(count(lit(1)).as("n_deleted"))
            .crossJoin(total.agg(count(lit(1)).as("n_total")))
            .select(lit(table).as("table_name"), col("n_deleted"),
              (col("n_total") - col("n_deleted")).as("n_remaining"))
        row("customer", victims, T(s, d, "customer"))
          .unionAll(row("orders", delOrders, T(s, d, "orders")))
          .unionAll(row("lineitem", delLineitem, T(s, d, "lineitem")))
          .orderBy("table_name")
      },
      Some {
        val t10 = graft.ops.CorpusOps.md5Threshold(0.1)
        s"""WITH victims AS (
           |  SELECT c_custkey FROM customer
           |  WHERE md5('gdpr:' || CAST(c_custkey AS VARCHAR)) < '$t10'),
           |del_orders AS (
           |  SELECT o_orderkey FROM orders
           |  WHERE o_custkey IN (SELECT c_custkey FROM victims)),
           |del_li AS (
           |  SELECT 1 AS x FROM lineitem
           |  WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders))
           |SELECT 'customer' AS table_name,
           |  (SELECT count(*) FROM victims) AS n_deleted,
           |  (SELECT count(*) FROM customer) - (SELECT count(*) FROM victims)
           |    AS n_remaining
           |UNION ALL
           |SELECT 'orders',
           |  (SELECT count(*) FROM del_orders),
           |  (SELECT count(*) FROM orders) - (SELECT count(*) FROM del_orders)
           |UNION ALL
           |SELECT 'lineitem',
           |  (SELECT count(*) FROM del_li),
           |  (SELECT count(*) FROM lineitem) - (SELECT count(*) FROM del_li)
           |ORDER BY table_name""".stripMargin
      },
      "GDPR cascade-delete audit: FK-propagated deletion counts, one semi join per hop")
  )
}
